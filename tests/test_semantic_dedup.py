"""SemDeDup-style semantic dedup (similarity.semantic_dupes).

Pins the operator's contract:
* planted exact-duplicate embeddings land in the same cluster and only the
  smallest vec_id survives;
* vectors with no epsilon-ball neighbor are all kept;
* every corpus vector gets exactly one verdict row;
* with precomputed centroids the plan runs zero training jobs
  (ivf_centroids monkeypatched to raise).
"""

from __future__ import annotations

import math

import pytest

from git_prov_spark.corpus import similarity


def _ring_vectors(n: int, dim: int = 8) -> list[list[float]]:
    """n well-separated unit vectors on a 2D ring embedded in `dim`."""
    out = []
    for i in range(n):
        a = 2.0 * math.pi * i / n
        v = [math.cos(a), math.sin(a)] + [0.0] * (dim - 2)
        out.append(v)
    return out


@pytest.fixture()
def emb_df(spark):
    base = _ring_vectors(12)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant: 100/101 duplicate vector 0; 102 duplicates vector 5
    rows += [(100, rows[0][1]), (101, rows[0][1]), (102, rows[5][1])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_duplicates_dropped(emb_df):
    verdicts = {
        r["vec_id"]: (r["cluster"], r["kept"])
        for r in similarity.semantic_dupes(emb_df, threshold=0.99).collect()
    }
    assert len(verdicts) == 15  # one verdict row per corpus vector
    # duplicates of vec 0: min-id keeper is 0, clones dropped
    assert verdicts[0][1] is True
    assert verdicts[100][1] is False
    assert verdicts[101][1] is False
    assert verdicts[100][0] == verdicts[0][0]  # same cluster as the keeper
    # duplicate of vec 5
    assert verdicts[5][1] is True
    assert verdicts[102][1] is False
    # everything without an epsilon-ball neighbor survives
    for i in range(12):
        if i not in (0, 5):
            assert verdicts[i][1] is True, i


def test_no_dupes_below_threshold(emb_df):
    # ring spacing is 30 deg (cos ~0.866): a 0.999 cut on the distinct 12
    distinct = emb_df.where("vec_id < 12")
    out = similarity.semantic_dupes(distinct, threshold=0.999).collect()
    assert len(out) == 12
    assert all(r["kept"] for r in out)


def test_precomputed_centroids_run_no_training(emb_df, monkeypatch):
    cents = [[1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
             [-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]]
    monkeypatch.setattr(
        similarity, "ivf_centroids",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("trained despite precomputed centroids")))
    monkeypatch.setattr(
        similarity, "load_or_train_centroids",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("resolved index despite precomputed centroids")))
    out = similarity.semantic_dupes(
        emb_df, threshold=0.99, centroids=cents, corpus_size=15).collect()
    assert len(out) == 15
    assert {r["cluster"] for r in out} <= {0, 1}


def test_corpus_size_required_with_centroids(emb_df):
    with pytest.raises(ValueError):
        similarity.semantic_dupes(emb_df, centroids=[[1.0] * 8])


# ---------------------------------------------------------------------------
# fixed-point centroids


def test_label_centroids_exact_and_partition_invariant(spark):
    from git_prov_spark.corpus.similarity import label_centroids

    rows = [
        (1, [0.5] * 64, 0),
        (2, [1.0] * 64, 0),
        (3, [-0.25] * 64, 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {(r.label, r.dim): (r.n, r.c_micro)
           for r in label_centroids(df).collect()}
    # label 0: (500000 + 1000000) div 2 = 750000 on every dim
    assert all(out[(0, d)] == (2, 750000) for d in range(1, 65))
    # label 1: floor(-0.25e6) = -250000, div 1
    assert all(out[(1, d)] == (1, -250000) for d in range(1, 65))
    x = sorted(out.items())
    y = sorted(((r.label, r.dim), (r.n, r.c_micro))
               for r in label_centroids(df.repartition(5)).collect())
    assert x == y


def test_label_centroid_sim_geometry(spark):
    from git_prov_spark.corpus.similarity import label_centroid_sim

    # label 0 along +e1, label 1 along -e1 (cos -1), label 2 along e2
    def vec(i, s):
        v = [0.0] * 64
        v[i] = s
        return v

    rows = [(1, vec(0, 1.0), 0), (2, vec(0, 0.5), 0),
            (3, vec(0, -1.0), 1), (4, vec(1, 1.0), 2)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {(r.l1, r.l2): r.cos for r in label_centroid_sim(df).collect()}
    assert out[(0, 1)] == -1.0
    assert out[(0, 2)] == 0.0
    assert out[(1, 2)] == 0.0
