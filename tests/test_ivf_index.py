"""IVF index amortization: train ONCE per corpus snapshot, persist, reuse.

The r3 verdict flagged `ann_topk_ivf` for retraining the quantizer inside
every query execution (count + stride-sample collect + Lloyd rounds per
call). These tests pin the fixed lifecycle:

* a second query against the same index runs NO training jobs at all
  (ivf_centroids is monkeypatched to raise — the cache hit must never
  reach it, so no count, no collect, no Lloyd);
* the persisted artifact survives a process "restart" (in-memory cache
  cleared) and yields bit-identical centroids to a fresh retrain on the
  same data — determinism is what makes serving a cached index safe;
* the fingerprint key changes when the corpus bytes change, so a stale
  index is never served.
"""

from __future__ import annotations

import json
import os

import pytest

from git_prov_spark.corpus import similarity

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture()
def emb_df(spark):
    if not os.path.exists(EMB):
        pytest.skip("driver testdata not present")
    return spark.read.parquet(EMB)


def test_second_query_runs_no_training_jobs(emb_df, tmp_path, monkeypatch):
    cache = str(tmp_path / "ivf")
    similarity._CENTROID_CACHE.clear()
    first = similarity.topk_ivf(emb_df, source_path=EMB, cache_dir=cache)
    rows1 = sorted(tuple(r) for r in first.collect())

    def boom(*a, **k):  # any training attempt on the warm path is a failure
        raise AssertionError("training ran on a warm index")

    monkeypatch.setattr(similarity, "ivf_centroids", boom)
    second = similarity.topk_ivf(emb_df, source_path=EMB, cache_dir=cache)
    rows2 = sorted(tuple(r) for r in second.collect())
    assert rows1 == rows2


def test_artifact_survives_restart_and_matches_retrain(emb_df, tmp_path,
                                                       monkeypatch):
    cache = str(tmp_path / "ivf")
    similarity._CENTROID_CACHE.clear()
    trained, n_trained = similarity.load_or_train_centroids(
        emb_df, source_path=EMB, cache_dir=cache)

    # simulate a new process: memory cache gone, artifact on disk remains
    similarity._CENTROID_CACHE.clear()
    monkeypatch.setattr(
        similarity, "ivf_centroids",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("retrained despite persisted artifact")))
    loaded, n_loaded = similarity.load_or_train_centroids(
        emb_df, source_path=EMB, cache_dir=cache)
    assert n_loaded == n_trained
    assert loaded == trained  # bit-exact: floats round-trip through JSON

    arts = os.listdir(cache)
    assert len(arts) == 1
    with open(os.path.join(cache, arts[0])) as fh:
        art = json.load(fh)
    assert art["corpus_n"] == n_trained
    assert art["centroids"] == trained


def test_warm_index_runs_no_assignment_jobs(emb_df, tmp_path, monkeypatch):
    """The index's other half (inverted lists): after the first query
    builds lists-{key}.parquet, a second query must launch neither
    training NOR the corpus-wide argmax-cosine assignment — it serves
    candidates straight from the artifact scan."""
    cache = str(tmp_path / "ivf")
    similarity._CENTROID_CACHE.clear()
    first = similarity.topk_ivf(emb_df, source_path=EMB, cache_dir=cache)
    rows1 = sorted(tuple(r) for r in first.collect())
    assert any(a.startswith("lists-") for a in os.listdir(cache))

    def boom(*a, **k):
        raise AssertionError("assignment/training ran on a warm index")

    monkeypatch.setattr(similarity, "ivf_centroids", boom)
    monkeypatch.setattr(similarity, "ivf_assign", boom)
    second = similarity.topk_ivf(emb_df, source_path=EMB, cache_dir=cache)
    rows2 = sorted(tuple(r) for r in second.collect())
    assert rows1 == rows2


def test_persisted_lists_match_inline_assignment(emb_df, tmp_path):
    """Serving from the artifact is result-identical to computing the
    capped assignment inline (the no-source_path plan)."""
    cache = str(tmp_path / "ivf")
    similarity._CENTROID_CACHE.clear()
    cents, n = similarity.load_or_train_centroids(
        emb_df, source_path=EMB, cache_dir=cache)
    warm = sorted(tuple(r) for r in similarity.topk_ivf(
        emb_df, source_path=EMB, cache_dir=cache).collect())
    inline = sorted(tuple(r) for r in similarity.topk_ivf(
        emb_df, centroids=cents, corpus_size=n).collect())
    assert warm == inline


def test_fingerprint_invalidates_on_data_change(tmp_path):
    a = tmp_path / "corpus.parquet"
    a.write_bytes(b"x" * 100)
    f1 = similarity.corpus_fingerprint(str(a))
    a.write_bytes(b"x" * 101)
    f2 = similarity.corpus_fingerprint(str(a))
    assert f1 != f2


def test_committed_artifacts_match_retrain(emb_df):
    """Guards the committed .artifacts/ivf files against staleness: the
    artifact the gate/bench will load must equal a from-scratch retrain on
    the current testdata."""
    cache = similarity.default_ivf_cache_dir()
    key = similarity.corpus_fingerprint(EMB)
    path = os.path.join(cache, f"centroids-{key}.json")
    if not os.path.exists(path):
        pytest.skip("no committed artifact for this testdata snapshot")
    with open(path) as fh:
        art = json.load(fh)
    fresh, n = similarity.ivf_centroids(emb_df)
    assert art["corpus_n"] == n
    assert art["centroids"] == fresh


def test_explicit_centroids_fork_the_assignment_key():
    """ADVICE r4: caller-supplied centroids next to source_path must never be
    served a cached assignment built from DIFFERENT (trained) centroids —
    the key folds in a digest of the explicit centroid values."""
    from git_prov_spark.corpus.similarity import _index_key

    import hashlib
    import json
    import os

    # _index_key fingerprints the path contents; use any real file
    path = os.path.abspath(__file__)
    base = _index_key(path, 4)
    c1 = [[1.0, 0.0], [0.0, 1.0]]
    c2 = [[1.0, 0.0], [0.5, 0.5]]
    k1 = _index_key(path, 4, c1)
    k2 = _index_key(path, 4, c2)
    assert base != k1 and k1 != k2
    assert k1 == _index_key(path, 4, [[1.0, 0.0], [0.0, 1.0]])  # value-keyed
    digest = hashlib.sha256(json.dumps(c1).encode()).hexdigest()[:12]
    assert k1.endswith("-c" + digest)


def test_knn_graph_consistent_with_topk_lsh(spark):
    """knn_graph restricted to the query prefix IS topk_lsh — same
    buckets, same scoring, same ranking; plus the degree bound holds."""
    from git_prov_spark.corpus.similarity import knn_graph, topk_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    g = knn_graph(emb, k=5)
    sub = {(r.src, r.dst, r.rank) for r in g.where("src < 10").collect()}
    ref = {(r.query_id, r.neighbor_id, r.rank)
           for r in topk_lsh(emb, n_queries=10, k=5).collect()}
    assert sub == ref
    from pyspark.sql import functions as F
    assert g.groupBy("src").count().agg(F.max("count")).first()[0] <= 5
