"""Cluster-balanced semantic subsampling (curate.cluster_balanced_sample,
the D4-style diversification step).

Pins the operator's contract:
* every corpus vector gets exactly one verdict row;
* each cluster keeps exactly min(per_cluster, |cluster|) members;
* the lottery is deterministic, growth-stable (adding vectors never flips
  an incumbent's fate within an uncapped cluster), and re-drawable under a
  fresh salt;
* with precomputed centroids the plan runs zero training jobs;
* crowded semantic regions downsample while singleton regions survive.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from git_prov_spark.corpus import curate, similarity


def _ring_vectors(n: int, dim: int = 8) -> list[list[float]]:
    out = []
    for i in range(n):
        a = 2.0 * math.pi * i / n
        v = [math.cos(a), math.sin(a)] + [0.0] * (dim - 2)
        out.append(v)
    return out


@pytest.fixture()
def crowded_df(spark):
    """4 well-separated directions; direction 0 is crowded (9 exact
    copies — identical vectors argmax to one centroid no matter how the
    quantizer trained), the rest are singletons."""
    dirs = _ring_vectors(4)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(dirs)]
    rows += [(100 + j, rows[0][1]) for j in range(9)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _centroids(df):
    return similarity.ivf_centroids(df, n_centroids=4)


def test_caps_crowded_cluster_keeps_singletons(crowded_df):
    cents, n = _centroids(crowded_df)
    out = curate.cluster_balanced_sample(
        crowded_df, per_cluster=3, centroids=cents, corpus_size=n
    ).collect()
    assert len(out) == 13  # one verdict row per vector
    kept_per = Counter(r.cluster for r in out if r.kept)
    size_per = Counter(r.cluster for r in out)
    for cl, size in size_per.items():
        assert kept_per[cl] == min(3, size), (cl, size)
    # the crowded direction really was capped, the singleton regions intact
    assert max(size_per.values()) == 10 and max(kept_per.values()) == 3
    assert min(size_per.values()) == 1 and kept_per.total() == 3 + 3


def test_deterministic_and_salt_redrawable(crowded_df):
    cents, n = _centroids(crowded_df)
    a = {(r.vec_id, r.kept) for r in curate.cluster_balanced_sample(
        crowded_df, per_cluster=3, centroids=cents, corpus_size=n).collect()}
    b = {(r.vec_id, r.kept) for r in curate.cluster_balanced_sample(
        crowded_df, per_cluster=3, centroids=cents, corpus_size=n).collect()}
    assert a == b  # bit-stable re-run
    c = {(r.vec_id, r.kept) for r in curate.cluster_balanced_sample(
        crowded_df, per_cluster=3, centroids=cents, corpus_size=n,
        salt="cbs-v2").collect()}
    assert {v for v, _ in c} == {v for v, _ in a}  # same corpus coverage
    assert c != a  # a fresh salt re-draws the lottery


def test_growth_stable_for_uncapped_clusters(spark):
    """A new vector in a DIFFERENT cluster never flips incumbents; in the
    same cluster an incumbent only ever flips kept→dropped (crowding), and
    only when the cap binds."""
    dirs = _ring_vectors(4)
    base = [(i, [float(x) for x in v]) for i, v in enumerate(dirs)]
    df1 = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    cents, _ = similarity.ivf_centroids(df1, n_centroids=4)
    v1 = {r.vec_id: r.kept for r in curate.cluster_balanced_sample(
        df1, per_cluster=2, centroids=cents, corpus_size=4).collect()}
    grown = base + [(50, base[1][1])]  # newcomer lands in vector 1's cluster
    df2 = spark.createDataFrame(grown, "vec_id long, embedding array<float>")
    v2 = {r.vec_id: r.kept for r in curate.cluster_balanced_sample(
        df2, per_cluster=2, centroids=cents, corpus_size=5).collect()}
    for vid, kept in v1.items():
        if vid != 1:  # other clusters untouched by the newcomer
            assert v2[vid] == kept, vid
    # vector 1's cluster has 2 members, cap 2: both kept
    assert v2[1] and v2[50]


def test_precomputed_centroids_run_zero_training_jobs(crowded_df, monkeypatch):
    cents, n = _centroids(crowded_df)
    monkeypatch.setattr(
        similarity, "ivf_centroids",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("trained!")),
    )
    monkeypatch.setattr(
        similarity, "load_or_train_centroids",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("trained!")),
    )
    out = curate.cluster_balanced_sample(
        crowded_df, per_cluster=3, centroids=cents, corpus_size=n).collect()
    assert len(out) == 13


def test_rejects_bad_args(crowded_df):
    cents, _ = _centroids(crowded_df)
    with pytest.raises(ValueError):
        curate.cluster_balanced_sample(crowded_df, per_cluster=-1,
                                       centroids=cents, corpus_size=13)
    with pytest.raises(ValueError):
        curate.cluster_balanced_sample(crowded_df, per_cluster=3,
                                       centroids=cents)  # no corpus_size
