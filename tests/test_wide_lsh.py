"""Production-size LSH variants: recall on planted near-dups.

- MinHash wide (128 perms, 16x8 bands): planted high-Jaccard copies must be
  recalled; planted low-overlap pairs should mostly NOT become candidates
  (the S-curve crosses 0.5 near s ≈ 0.72).
- ANN multi-probe (16 planes, hamming-1 probes): planted near-identical
  vectors must surface as the top neighbor for most queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.corpus.dedup import lsh_candidate_pairs_wide
from git_prov_spark.corpus.similarity import topk_lsh_multiprobe


def test_minhash_wide_recall_on_planted_dupes(spark):
    import random

    rng = random.Random(21)
    vocab = [f"w{j}" for j in range(5000)]
    rows, planted = [], []
    for i in range(80):
        toks = [rng.choice(vocab) for _ in range(80)]
        rows.append((i, " ".join(toks)))
        if i % 4 == 0:  # near-dup: drop 2 of 80 tokens -> shingle sim ~0.88
            rows.append((i + 1000, " ".join(toks[2:])))
            planted.append((i, i + 1000))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.d1, r.d2) for r in lsh_candidate_pairs_wide(docs, n=4).collect()
    }
    recalled = sum(1 for p in planted if p in got)
    assert recalled / len(planted) >= 0.95, (recalled, len(planted))


def test_minhash_wide_rejects_low_similarity(spark):
    """Unrelated docs over a large vocab share no 4-gram shingles — zero
    candidates expected from banding (precision sanity, not a hard bound)."""
    import random

    rng = random.Random(22)
    vocab = [f"v{j}" for j in range(20000)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(60))) for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = lsh_candidate_pairs_wide(docs, n=4).count()
    assert got == 0


def test_multiprobe_finds_planted_neighbors(spark):
    """Queries 0..9 each get a planted near-identical corpus vector (tiny
    perturbation -> same or hamming-1 bucket with high probability)."""
    import random

    rng = random.Random(33)
    rows = []
    for i in range(400):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v))
        if i < 10:  # planted neighbor of query i
            rows.append((10000 + i, [x + rng.uniform(-0.01, 0.01) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in topk_lsh_multiprobe(emb, n_queries=10, k=5).collect()
    }
    hits = sum(1 for i in range(10) if got.get((i, 1)) == 10000 + i)
    assert hits >= 8, (hits, got)


def test_multiprobe_plan_is_bucket_equijoin(spark):
    """The scale invariant: candidates come from an equi-join on bucket —
    no cartesian/broadcast-nested-loop anywhere in the plan."""
    import random

    rng = random.Random(34)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = (
        topk_lsh_multiprobe(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_finds_planted_neighbors(spark):
    """IVF path: planted near-identical vectors share the query's cluster
    (tiny perturbation barely moves the argmax centroid) -> recalled."""
    import random

    rng = random.Random(44)
    rows = []
    for i in range(400):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v))
        if i < 10:
            rows.append((10000 + i, [x + rng.uniform(-0.005, 0.005) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from git_prov_spark.corpus.similarity import topk_ivf

    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in topk_ivf(emb, n_queries=10, k=5).collect()
    }
    hits = sum(1 for i in range(10) if got.get((i, 1)) == 10000 + i)
    assert hits >= 9, (hits, got)


def test_ivf_search_join_is_equi(spark):
    """The candidate search must be an equi-join on cluster; only the K-row
    centroid fan-out may be a nested-loop (it is declared in the audit)."""
    import random

    rng = random.Random(45)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from git_prov_spark.corpus.similarity import ivf_assign, topk_ivf

    plan = topk_ivf(emb)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # clusters are well-formed: every vector assigned exactly once
    assign = ivf_assign(emb)
    assert assign.count() == 100
    assert assign.select("vec_id").distinct().count() == 100
    assert assign.where(F.col("cluster").isNull()).count() == 0
