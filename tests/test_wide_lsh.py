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


def test_ivf_trained_quantizer_adapts_to_clusters(spark):
    """The trained quantizer must adapt to the data distribution: on 8
    well-separated gaussian blobs, Lloyd rounds should give every blob its
    own centroid region (near-balanced assignment), and no inverted list
    may exceed the declared cap — the hot-cluster guard that keeps the
    candidate join linear at scale."""
    import random

    from git_prov_spark.corpus.similarity import (
        choose_n_centroids,
        ivf_assign,
        ivf_centroids,
        ivf_list_cap,
        train_centroids,
    )

    rng = random.Random(46)
    centers = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(8)]
    rows = []
    for i in range(640):
        c = centers[i % 8]
        rows.append((i, [x + rng.gauss(0, 0.05) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, n = ivf_centroids(emb)
    assert n == 640 and len(cents) == choose_n_centroids(640)  # K ~ sqrt(N)
    sizes = [
        r["count"]
        for r in ivf_assign(emb, centroids=cents).groupBy("cluster").count().collect()
    ]
    cap = ivf_list_cap(n, len(cents))
    # 8 blobs, K=25 centroids: every occupied cluster is a sub-blob; the
    # biggest must stay far from degenerate (≤ one blob) and under the cap
    assert max(sizes) <= min(cap, 640 // 8), (max(sizes), cap)
    assert sum(sizes) == 640
    # determinism: retraining from the same sample is bit-identical
    sample = [r[1] for r in rows if r[0] % 1 == 0]
    assert train_centroids(sample, len(cents)) == train_centroids(
        sample, len(cents)
    )


def test_lsh_index_matches_equals_batch_pairs(spark, tmp_path):
    """The ingest gate through a persisted parquet index must surface
    exactly the collisions the one-shot pair join finds on the union —
    restricted to pairs touching a new doc, with new-new pairs reported
    in both directions."""
    from git_prov_spark.corpus import dedup

    rng = __import__("random").Random(7)
    words = [f"w{i}" for i in range(40)]
    base = [
        (i, " ".join(rng.choice(words) for _ in range(30))) for i in range(60)
    ]
    # batch: near-copies of every 3rd base doc (drop last token) + one
    # in-batch duplicate pair
    new = [
        (1000 + i, t.rsplit(" ", 1)[0]) for i, t in base if i % 3 == 0
    ]
    new += [(2000, new[0][1]), (2001, new[0][1])]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    batch = spark.createDataFrame(new, "doc_id long, text string")

    # persisted-index lifecycle: write, read back, probe, append
    ix = str(tmp_path / "lsh_index")
    dedup.lsh_bands(docs).write.parquet(ix)
    index = spark.read.parquet(ix)
    got = {
        (r.new_id, r.match_id, r.n_shared_bands)
        for r in dedup.lsh_index_matches(batch, index).collect()
    }

    union = docs.unionByName(batch)
    pairs = dedup.lsh_candidate_pairs(union).collect()
    new_ids = {d for d, _ in new}
    want = set()
    for r in pairs:
        if r.d1 in new_ids:
            want.add((r.d1, r.d2, r.n_shared_bands))
        if r.d2 in new_ids:
            want.add((r.d2, r.d1, r.n_shared_bands))
    assert got == want
    assert got  # the planted copies must actually collide

    # append keeps the index current: the batch's own bands land in it
    dedup.lsh_bands(batch).write.mode("append").parquet(ix)
    n_total = spark.read.parquet(ix).select("doc_id").distinct().count()
    assert n_total == 60 + len(new)
