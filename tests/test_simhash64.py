"""64-bit banded SimHash: recall guarantee + brute-force parity.

The banding theorem under test: with 4 bands of 16 bits, ANY pair at hamming
distance ≤ 3 shares at least one intact band, so the banded equi-join's
candidate set contains every such pair (perfect recall ≤ 3, by pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.corpus.dedup import simhash64_bands, simhash64_near_pairs


def _brute_pairs(bands_rows, max_hamming):
    sigs = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in bands_rows}
    ids = sorted(sigs)
    out = set()
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            h = sum(
                bin(a ^ b).count("1") for a, b in zip(sigs[d1], sigs[d2])
            )
            if h <= max_hamming:
                out.add((d1, d2, h))
    return out


def _corpus(spark, n_docs=120, tok_per_doc=60):
    """Deterministic docs + planted near-dups: copy of doc i with ONE token
    replaced (flips few signature bits in a majority-voted 64-bit simhash)."""
    import random

    rng = random.Random(5)
    vocab = [f"w{j}" for j in range(400)]
    rows = []
    for i in range(n_docs):
        toks = [rng.choice(vocab) for _ in range(tok_per_doc)]
        rows.append((i, " ".join(toks)))
        if i % 6 == 0:  # planted near-dup
            mut = list(toks)
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
            rows.append((i + 100000, " ".join(mut)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_recall_equals_bruteforce(spark):
    """Operator output == ALL pairs with hamming ≤ 3 (computed brute-force
    from the signatures): no candidate is missed, none is extra."""
    docs = _corpus(spark)
    bands_rows = simhash64_bands(docs).collect()
    want = _brute_pairs(bands_rows, max_hamming=3)
    got = {
        (r.d1, r.d2, r.hamming)
        for r in simhash64_near_pairs(docs, max_hamming=3).collect()
    }
    assert got == want
    assert len(want) > 0  # the planted near-dups actually land ≤ 3


def test_exact_copies_at_hamming_zero(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        "doc_id long, text string",
    )
    got = {(r.d1, r.d2): r.hamming
           for r in simhash64_near_pairs(docs).collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_signature_is_64_bit(spark):
    """Bands span genuinely distinct bit ranges: 4 bands × 16 bits each,
    values within [0, 65536)."""
    docs = _corpus(spark, n_docs=20)
    rows = simhash64_bands(docs).collect()
    for r in rows:
        for b in (r.b0, r.b1, r.b2, r.b3):
            assert 0 <= b < (1 << 16)
    # not all bands identical across docs (would indicate a broken hash)
    assert len({(r.b0, r.b1, r.b2, r.b3) for r in rows}) > 10


def test_oracle_parity_on_synthetic(spark, tmp_path):
    """DuckDB twin reproduces the Spark output bit-for-bit."""
    import duckdb

    from git_prov_spark.corpus.oracles import sql_simhash64_pairs

    docs = _corpus(spark, n_docs=60)
    d = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    want = {tuple(r) for r in con.execute(sql_simhash64_pairs()).fetchall()}
    got = {
        (r.d1, r.d2, r.hamming)
        for r in simhash64_near_pairs(spark.read.parquet(d)).collect()
    }
    assert got == want and len(got) > 0
