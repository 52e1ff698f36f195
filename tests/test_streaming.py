"""Incremental/streaming KG construction == batch build_triples, exactly.

The gate for git_prov_spark.streaming: any commit-ordered split of the
snapshot table, folded batch-by-batch (or driven through a real
Structured-Streaming file source), must accumulate the SAME triple set the
one-shot batch pipeline produces — including removals whose evidence only
completes after the last file-bearing commit, and after a crash-retry of a
half-committed micro-batch."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from git_prov_spark.pipeline.build import build_triples
from git_prov_spark.pipeline.versions import ensure_commit_seq
from git_prov_spark.streaming import IncrementalKG, stream_build

TRIPLE_COLS = ["repo", "subj", "pred", "obj", "obj_type"]


def _tset(df):
    return {tuple(r) for r in df.select(*TRIPLE_COLS).collect()}


def _seq_chunks(files, commits, bounds):
    """Split snapshot rows into commit_seq ranges [lo, hi] per repo."""
    seq = ensure_commit_seq(commits).select("repo", "commit", "commit_seq")
    tagged = files.join(seq, ["repo", "commit"])
    return [
        tagged.where(F.col("commit_seq").between(lo, hi)).drop("commit_seq")
        for lo, hi in bounds
    ]


def test_incremental_matches_batch(spark, spark_tables, tmp_path):
    files, commits, contributors = spark_tables
    expected = _tset(build_triples(files, commits, contributors))

    ikg = IncrementalKG(spark, commits, contributors, str(tmp_path / "kg"))
    chunks = _seq_chunks(files, commits, [(0, 2), (3, 5), (6, 999)])
    for i, chunk in enumerate(chunks):
        ikg.process_batch(chunk, i)
    got = _tset(ikg.finalize())
    assert got == expected


def test_empty_middle_batch_is_noop(spark, spark_tables, tmp_path):
    files, commits, contributors = spark_tables
    expected = _tset(build_triples(files, commits, contributors))

    ikg = IncrementalKG(spark, commits, contributors, str(tmp_path / "kg"))
    chunks = _seq_chunks(files, commits, [(0, 3), (4, 999)])
    ikg.process_batch(chunks[0], 0)
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, content string"
    )
    ikg.process_batch(empty, 1)
    ikg.process_batch(chunks[1], 2)
    assert _tset(ikg.finalize()) == expected


def test_tail_removal_after_fileless_commit(spark, tmp_path):
    """A path removed before trailing commits that touch no files: the
    removal's evidence never streams, so only finalize's forced watermark
    can flush it. Batch parity must still hold."""
    commits = spark.createDataFrame(
        [
            ("r", "c0", [], "dev", "Dev", "d@x", "2024-01-01 00:00:00", "m0"),
            ("r", "c1", ["c0"], "dev", "Dev", "d@x", "2024-01-02 00:00:00", "m1"),
            ("r", "c2", ["c1"], "dev", "Dev", "d@x", "2024-01-03 00:00:00", "m2"),
        ],
        "repo string, commit string, parents array<string>, author_login string,"
        " author_name string, author_email string, authored_at string,"
        " message string",
    ).withColumn("authored_at", F.to_timestamp("authored_at"))
    contributors = spark.createDataFrame(
        [("r", "dev", "User", "Dev", "d@x", None)],
        "repo string, login string, type string, name string, email string,"
        " avatar_url string",
    )
    files = spark.createDataFrame(
        [
            ("r", "a.txt", "c0", "one\n"),
            ("r", "b.txt", "c0", "bee\n"),
            ("r", "a.txt", "c1", "one\ntwo\n"),
            # b.txt gone at c1 -> removed@c1; a.txt gone at c2 (file-less
            # commit) -> removed@c2, only derivable from the commits dim
        ],
        "repo string, path string, commit string, content string",
    )
    expected = _tset(build_triples(files, commits, contributors))
    assert any(p == "prov:wasInvalidatedBy" for _, _, p, _, _ in expected)

    ikg = IncrementalKG(spark, commits, contributors, str(tmp_path / "kg"))
    ikg.process_batch(files.where(F.col("commit") == "c0"), 0)
    ikg.process_batch(files.where(F.col("commit") == "c1"), 1)
    assert _tset(ikg.finalize()) == expected


def test_overlay_compaction_parity(spark, spark_tables, tmp_path):
    """compact_every=2 forces a FULL state version mid-run: the overlay
    chain restarts there and parity must still hold."""
    files, commits, contributors = spark_tables
    expected = _tset(build_triples(files, commits, contributors))
    out = str(tmp_path / "kg")

    ikg = IncrementalKG(spark, commits, contributors, out, compact_every=2)
    chunks = _seq_chunks(files, commits, [(0, 1), (2, 3), (4, 6), (7, 999)])
    for i, chunk in enumerate(chunks):
        ikg.process_batch(chunk, i)
    # at least one mid-run compaction happened (finalize adds another)
    assert ikg._last_full is not None and ikg._last_full < 4
    assert _tset(ikg.finalize()) == expected


def test_retry_of_uncommitted_batch(spark, spark_tables, tmp_path):
    """Crash between the triples write and the state commit: the state
    version has no _COMMITTED marker, a fresh builder resumes from the
    previous version, and replaying the batch id overwrites its own
    triples partition — no duplicates, batch parity holds."""
    files, commits, contributors = spark_tables
    expected = _tset(build_triples(files, commits, contributors))
    out = str(tmp_path / "kg")

    chunks = _seq_chunks(files, commits, [(0, 4), (5, 999)])
    ikg = IncrementalKG(spark, commits, contributors, out)
    ikg.process_batch(chunks[0], 0)
    ikg.process_batch(chunks[1], 1)
    # simulate the crash: state v1 exists but was never committed
    os.remove(os.path.join(out, "state", "v1", "_COMMITTED"))

    resumed = IncrementalKG(spark, commits, contributors, out)
    assert resumed._chain == [0]
    resumed.process_batch(chunks[1], 1)  # replay
    assert _tset(resumed.finalize()) == expected


def test_stream_build_file_source(spark, spark_tables, tmp_path):
    """End-to-end through a real Structured-Streaming file source:
    chronologically-stamped chunk files, maxFilesPerTrigger=1, availableNow
    drain, finalize — equals batch."""
    files, commits, contributors = spark_tables
    expected = _tset(build_triples(files, commits, contributors))

    src = tmp_path / "src"
    src.mkdir()
    chunks = _seq_chunks(files, commits, [(0, 3), (4, 6), (7, 999)])
    schema = None
    for i, chunk in enumerate(chunks):
        stage = str(tmp_path / f"stage{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            p for p in os.listdir(stage)
            if p.endswith(".parquet") and not p.startswith("_")
        )
        dst = src / f"chunk{i}.parquet"
        shutil.move(os.path.join(stage, part), dst)
        # the file source orders batches by modification time
        os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))
        schema = chunk.schema
    got = stream_build(
        spark,
        str(src),
        schema,
        commits,
        contributors,
        str(tmp_path / "kg"),
        str(tmp_path / "ckpt"),
    )
    assert _tset(got) == expected


def test_stream_curate_gates_across_batches(spark, tmp_path_factory):
    """Three chronological document chunks stream through the curator:
    batch 0 seeds the corpus; batch 1's resent/near docs are rejected
    against batch 0's state; batch 2 against both. Decisions must equal a
    hand-driven sequence of incremental_manifest calls."""
    from git_prov_spark.streaming import stream_curate

    base = tmp_path_factory.mktemp("stream_curate")
    src = base / "in"
    src.mkdir()

    A = ("the quick brown fox jumps over the lazy dog and then the fox "
         "runs to the hills where the water is cold and the sun is warm")
    B = ("a second english document where the cat and the dog walk to "
         "the house and then the bird sings in the tree by the river")
    chunks = [
        [(1, A), (2, "zzz qqq vvv kkk mmm nnn ppp rrr")],   # kept, lang
        [(10, A), (11, B)],                                  # exact_dup, kept
        [(20, A.rsplit(" ", 1)[0]), (21, B), (22, B + " x")],  # near, exact, near
    ]
    for i, rows in enumerate(chunks):
        stage = str(base / f"stage{i}")
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(p for p in os.listdir(stage)
                    if p.endswith(".parquet") and not p.startswith("_"))
        dst = src / f"chunk{i}.parquet"
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))

    manifest = stream_curate(
        spark, str(src), "doc_id long, text string",
        str(base / "out"), str(base / "ckpt"),
    )
    got = {r.doc_id: (r.reason, int(r.keep)) for r in manifest.collect()}
    assert got == {
        1: ("kept", 1),
        2: ("lang", 0),
        10: ("exact_dup", 0),   # A already in corpus state
        11: ("kept", 1),
        20: ("near_dup", 0),    # near copy of A from two batches back
        21: ("exact_dup", 0),   # B arrived in batch 1
        22: ("near_dup", 0),    # near copy of B
    }
    # the kept set's state is what accumulated: 2 docs -> 2 sha rows
    shas = spark.read.parquet(str(base / "out" / "shas"))
    assert shas.count() == 2


def test_stream_curator_replay_survives_partial_state_dir(spark, tmp_path):
    """A crash can leave a state dir with no committed parquet (only
    _temporary); the replay must read it as empty pre-batch state instead
    of failing schema inference forever."""
    from git_prov_spark.streaming import StreamingCurator

    out = tmp_path / "out"
    (out / "index" / "batch=0").mkdir(parents=True)  # exists, zero files
    cur = StreamingCurator(spark, str(out))
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    cur.process_batch(batch, 0)                      # replay of batch 0
    m = {r.doc_id: r.reason for r in cur.manifest().collect()}
    assert m == {1: "kept"}


def test_replay_of_committed_batch_is_noop(spark, spark_tables, tmp_path):
    """foreachBatch is at-least-once: replaying a batch whose state version
    IS committed must not refold it (the watermark would drop all its rows
    and overwrite the committed state with empty deltas)."""
    files, commits, contributors = spark_tables
    expected = _tset(build_triples(files, commits, contributors))
    out = str(tmp_path / "kg")

    chunks = _seq_chunks(files, commits, [(0, 4), (5, 999)])
    ikg = IncrementalKG(spark, commits, contributors, out)
    ikg.process_batch(chunks[0], 0)
    ikg.process_batch(chunks[1], 1)

    resumed = IncrementalKG(spark, commits, contributors, out)
    assert 1 in resumed._chain            # batch 1 committed
    resumed.process_batch(chunks[1], 1)   # checkpoint-replay after commit
    assert _tset(resumed.finalize()) == expected


def test_empty_first_batch(spark, spark_tables, tmp_path):
    """An all-empty FIRST micro-batch (no blobs yet on disk) must fold as a
    no-op instead of failing blob-store schema inference."""
    files, commits, contributors = spark_tables
    expected = _tset(build_triples(files, commits, contributors))

    ikg = IncrementalKG(spark, commits, contributors, str(tmp_path / "kg"))
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, content string"
    )
    ikg.process_batch(empty, 0)
    ikg.process_batch(files, 1)
    assert _tset(ikg.finalize()) == expected


def test_stream_hll_equals_batch_build(spark, tmp_path):
    from git_prov_spark.corpus.sketches import hll_registers
    from git_prov_spark.streaming import stream_hll

    src = tmp_path / "in"
    src.mkdir()
    full = spark.range(0, 3000, 3).selectExpr("id AS k")
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3000)]):
        batch = full.where((F.col("k") >= lo) & (F.col("k") < hi))
        stage = tmp_path / f"stage{i}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = next(p for p in stage.iterdir()
                    if p.name.endswith(".parquet")
                    and not p.name.startswith("_"))
        dst = src / f"c{i}.parquet"
        part.rename(dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    streamed = stream_hll(spark, str(src), "k long", "k",
                          str(tmp_path / "ckpt"))
    batch_regs = hll_registers(full, "k")
    assert (sorted(map(tuple, streamed.collect()))
            == sorted(map(tuple, batch_regs.collect())))


def test_stream_hll_empty_source(spark, tmp_path):
    from git_prov_spark.streaming import stream_hll

    src = tmp_path / "in"
    src.mkdir()
    spark.range(0).selectExpr("id AS k").coalesce(1).write.parquet(
        str(src / "empty"))
    # a source dir whose only file holds zero rows -> empty sketch frame
    out = stream_hll(spark, str(src / "empty"), "k long", "k",
                     str(tmp_path / "ckpt"))
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["bucket", "rho"]


def _write_event_chunks(spark, tmp_path, batches):
    src = tmp_path / "in"
    src.mkdir()
    for i, batch in enumerate(batches):
        stage = tmp_path / f"stage{i}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = next(p for p in stage.iterdir()
                    if p.name.endswith(".parquet")
                    and not p.name.startswith("_"))
        dst = src / f"c{i}.parquet"
        part.rename(dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    return str(src)


def test_stream_windowed_equals_batch_after_flush(spark, tmp_path):
    from datetime import datetime, timedelta

    from git_prov_spark.streaming import stream_windowed_counts

    t0 = datetime(2024, 1, 1)
    rows = [(t0 + timedelta(minutes=13 * i), f"t{i % 2}", i % 5, float(i))
            for i in range(40)]
    schema = "ts timestamp, event_type string, user_id long, value double"
    df = spark.createDataFrame(rows, schema)
    flush = spark.createDataFrame(
        [(t0 + timedelta(days=2), "flush", -1, 0.0)], schema)
    src = _write_event_chunks(
        spark, tmp_path,
        [df.where(F.col("value") < 20), df.where(F.col("value") >= 20),
         flush])
    out = stream_windowed_counts(
        spark, src, schema, str(tmp_path / "ckpt"), str(tmp_path / "out"))
    got = sorted(map(tuple, out.collect()))
    # independent expectation: group in python
    from collections import defaultdict
    import calendar
    acc = defaultdict(lambda: [0, 0.0])
    for ts, et, _, v in rows:
        ws = ts.replace(minute=0, second=0, microsecond=0)
        key = (calendar.timegm(ws.timetuple()), et)
        acc[key][0] += 1
        acc[key][1] = max(acc[key][1], v)
    want = sorted((k[0], k[1], c, m) for k, (c, m) in acc.items())
    assert got == want


def test_stream_windowed_unflushed_tail_stays_in_state(spark, tmp_path):
    from datetime import datetime, timedelta

    from git_prov_spark.streaming import stream_windowed_counts

    t0 = datetime(2024, 1, 1)
    schema = "ts timestamp, event_type string, user_id long, value double"
    df = spark.createDataFrame(
        [(t0, "a", 1, 1.0), (t0 + timedelta(minutes=5), "a", 2, 2.0)],
        schema)
    # NO flush sentinel: the single open window is inside the watermark
    # when the source drains -> append mode emits nothing (the documented
    # reason the flush pattern exists)
    src = _write_event_chunks(spark, tmp_path, [df])
    out = stream_windowed_counts(
        spark, src, schema, str(tmp_path / "ckpt"), str(tmp_path / "out"))
    assert out.collect() == []


class TestIncrementalEntailment:
    SCH_ROWS = [
        ("s", "ex:Draft", "rdfs:subClassOf", "ex:Document", "iri"),
        ("s", "ex:Document", "rdfs:subClassOf", "ex:Work", "iri"),
        ("s", "ex:authored", "rdfs:subPropertyOf", "ex:contributedTo", "iri"),
        ("s", "ex:authored", "rdfs:domain", "ex:Person", "iri"),
    ]
    T = ("repo string, subj string, pred string, obj string, "
         "obj_type string")

    def _batches(self, spark):
        b0 = spark.createDataFrame([
            ("g", "d1", "rdf:type", "ex:Draft", "iri"),
            ("g", "a1", "ex:authored", "d1", "iri"),
        ], self.T)
        b1 = spark.createDataFrame([
            ("g", "d2", "rdf:type", "ex:Draft", "iri"),
            ("g", "a2", "ex:authored", "d2", "iri"),
        ], self.T)
        return b0, b1

    def test_prefix_invariant_and_replay(self, spark, tmp_path):
        from git_prov_spark.inference import rdfs_closure
        from git_prov_spark.streaming import IncrementalEntailment

        sch = spark.createDataFrame(self.SCH_ROWS, self.T)
        b0, b1 = self._batches(spark)
        ent = IncrementalEntailment(spark, sch, str(tmp_path / "ent"))
        ent.process_batch(b0, 0)
        # prefix invariant after batch 0
        assert {tuple(r) for r in ent.store().collect()} \
            == {tuple(r) for r in rdfs_closure(b0, sch).collect()}
        ent.process_batch(b1, 1)
        full = rdfs_closure(b0.unionByName(b1), sch)
        assert {tuple(r) for r in ent.store().collect()} \
            == {tuple(r) for r in full.collect()}
        # at-least-once: replaying batch 1 must be a no-op
        ent.process_batch(b1, 1)
        assert {tuple(r) for r in ent.store().collect()} \
            == {tuple(r) for r in full.collect()}

    def test_real_stream_drive(self, spark, tmp_path):
        from git_prov_spark.inference import rdfs_closure
        from git_prov_spark.streaming import stream_entailed

        sch = spark.createDataFrame(self.SCH_ROWS, self.T)
        b0, b1 = self._batches(spark)
        src = str(tmp_path / "triples_in")
        # two chunk files -> two micro-batches under maxFilesPerTrigger=1
        b0.coalesce(1).write.mode("append").parquet(src)
        b1.coalesce(1).write.mode("append").parquet(src)
        got = stream_entailed(
            spark, src, sch, str(tmp_path / "ent2"),
            str(tmp_path / "ckpt"))
        full = rdfs_closure(b0.unionByName(b1), sch)
        assert {tuple(r) for r in got.collect()} \
            == {tuple(r) for r in full.collect()}
