"""Keyed-state streaming dedup (streaming.stateful_dedup_transform).

The engine-managed state-store twin of the LSM-overlay curation classes:
per-sha GroupState via applyInPandasWithState. Pins:
* cross-batch detection — a doc re-sent in a later micro-batch is flagged
  against state written by an earlier one;
* within-batch detection with deterministic (ascending-id) ordering;
* canonical_id is the smallest id seen for the sha up to the row's batch;
* one verdict row per streamed document;
* checkpointed state survives a new query over an extended source (resume).
"""

from __future__ import annotations

import os
import shutil

import pytest

from git_prov_spark.streaming import stream_dedup

SCHEMA = "doc_id long, text string"


def _write_chunk(spark, tmp_path, src, i, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    stage = str(tmp_path / f"stage{i}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(p for p in os.listdir(stage)
                if p.endswith(".parquet") and not p.startswith("_"))
    dst = src / f"chunk{i}.parquet"
    shutil.move(os.path.join(stage, part), dst)
    os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))


def test_cross_and_within_batch_dedup(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # batch 0: ids 0-3; 0 and 3 share text (within-batch dup)
    _write_chunk(spark, tmp_path, src, 0, [
        (0, "alpha"), (1, "beta"), (2, "gamma"), (3, "alpha")])
    # batch 1: 10 re-sends batch-0 text (cross-batch dup), 11 is new,
    # 12 re-sends 11's text (within-batch), 13 re-sends "beta"
    _write_chunk(spark, tmp_path, src, 1, [
        (10, "gamma"), (11, "delta"), (12, "delta"), (13, "beta")])

    got = {r["doc_id"]: r for r in stream_dedup(
        spark, str(src), SCHEMA, str(tmp_path / "out"),
        str(tmp_path / "ckpt")).collect()}

    assert len(got) == 8  # one verdict per streamed doc
    assert not got[0]["is_dup"] and got[0]["canonical_id"] == 0
    assert not got[1]["is_dup"] and not got[2]["is_dup"]
    assert got[3]["is_dup"] and got[3]["canonical_id"] == 0
    assert got[10]["is_dup"] and got[10]["canonical_id"] == 2   # cross-batch
    assert not got[11]["is_dup"] and got[11]["canonical_id"] == 11
    assert got[12]["is_dup"] and got[12]["canonical_id"] == 11  # within-batch
    assert got[13]["is_dup"] and got[13]["canonical_id"] == 1   # cross-batch
    # sha parity: same text -> same sha; different -> different
    assert got[0]["content_sha"] == got[3]["content_sha"]
    assert got[0]["content_sha"] != got[1]["content_sha"]


def test_state_survives_restart(spark, tmp_path):
    """availableNow drains what exists; a second query over the SAME
    checkpoint after a new chunk lands must flag the new batch against
    state from the first run (engine-restored keyed state, not memory)."""
    src = tmp_path / "in"
    src.mkdir()
    _write_chunk(spark, tmp_path, src, 0, [(0, "alpha"), (1, "beta")])
    first = stream_dedup(spark, str(src), SCHEMA, str(tmp_path / "out"),
                         str(tmp_path / "ckpt")).collect()
    assert {r["doc_id"] for r in first} == {0, 1}

    _write_chunk(spark, tmp_path, src, 1, [(10, "alpha"), (11, "epsilon")])
    all_rows = {r["doc_id"]: r for r in stream_dedup(
        spark, str(src), SCHEMA, str(tmp_path / "out"),
        str(tmp_path / "ckpt")).collect()}
    # the restarted query appended only the NEW chunk's verdicts...
    assert set(all_rows) == {0, 1, 10, 11}
    # ...and 10 is a dup of state persisted by the FIRST query
    assert all_rows[10]["is_dup"] and all_rows[10]["canonical_id"] == 0
    assert not all_rows[11]["is_dup"]


def test_null_text_hashes_like_empty(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_chunk(spark, tmp_path, src, 0, [(0, None), (1, ""), (2, "x")])
    got = {r["doc_id"]: r for r in stream_dedup(
        spark, str(src), SCHEMA, str(tmp_path / "out"),
        str(tmp_path / "ckpt")).collect()}
    assert got[0]["content_sha"] == got[1]["content_sha"]
    assert not got[0]["is_dup"] and got[1]["is_dup"]
    assert got[1]["canonical_id"] == 0
