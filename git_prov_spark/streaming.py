"""Incremental / Structured-Streaming KG construction (SURVEY §2.9 extension).

The reference is strictly batch (one repo per HTTP request,
ProvenanceService.java:116-189) — this module adds what a web-scale
deployment of the same semantics actually runs: file snapshots arriving in
commit order are folded into the triple store micro-batch by micro-batch,
so a 100 TB corpus is never rebuilt from scratch when new commits land.

Design — the fact stream is the snapshot table (the 100 TB part); commits
and contributors are dims (static here; dim-sized updates are a tiny batch
job):

  batch files ──slim──▶ union with SNAPSHOT STATE (last present row per
  (repo, path)) ──▶ the SAME window change-log as batch
  (`changelog.events_from_slim`), bounded by the per-repo processed
  WATERMARK so removal detection never looks past what has streamed ──▶
  keep only events newer than the watermark ──▶ version-chain fixup from
  EVENT STATE (last event per path) ──▶ the unchanged statement builders
  ──▶ append, partitioned by batch_id with dynamic partition overwrite
  (a retried micro-batch overwrites its own partition: exactly-once).

State is three slim parquet tables (snapshot rows, last-event rows, blob
store) + a per-repo watermark, all O(|paths| + |distinct blobs|) — orders
of magnitude below the snapshot stream. They are versioned per batch id
(state/v{batch}) so a replayed batch rewrites its own version instead of
corrupting the previous one. At production scale the same shape maps onto
Delta/Iceberg MERGE or `applyInPandasWithState`; plain parquet keeps this
container-runnable.

Ordering contract: micro-batches must respect commit_seq order per repo
(the file source delivers by modification time; arrange chunk files
chronologically). Rows at-or-below the repo's watermark are LATE and are
dropped before they can touch state — the stream never silently reorders
history.

Aggregate (dim-scoped) statements — agent attributes and
gitprov:contributions — are totals over all commits, not per-commit facts,
so they are emitted once by `finalize()` (which also forces the watermark
to the commits dim's max so tail removals after file-less commits flush).
After finalize, the accumulated store is triple-for-triple equal to
`build_triples` on the full input (tests/test_streaming.py asserts set
equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .pipeline.agents import contributions, resolve_authors
from .pipeline.changelog import (
    CHANGE_EVENT_COLS,
    blobs,
    events_from_slim,
    slim_files,
    with_commit_seq,
)
from .pipeline.diffstats import with_diff_stats
from .pipeline.statements import (
    activity_triples,
    agent_triples,
    association_triples,
    base_entity_triples,
    communication_triples,
    derivation_triples,
    enrich_with_ids,
    entity_triples,
    generation_triples,
    invalidation_triples,
    usage_triples,
)
from .pipeline.versions import ensure_commit_seq

SLIM_SCHEMA = (
    "repo string, path string, commit string, commit_seq int, content_sha string"
)
EVENT_STATE_SCHEMA = (
    "repo string, path string, last_event_commit string, last_event_seq int"
)
WATERMARK_SCHEMA = "repo string, max_seq int"
FINALIZE_BATCH_ID = 1_000_000_000  # far above any real micro-batch id
AGENTS_BATCH_ID = FINALIZE_BATCH_ID + 1


class IncrementalKG:
    """Fold file-snapshot micro-batches into a triples store.

    Drive it either directly (`process_batch` per chunk, then `finalize`)
    or through Structured Streaming (`stream_build` below wires it into
    `foreachBatch`)."""

    def __init__(
        self,
        spark: SparkSession,
        commits: DataFrame,
        contributors: DataFrame,
        out_dir: str,
        compact_every: int = 8,
    ):
        self.spark = spark
        # the fold references the commits dim ~6 times per batch and the
        # contributors dim in every agent join: materialize both ONCE —
        # callers often hand in lazy derived plans (joins, unions, minted
        # commit_seq windows) whose recomputation per consumer would
        # multiply every micro-batch's cost. Dims are bounded by repo
        # count × history, not by the snapshot stream.
        self.commits = ensure_commit_seq(commits).localCheckpoint(eager=True)
        self.contributors = contributors.localCheckpoint(eager=True)
        self.out = out_dir.rstrip("/")
        self.compact_every = compact_every
        self._chain, self._last_full = self._scan_versions()

    # -- state plumbing: LSM-style overlay versions -------------------------
    #
    # A batch that touches 1/1000th of the repos must not rewrite state for
    # the other 999/1000ths. Each committed version is either a DELTA
    # (only rows changed by that batch) or a FULL snapshot (marked _FULL,
    # written every `compact_every` batches and by finalize). Readers stack
    # the committed chain from the last FULL version and take the
    # highest-version row per key — so per-batch write cost is O(|delta|)
    # and read amplification is bounded by the compaction interval. This is
    # the same contract Delta/Iceberg MERGE gives; plain parquet + marker
    # files keep it container-runnable and crash-atomic (an uncommitted
    # version is invisible, and the source replays its batch).

    def _state_dir(self, version: int) -> str:
        return f"{self.out}/state/v{version}"

    def _fs(self):
        sc = self.spark.sparkContext
        hadoop = sc._jvm.org.apache.hadoop  # noqa: SLF001 — FS listing
        path = hadoop.fs.Path(f"{self.out}/state")
        return hadoop, path.getFileSystem(sc._jsc.hadoopConfiguration())

    def _scan_versions(self) -> tuple[list[int], int | None]:
        """Committed version ids ascending + the latest FULL one. A crash
        between the state writes leaves no _COMMITTED marker, so restart
        sees only complete versions and the source replays the batch."""
        hadoop, fs = self._fs()
        path = hadoop.fs.Path(f"{self.out}/state")
        if not fs.exists(path):
            return [], None
        chain, full = [], None
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            base = st.getPath().toString()
            if not name.startswith("v"):
                continue
            if not fs.exists(hadoop.fs.Path(f"{base}/_COMMITTED")):
                continue
            v = int(name[1:])
            chain.append(v)
            if fs.exists(hadoop.fs.Path(f"{base}/_FULL")):
                full = v if full is None else max(full, v)
        return sorted(chain), full

    def _mark_committed(self, version: int, full: bool) -> None:
        hadoop, fs = self._fs()
        full_marker = hadoop.fs.Path(f"{self._state_dir(version)}/_FULL")
        if full:
            fs.create(full_marker, True).close()
        elif fs.exists(full_marker):
            # an aborted compacting attempt of this batch left a stale
            # _FULL — this replay wrote deltas, so the marker must go
            fs.delete(full_marker, False)
        fs.create(
            hadoop.fs.Path(f"{self._state_dir(version)}/_COMMITTED"), True
        ).close()

    def _read_chain(self) -> list[int]:
        if self._last_full is None:
            return self._chain
        return [v for v in self._chain if v >= self._last_full]

    def _read_overlayed(
        self,
        name: str,
        schema: str,
        keys: list[str],
        scope: DataFrame | None = None,
        anti: bool = False,
    ) -> DataFrame:
        """Stacked view of an overlay table: newest committed version wins
        per key. `scope` (a repo list) filters BEFORE the dedup window, so
        a delta-sized batch only shuffles delta-sized state."""
        chain = self._read_chain()
        if not chain:
            return self.spark.createDataFrame([], schema)
        parts = [
            self.spark.read.schema(schema)
            .parquet(f"{self._state_dir(v)}/{name}")
            .withColumn("_v", F.lit(v))
            for v in chain
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if scope is not None:
            df = df.join(scope, "repo", "left_anti" if anti else "left_semi")
        w = Window.partitionBy(*keys).orderBy(F.desc("_v"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_v")
        )

    def _read_union(self, name: str, schema: str) -> DataFrame:
        """Plain union of the committed chain — for append-only tables
        whose per-version rows are disjoint (the blob-sha index)."""
        chain = self._read_chain()
        if not chain:
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).parquet(
            f"{self._state_dir(chain[0])}/{name}"
        )
        for v in chain[1:]:
            df = df.unionByName(
                self.spark.read.schema(schema).parquet(
                    f"{self._state_dir(v)}/{name}"
                )
            )
        return df

    def _read_latest(self, name: str, schema: str) -> DataFrame:
        """Latest committed copy of a small full-rewrite table (watermark)."""
        if not self._chain:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(
            f"{self._state_dir(self._chain[-1])}/{name}"
        )

    def _write_state(self, version: int, name: str, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(f"{self._state_dir(version)}/{name}")

    # -- the fold ----------------------------------------------------------

    def process_batch(
        self,
        batch_files: DataFrame,
        batch_id: int,
        force_watermark: DataFrame | None = None,
    ) -> None:
        """Fold one micro-batch of snapshot rows (repo, path, commit,
        content, ...) into state + the triple store.

        `force_watermark` (repo, max_seq) advances the watermark past the
        batch's own rows — finalize uses it with the commits dim's max so
        trailing removals (a path absent from the last, possibly file-less,
        commits) are emitted."""
        if batch_id in self._chain:
            # foreachBatch is at-least-once: a crash AFTER this batch's
            # state commit but BEFORE the streaming checkpoint advances
            # replays a batch that is already folded (state vN committed,
            # triples partition written). Refolding would find all its rows
            # at-or-below the watermark and overwrite the committed state
            # version with EMPTY deltas — so a committed batch is a no-op.
            # (An UNCOMMITTED version is invisible to _scan_versions and
            # replays normally — tests cover both.)
            return
        commits = self.commits
        wm = self._read_latest("watermark", WATERMARK_SCHEMA)
        prev = wm.select("repo", F.col("max_seq").alias("prev_max"))

        slim_b = with_commit_seq(slim_files(batch_files), commits)
        # late-data guard: a row at-or-below the repo watermark would
        # corrupt the snapshot state's lag column — drop before state union
        slim_b = slim_b.join(prev, "repo", "left").where(
            F.col("prev_max").isNull() | (F.col("commit_seq") > F.col("prev_max"))
        ).drop("prev_max")

        batch_max = slim_b.groupBy("repo").agg(F.max("commit_seq").alias("max_seq"))
        if force_watermark is not None:
            batch_max = batch_max.unionByName(force_watermark)
        # referenced by the change-log bound, the dim slice, and the state
        # write — checkpoint once (per-repo rows: tiny at any scale)
        new_wm = (
            wm.unionByName(batch_max)
            .groupBy("repo")
            .agg(F.max("max_seq").alias("max_seq"))
            .localCheckpoint(eager=True)
        )

        # the fold must scale with the DELTA, not the corpus: only repos
        # present in this batch (or swept by a forced watermark) can emit
        # events, so state of untouched repos is neither read into the
        # window nor rewritten
        touched_repos = batch_max.select("repo").distinct()
        compacting = len(self._read_chain()) + 1 > self.compact_every or (
            force_watermark is not None
        )
        active_state = self._read_overlayed(
            "snapshots", SLIM_SCHEMA, ["repo", "path"], scope=touched_repos
        )
        ev_active = self._read_overlayed(
            "events", EVENT_STATE_SCHEMA, ["repo", "path"], scope=touched_repos
        )

        # same change-log window as batch, over active state + new rows,
        # removal detection bounded by the processed watermark (not the
        # full dim)
        union_slim = active_state.unionByName(slim_b.select(*active_state.columns))
        evts = events_from_slim(
            union_slim, commits, max_seq=new_wm
        ).join(prev, "repo", "left").where(
            F.col("prev_max").isNull() | (F.col("commit_seq") > F.col("prev_max"))
        ).drop("prev_max")

        # version-chain fixup: within-batch lag, stitched to the event state
        w = Window.partitionBy("repo", "path").orderBy("commit_seq")
        chained = evts.select(
            *CHANGE_EVENT_COLS,
            F.lag("commit").over(w).alias("_batch_parent"),
            (F.row_number().over(w) == 1).alias("_first_in_batch"),
        ).join(ev_active, ["repo", "path"], "left")
        events = chained.select(
            *CHANGE_EVENT_COLS,
            F.coalesce("_batch_parent", "last_event_commit").alias("parent_commit"),
            (
                F.col("_first_in_batch") & F.col("last_event_commit").isNull()
            ).alias("is_first_version"),
        ).localCheckpoint(eager=True)  # read twice (triples + state update)

        # blob store: append only unseen shas, partitioned by batch for
        # retry idempotency
        blob_dir = f"{self.out}/blobs"
        have = self._read_union("blob_shas", "content_sha string")
        new_blobs = (
            blobs(batch_files)
            .join(have, "content_sha", "left_anti")
            .withColumn("batch_id", F.lit(batch_id))
        )
        (
            new_blobs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(blob_dir)
        )
        from pyspark.errors import AnalysisException

        try:
            blob_store = self.spark.read.parquet(blob_dir)
        except AnalysisException:
            # an all-empty first batch writes no partition files: the dir
            # holds only _SUCCESS and schema inference fails — empty store
            blob_store = self.spark.createDataFrame(
                [], "content_sha string, content string, batch_id long"
            )
        all_blobs = blob_store.drop("batch_id")
        # read the just-written partition back for the sha index instead of
        # recomputing the blob dedup shuffle over the fat content column
        written_shas = blob_store.where(
            F.col("batch_id") == batch_id
        ).select("content_sha")

        # commit-scoped dims for this batch's seq range
        new_commits = (
            commits.join(prev, "repo", "left")
            .join(new_wm, "repo")
            .where(
                (F.col("prev_max").isNull() | (F.col("commit_seq") > F.col("prev_max")))
                & (F.col("commit_seq") <= F.col("max_seq"))
            )
            .drop("prev_max", "max_seq")
            # three statement builders + resolve_authors re-read this
            # batch-scoped dim slice; materialize it once (|batch| commits)
            .localCheckpoint(eager=True)
        )

        triples = self._batch_triples(events, new_commits, all_blobs)
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{self.out}/triples")
        )

        # state update. Delta version: only rows this batch changed — the
        # last snapshot per path among the BATCH rows (they all outrank
        # state by the watermark guard), the last event per path among this
        # batch's events, and the newly written shas. Compacting version:
        # the fully merged tables (delta-changed rows + passive
        # pass-through), marked _FULL so readers restart the chain here.
        ev_cols = events.select(
            "repo", "path",
            F.col("commit").alias("last_event_commit"),
            F.col("commit_seq").alias("last_event_seq"),
        )
        last = Window.partitionBy("repo", "path").orderBy(F.desc("commit_seq"))
        last_ev = Window.partitionBy("repo", "path").orderBy(
            F.desc("last_event_seq")
        )
        if compacting:
            snap_out = (
                union_slim.withColumn("_rn", F.row_number().over(last))
                .where(F.col("_rn") == 1)
                .drop("_rn")
                .unionByName(
                    self._read_overlayed(
                        "snapshots", SLIM_SCHEMA, ["repo", "path"],
                        scope=touched_repos, anti=True,
                    )
                )
            )
            ev_out = (
                ev_active.unionByName(ev_cols)
                .withColumn("_rn", F.row_number().over(last_ev))
                .where(F.col("_rn") == 1)
                .drop("_rn")
                .unionByName(
                    self._read_overlayed(
                        "events", EVENT_STATE_SCHEMA, ["repo", "path"],
                        scope=touched_repos, anti=True,
                    )
                )
            )
            # disjoint by construction (written_shas was anti-joined
            # against `have`) — no dedup shuffle needed
            shas_out = have.unionByName(written_shas)
        else:
            snap_out = (
                slim_b.select("repo", "path", "commit", "commit_seq", "content_sha")
                .withColumn("_rn", F.row_number().over(last))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            ev_out = (
                ev_cols.withColumn("_rn", F.row_number().over(last_ev))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            shas_out = written_shas
        self._write_state(batch_id, "snapshots", snap_out)
        self._write_state(batch_id, "events", ev_out)
        self._write_state(batch_id, "watermark", new_wm)
        self._write_state(batch_id, "blob_shas", shas_out)
        self._mark_committed(batch_id, full=compacting)
        self._chain = sorted(set(self._chain) | {batch_id})
        if compacting:
            self._last_full = batch_id

    def _batch_triples(
        self, events: DataFrame, new_commits: DataFrame, all_blobs: DataFrame
    ) -> DataFrame:
        """The per-commit-range slice of build_triples' union (everything
        except the dim-aggregate agent statements, which finalize emits)."""
        events = enrich_with_ids(events)
        events_ts = events.join(
            self.commits.select("repo", "commit", "authored_at"), ["repo", "commit"]
        )
        modified = events_ts.where(F.col("status") == "modified")
        # line-explode only the blobs this batch's modified pairs reference —
        # without the semi-join every fold pays O(|all blobs| x lines). (The
        # store scan itself is still unpruned; a bucketed-by-sha blob table
        # is the production answer for skipping the I/O too.)
        needed_shas = (
            modified.select(F.col("content_sha").alias("sha"))
            .unionByName(modified.select(F.col("prev_content_sha").alias("sha")))
            .distinct()
            .withColumnRenamed("sha", "content_sha")
        )
        blobs_needed = all_blobs.join(needed_shas, "content_sha", "left_semi")
        modified_stats = with_diff_stats(modified, blobs_needed)
        resolved = resolve_authors(new_commits, self.contributors)
        parts = [
            activity_triples(new_commits),
            association_triples(resolved),
            communication_triples(new_commits),
            entity_triples(events),
            base_entity_triples(events),
            generation_triples(events_ts),
            invalidation_triples(events_ts),
            usage_triples(events_ts),
            derivation_triples(modified_stats),
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def finalize(self) -> DataFrame:
        """Flush tail removals (watermark → commits max) and emit the
        dim-aggregate agent/contribution statements; return the full
        accumulated triples DataFrame."""
        global_max = self.commits.groupBy("repo").agg(
            F.max("commit_seq").alias("max_seq")
        )
        empty_files = self.spark.createDataFrame(
            [], "repo string, path string, commit string, content string"
        )
        self.process_batch(
            empty_files, FINALIZE_BATCH_ID, force_watermark=global_max
        )
        resolved = resolve_authors(self.commits, self.contributors)
        agent_part = agent_triples(contributions(resolved, self.contributors))
        (
            agent_part.withColumn("batch_id", F.lit(AGENTS_BATCH_ID))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{self.out}/triples")
        )
        return self.triples()

    def triples(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.out}/triples").drop("batch_id")


def stream_build(
    spark: SparkSession,
    files_dir: str,
    files_schema: str,
    commits: DataFrame,
    contributors: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Structured-Streaming driver: file-source → foreachBatch(IncrementalKG)
    → availableNow drain → finalize. Returns the accumulated triples.

    The file source delivers chunks oldest-modification-time-first;
    `max_files_per_trigger=1` makes each chunk file one micro-batch, which
    is how the ordering contract (commit_seq ascending per repo across
    batches) is satisfied for chronologically written chunks."""
    ikg = IncrementalKG(spark, commits, contributors, out_dir)
    stream = (
        spark.readStream.schema(files_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(files_dir)
    )
    query = (
        stream.writeStream.foreachBatch(
            lambda df, bid: ikg.process_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return ikg.finalize()


# ---------------------------------------------------------------------------
# Streaming corpus curation (the curation twin of IncrementalKG)
# ---------------------------------------------------------------------------

class StreamingCurator:
    """foreachBatch sink for document streams: gate each micro-batch with
    `corpus.curate.incremental_manifest` against the ACCUMULATED corpus
    state, then fold only the kept docs' state forward.

    State layout under `out_dir` (all plain parquet, one dir per batch):

        manifest/batch=N/   that batch's (doc_id, reason, keep) decisions
        index/batch=N/      lsh_bands rows of the batch's KEPT docs
        shas/batch=N/       content shas of the batch's KEPT docs

    Exactly-once: each write overwrites its own `batch=N` path, and state
    reads filter `batch < current`, so a replayed micro-batch probes
    exactly the pre-batch state and rewrites its own outputs. Per-batch
    cost is |batch| hashing + an equi-join probe into the accumulated
    index — the corpus is never re-hashed (same |delta| contract as
    IncrementalKG). Production mapping: Delta/Iceberg MERGE on the three
    state tables.
    """

    _INDEX_SCHEMA = "doc_id long, band int, sig string"
    _SHA_SCHEMA = "content_sha string"
    _MANIFEST_SCHEMA = "doc_id long, reason string, keep long"

    def __init__(self, spark: SparkSession, out_dir: str, n: int = 4,
                 min_tokens: int = 5, max_punct_pct: int = 20):
        self.spark = spark
        self.out_dir = out_dir
        self.n = n
        self.min_tokens = min_tokens
        self.max_punct_pct = max_punct_pct

    def _read_state(self, name: str, schema: str, before_batch: int) -> DataFrame:
        import os

        from pyspark.errors import AnalysisException

        path = os.path.join(self.out_dir, name)
        sc = self.spark.sparkContext
        hadoop = sc._jvm.org.apache.hadoop  # noqa: SLF001 — existence probe
        hpath = hadoop.fs.Path(path)
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
        if not fs.exists(hpath):   # first batch: no state yet
            return self.spark.createDataFrame([], schema)
        try:
            df = self.spark.read.parquet(path)
        except AnalysisException:
            # the dir exists but holds no committed files: a crash landed
            # between this batch's state writes (e.g. only _temporary from
            # the aborted attempt). The replay must see the pre-batch state
            # — which is empty, or it would have parsed.
            return self.spark.createDataFrame([], schema)
        return df.where(F.col("batch") < before_batch).drop("batch")

    def _write_state(self, name: str, batch_id: int, df: DataFrame) -> None:
        import os

        df.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, name, f"batch={batch_id}")
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        from .corpus.curate import incremental_manifest
        from .corpus.dedup import lsh_bands

        docs = docs.select("doc_id", "text").persist()
        try:
            index = self._read_state("index", self._INDEX_SCHEMA, batch_id)
            known = self._read_state("shas", self._SHA_SCHEMA, batch_id)
            manifest = incremental_manifest(
                docs, index, known, min_tokens=self.min_tokens,
                max_punct_pct=self.max_punct_pct, n=self.n,
            ).persist()
            self._write_state("manifest", batch_id, manifest)
            kept = docs.join(
                manifest.where(F.col("keep") == 1).select("doc_id"), "doc_id"
            ).persist()
            self._write_state("index", batch_id, lsh_bands(kept, n=self.n))
            self._write_state(
                "shas", batch_id,
                kept.select(F.sha2(F.col("text"), 256).alias("content_sha")),
            )
            kept.unpersist()
            manifest.unpersist()
        finally:
            docs.unpersist()

    def manifest(self) -> DataFrame:
        """All decisions so far, with the batch id that made each."""
        import os

        return self.spark.read.parquet(os.path.join(self.out_dir, "manifest"))


def stream_curate(
    spark: SparkSession,
    docs_dir: str,
    docs_schema: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    n: int = 4,
) -> DataFrame:
    """Structured-Streaming driver: document file-source →
    foreachBatch(StreamingCurator) → availableNow drain. Returns the
    accumulated manifest (doc_id, reason, keep, batch)."""
    cur = StreamingCurator(spark, out_dir, n=n)
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    query = (
        stream.writeStream.foreachBatch(
            lambda df, bid: cur.process_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return cur.manifest()


# ---------------------------------------------------------------------------
# Keyed-state streaming dedup (applyInPandasWithState)
#
# The LSM-overlay classes above carry their state in versioned parquet
# because foreachBatch needs replay-safe external state. This operator is
# the OTHER production shape the module doc promises: state held by the
# engine's keyed state store (HDFS-backed here; RocksDB provider on a real
# cluster), one state row per distinct content hash, checkpointed and
# restored by Structured Streaming itself.


def stateful_dedup_transform(docs, id_col: str = "doc_id",
                             text_col: str = "text"):
    """Cross-micro-batch streaming exact dedup: every arriving document is
    flagged against ALL content ever streamed, not just its own batch.

    groupBy(content sha) → applyInPandasWithState with per-key state
    (n_seen, first_id). Rows inside a batch are processed in ascending id
    order, so the operator is deterministic for a fixed batch sequence:
    `is_dup` is true iff the same sha was seen in an earlier batch or at a
    smaller id in this one; `canonical_id` is the smallest id seen for the
    sha up to and including the row's batch.

    Scale story: state is O(distinct shas) — one (long, long) per unique
    document — partitioned by the shuffle on sha like any streaming agg;
    the text column itself never enters state. Arrow-batched pandas on
    both sides of the state boundary, no per-row python.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    import pandas as pd

    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("content_sha"),
    )

    def flag(key, pdfs, state):
        n_seen, first_id = state.get if state.exists else (0, None)
        ids = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()
        out_dup, out_canon = [], []
        for i in ids:
            if first_id is None or i < first_id:
                first_id = i
            out_dup.append(n_seen > 0)
            out_canon.append(first_id)
            n_seen += 1
        state.update((n_seen, first_id))
        yield pd.DataFrame({
            "doc_id": ids,
            "content_sha": [key[0]] * len(ids),
            "is_dup": out_dup,
            "canonical_id": out_canon,
        })

    return hashed.groupBy("content_sha").applyInPandasWithState(
        flag,
        outputStructType="doc_id long, content_sha string, "
                         "is_dup boolean, canonical_id long",
        stateStructType="n_seen long, first_id long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(
    spark: SparkSession,
    docs_dir: str,
    docs_schema: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Structured-Streaming driver: document file-source →
    stateful_dedup_transform → availableNow drain into a parquet sink
    (a file sink, unlike the memory sink, recovers from the checkpoint —
    so a later run over the same checkpoint resumes the keyed state and
    appends only the new batches' verdicts). Returns the accumulated
    verdicts (doc_id, content_sha, is_dup, canonical_id), one row per
    streamed document."""
    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    query = (
        stateful_dedup_transform(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # explicit schema: a drained stream that wrote zero rows leaves the sink
    # dir without data files (or not created at all when zero batches fire),
    # and schema inference would fail instead of returning the (fixed) empty
    # verdict frame
    import os

    out_schema = ("doc_id long, content_sha string, is_dup boolean, "
                  "canonical_id long")
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], out_schema)
    return spark.read.schema(out_schema).parquet(out_dir)


def stream_hll(
    spark: SparkSession,
    src_dir: str,
    src_schema: str,
    col: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming sketch maintenance: fold each micro-batch's HyperLogLog
    register table into a running sketch via the merge law (bucket-wise
    max — sketches.merge_registers), and return the final registers.

    The law makes the streamed result EQUAL to the batch build over all
    data regardless of how rows split across triggers — which is exactly
    what lets a 100 TB ingest keep a live distinct-count dashboard
    without rescans: per-batch registers are ≤2^p narrow rows, the fold
    is sketch-sized, and raw data is touched once.

    foreachBatch holds the running sketch as a ≤2^p-entry dict on the
    driver — deliberately driver-sided: the accumulator is SKETCH-sized
    (256 (int,int) pairs at p=8), not data-sized; each batch's register
    build is the distributed one-pass hash-aggregate."""
    from .corpus.sketches import hll_registers

    running: dict[int, int] = {}

    def fold(batch_df, batch_id):
        for r in hll_registers(batch_df, col).collect():
            if r.rho > running.get(r.bucket, 0):
                running[r.bucket] = r.rho

    query = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if not running:
        return spark.createDataFrame([], "bucket int, rho int")
    return spark.createDataFrame(
        sorted(running.items()), "bucket int, rho int")


def stream_windowed_counts(
    spark: SparkSession,
    src_dir: str,
    src_schema: str,
    checkpoint_dir: str,
    out_dir: str,
    width_min: int = 60,
    watermark_min: int = 10,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Watermarked streaming tumbling-window aggregation — the streaming
    twin of timeseries.windowed_counts (same F.window construct, same
    order-independent aggregates), in APPEND mode: a window row is
    emitted exactly once, when the watermark (max event time seen minus
    ``watermark_min``) passes its end — the late-data contract a real
    event pipeline runs with.

    Append-mode subtlety the gate exercises: windows still within the
    watermark when the source drains NEVER emit — they wait in state for
    data that will not come. The caller therefore appends a FLUSH
    sentinel event later than every real window's end + watermark (the
    standard end-of-stream flush pattern); the sentinel's own window is
    the one left behind, so the emitted set is exactly the batch twin's
    result over the real events.

    State is O(open windows × keys) — bounded by the watermark horizon,
    never by history; the shuffle is the same (window, key) hash
    partitioning as the batch plan. The batch twin's n_users column is
    absent here: Structured Streaming rejects DISTINCT aggregates
    (count_distinct) in a streaming query — the streaming spelling of a
    windowed distinct count is a per-(window,user) pre-dedup or an HLL
    register fold (stream_hll), both already shipped."""
    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
        .select(F.col("ts").cast("timestamp").alias("ts"),
                "event_type", "user_id", "value")
    )
    agg = (
        stream.withWatermark("ts", f"{watermark_min} minutes")
        .groupBy(F.window("ts", f"{width_min} minutes").alias("win"),
                 "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("win.start").cast("long").alias("window_start_epoch"),
            "event_type", "n_events", "max_value",
        )
    )
    query = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    out_schema = ("window_start_epoch long, event_type string, "
                  "n_events long, max_value double")
    import os

    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], out_schema)
    return spark.read.schema(out_schema).parquet(out_dir)


# ---------------------------------------------------------------------------
# Streaming RDFS entailment maintenance (the reasoner twin of IncrementalKG)
# ---------------------------------------------------------------------------

class IncrementalEntailment:
    """foreachBatch sink maintaining the MATERIALIZED RDFS closure of an
    arriving triple stream: batch 0 closes in full, every later batch
    runs the linear-in-Δ delta closure (inference.rdfs_closure_delta)
    against the accumulated store and appends ONLY the new entailments.
    Invariant (the gated property): after any prefix of batches the
    accumulated store equals `rdfs_closure(all triples so far, schema)`
    — incremental == one-shot, at O(|batch|) per batch instead of
    O(|store|).

    State layout: `out_dir/b<batch_id>/` holds the batch's NEW rows
    (first batch: the full closure). A replayed batch (foreachBatch is
    at-least-once) recomputes against the accumulated store EXCLUDING
    its own directory and overwrites it — idempotent, same contract as
    IncrementalKG's per-batch exactly-once partitions.

    The schema (ontology) is driver-held and broadcast into every rule
    join; at 100 TB the per-batch cost is the batch's own closure plus
    one anti-join against the store's identity layout."""

    def __init__(self, spark: SparkSession, schema_triples: DataFrame,
                 out_dir: str):
        import os

        self.spark = spark
        self.schema = schema_triples
        self.out = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def _batch_dirs(self, exclude: int | None = None) -> list[str]:
        import os

        return sorted(
            os.path.join(self.out, d) for d in os.listdir(self.out)
            if d.startswith("b") and d[1:].isdigit()
            and (exclude is None or int(d[1:]) != exclude)
        )

    def store(self, exclude: int | None = None) -> DataFrame:
        dirs = self._batch_dirs(exclude)
        if not dirs:
            return self.spark.createDataFrame(
                [], "repo string, subj string, pred string, obj string, "
                    "obj_type string")
        return self.spark.read.parquet(*dirs)

    def process_batch(self, delta: DataFrame, batch_id: int) -> None:
        import os

        from .inference import rdfs_closure, rdfs_closure_delta

        base = self.store(exclude=int(batch_id))
        if not self._batch_dirs(exclude=int(batch_id)):
            new = rdfs_closure(delta, self.schema)
        else:
            new = rdfs_closure_delta(base, delta, self.schema)
        new.write.mode("overwrite").parquet(
            os.path.join(self.out, f"b{int(batch_id)}"))


def stream_entailed(
    spark: SparkSession,
    triples_dir: str,
    schema_triples: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Structured-Streaming driver: triple-file source → foreachBatch
    (IncrementalEntailment) → availableNow drain; returns the
    accumulated CLOSED store."""
    ent = IncrementalEntailment(spark, schema_triples, out_dir)
    stream = (
        spark.readStream.schema(
            "repo string, subj string, pred string, obj string, "
            "obj_type string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(triples_dir)
    )
    query = (
        stream.writeStream.foreachBatch(
            lambda df, bid: ent.process_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return ent.store()
