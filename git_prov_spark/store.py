"""Triple store: partitioned sink/scan (SURVEY.md §2.1 S6-S9) + RDF serialization.

The reference persists one Jena TDB named model per repo (StoreService.java:28-44)
and re-serializes on read (JenaUtils.java:18-54). Here the store is a parquet
table partitioned by (repo_bucket, pred): per-repo reads prune on repo_bucket,
per-predicate query shapes prune on pred. Iceberg is the production target —
its runtime jar is absent in this sandbox, so `writeTo(...).overwritePartitions()`
is gated behind an import-try and plain parquet + dynamic partition overwrite
provides the same idempotent-partition semantics.

Checkpoint/resume (S9, north_rule): repos hash into N_BUCKETS groups; a `_done`
manifest marks completed bucket groups; a restarted run recomputes only pending
buckets (set-difference on the driver — the bucket list is tiny even at 10^12
rows) and dynamic partition overwrite keeps partial re-runs idempotent.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .iri import NAMESPACES

DEFAULT_BUCKETS = 16


def repo_bucket(n_buckets: int = DEFAULT_BUCKETS):
    return F.pmod(F.xxhash64("repo"), F.lit(n_buckets)).cast("int")


def write_triples(
    triples: DataFrame, path: str, n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite", salt_files: int = 4,
    expected_preds: int = 32, max_write_partitions: int = 2048,
    dynamic: bool = False,
) -> None:
    # Shuffle on the partition keys first so each (repo_bucket, pred)
    # directory is written by few tasks — without this, each of the T write
    # tasks opens a writer per directory (T x buckets x preds small files +
    # fs contention that worsens with parallelism). Keys alone skew, though:
    # rdf:type is ~1/4 of all triples, so one task per (bucket, rdf:type)
    # becomes the stage straggler (observed: a 56s task in a 57s stage).
    # A bounded salt splits every directory across salt_files tasks — file
    # count stays <= buckets x preds x salt_files, straggler ~1/salt_files.
    #
    # numPartitions is explicit: with the session default (e.g. 32 shuffle
    # partitions) the ~2000 distinct (bucket, pred, salt) keys would hash-
    # collide many directories into one task, partially re-introducing the
    # straggler the salt exists to fix.
    n_parts = min(max_write_partitions, n_buckets * salt_files * expected_preds)
    salt = F.pmod(F.xxhash64("subj", "obj"), F.lit(salt_files))
    writer = (
        triples.withColumn("repo_bucket", repo_bucket(n_buckets))
        .repartition(n_parts, F.col("repo_bucket"), F.col("pred"), salt)
        .write.mode(mode)
    )
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy("repo_bucket", "pred").parquet(path)


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_triples_table(
    triples: DataFrame,
    spark: SparkSession,
    table: str = "kg.triples",
    path: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    replace: bool = False,
) -> str:
    """Production sink: Iceberg table partitioned by (bucket(B, repo), pred)
    when the runtime jar is present; otherwise the parquet layout with the
    IDENTICAL pruning keys (repo_bucket=*/pred=* directories — the same
    partition transform Iceberg's spec would apply, so a per-repo or
    per-predicate scan prunes equally in both branches; the contract test in
    tests/test_store.py asserts the equivalence on whichever branch this
    environment has).

    Returns "iceberg" or "parquet" (the branch taken). Non-replace writes
    overwrite only the partitions present in `triples` — the idempotent
    resume semantics (S9) in both branches.
    """
    if iceberg_available(spark):
        writer = triples.writeTo(table).using("iceberg").partitionedBy(
            F.bucket(n_buckets, F.col("repo")), F.col("pred")
        )
        if replace:
            writer.createOrReplace()
        elif spark.catalog.tableExists(table):
            # probe existence explicitly: a blanket except around
            # overwritePartitions() would mask real failures (schema drift,
            # permissions) behind a confusing already-exists error from create()
            writer.overwritePartitions()
        else:
            writer.create()
        return "iceberg"
    if path is None:
        raise ValueError("parquet fallback needs an explicit path")
    # one salted, explicitly-fanned-out writer for both branches — the
    # incremental path only adds write-scoped dynamic partition overwrite
    write_triples(
        triples, path, n_buckets=n_buckets, mode="overwrite",
        dynamic=not replace,
    )
    return "parquet"


def read_triples(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_repo(
    spark: SparkSession, path: str, repo: str, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Partition-pruned per-repo scan (S8) — the analog of getNamedModel."""
    df = spark.read.parquet(path)
    return df.where(
        (F.col("repo_bucket") == F.pmod(F.xxhash64(F.lit(repo)), F.lit(n_buckets)))
        & (F.col("repo") == repo)
    )


def list_repos(triples: DataFrame) -> DataFrame:
    """Stored graph names (S8/A3; StoreService.java:61-80)."""
    return triples.select("repo").distinct()


# --------------------------------------------------------------------------
# Checkpoint / resume (S9)
# --------------------------------------------------------------------------

def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_done")


def completed_buckets(out_dir: str) -> set[int]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    done: set[int] = set()
    for name in os.listdir(d):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                done.update(json.load(f)["buckets"])
    return done


def _mark_done(out_dir: str, buckets: list[int], meta: dict) -> None:
    d = _manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    tag = "-".join(str(b) for b in buckets)
    tmp = os.path.join(d, f".group_{tag}.tmp")
    with open(tmp, "w") as f:
        json.dump({"buckets": buckets, **meta}, f)
    os.replace(tmp, os.path.join(d, f"group_{tag}.json"))  # atomic publish


def materialize_resumable(
    build_fn: Callable[[DataFrame, DataFrame, DataFrame], DataFrame],
    files: DataFrame,
    commits: DataFrame,
    contributors: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    group_size: int = 4,
    on_group_done: Callable[[list[int], dict], None] | None = None,
) -> dict:
    """Build + write triples in resumable bucket groups.

    Each group filters inputs to its repo-buckets (predicate reaches the scans),
    runs build_fn, and overwrites exactly its own output partitions (dynamic
    partition overwrite). A kill between groups loses nothing; a kill inside a
    group re-runs only that group. Per-group lineage (buckets, rows, seconds)
    lands in the manifest (north_rule: per-partition lineage + metrics).
    """
    done = completed_buckets(out_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    stats = {"resumed_skipped": sorted(done), "groups": []}

    for i in range(0, len(pending), group_size):
        group = pending[i : i + group_size]
        t0 = time.time()
        bucket = repo_bucket(n_buckets)
        f_g = files.where(bucket.isin(group))
        c_g = commits.where(bucket.isin(group))
        k_g = contributors.where(bucket.isin(group))
        triples = build_fn(f_g, c_g, k_g).withColumn(
            "repo_bucket", repo_bucket(n_buckets)
        )
        # row lineage rides the WRITE action itself (Observation API) —
        # no second count job; north_rule: per-partition lineage +
        # throughput metrics per stage
        from pyspark.sql import Observation

        obs = Observation(f"group_{group[0]}_{group[-1]}")
        triples = triples.observe(obs, F.count(F.lit(1)).alias("rows"))
        # dynamic partition overwrite MUST be write-scoped, not assumed from
        # session conf: under spark-submit's default (STATIC) an overwrite
        # here would delete the whole store — every earlier group AND the
        # _done manifest — before writing this group's partitions
        (
            triples.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("repo_bucket", "pred")
            .parquet(out_dir)
        )
        elapsed = time.time() - t0
        n_rows = int(obs.get["rows"])
        meta = {"seconds": round(elapsed, 3), "rows": n_rows,
                "rows_per_sec": round(n_rows / elapsed, 1)
                if elapsed > 0 else None}
        _mark_done(out_dir, group, meta)
        stats["groups"].append({"buckets": group, **meta})
        if on_group_done:
            on_group_done(group, meta)
    return stats


# --------------------------------------------------------------------------
# RDF serialization (S6) — N-Triples / Turtle / JSON-lines text sinks.
# The reference's 11 interop formats (ProvenanceService.java:216-250):
# document forms live in provdoc.py, presentation renders incl. SVG/PDF/
# HTML/PNG/JPEG in provdoc.py + raster.py — all eleven ship.
# --------------------------------------------------------------------------

def _expand(term: F.Column) -> F.Column:
    """CURIE -> full IRI (gitprov: is per-repo, DESIGN.md §2)."""
    prefix = F.substring_index(term, ":", 1)
    local = F.split(term, ":", 2).getItem(1)
    out = F.when(
        prefix == "gitprov",
        F.concat(F.lit("gitprov://"), F.col("repo"), F.lit("#"), local),
    )
    for p, ns in NAMESPACES.items():
        out = out.when(prefix == p, F.concat(F.lit(ns), local))
    return out.otherwise(term)


def _lit_escape(c: F.Column) -> F.Column:
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", "\\\\n")
    c = F.regexp_replace(c, "\r", "\\\\r")
    return F.regexp_replace(c, "\t", "\\\\t")


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """One N-Triples line per triple (column `line`); order-insensitive."""
    s = F.concat(F.lit("<"), _expand(F.col("subj")), F.lit(">"))
    p = F.concat(F.lit("<"), _expand(F.col("pred")), F.lit(">"))
    # every obj_type shape serializes to a well-formed term — a NULL
    # branch would silently truncate the line and the triple would
    # vanish through serialize∘parse:
    #   iri            → <expanded>
    #   xsd:string     → plain quoted literal
    #   '@tag'         → "lit"@tag        (language-tagged)
    #   any CURIE      → "lit"^^<expanded datatype> (not just xsd:)
    #   colon-less     → plain quoted (legacy demo vocabularies like
    #                    'string' normalize to xsd:string on re-parse)
    o = F.when(
        F.col("obj_type") == "iri",
        F.concat(F.lit("<"), _expand(F.col("obj")), F.lit(">")),
    ).when(
        F.col("obj_type") == "xsd:string",
        F.concat(F.lit('"'), _lit_escape(F.col("obj")), F.lit('"')),
    ).when(
        F.col("obj_type").startswith("@"),
        F.concat(F.lit('"'), _lit_escape(F.col("obj")), F.lit('"'),
                 F.col("obj_type")),
    ).when(
        ~F.col("obj_type").contains(":"),
        F.concat(F.lit('"'), _lit_escape(F.col("obj")), F.lit('"')),
    ).otherwise(
        F.concat(
            F.lit('"'), _lit_escape(F.col("obj")), F.lit('"^^<'),
            _expand(F.col("obj_type")),
            F.lit(">"),
        )
    )
    return triples.select(
        F.concat_ws(" ", s, p, o, F.lit(".")).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    ntriples_lines(triples).write.mode(mode).text(path)


#: hard cap on triples a convenience per-repo export may collect to the
#: driver (a few hundred MB of line strings). A Linux-kernel-shaped repo
#: (10^7-10^8 triples in ONE graph) must take the distributed sharded
#: twins instead; the guard turns a driver OOM into a polite refusal.
DRIVER_EXPORT_MAX_TRIPLES = 2_000_000


class ExportTooLarge(ValueError):
    """Per-repo driver-side export exceeds its max_triples guard."""


def guard_driver_export(scoped: DataFrame, repo: str, what: str,
                        max_triples: int | None) -> None:
    """Count-probe before a driver-side collect: limit(max+1).count() — the
    probe job stops as soon as the threshold is crossed, it never counts the
    whole graph. max_triples=None disables the guard explicitly."""
    if max_triples is None:
        return
    n = scoped.limit(max_triples + 1).count()
    if n > max_triples:
        raise ExportTooLarge(
            f"{what} for repo {repo!r} exceeds max_triples={max_triples} "
            "(driver-side convenience export). Use the distributed twins — "
            "store.write_ntriples / store.write_rdfxml / "
            "provdoc.prov_document_parts — or pass a larger max_triples "
            "(None disables the guard) if the driver can hold it."
        )


def turtle_text(triples: DataFrame, repo: str,
                max_triples: int | None = DRIVER_EXPORT_MAX_TRIPLES) -> str:
    """Single-repo Turtle string (driver-side assembly of prefix header + body).

    Mirrors the reference's per-repo document serialization; intended for
    one-repo exports, not the bulk path (use write_ntriples for bulk).
    Refuses past `max_triples` (guard_driver_export)."""
    from .iri import gitprov_ns

    guard_driver_export(triples.where(F.col("repo") == repo), repo,
                        "turtle_text", max_triples)

    header = "".join(
        f"@prefix {p}: <{ns}> .\n" for p, ns in NAMESPACES.items()
    ) + f"@prefix gitprov: <{gitprov_ns(repo)}> .\n\n"
    body_df = triples.where(F.col("repo") == repo).select(
        F.concat_ws(
            " ",
            F.col("subj"),
            F.col("pred"),
            F.when(F.col("obj_type") == "iri", F.col("obj"))
            .when(
                F.col("obj_type") == "xsd:string",
                F.concat(F.lit('"'), _lit_escape(F.col("obj")), F.lit('"')),
            )
            .otherwise(
                F.concat(
                    F.lit('"'), _lit_escape(F.col("obj")), F.lit('"^^'),
                    F.col("obj_type"),
                )
            ),
            F.lit("."),
        ).alias("line")
    ).orderBy("line")
    return header + "\n".join(r.line for r in body_df.collect())


def write_jsonlines(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    triples.write.mode(mode).json(path)


# --------------------------------------------------------------------------
# RDF/XML + TriG (reference formats: ProvenanceService.java:216-250 writes
# RDFXML and TRIG among its 11; both are DATA formats users round-trip
# through other stores, unlike the PDF/SVG presentation outputs).
# --------------------------------------------------------------------------

def _xml_escape(c: F.Column) -> F.Column:
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    return F.regexp_replace(c, '"', "&quot;")


def rdfxml_description_lines(triples: DataFrame) -> DataFrame:
    """One <rdf:Description> element per triple (column `line`).

    Flat description-per-triple is valid RDF/XML (grouping by subject is a
    readability nicety, not a conformance requirement). Predicates in the
    per-repo gitprov namespace carry an inline xmlns declaration — element
    QName prefixes can't vary per row otherwise. Everything is built from
    string built-ins: distributed, codegen'd, no driver involvement.
    """
    subj = _xml_escape(_expand(F.col("subj")))
    pred_prefix = F.substring_index(F.col("pred"), ":", 1)
    pred_local = F.split(F.col("pred"), ":", 2).getItem(1)
    # gitprov preds get an inline per-repo namespace; others use the header's
    inline_ns = F.when(
        pred_prefix == "gitprov",
        F.concat(
            F.lit(' xmlns:gitprov="gitprov://'),
            _xml_escape(F.col("repo")), F.lit('#"'),
        ),
    ).otherwise(F.lit(""))
    qname = F.concat(pred_prefix, F.lit(":"), pred_local)
    obj_iri = _xml_escape(_expand(F.col("obj")))
    obj_lit = _xml_escape(F.col("obj"))
    body = F.when(
        F.col("obj_type") == "iri",
        F.concat(F.lit('<'), qname, inline_ns,
                 F.lit(' rdf:resource="'), obj_iri, F.lit('"/>')),
    ).when(
        F.col("obj_type") == "xsd:string",
        F.concat(F.lit('<'), qname, inline_ns, F.lit('>'), obj_lit,
                 F.lit('</'), qname, F.lit('>')),
    ).when(
        F.col("obj_type").startswith("@"),
        F.concat(F.lit('<'), qname, inline_ns, F.lit(' xml:lang="'),
                 F.substring(F.col("obj_type"), 2, 1 << 10), F.lit('">'),
                 obj_lit, F.lit('</'), qname, F.lit('>')),
    ).when(
        ~F.col("obj_type").contains(":"),
        F.concat(F.lit('<'), qname, inline_ns, F.lit('>'), obj_lit,
                 F.lit('</'), qname, F.lit('>')),
    ).otherwise(
        F.concat(
            F.lit('<'), qname, inline_ns,
            F.lit(' rdf:datatype="'), _expand(F.col("obj_type")),
            F.lit('">'),
            obj_lit, F.lit('</'), qname, F.lit('>'),
        )
    )
    return triples.select(
        F.concat(
            F.lit('  <rdf:Description rdf:about="'), subj, F.lit('">'),
            body, F.lit("</rdf:Description>"),
        ).alias("line")
    )


def _rdfxml_header() -> str:
    xmlns = "".join(f' xmlns:{p}="{ns}"' for p, ns in NAMESPACES.items())
    return f'<?xml version="1.0" encoding="UTF-8"?>\n<rdf:RDF{xmlns}>'


RDFXML_FOOTER = "</rdf:RDF>"


def rdfxml_text(triples: DataFrame, repo: str,
                max_triples: int | None = DRIVER_EXPORT_MAX_TRIPLES) -> str:
    """Single-repo RDF/XML document string (driver-side assembly — the
    per-repo export analog of turtle_text; bulk path is write_rdfxml).
    Refuses past `max_triples` (guard_driver_export)."""
    guard_driver_export(triples.where(F.col("repo") == repo), repo,
                        "rdfxml_text", max_triples)
    lines = (
        rdfxml_description_lines(triples.where(F.col("repo") == repo))
        .orderBy("line")
        .collect()
    )
    return "\n".join([_rdfxml_header()] + [r.line for r in lines] + [RDFXML_FOOTER])


def write_rdfxml(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed sharded RDF/XML export: every part file is a complete,
    well-formed document (header + descriptions + footer added per
    partition) — the standard shape for bulk RDF interchange."""
    header, footer = _rdfxml_header(), RDFXML_FOOTER
    lines = rdfxml_description_lines(triples)

    def wrap(it):
        yielded = False
        for row in it:
            if not yielded:
                yield header
                yielded = True
            yield row.line
        if yielded:
            yield footer

    if mode == "overwrite":
        spark = triples.sparkSession
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jvm_path, True)
    lines.rdd.mapPartitions(wrap).saveAsTextFile(path)


def trig_lines(triples: DataFrame) -> DataFrame:
    """One TriG statement per triple: `GRAPH <iri> { s p o . }`.

    TriG allows the same graph to be opened any number of times, so a flat
    line-per-triple form is valid and fully distributed — no per-graph
    grouping pass. Graph IRI = the per-repo namespace (the analog of the
    reference's one-named-model-per-repo store, StoreService.java:38-44).
    """
    g = F.concat(F.lit("gitprov://"), F.col("repo"))
    s = F.concat(F.lit("<"), _expand(F.col("subj")), F.lit(">"))
    p = F.concat(F.lit("<"), _expand(F.col("pred")), F.lit(">"))
    o = F.when(
        F.col("obj_type") == "iri",
        F.concat(F.lit("<"), _expand(F.col("obj")), F.lit(">")),
    ).when(
        F.col("obj_type") == "xsd:string",
        F.concat(F.lit('"'), _lit_escape(F.col("obj")), F.lit('"')),
    ).when(
        F.col("obj_type").startswith("@"),
        F.concat(F.lit('"'), _lit_escape(F.col("obj")), F.lit('"'),
                 F.col("obj_type")),
    ).when(
        ~F.col("obj_type").contains(":"),
        F.concat(F.lit('"'), _lit_escape(F.col("obj")), F.lit('"')),
    ).otherwise(
        F.concat(
            F.lit('"'), _lit_escape(F.col("obj")), F.lit('"^^<'),
            _expand(F.col("obj_type")), F.lit(">"),
        )
    )
    return triples.select(
        F.concat(
            F.lit("GRAPH <"), g, F.lit("> { "),
            F.concat_ws(" ", s, p, o), F.lit(" . }"),
        ).alias("line")
    )


def write_trig(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    trig_lines(triples).write.mode(mode).text(path)


# --------------------------------------------------------------------------
# Repo discovery / search (S5 full; GithubService.java:60-92 delegates to the
# GitHub search API — here it's a filter over repo metadata derived from the
# files table, entirely partition-prunable).
# --------------------------------------------------------------------------

def repo_metadata(files: DataFrame) -> DataFrame:
    """(repo, owner, name, languages, n_files) per distinct repo."""
    return (
        files.groupBy("repo")
        .agg(
            F.collect_set("lang").alias("languages"),
            F.count("*").alias("n_files"),
        )
        .withColumn("owner", F.split(F.col("repo"), "/").getItem(0))
        .withColumn("name", F.split(F.col("repo"), "/").getItem(1))
    )


def search_repos(
    meta: DataFrame,
    query: str | None = None,
    owner: str | None = None,
    language: str | None = None,
) -> DataFrame:
    """Filter repo metadata the way the reference's search params do
    (query substring on the name, user/org = owner equality, language
    membership). At least one param is required — the reference 400s on an
    empty search (ProvController.java:52-54)."""
    if query is None and owner is None and language is None:
        raise ValueError("search needs at least one of query/owner/language")
    df = meta
    if query is not None:
        df = df.where(F.col("name").contains(query))
    if owner is not None:
        df = df.where(F.col("owner") == owner)
    if language is not None:
        df = df.where(F.array_contains(F.col("languages"), language))
    return df


# --------------------------------------------------------------------------
# N-Triples PARSER — the ingest twin of ntriples_lines (round-trip closure)
# --------------------------------------------------------------------------

#: private-use sentinel for the two-phase backslash unescape. A literal
#: containing U+E000 is outside the parser's contract (it cannot appear in
#: well-formed corpus text; the serializer never emits it).
_UNESC_SENTINEL = ""


def _lit_unescape(c: F.Column) -> F.Column:
    """Exact inverse of _lit_escape: protect '\\\\' behind a sentinel
    first so '\\\\n' decodes to backslash+n, not newline — the classic
    two-phase trick that makes sequential regexp passes order-safe."""
    c = F.regexp_replace(c, r"\\\\", _UNESC_SENTINEL)
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\t", "\t")
    c = F.regexp_replace(c, r'\\"', '"')
    return F.regexp_replace(c, _UNESC_SENTINEL, r"\\")


def _compact(term: F.Column) -> F.Column:
    """Full IRI -> the store's CURIE vocabulary (inverse of _expand):
    gitprov://<repo># IRIs re-anchor on the gitprov: prefix; known
    namespaces compact longest-prefix-first; anything else verbatim."""
    out = F.when(
        term.startswith("gitprov://"),
        F.concat(F.lit("gitprov:"),
                 F.substring_index(term, "#", -1)),
    )
    for p, ns in sorted(NAMESPACES.items(), key=lambda kv: -len(kv[1])):
        out = out.when(term.startswith(ns),
                       F.concat(F.lit(p + ":"), F.substring(
                           term, len(ns) + 1, 1 << 20)))
    return out.otherwise(term)


def parse_ntriples_lines(lines: DataFrame,
                         default_repo: str | None = None) -> DataFrame:
    """(repo, subj, pred, obj, obj_type) from a `line` column of
    N-Triples — the distributed INGEST path that closes the store's
    serialization round trip (ntriples_lines ∘ parse_ntriples_lines =
    identity on the store's term vocabulary).

    Entirely map-side built-ins (regexp_extract / regexp_replace /
    substring): no shuffle, no UDF — at 100 TB this is a pure scan
    stage that parallelizes with the input file split count. Per line:
    subject/predicate IRIs compact back to CURIEs; the object branches
    on its lexical shape (<iri> / "literal" / "literal"^^<datatype>);
    plain literals read back as xsd:string (exactly what the serializer
    emits for them). The graph column recovers from any gitprov://
    term's authority (the per-repo namespace, DESIGN.md §2), falling
    back to `default_repo`; rows where neither side carries one and no
    default is given keep a NULL repo, which the store's writers
    reject loudly. Malformed lines (no NT shape) are dropped — the
    standard big-ingest posture (count them upstream via a dq rule on
    the raw line relation when provenance demands it)."""
    s_raw = F.regexp_extract("line", r"^<([^>]*)> ", 1)
    p_raw = F.regexp_extract("line", r"^<[^>]*> <([^>]*)> ", 1)
    rest = F.regexp_extract("line", r"^<[^>]*> <[^>]*> (.*) \.$", 1)
    shaped = (
        lines.select(
            s_raw.alias("_s"), p_raw.alias("_p"), rest.alias("_r"))
        .where((F.col("_s") != "") & (F.col("_p") != "")
               & (F.col("_r") != ""))
    )
    o_iri = F.regexp_extract("_r", r"^<(.*)>$", 1)
    o_typed = F.regexp_extract("_r", r'^"(.*)"\^\^<(.*)>$', 1)
    o_dtype = F.regexp_extract("_r", r'^"(.*)"\^\^<(.*)>$', 2)
    o_langlit = F.regexp_extract("_r", r'^"(.*)"(@[A-Za-z][A-Za-z0-9-]*)$', 1)
    o_lang = F.regexp_extract("_r", r'^"(.*)"(@[A-Za-z][A-Za-z0-9-]*)$', 2)
    o_plain = F.regexp_extract("_r", r'^"(.*)"$', 1)
    parsed = shaped.select(
        "_s", "_p", o_iri.alias("_oraw"),
        F.when(F.col("_r").startswith("<"), _compact(o_iri))
        .when(o_dtype != "", _lit_unescape(o_typed))
        .when(o_lang != "", _lit_unescape(o_langlit))
        .otherwise(_lit_unescape(o_plain)).alias("obj"),
        F.when(F.col("_r").startswith("<"), F.lit("iri"))
        .when(o_dtype != "", _compact(o_dtype))
        .when(o_lang != "", F.lower(o_lang))  # store keeps tags lowercase
        .otherwise(F.lit("xsd:string")).alias("obj_type"),
    )
    repo_of = lambda c: F.regexp_extract(c, r"^gitprov://(.*)#", 1)  # noqa: E731
    return parsed.select(
        F.coalesce(
            F.when(repo_of(F.col("_s")) != "", repo_of(F.col("_s"))),
            F.when(repo_of(F.col("_p")) != "", repo_of(F.col("_p"))),
            F.when(repo_of(F.col("_oraw")) != "", repo_of(F.col("_oraw"))),
            F.lit(default_repo),
        ).alias("repo"),
        _compact(F.col("_s")).alias("subj"),
        _compact(F.col("_p")).alias("pred"),
        "obj", "obj_type",
    )


def read_ntriples(spark, path: str,
                  default_repo: str | None = None) -> DataFrame:
    """Distributed N-Triples source: text lines -> triple relation."""
    return parse_ntriples_lines(
        spark.read.text(path).withColumnRenamed("value", "line"),
        default_repo=default_repo)


def compact_store(spark, path: str, target_bytes: int = 128 * 1024 * 1024,
                  n_buckets: int = DEFAULT_BUCKETS) -> dict:
    """Rewrite a partitioned triple store so every (repo_bucket, pred)
    directory holds ~target_bytes-sized files — the compaction pass an
    incrementally-appended store (streaming build batches, UPDATE
    deltas, store_delta shipments) needs periodically, or reads drown
    in file-open overhead (the classic small-files problem; Iceberg's
    rewrite_data_files is the managed twin, still jar-less in this
    container — BASELINE.md §Iceberg).

    Contract: content-identical (same triple multiset), layout-only.
    Mechanics: one pass — read with the partition columns, compute the
    global bytes/row from the scan statistics, then shuffle ON THE
    PARTITION KEYS with a row_number-derived file index so each
    directory lands in ceil(dir_rows / rows_per_file) write tasks; a
    directory already at one right-sized file costs one task. Returns
    {files_before, files_after, rows} so the caller can assert the
    shrink.

    At 100 TB you'd run this per-partition-subset (WHERE repo_bucket
    IN (...)) under dynamic partition overwrite — the `where` the
    caller applies before calling composes with the same plan."""
    import glob as _glob
    import os

    def _count_files(p):
        return len([f for f in _glob.glob(
            os.path.join(p, "**", "*.parquet"), recursive=True)])

    before = _count_files(path)
    df = spark.read.parquet(path)
    rows = df.count()
    size_bytes = sum(
        os.path.getsize(f) for f in _glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True))
    rows_per_file = max(
        1, int(rows * target_bytes / size_bytes) if size_bytes else rows)
    from pyspark.sql import Window

    w = Window.partitionBy("repo_bucket", "pred").orderBy("subj", "obj")
    tmp = path.rstrip("/") + ".compact.tmp"
    (
        df.withColumn(
            "_f", ((F.row_number().over(w) - 1) / rows_per_file)
            .cast("long"))
        .repartition(F.col("repo_bucket"), F.col("pred"), F.col("_f"))
        .drop("_f")
        .write.mode("overwrite").partitionBy("repo_bucket", "pred")
        .parquet(tmp)
    )
    import shutil

    # swap by rename, old store last: a crash at any point leaves either
    # the original at `path` (before the first rename) or the full data
    # recoverable at `<path>.compact.old` (between the renames) — never
    # a window with the data already deleted
    old = path.rstrip("/") + ".compact.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"files_before": before, "files_after": _count_files(path),
            "rows": rows}
