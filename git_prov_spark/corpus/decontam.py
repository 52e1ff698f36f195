"""Benchmark decontamination: flag / drop training documents that share
word n-grams with an evaluation set.

The canonical large-scale training-data step (GPT-3 §C / PaLM / Llama all
describe n-gram–overlap decontamination): before training, every document
that contains an n-gram also present in a benchmark's prompts or targets is
flagged so the eval stays honest. The reference system has no corpus suite;
this extends it the way SURVEY.md §2's LLM-pipeline mandate prescribes.

Scale shape (the 100 TB story):
* The EVAL side is a benchmark suite — thousands to low-millions of
  shingles, bounded and tiny next to the corpus — so the overlap join
  broadcasts the distinct eval-shingle set and the corpus side never
  shuffles: one map-side semi-join pass over training shingles, then a
  hash-aggregate on doc_id. Cost O(|corpus shingles|), like the LSH ingest
  gate (dedup.lsh_index_matches).
* With `broadcast_eval=False` the same plan becomes a shuffle equi-join on
  the shingle for the rare oversized-eval case.
* Shingling reuses dedup.shingles (distinct word n-grams via one
  posexplode — no UDF), so the DuckDB oracle twin reproduces it token-for-
  token (oracles.sql_contamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles

DEFAULT_DECONTAM_NGRAM = 8  # real pipelines use 8-13; fixtures use smaller


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = DEFAULT_DECONTAM_NGRAM,
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for EVERY training doc: n_hits =
    distinct training shingles that also occur anywhere in the eval set."""
    tr = shingles(train, n=n, id_col=id_col)
    ev = shingles(eval_df, n=n, id_col=id_col).select("shingle").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = tr.join(ev, "shingle").groupBy(id_col).agg(
        F.count("*").alias("_hits")
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = DEFAULT_DECONTAM_NGRAM,
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training rows with contaminated documents removed (one left-anti
    join against the flagged ids — all columns pass through)."""
    flagged = (
        contamination_report(train, eval_df, n, id_col, broadcast_eval)
        .where(F.col("contaminated"))
        .select(id_col)
    )
    return train.join(flagged, id_col, "left_anti")


def semantic_contamination(
    train_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """(vec_id, n_hits, max_cos_r, contaminated) for EVERY training
    vector — EMBEDDING-level benchmark decontamination: the pass real
    pipelines run alongside n-gram decontam (contamination_report) to
    catch paraphrased/translated eval leakage that shares no exact
    n-gram. A hit is an eval vector with cosine >= threshold that lands
    in the training vector's hyperplane-LSH bucket or one of its
    hamming-1 neighbors (the EVAL side expands to its 1 + n_planes probe
    buckets — eval sets are small, the expansion is free).

    Scale (100 TB): the corpus side computes one bucket id map-side and
    equi-joins against the broadcast probe-expanded eval set — the
    corpus never self-joins and never shuffles; cost is linear in corpus
    size plus the (tiny) in-bucket candidate mass. Bucketing bounds
    recall exactly like ann_topk_multiprobe (candidates at hamming <= 1
    of the eval bucket are guaranteed); raise n_planes coverage or run
    the IVF path for stricter recall. Determinism: hyperplane weights
    are hash-derived literals and the cosine is the fixed left fold
    (dedup.cosine_expr), so both engines see identical doubles and the
    DuckDB twin matches bit-for-bit.
    """
    from .dedup import cosine_expr
    from .hashing import ANN_PLANES
    from .similarity import lsh_bucket_expr, probe_masks

    bucket = lsh_bucket_expr("embedding")
    tr = train_emb.select(
        F.col(id_col), F.col("embedding").alias("_temb"),
        F.expr(bucket).alias("_b"))
    masks = probe_masks(ANN_PLANES)
    ev = (
        eval_emb.select(F.col(id_col).alias("_eid"),
                        F.col("embedding").alias("_eemb"))
        .withColumn("_b0", F.expr(bucket.replace("embedding", "_eemb")))
        .withColumn("_m", F.explode(F.array(*[F.lit(m) for m in masks])))
        .select("_eid", "_eemb", F.expr("int(_b0) ^ int(_m)").alias("_b"))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = (
        tr.join(ev, "_b")
        .withColumn("_cos", F.expr(cosine_expr("_temb", "_eemb")))
        .where(F.col("_cos") >= threshold)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_hits"),
             F.round(F.max("_cos"), 4).alias("_maxcos"))
    )
    return (
        train_emb.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.col("_maxcos").alias("max_cos_r"),
            (F.coalesce(F.col("_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def span_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    window: int = 32,
    overlap: int = 8,
    n: int = DEFAULT_DECONTAM_NGRAM,
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, n_hits, keep) — SPAN-level
    benchmark decontamination: documents chunk into token windows
    (text.chunk_documents) and each WINDOW is tested against the eval
    shingle set independently, so a doc with one contaminated paragraph
    loses that window, not the whole document — the Pile/Llama-style
    surgical cut that preserves the clean 99% of a long doc where
    doc-level decontam (contamination_report) would drop it all.

    Scale: same shape as the doc-level pass — the eval shingle set
    broadcasts (eval corpora are small by definition), the chunk
    shingles are map-side explodes, one hash-aggregate per chunk key.
    The corpus text shuffles once, in the chunker's posexplode."""
    from .text import chunk_documents

    ch = chunk_documents(train, window=window, overlap=overlap,
                         id_col=id_col)
    return _span_flags(ch, eval_df, n=n, id_col=id_col,
                       broadcast_eval=broadcast_eval)


def _span_flags(ch: DataFrame, eval_df: DataFrame, n: int,
                id_col: str, broadcast_eval: bool) -> DataFrame:
    """Per-chunk contamination flags over an ALREADY-CHUNKED relation —
    shared by span_decontaminate and span_cleaned_corpus so the corpus
    chunks exactly once per caller (the chunker's posexplode is the
    corpus-sized cost)."""
    from .dedup import shingle_expr
    from .text import tokens_col

    csh = (
        ch.withColumn("tokens", tokens_col("chunk_text"))
        .select(F.col(id_col), "chunk_idx",
                F.explode(F.expr(shingle_expr(n))).alias("shingle"))
        .distinct()
    )
    ev = shingles(eval_df, n=n, id_col=id_col).select("shingle").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    hits = csh.join(ev, "shingle").groupBy(id_col, "chunk_idx").agg(
        F.count(F.lit(1)).alias("_hits"))
    return (
        ch.join(hits, [id_col, "chunk_idx"], "left")
        .select(
            F.col(id_col), "chunk_idx", "n_tokens",
            F.coalesce("_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("_hits", F.lit(0)) == 0).alias("keep"),
        )
    )

def span_cleaned_corpus(
    train: DataFrame,
    eval_df: DataFrame,
    window: int = 32,
    overlap: int = 8,
    n: int = DEFAULT_DECONTAM_NGRAM,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cleaned_text, n_tokens_kept, n_chunks_dropped) — the
    SHIPPED artifact of span-level decontamination: each document
    reassembled from its kept windows, contaminated windows excised.

    Reassembly rule (exact, both engines): a kept chunk contributes its
    first `window - overlap` tokens — the stride segment it uniquely
    owns — except the document's LAST chunk, which contributes all of
    its tokens (the tail past the final stride boundary exists only
    there). Dropping a chunk therefore excises exactly its stride
    segment (plus the tail, if last). Documents whose every chunk drops
    emit an empty cleaned_text, still one row — the manifest must
    partition the input.

    Scale: the chunker's posexplode is the one text shuffle; reassembly
    is a per-doc array_sort over (chunk_idx, segment) structs — bounded
    by a document's chunk count, never the corpus."""
    from .text import chunk_documents, tokens_col

    stride = window - overlap
    ch = chunk_documents(train, window=window, overlap=overlap,
                         id_col=id_col)
    # ONE chunking pass: the flags come from the same chunk relation the
    # reassembly consumes (the chunker's posexplode is the corpus-sized
    # cost — running it twice would double the dominant term)
    flags = _span_flags(ch, eval_df, n=n, id_col=id_col,
                        broadcast_eval=True) \
        .select(id_col, "chunk_idx", "keep")
    last = ch.groupBy(id_col).agg(F.max("chunk_idx").alias("_last"))
    seg = (
        ch.join(flags, [id_col, "chunk_idx"])
        .join(last, id_col)
        .withColumn("_toks", tokens_col("chunk_text"))
        .withColumn(
            "_seg",
            F.when(~F.col("keep"), F.array().cast("array<string>"))
            .when(F.col("chunk_idx") == F.col("_last"), F.col("_toks"))
            .otherwise(F.slice("_toks", 1, stride)))
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("chunk_idx", F.col("_seg").alias("s"))))
    return (
        seg.groupBy(id_col)
        .agg(
            F.concat_ws(" ", F.flatten(
                F.transform(ordered, lambda x: x["s"])))
            .alias("cleaned_text"),
            F.sum(F.size("_seg")).cast("long").alias("n_tokens_kept"),
            F.sum((~F.col("keep")).cast("long")).alias("n_chunks_dropped"),
        )
    )
