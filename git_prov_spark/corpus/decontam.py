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
