"""Distributed BPE merge learning — the tokenizer-TRAINING pass of an
LLM data pipeline (Sennrich et al. 2016), built on the word-frequency
trick every production BPE trainer uses: merges are learned over the
DISTINCT-WORD table weighted by corpus frequency, never over raw text.

This is the capstone over the counting passes that already exist here
(`text.vocabulary` is the word-frequency extraction, `text.bigram_stats`
is one round's pair count): `learn_bpe` runs the full iterative loop —
count adjacent symbol pairs, pick the most frequent, merge it greedily
left-to-right in every word, repeat.

Scale (100 TB): the corpus-sized work is ONE explode + hash-aggregate to
build the word-frequency table (map-side partials collapse repeated
words before the shuffle — Zipf makes this collapse hard); every merge
round after that touches only the distinct-word relation, which is
vocabulary-sized (10^6-10^8 rows at web scale, independent of corpus
tokens). Per round: one map-side pair explode + one hash-aggregate +
one ordered limit(1) (TakeOrderedAndProject: per-partition heaps, a
single row to the driver — the one bounded scalar per round, exactly the
pagerank-N precedent) + one map-side fold to re-tokenize. Words are
`localCheckpoint`ed per round so lineage stays flat across rounds
(the connected-components precedent, operators.py).

Determinism (the cross-engine hash gate): pair counts are exact longs;
ties break on the SEP-joined pair STRING ascending (string order, not
tuple order, so both engines compare identically); merge application is
a left fold — strict leftmost-first greedy, the reference BPE semantics:
"aaaa" under merge (a,a) becomes (aa)(aa), never (aa)(a)(a) — and the
DuckDB twin (oracles.sql_bpe_*) reproduces the identical fold via
list_reduce over a list-of-lists lift.

Reference parity note: the git-prov reference has no tokenizer training
(it is a KG service); this module is part of the prompt-mandated
LLM-data-pipeline surface, gated like the rest of the corpus suite.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unit separator: joins the two symbols of a pair into one aggregation
# key. Words containing it are excluded up front (it cannot then appear
# in any symbol, so the join is unambiguous and the split is exact).
SEP = "\x1f"
N_MERGES = 8


def word_freqs(df: DataFrame, text: str = "text") -> DataFrame:
    """(word, freq) over BPE pretokens — the only corpus-sized pass."""
    from .text import bpe_tokens_col

    return (
        df.select(F.explode(bpe_tokens_col(text)).alias("word"))
        .where(~F.col("word").contains(SEP))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    )


def _char_syms(word_col: str = "word") -> Column:
    return F.expr(
        f"transform(sequence(1, length({word_col})), "
        f"i -> substring({word_col}, i, 1))"
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy leftmost-first merge of adjacent (a, b) into a||b: a left
    fold over the symbol array. Within one pass the freshly created
    symbol a||b can never itself equal `a` (that would need b = ''), so
    the fold cannot cascade — it is exactly single-pass greedy."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(df: DataFrame, n_merges: int = N_MERGES,
              text: str = "text") -> tuple[list[tuple], DataFrame]:
    """Learn `n_merges` BPE merges over the corpus. Returns
    (merges, words): `merges` is the learned merge table as a Python
    list of (merge_rank, lhs, rhs, pair_count) — n_merges driver-side
    rows, one bounded scalar per round — and `words` is the
    (word, freq, syms) DataFrame tokenized under all learned merges.

    Stops early (returning fewer merges) only if the corpus runs out of
    adjacent pairs — every word reduced to a single symbol."""
    words = (
        word_freqs(df, text)
        .withColumn("syms", _char_syms())
        .localCheckpoint()
    )
    merges: list[tuple] = []
    for k in range(1, n_merges + 1):
        pc = (
            words.where(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    f"i -> concat_ws('{SEP}', element_at(syms, i), "
                    "element_at(syms, i + 1)))"
                )).alias("pair"),
            )
            .groupBy("pair").agg(F.sum("freq").alias("cnt"))
        )
        top = pc.orderBy(F.col("cnt").desc(), "pair").limit(1).collect()
        if not top:
            break
        a, b = top[0]["pair"].split(SEP)
        merges.append((k, a, b, int(top[0]["cnt"])))
        words = (
            words.withColumn("syms", _apply_merge(F.col("syms"), a, b))
            .localCheckpoint()
        )
    return merges, words


def bpe_merge_table(df: DataFrame, n_merges: int = N_MERGES,
                    text: str = "text") -> DataFrame:
    """(merge_rank, lhs, rhs, pair_count): the learned merge table — the
    artifact a tokenizer ships."""
    merges, words = learn_bpe(df, n_merges, text)
    return words.sparkSession.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, pair_count long")


def bpe_vocab(df: DataFrame, n_merges: int = N_MERGES,
              text: str = "text") -> DataFrame:
    """(word, freq, n_syms, toks): every distinct word tokenized under
    the learned merges — the evidence the merges were APPLIED correctly,
    not just ranked. `toks` is space-joined (pretokens never contain
    whitespace, so the join is unambiguous)."""
    _, words = learn_bpe(df, n_merges, text)
    return words.select(
        "word", "freq",
        F.size("syms").cast("long").alias("n_syms"),
        F.concat_ws(" ", "syms").alias("toks"),
    )


def bpe_encode_counts(df: DataFrame, n_merges: int = N_MERGES,
                      text: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_pieces) — every document ENCODED under the
    corpus-learned merge table: pretoken count and resulting BPE piece
    count. The compression readout a tokenizer-training pipeline logs
    per shard (pieces/word ratio), and the budgeting input for token-
    based pricing of a corpus.

    Scale: encoding never touches documents symbol-by-symbol — the
    vocabulary (word → piece count under all merges) comes out of
    learn_bpe's word-level fold, is Zipf-small, and BROADCASTS into a
    join against the per-doc word counts (one hash-aggregate over
    exploded pretokens, map-side partials). The corpus-sized work is
    the same single pass word_freqs already does."""
    _, words = learn_bpe(df, n_merges, text)
    vocab = words.select("word", F.size("syms").alias("n_syms"))
    from .text import bpe_tokens_col

    per_doc = (
        df.select(F.col(id_col), F.explode(bpe_tokens_col(text)).alias("word"))
        .where(~F.col("word").contains(SEP))
        .groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_doc.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(F.sum("c").cast("long").alias("n_words"),
             F.sum(F.col("c") * F.col("n_syms")).cast("long")
             .alias("n_pieces"))
    )
