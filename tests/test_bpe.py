"""bpe.py: distributed BPE merge learning — exact parity with a
pure-Python reference trainer (the third implementation, alongside the
DuckDB twin the gate runs), greedy-run semantics, tie-break determinism,
and partitioning invariance."""
from __future__ import annotations

import re

from git_prov_spark.corpus.bpe import (
    SEP,
    bpe_merge_table,
    bpe_vocab,
    learn_bpe,
)

# ASCII-equivalent of text.BPE_TOKEN_PATTERN (tests use ASCII corpora so
# Python `re` needs no \p classes)
_PRETOKEN = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")


def _py_bpe(texts, n_merges):
    """Reference BPE trainer: word-frequency table, per round count
    adjacent pairs (overlapping positions count), argmax by
    (count DESC, SEP-joined pair ASC), greedy leftmost merge."""
    freqs = {}
    for t in texts:
        for w in _PRETOKEN.findall(t or ""):
            if SEP in w:
                continue
            freqs[w] = freqs.get(w, 0) + 1
    words = {w: list(w) for w in freqs}
    merges = []
    for k in range(1, n_merges + 1):
        counts = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(),
            key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1]))
        merges.append((k, a, b, cnt))
        for w, syms in words.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            words[w] = out
    return merges, {w: (freqs[w], words[w]) for w in words}


CORPUS = [
    "the theme of the thesis",
    "then the weather thawed",
    "low lower lowest low low",
    "newer newest new new",
    "aaaa aaaa aab",
    "ababab banana bandana",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_merges_match_python_reference(spark):
    want, _ = _py_bpe(CORPUS, 10)
    got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count)
           for r in bpe_merge_table(_docs(spark), n_merges=10)
           .orderBy("merge_rank").collect()]
    assert got == want


def test_bpe_vocab_matches_python_reference(spark):
    _, want = _py_bpe(CORPUS, 10)
    got = {r.word: (r.freq, r.n_syms, r.toks)
           for r in bpe_vocab(_docs(spark), n_merges=10).collect()}
    assert got == {w: (f, len(s), " ".join(s)) for w, (f, s) in want.items()}


def test_bpe_greedy_run_semantics(spark):
    """Leftmost-first greedy on character runs: 'aaaa' under merge (a,a)
    tokenizes to (aa)(aa) — the replace-pass shortcut would give
    (aa)(a)(a) or (aa)(a)(aa)(a) shapes; this pins strict greedy."""
    merges, words = learn_bpe(_docs(spark, ["aaaa aaaa aaaa"]), n_merges=1)
    assert merges[0][1:3] == ("a", "a")
    toks = {r.word: r.syms for r in words.collect()}
    assert toks["aaaa"] == ["aa", "aa"]


def test_bpe_tiebreak_is_pair_string_order(spark):
    """Two pairs with equal counts: the SEP-joined-string-ascending one
    wins — deterministic across engines and partitionings."""
    # 'xy' and 'xz' both appear 3 times and share no positions
    merges, _ = learn_bpe(_docs(spark, ["xy xz", "xy xz", "xy xz"]),
                          n_merges=1)
    assert (merges[0][1], merges[0][2]) == ("x", "y")


def test_bpe_sep_words_excluded(spark):
    texts = [f"plain{SEP}poison plain plain"]
    merges, words = learn_bpe(_docs(spark, texts), n_merges=2)
    assert all(SEP not in r.word for r in words.collect())


def test_bpe_partitioning_invariant(spark):
    df = _docs(spark).repartition(7)
    want, _ = _py_bpe(CORPUS, 6)
    got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count)
           for r in bpe_merge_table(df, n_merges=6)
           .orderBy("merge_rank").collect()]
    assert got == want


def test_bpe_stops_when_pairs_exhausted(spark):
    merges, words = learn_bpe(_docs(spark, ["ab ab cd"]), n_merges=50)
    # 'ab' then 'cd' then nothing left to merge
    assert [(m[1], m[2]) for m in merges] == [("a", "b"), ("c", "d")]
    assert all(r.n_syms == 1 for r in
               words.selectExpr("size(syms) AS n_syms").collect())


def test_bpe_encode_counts_invariants(spark):
    from git_prov_spark.corpus.bpe import bpe_encode_counts, bpe_vocab

    docs = spark.createDataFrame(
        [(1, "low lower lowest low"), (2, "new newer low"), (3, None)],
        "doc_id long, text string")
    enc = {r.doc_id: (r.n_words, r.n_pieces)
           for r in bpe_encode_counts(docs, n_merges=4).collect()}
    # empty doc emits nothing; counts are per-pretoken sums
    assert 3 not in enc
    assert enc[1][0] == 4 and enc[2][0] == 3
    # pieces bounded: 1..len(word) per word, and merges COMPRESS:
    # total pieces strictly below total characters (merges fired)
    vocab = {r.word: r.n_syms
             for r in bpe_vocab(docs, n_merges=4).collect()}
    for d, (nw, np_) in enc.items():
        assert nw <= np_
    assert enc[1][1] == vocab["low"] * 2 + vocab["lower"] + vocab["lowest"]
