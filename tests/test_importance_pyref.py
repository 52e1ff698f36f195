"""Pure-Python third implementations of the r5 data-selection operators,
compared against the DuckDB oracle twins (no Spark, no JVM — fast).

The driver's gate proves Spark ≡ DuckDB; these prove DuckDB ≡ an
independent from-scratch Python evaluation, so a mistake written
identically into both the Spark plan and the SQL twin cannot hide
(the same triple-redundancy pattern as tests/test_oracle_parity.py)."""
from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import pandas as pd
import pytest

from git_prov_spark.corpus import oracles
from git_prov_spark.corpus.text import (EN_STOPWORDS, SURPRISAL_EMPTY,
                                        SURPRISAL_FIXED_POINT)


def h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def flog2(x: int) -> int:
    return x.bit_length() - 1


def toks(t: str | None) -> list[str]:
    return (t or "").split()


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    rows = []
    vocab_en = ["the", "a", "of", "cat", "sea", "wind", "park", "walk",
                "dawn", "is", "on", "and"]
    vocab_x = ["zorp", "blix", "quang", "vemth", "kroz", "nuvix", "grindle"]
    for i in range(40):
        if i % 4 == 0:
            words = [vocab_x[(i * 7 + j) % len(vocab_x)] for j in range(6 + i % 5)]
        else:
            words = [vocab_en[(i * 3 + j) % len(vocab_en)] for j in range(8 + i % 7)]
        rows.append((i, " ".join(words)))
    rows += [(40, ""), (41, None), (42, "one two three")]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def duck(sql: str, corpus: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", corpus)
    return con.execute(sql).fetchdf()


def test_dsir_pyref(corpus):
    B, cap, salt = 256, 24, "dsir-v1"
    tk = {r.doc_id: toks(r.text) for r in corpus.itertuples()}
    tgt = {i: len(t) > 0
           and sum(1 for w in t if w in EN_STOPWORDS) * 20 >= len(t)
           for i, t in tk.items()}
    cr, ct = Counter(), Counter()
    for i, t in tk.items():
        for w in t:
            b = h64(w) % B
            cr[b] += 1
            if tgt[i]:
                ct[b] += 1
    lratio = {b: flog2(ct[b] + 1) - flog2(cr[b] + 1) for b in cr}
    logw = {i: sum(lratio[h64(w) % B] for w in t) for i, t in tk.items()}
    lmax = max(logw.values())
    want = {}
    for i, w in logw.items():
        d = min(lmax - w, cap)
        want[i] = (w, d, h64(f"{salt}:{i}") % (1 << d) == 0)

    got = duck(oracles.sql_importance_sample("documents"), corpus)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert (r.logw_bits, r.deficit, bool(r.keep)) == want[r.doc_id], \
            r.doc_id


def test_tfidf_pyref(corpus):
    k = 3
    tf: Counter = Counter()
    for r in corpus.itertuples():
        for w in toks(r.text):
            tf[(r.doc_id, w)] += 1
    dfreq = Counter(w for (_, w) in tf)
    n = len(corpus)
    scored = [(d, w, c, dfreq[w], c * flog2(n // dfreq[w]))
              for (d, w), c in tf.items()]
    want = set()
    by_doc: dict[int, list] = {}
    for row in scored:
        by_doc.setdefault(row[0], []).append(row)
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: (-r[4], r[1]))
        want.update(rows[:k])

    got = duck(oracles.sql_tfidf_terms("documents", k=k), corpus)
    got_set = {(r.doc_id, r.token, r.tf, r.df_docs, r.score)
               for r in got.itertuples()}
    assert got_set == want


def test_surprisal_pyref(corpus):
    n_buckets = 3
    ct: Counter = Counter()
    for r in corpus.itertuples():
        ct.update(toks(r.text))
    total = sum(ct.values())
    bits = {w: flog2(total) - flog2(c) for w, c in ct.items()}
    per = {}
    for r in corpus.itertuples():
        t = toks(r.text)
        s = sum(bits[w] for w in t)
        avg = (s * SURPRISAL_FIXED_POINT) // len(t) if t else SURPRISAL_EMPTY
        per[r.doc_id] = (len(t), s, avg)
    order = sorted(per, key=lambda i: (per[i][2], i))
    n = len(order)
    want = {i: (*per[i], (rank * n_buckets) // n)
            for rank, i in enumerate(order)}

    got = duck(oracles.sql_surprisal_buckets("documents"), corpus)
    for r in got.itertuples():
        assert (r.n_tokens, r.sum_bits, r.avg_q, r.bucket) == want[r.doc_id], \
            r.doc_id


def test_novelty_pyref(corpus):
    n = 4
    sh: dict[int, set] = {}
    for r in corpus.itertuples():
        t = toks(r.text)
        sh[r.doc_id] = {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}
    dfreq = Counter(s for ss in sh.values() for s in ss)
    want = {}
    for d, ss in sh.items():
        novel = sum(1 for s in ss if dfreq[s] == 1)
        pct = (novel * 100) // len(ss) if ss else None
        want[d] = (len(ss), novel, pct)

    got = duck(oracles.sql_novelty("documents"), corpus)
    for r in got.itertuples():
        pct = None if pd.isna(r.novel_pct) else int(r.novel_pct)
        assert (r.n_shingles, r.n_novel, pct) == want[r.doc_id], r.doc_id
