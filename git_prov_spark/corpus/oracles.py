"""DuckDB oracle SQL for every corpus operator.

Each builder returns ANSI-ish SQL (DuckDB dialect) computing EXACTLY the same
result — same column names, same types (integers as BIGINT), bit-identical
hashes/doubles — as the Spark implementation in this package. Shared
constants (`hashing.py`) guarantee hash parity; identical left-to-right fold
order guarantees double parity.

The driver registers the parquet tables as views named `documents`,
`embeddings`, …; `src` parameters default to those names.
"""

from __future__ import annotations

from .hashing import (
    ANN_PLANES,
    EMBED_DIM,
    LSH_BANDS,
    LSH_ROWS,
    MERSENNE_P,
    MINHASH_PERMS,
    SIMHASH64_BAND_BITS,
    SIMHASH64_BANDS,
    SIMHASH64_BITS,
    SIMHASH_HI_SUFFIX,
    duck_h64,
    duck_hmod,
    perm_expr,
)
from .text import EN_STOPWORDS, FP_BASE

P = MERSENNE_P


def toks_cte(src: str = "documents") -> str:
    # NULL text normalized to '' to match text.norm_text (the `text` column
    # downstream — n_chars, diffs, fingerprints — sees the normalized value)
    return (
        "SELECT doc_id, CASE WHEN trim(COALESCE(text, '')) = '' "
        "THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split_regex(trim(text), '\\s+') END AS tokens, "
        f"COALESCE(text, '') AS text FROM {src}"
    )


def _stop_list() -> str:
    return "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"


def sql_token_counts(src: str = "documents") -> str:
    return (
        f"WITH toks AS ({toks_cte(src)}) "
        "SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens, "
        "CAST(length(text) AS BIGINT) AS n_chars_actual FROM toks"
    )


def sql_lang_id(src: str = "documents") -> str:
    hits = f"len(list_filter(tokens, t -> list_contains({_stop_list()}, t)))"
    return (
        f"WITH toks AS ({toks_cte(src)}) "
        f"SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens, "
        f"CAST({hits} AS BIGINT) AS n_stop_hits, "
        f"CASE WHEN len(tokens) > 0 AND {hits} * 20 >= len(tokens) "
        "THEN 'en' ELSE 'other' END AS lang_pred FROM toks"
    )


def sql_quality(src: str = "documents") -> str:
    n_stop = f"len(list_filter(tokens, t -> list_contains({_stop_list()}, t)))"
    # keep the punct class in sync with text.PUNCT_REGEX
    n_punct = (
        "length(regexp_replace(text, '[^.,;:!?''\"()\\-]', '', 'g'))"
    )
    sum_len = "list_sum(list_transform(tokens, t -> CAST(length(t) AS BIGINT)))"
    return (
        f"WITH toks AS ({toks_cte(src)}) "
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
        "CAST(len(tokens) AS BIGINT) AS n_tokens, "
        f"CAST({n_stop} AS BIGINT) AS n_stop, "
        f"CAST({n_punct} AS BIGINT) AS n_punct, "
        f"CASE WHEN len(tokens) > 0 THEN round(CAST(COALESCE({sum_len}, 0) AS DOUBLE)"
        " / len(tokens), 4) ELSE 0.0 END AS avg_token_len FROM toks"
    )


def sql_fingerprints(src: str = "documents") -> str:
    fold = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(tokens, t -> {duck_hmod('t')})), "
        f"(acc, x) -> (acc * {FP_BASE} + x) % {P})"
    )
    return (
        f"WITH toks AS ({toks_cte(src)}) "
        f"SELECT doc_id, {fold} AS fingerprint FROM toks"
    )


def sql_bpe_token_counts(src: str = "documents") -> str:
    from .text import BPE_TOKEN_PATTERN

    def n_matching(pat: str) -> str:
        return (
            f"len(list_filter(bt, t -> regexp_matches(t, '{pat}')))"
        )

    alpha = n_matching(r"^\p{L}")
    num = n_matching(r"^\p{N}")
    punct = n_matching(r"^[^\p{L}\p{N}]")
    return (
        f"WITH toks AS (SELECT doc_id, "
        f"regexp_extract_all(COALESCE(text, ''), '{BPE_TOKEN_PATTERN}') AS bt "
        f"FROM {src}) "
        "SELECT doc_id, CAST(len(bt) AS BIGINT) AS n_bpe_tokens, "
        f"CAST({alpha} AS BIGINT) AS n_alpha, "
        f"CAST({num} AS BIGINT) AS n_num, "
        f"CAST({punct} AS BIGINT) AS n_punct "
        "FROM toks"
    )


def sql_repetition_signals(src: str = "documents") -> str:
    lines = "string_split(COALESCE(text, ''), chr(10))"
    max_freq = (
        "list_max(list_transform(list_distinct(lines), "
        "d -> len(list_filter(lines, x -> x = d))))"
    )
    return (
        f"WITH l AS (SELECT doc_id, {lines} AS lines FROM {src}) "
        "SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines, "
        "CAST(len(list_distinct(lines)) AS BIGINT) AS n_distinct_lines, "
        f"CAST({max_freq} AS BIGINT) AS max_line_freq FROM l"
    )


def sql_span_exact_dupes(src: str = "documents", min_len: int = 1) -> str:
    return (
        "WITH spans AS (SELECT doc_id, "
        f"unnest(string_split(text, chr(10))) AS span FROM {src}) "
        "SELECT sha256(span) AS span_sha, "
        "count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences, "
        "min(doc_id) AS canonical_doc_id "
        f"FROM spans WHERE length(span) >= {min_len} "
        "GROUP BY 1 HAVING count(DISTINCT doc_id) > 1"
    )


def sql_exact_dupes(src: str = "documents") -> str:
    return (
        f"SELECT sha256(text) AS content_sha, min(doc_id) AS canonical_doc_id, "
        f"count(*) AS n_copies FROM {src} GROUP BY 1"
    )


def shingles_cte(n: int = 4) -> str:
    """Expects a `toks` CTE in scope; yields distinct (doc_id, shingle)."""
    parts = ", ".join(f"tokens[i + {j}]" for j in range(n))
    return (
        "SELECT DISTINCT doc_id, shingle FROM ("
        f"SELECT doc_id, unnest(CASE WHEN len(tokens) >= {n} THEN "
        f"list_transform(generate_series(1, len(tokens) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) ELSE CAST([] AS VARCHAR[]) END) AS shingle "
        "FROM toks) s"
    )


def sql_ngram_jaccard(src: str = "documents", n: int = 4, min_pct: int = 60,
                      max_df: int | None = None) -> str:
    df_filter = (
        f", rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= {max_df}), "
        "shf AS (SELECT sh.* FROM sh JOIN rare USING (shingle))"
        if max_df is not None else ", shf AS (SELECT * FROM sh)"
    )
    return (
        f"WITH toks AS ({toks_cte(src)}), sh AS ({shingles_cte(n)}){df_filter}, "
        "sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY 1), "
        "inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter "
        "FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2) "
        "SELECT d1, d2, n_inter, s1.n_sh + s2.n_sh - n_inter AS n_union "
        "FROM inter JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2 "
        f"WHERE n_inter * 100 >= {min_pct} * (s1.n_sh + s2.n_sh - n_inter)"
    )


def _minhash_sig_cte(n: int = 4, perms: list[tuple[int, int]] | None = None) -> str:
    """CTE clauses (comma-joined fragment, NO 'WITH' prologue — the caller
    composes it after its own leading CTEs); yields sig(doc_id, mh0..mhK)."""
    perms = MINHASH_PERMS if perms is None else perms
    mins = ", ".join(
        f"min({perm_expr('h', a, b)}) AS mh{i}"
        for i, (a, b) in enumerate(perms)
    )
    return (
        f"sh AS ({shingles_cte(n)}), "
        f"hs AS (SELECT doc_id, {duck_hmod('shingle')} AS h FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM hs GROUP BY doc_id)"
    )


def sql_minhash_lsh(src: str = "documents", n: int = 4,
                    perms: list[tuple[int, int]] | None = None,
                    bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> str:
    band_rows = []
    for band in range(bands):
        cols = ", ".join(
            f"CAST(mh{band * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_rows.append(
            f"SELECT doc_id, {band} AS band, md5(concat_ws('_', {cols})) AS sig_h FROM sig"
        )
    stacked = " UNION ALL ".join(band_rows)
    return (
        f"WITH toks AS ({toks_cte(src)}), {_minhash_sig_cte(n, perms)}, "
        f"stacked AS ({stacked}) "
        "SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared_bands "
        "FROM stacked a JOIN stacked b "
        "ON a.band = b.band AND a.sig_h = b.sig_h AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2"
    )


def sql_lsh_index_matches(src: str = "documents", n: int = 4,
                          new_min_id: int = 1_000_000,
                          perms: list[tuple[int, int]] | None = None,
                          bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> str:
    """DuckDB twin of dedup.lsh_index_matches with the index side =
    doc_id < new_min_id and the incoming batch = doc_id >= new_min_id:
    band collisions of each new doc against index + batch, self excluded."""
    band_rows = []
    for band in range(bands):
        cols = ", ".join(
            f"CAST(mh{band * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_rows.append(
            f"SELECT doc_id, {band} AS band, md5(concat_ws('_', {cols})) AS sig_h FROM sig"
        )
    stacked = " UNION ALL ".join(band_rows)
    return (
        f"WITH toks AS ({toks_cte(src)}), {_minhash_sig_cte(n, perms)}, "
        f"stacked AS ({stacked}) "
        "SELECT a.doc_id AS new_id, b.doc_id AS match_id, "
        "count(*) AS n_shared_bands "
        "FROM stacked a JOIN stacked b "
        "ON a.band = b.band AND a.sig_h = b.sig_h AND a.doc_id <> b.doc_id "
        f"WHERE a.doc_id >= {new_min_id} "
        "GROUP BY 1, 2"
    )


def sql_near_dup_groups(src: str = "documents", n: int = 4) -> str:
    """DuckDB twin of dedup.near_dup_groups: the LSH pair SQL feeds a
    recursive transitive closure; component = min reachable node (exactly
    what min-label propagation converges to)."""
    pairs_sql = sql_minhash_lsh(src, n=n)
    return (
        f"WITH RECURSIVE pairs AS ({pairs_sql}), "
        "e AS (SELECT d1 AS a, d2 AS b FROM pairs "
        "UNION SELECT d2, d1 FROM pairs), "
        "reach(node, r) AS ("
        "SELECT a, a FROM e "
        "UNION "
        "SELECT reach.node, e.b FROM reach JOIN e ON e.a = reach.r) "
        "SELECT node AS doc_id, min(r) AS canonical_doc_id "
        "FROM reach GROUP BY 1"
    )


def sql_simhash64_pairs(src: str = "documents", max_hamming: int = 3) -> str:
    """DuckDB twin of dedup.simhash64_near_pairs: 64-bit banded SimHash,
    band equi-join candidates, exact hamming via bit_count(xor)."""
    sums = ", ".join(
        f"sum(CASE WHEN ({'hlo' if j < 32 else 'hhi'} >> {j % 32}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH64_BITS)
    )
    band_exprs = []
    for b in range(SIMHASH64_BANDS):
        bits = " + ".join(
            f"(CASE WHEN s{b * SIMHASH64_BAND_BITS + r} > 0 "
            f"THEN {1 << r} ELSE 0 END)"
            for r in range(SIMHASH64_BAND_BITS)
        )
        band_exprs.append(f"CAST({bits} AS BIGINT) AS b{b}")
    stacked = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, b{b} AS val FROM bands"
        for b in range(SIMHASH64_BANDS)
    )
    hamming = " + ".join(
        f"bit_count(xor(x.b{i}, y.b{i}))" for i in range(SIMHASH64_BANDS)
    )
    hi_hash = duck_h64(f"t || '{SIMHASH_HI_SUFFIX}'")
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        "tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks), "
        f"hs AS (SELECT doc_id, {duck_h64('t')} AS hlo, "
        f"{hi_hash} AS hhi FROM tok), "
        f"agg AS (SELECT doc_id, {sums} FROM hs GROUP BY doc_id), "
        f"bands AS (SELECT doc_id, {', '.join(band_exprs)} FROM agg), "
        f"stacked AS ({stacked}), "
        "cands AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 "
        "FROM stacked a JOIN stacked b "
        "ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id) "
        f"SELECT d1, d2, CAST({hamming} AS BIGINT) AS hamming "
        "FROM cands JOIN bands x ON x.doc_id = d1 JOIN bands y ON y.doc_id = d2 "
        f"WHERE {hamming} <= {max_hamming}"
    )


def duck_cosine(a: str, b: str) -> str:
    """Sequential-fold cosine — fold order identical to dedup.cosine_expr."""
    dot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), "
        "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), (acc, v) -> acc + v)"
    )

    def norm(c: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform({c}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), "
            "(acc, v) -> acc + v)"
        )

    return f"({dot}) / (sqrt({norm(a)}) * sqrt({norm(b)}))"


def sql_embedding_dupes(src: str = "embeddings", threshold: float = 0.3) -> str:
    cos = duck_cosine("a.embedding", "b.embedding")
    return (
        f"SELECT a.vec_id AS v1, b.vec_id AS v2, round({cos}, 4) AS cos_r "
        f"FROM {src} a JOIN {src} b ON a.vec_id < b.vec_id "
        f"WHERE {cos} >= {threshold}"
    )


def duck_lsh_bucket(emb_col: str, n_planes: int = ANN_PLANES,
                    dim: int = EMBED_DIM) -> str:
    from .similarity import lsh_bucket_expr

    return lsh_bucket_expr(emb_col, n_planes, dim, dialect="duckdb")


def sql_lsh_buckets(src: str = "embeddings") -> str:
    return (
        f"SELECT vec_id, CAST({duck_lsh_bucket('embedding')} AS INTEGER) AS bucket "
        f"FROM {src}"
    )


def sql_topk_bruteforce(src: str = "embeddings", n_queries: int = 10, k: int = 5) -> str:
    cos = duck_cosine("q.embedding", "c.embedding")
    return (
        f"WITH scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
        f"{cos} AS cos FROM {src} q JOIN {src} c ON q.vec_id < {n_queries} "
        "AND q.vec_id <> c.vec_id), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored) "
        f"SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank "
        f"FROM ranked WHERE rank <= {k}"
    )


def sql_topk_lsh_multiprobe(src: str = "embeddings", n_queries: int = 10,
                            k: int = 5, n_planes: int = None) -> str:
    from .hashing import ANN_PLANES_WIDE
    from .similarity import lsh_bucket_expr, probe_masks

    n_planes = ANN_PLANES_WIDE if n_planes is None else n_planes
    bucket = lsh_bucket_expr("embedding", n_planes, EMBED_DIM, dialect="duckdb")
    masks = ", ".join(str(m) for m in probe_masks(n_planes))
    cos = duck_cosine("q.embedding", "c.embedding")
    return (
        f"WITH b AS (SELECT vec_id, CAST({bucket} AS INTEGER) AS bucket FROM {src}), "
        f"e AS (SELECT s.vec_id, s.embedding, b.bucket FROM {src} s "
        "JOIN b ON b.vec_id = s.vec_id), "
        f"probes AS (SELECT vec_id, embedding, "
        f"CAST(xor(bucket, m) AS INTEGER) AS bucket "
        f"FROM e, unnest([{masks}]) AS t(m) WHERE vec_id < {n_queries}), "
        f"scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos "
        "FROM probes q JOIN e c ON q.bucket = c.bucket "
        "AND q.vec_id <> c.vec_id), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored) "
        f"SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank "
        f"FROM ranked WHERE rank <= {k}"
    )


def sql_topk_lsh(src: str = "embeddings", n_queries: int = 10, k: int = 5) -> str:
    cos = duck_cosine("q.embedding", "c.embedding")
    return (
        f"WITH b AS ({sql_lsh_buckets(src)}), "
        f"e AS (SELECT s.vec_id, s.embedding, b.bucket FROM {src} s "
        "JOIN b ON b.vec_id = s.vec_id), "
        f"scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos "
        f"FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < {n_queries} "
        "AND q.vec_id <> c.vec_id), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored) "
        f"SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank "
        f"FROM ranked WHERE rank <= {k}"
    )


def sql_topk_ivf(src: str, centroids: list[list[float]], corpus_n: int,
                 n_queries: int = 10, k: int = 5, n_probes: int = 4) -> str:
    """DuckDB twin of similarity.topk_ivf: the TRAINED centroids are
    injected as double literals (repr() round-trips IEEE doubles exactly,
    and duck_cosine's fold order matches cosine_expr, so assignment and
    scoring are bit-identical to the Spark plan), then the same argmax
    assignment, per-cluster list cap, and n_probes inverted-list search."""
    from .similarity import ivf_list_cap

    cap = ivf_list_cap(corpus_n, len(centroids))
    vals = ", ".join(
        "(" + str(i) + ", ["
        + ", ".join(repr(x) for x in row)
        + "]::DOUBLE[])"
        for i, row in enumerate(centroids)
    )
    a_cos = duck_cosine("e.embedding", "c.cemb")
    q_cos = duck_cosine("q.embedding", "c.cemb")
    n_cos = duck_cosine("p.embedding", "n.embedding")
    return (
        f"WITH cents(cid, cemb) AS (VALUES {vals}), "
        f"assign0 AS (SELECT vec_id, cluster FROM ("
        f"SELECT e.vec_id, c.cid AS cluster, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {a_cos} DESC, c.cid) AS rn "
        f"FROM {src} e, cents c) WHERE rn = 1), "
        f"assign AS (SELECT vec_id, cluster FROM ("
        f"SELECT vec_id, cluster, row_number() OVER ("
        f"PARTITION BY cluster ORDER BY vec_id) AS ln FROM assign0) "
        f"WHERE ln <= {cap}), "
        f"probes AS (SELECT query_id, embedding, cluster FROM ("
        f"SELECT q.vec_id AS query_id, q.embedding, c.cid AS cluster, "
        f"row_number() OVER (PARTITION BY q.vec_id "
        f"ORDER BY {q_cos} DESC, c.cid) AS rn "
        f"FROM {src} q, cents c WHERE q.vec_id < {n_queries}) "
        f"WHERE rn <= {n_probes}), "
        f"scored AS (SELECT p.query_id, n.vec_id AS neighbor_id, {n_cos} AS cos "
        f"FROM probes p JOIN assign a ON a.cluster = p.cluster "
        f"JOIN {src} n ON n.vec_id = a.vec_id "
        "WHERE p.query_id <> n.vec_id), "
        "ranked AS (SELECT query_id, neighbor_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored) "
        f"SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank "
        f"FROM ranked WHERE rank <= {k}"
    )


def sql_media_features(src: str = "documents") -> str:
    return (
        f"SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes, "
        f"sha256(text) AS media_sha FROM {src}"
    )


def sql_frame_samples(src: str = "documents", n_frames: int = 4,
                      frame_hex: int = 64) -> str:
    return (
        f"WITH hx AS (SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS h FROM {src}), "
        f"frames AS (SELECT doc_id, unnest(generate_series(0, {n_frames - 1})) AS f, h "
        "FROM hx) "
        "SELECT doc_id, CAST(f AS INTEGER) AS frame_idx, "
        f"md5(substr(h, f * {frame_hex} + 1, {frame_hex})) AS frame_sha "
        f"FROM frames WHERE substr(h, f * {frame_hex} + 1, {frame_hex}) <> ''"
    )


def sql_diffstats(src: str = "documents") -> str:
    """Multiset token diff between consecutive doc_ids — the SQL twin of the
    pipeline's Arrow-batched diff_stats_udf (pipeline/diffstats.py).

    Zero-token docs: the Spark side array_joins an empty token list into '',
    which the UDF counts as ONE empty line (pipeline semantics: '' is a
    line — see tests/test_diffstats.py goldens). The tc CTE mirrors that
    with a synthetic ('', 1) row per empty doc, so single- and double-empty
    pairs agree instead of vanishing from the inner join."""
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        "tc AS (SELECT doc_id, t, count(*) AS n FROM "
        "(SELECT doc_id, unnest(tokens) AS t FROM toks) u GROUP BY 1, 2 "
        "UNION ALL SELECT doc_id, '' AS t, 1 AS n FROM toks "
        "WHERE len(tokens) = 0), "
        f"pairs AS (SELECT a.doc_id AS d_old, b.doc_id AS d_new FROM {src} a "
        f"JOIN {src} b ON b.doc_id = a.doc_id + 1), "
        "deltas AS (SELECT p.d_old, p.d_new, t.t, "
        "sum(CASE WHEN t.doc_id = p.d_new THEN t.n ELSE -t.n END) AS delta "
        "FROM pairs p JOIN tc t ON t.doc_id IN (p.d_old, p.d_new) GROUP BY 1, 2, 3) "
        "SELECT d_old, d_new, CAST(sum(greatest(delta, 0)) AS INTEGER) AS additions, "
        "CAST(sum(greatest(-delta, 0)) AS INTEGER) AS deletions, "
        "CAST(sum(greatest(delta, 0)) + sum(greatest(-delta, 0)) AS INTEGER) AS changes "
        "FROM deltas GROUP BY 1, 2"
    )


def sql_training_manifest(src: str = "documents", min_tokens: int = 5,
                          max_punct_pct: int = 20, n: int = 4) -> str:
    """DuckDB twin of curate.training_manifest: the four gate queries nest as
    subqueries (each carries its own WITH) and meet in joins on doc_id; the
    CASE mirrors the first-match-wins gate order."""
    inner = (
        f"WITH ex AS (SELECT d.doc_id, e.canonical_doc_id AS exact_canonical "
        f"FROM {src} d JOIN ({sql_exact_dupes(src)}) e "
        "ON sha256(d.text) = e.content_sha), "
        f"near AS (SELECT * FROM ({sql_near_dup_groups(src, n=n)}) nq), "
        f"lang AS (SELECT doc_id, lang_pred FROM ({sql_lang_id(src)}) lq), "
        f"qual AS (SELECT doc_id, n_tokens, n_punct, n_chars "
        f"FROM ({sql_quality(src)}) qq) "
        "SELECT ex.doc_id, CASE "
        "WHEN ex.exact_canonical <> ex.doc_id THEN 'exact_dup' "
        "WHEN near.canonical_doc_id IS NOT NULL "
        "AND near.canonical_doc_id <> ex.doc_id THEN 'near_dup' "
        "WHEN lang.lang_pred <> 'en' THEN 'lang' "
        f"WHEN qual.n_tokens < {min_tokens} "
        f"OR qual.n_punct * 100 > {max_punct_pct} * qual.n_chars THEN 'quality' "
        "ELSE 'kept' END AS reason "
        "FROM ex LEFT JOIN near ON near.doc_id = ex.doc_id "
        "JOIN lang ON lang.doc_id = ex.doc_id "
        "JOIN qual ON qual.doc_id = ex.doc_id"
    )
    return (
        f"SELECT doc_id, reason, CAST(reason = 'kept' AS BIGINT) AS keep "
        f"FROM ({inner}) m"
    )


def sql_incremental_manifest(src: str = "documents",
                             new_min_id: int = 1_000_000,
                             min_tokens: int = 5, max_punct_pct: int = 20,
                             n: int = 4) -> str:
    """DuckDB twin of curate.incremental_manifest with the id-threshold
    convention: corpus = doc_id < new_min_id (its shas are `known`, its
    bands the index), batch = doc_id >= new_min_id. The near gate reuses
    sql_lsh_index_matches; the reject rule mirrors the Spark side —
    indexed match (id below threshold) or smaller batch twin."""
    matches = sql_lsh_index_matches(src, n=n, new_min_id=new_min_id)
    inner = (
        f"WITH b AS (SELECT doc_id, text FROM {src} "
        f"WHERE doc_id >= {new_min_id}), "
        f"known AS (SELECT DISTINCT sha256(text) AS content_sha FROM {src} "
        f"WHERE doc_id < {new_min_id}), "
        "bsha AS (SELECT doc_id, sha256(text) AS content_sha FROM b), "
        "bmin AS (SELECT content_sha, min(doc_id) AS batch_min FROM bsha "
        "GROUP BY 1), "
        f"m AS (SELECT * FROM ({matches}) mq), "
        f"nh AS (SELECT DISTINCT new_id AS doc_id FROM m "
        f"WHERE match_id < {new_min_id} OR match_id < new_id), "
        f"lang AS (SELECT doc_id, lang_pred FROM ({sql_lang_id('b')}) lq), "
        "qual AS (SELECT doc_id, n_tokens, n_punct, n_chars "
        f"FROM ({sql_quality('b')}) qq) "
        "SELECT bsha.doc_id, CASE "
        "WHEN known.content_sha IS NOT NULL "
        "OR bmin.batch_min <> bsha.doc_id THEN 'exact_dup' "
        "WHEN nh.doc_id IS NOT NULL THEN 'near_dup' "
        "WHEN lang.lang_pred <> 'en' THEN 'lang' "
        f"WHEN qual.n_tokens < {min_tokens} "
        f"OR qual.n_punct * 100 > {max_punct_pct} * qual.n_chars "
        "THEN 'quality' ELSE 'kept' END AS reason "
        "FROM bsha "
        "LEFT JOIN known ON known.content_sha = bsha.content_sha "
        "JOIN bmin ON bmin.content_sha = bsha.content_sha "
        "LEFT JOIN nh ON nh.doc_id = bsha.doc_id "
        "JOIN lang ON lang.doc_id = bsha.doc_id "
        "JOIN qual ON qual.doc_id = bsha.doc_id"
    )
    return (
        "SELECT doc_id, reason, CAST(reason = 'kept' AS BIGINT) AS keep "
        f"FROM ({inner}) z"
    )


def sql_dataset_splits(src: str = "documents", salt: str = "split-v1",
                       weights: list[tuple[str, int]] | None = None) -> str:
    """DuckDB twin of curate.dataset_splits (portable md5 bucketing)."""
    if weights is None:
        weights = [("train", 9800), ("val", 100), ("test", 100)]
    bucket = duck_h64(f"'{salt}' || ':' || CAST(doc_id AS VARCHAR)") + " % 10000"
    cases, cum = [], 0
    for name, share in weights:
        cum += share
        cases.append(f"WHEN ({bucket}) < {cum} THEN '{name}'")
    return (
        f"SELECT doc_id, CASE {' '.join(cases)} END AS split FROM {src}"
    )


def sql_chunk_documents(src: str = "documents", window: int = 512,
                        overlap: int = 64) -> str:
    """DuckDB twin of text.chunk_documents (token windows with overlap)."""
    stride = window - overlap
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        "c AS (SELECT doc_id, tokens, "
        f"unnest(generate_series(0, len(tokens) - 1, {stride})) AS start "
        "FROM toks WHERE len(tokens) > 0) "
        f"SELECT doc_id, CAST(start / {stride} AS BIGINT) AS chunk_idx, "
        f"array_to_string(tokens[start + 1 : start + {window}], ' ') AS chunk_text, "
        f"CAST(least({window}, len(tokens) - start) AS BIGINT) AS n_tokens "
        "FROM c"
    )


def sql_contamination(src: str = "documents", n: int = 4,
                      eval_mod: int = 10) -> str:
    """DuckDB twin of decontam.contamination_report over a deterministic
    doc_id-stride eval split (eval = doc_id % eval_mod == 0)."""
    return (
        f"WITH toks AS ({toks_cte(src)}), sh AS ({shingles_cte(n)}), "
        f"ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {eval_mod} = 0), "
        f"tr AS (SELECT * FROM sh WHERE doc_id % {eval_mod} <> 0), "
        "hits AS (SELECT doc_id, count(*) AS n_hits FROM tr "
        "JOIN ev USING (shingle) GROUP BY 1) "
        "SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "COALESCE(h.n_hits, 0) > 0 AS contaminated "
        f"FROM {src} d LEFT JOIN hits h USING (doc_id) "
        f"WHERE d.doc_id % {eval_mod} <> 0"
    )


def sql_pii_scrub(src: str = "documents") -> str:
    """DuckDB twin of text.pii_scrub — identical RE2/Java-portable
    patterns, identical progressive-scrub counting order."""
    from .text import PII_EMAIL, PII_IPV4, PII_LONGNUM

    t0 = "COALESCE(text, '')"
    t1 = f"regexp_replace({t0}, '{PII_EMAIL}', '[EMAIL]', 'g')"
    t2 = f"regexp_replace({t1}, '{PII_IPV4}', '[IP]', 'g')"
    t3 = f"regexp_replace({t2}, '{PII_LONGNUM}', '[NUM]', 'g')"
    return (
        "SELECT doc_id, "
        f"CAST(len(regexp_extract_all({t0}, '{PII_EMAIL}')) AS BIGINT) AS n_emails, "
        f"CAST(len(regexp_extract_all({t1}, '{PII_IPV4}')) AS BIGINT) AS n_ips, "
        f"CAST(len(regexp_extract_all({t2}, '{PII_LONGNUM}')) AS BIGINT) AS n_longnums, "
        f"{t3} AS scrubbed, sha256({t3}) AS scrubbed_sha FROM {src}"
    )


def sql_stratified_sample(src: str, rates: list[tuple[str, int]],
                          salt: str = "mix-v1",
                          default_rate: int = 0) -> str:
    """DuckDB twin of curate.stratified_sample — `src` must yield
    (doc_id, stratum)."""
    bucket = duck_h64(f"'{salt}' || ':' || CAST(doc_id AS VARCHAR)") + " % 10000"
    cases = " ".join(
        f"WHEN stratum = '{name}' THEN {share}" for name, share in rates
    )
    return (
        f"SELECT doc_id, stratum, "
        f"({bucket}) < (CASE {cases} ELSE {default_rate} END) AS sampled "
        f"FROM {src}"
    )


def sql_dedup_semantic(src: str, centroids: list[list[float]], corpus_n: int,
                       threshold: float) -> str:
    """DuckDB twin of similarity.semantic_dupes: trained centroids injected
    as double literals, same argmax-cosine assignment, same ivf_list_cap on
    pair participation, same min-id keep rule. duck_cosine's fold order
    matches cosine_dot_expr (hoisted norms are the identical IEEE ops), so
    the >= threshold cut lands on bit-identical doubles."""
    from .similarity import ivf_list_cap

    cap = ivf_list_cap(corpus_n, len(centroids))
    vals = ", ".join(
        "(" + str(i) + ", ["
        + ", ".join(repr(x) for x in row)
        + "]::DOUBLE[])"
        for i, row in enumerate(centroids)
    )
    a_cos = duck_cosine("e.embedding", "c.cemb")
    p_cos = duck_cosine("ea.embedding", "eb.embedding")
    return (
        f"WITH cents(cid, cemb) AS (VALUES {vals}), "
        f"assign AS (SELECT vec_id, cluster FROM ("
        f"SELECT e.vec_id, c.cid AS cluster, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {a_cos} DESC, c.cid) AS rn "
        f"FROM {src} e, cents c) WHERE rn = 1), "
        f"capped AS (SELECT vec_id, cluster FROM ("
        f"SELECT vec_id, cluster, row_number() OVER ("
        f"PARTITION BY cluster ORDER BY vec_id) AS ln FROM assign) "
        f"WHERE ln <= {cap}), "
        f"dropped AS (SELECT DISTINCT b.vec_id "
        f"FROM capped a JOIN capped b "
        f"ON a.cluster = b.cluster AND a.vec_id < b.vec_id "
        f"JOIN {src} ea ON ea.vec_id = a.vec_id "
        f"JOIN {src} eb ON eb.vec_id = b.vec_id "
        f"WHERE {p_cos} >= {threshold!r}) "
        f"SELECT s.vec_id, CAST(s.cluster AS INTEGER) AS cluster, "
        f"d.vec_id IS NULL AS kept "
        f"FROM assign s LEFT JOIN dropped d ON d.vec_id = s.vec_id"
    )


def sql_cluster_sample(src: str, centroids: list[list[float]],
                       per_cluster: int, salt: str = "cbs-v1") -> str:
    """DuckDB twin of curate.cluster_balanced_sample: trained centroids
    injected as double literals, same argmax-cosine assignment as
    sql_dedup_semantic, winners = the per_cluster smallest
    (hash(salt:id), id) pairs per cluster (the Spark two-phase cap is
    semantics-preserving, so one global rank reproduces it exactly)."""
    vals = ", ".join(
        "(" + str(i) + ", ["
        + ", ".join(repr(x) for x in row)
        + "]::DOUBLE[])"
        for i, row in enumerate(centroids)
    )
    a_cos = duck_cosine("e.embedding", "c.cemb")
    h = duck_h64(f"'{salt}' || ':' || CAST(vec_id AS VARCHAR)")
    return (
        f"WITH cents(cid, cemb) AS (VALUES {vals}), "
        f"assign AS (SELECT vec_id, cluster FROM ("
        f"SELECT e.vec_id, c.cid AS cluster, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {a_cos} DESC, c.cid) AS rn "
        f"FROM {src} e, cents c) WHERE rn = 1), "
        f"ranked AS (SELECT vec_id, cluster, row_number() OVER ("
        f"PARTITION BY cluster ORDER BY {h}, vec_id) AS rk FROM assign) "
        f"SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, "
        f"rk <= {per_cluster} AS kept FROM ranked"
    )


def sql_source_quota(src: str, quota: int, salt: str = "quota-v1") -> str:
    """DuckDB twin of curate.source_quota: the two-phase Spark cap is
    semantics-preserving, so one global rank reproduces it exactly."""
    h = duck_h64(f"'{salt}' || ':' || CAST(doc_id AS VARCHAR)")
    return (
        f"WITH hashed AS (SELECT doc_id, source, {h} AS hv FROM {src}), "
        f"ranked AS (SELECT doc_id, source, row_number() OVER ("
        f"PARTITION BY source ORDER BY hv, doc_id) AS rk FROM hashed) "
        f"SELECT doc_id, source, rk <= {quota} AS kept FROM ranked"
    )


def sql_vocabulary(src: str = "documents", top_k: int = 100) -> str:
    """DuckDB twin of text.vocabulary(top_k=top_k): global term counts,
    top-K by (n_total DESC, token) — the LIMIT makes the count-ordering
    hash-observable."""
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        "flat AS (SELECT doc_id, unnest(tokens) AS token FROM toks) "
        "SELECT token, COUNT(*) AS n_total, "
        "COUNT(DISTINCT doc_id) AS n_docs "
        f"FROM flat GROUP BY token ORDER BY n_total DESC, token "
        f"LIMIT {top_k}"
    )


def sql_training_order(src: str = "documents", seed: int = 0,
                       n_shards: int = 64) -> str:
    """DuckDB twin of curate.training_order: same portable 60-bit hash →
    same shard assignment and same within-shard rank."""
    h = duck_h64(f"'shuffle:{seed}:' || CAST(doc_id AS VARCHAR)")
    return (
        f"WITH h AS (SELECT doc_id, {h} AS hh FROM {src}) "
        f"SELECT doc_id, CAST(hh % {n_shards} AS INTEGER) AS shard, "
        "CAST(row_number() OVER ("
        f"PARTITION BY hh % {n_shards} ORDER BY hh, doc_id) AS BIGINT)"
        " AS pos FROM h"
    )


def sql_quality_gate(src: str = "documents") -> str:
    from .text import (GATE_MAX_MEAN_LEN, GATE_MAX_PUNCT_PCT, GATE_MAX_WORDS,
                       GATE_MIN_MEAN_LEN, GATE_MIN_STOP_HITS, GATE_MIN_WORDS)

    n_stop = f"len(list_filter(tokens, t -> list_contains({_stop_list()}, t)))"
    n_punct = "length(regexp_replace(text, '[^.,;:!?''\"()\\-]', '', 'g'))"
    sum_len = ("COALESCE(list_sum(list_transform(tokens, "
               "t -> CAST(length(t) AS BIGINT))), 0)")
    lines = "string_split(text, chr(10))"
    max_freq = ("list_max(list_transform(list_distinct(lines), "
                "d -> len(list_filter(lines, x -> x = d))))")
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        f"sig AS (SELECT doc_id, len(tokens) AS n_tokens, {sum_len} AS sum_len, "
        f"length(text) AS n_chars, {n_punct} AS n_punct, {n_stop} AS n_stop, "
        f"len({lines}) AS n_lines, "
        f"(SELECT {max_freq} FROM (SELECT {lines} AS lines)) AS max_line_freq "
        "FROM toks), "
        "rules AS (SELECT doc_id, "
        f"n_tokens >= {GATE_MIN_WORDS} AND n_tokens <= {GATE_MAX_WORDS} "
        "AS r_wordcount, "
        f"n_tokens > 0 AND {GATE_MIN_MEAN_LEN} * n_tokens <= sum_len "
        f"AND sum_len <= {GATE_MAX_MEAN_LEN} * n_tokens AS r_meanlen, "
        f"{GATE_MAX_PUNCT_PCT} * n_punct <= n_chars AS r_symbol, "
        f"n_stop >= {GATE_MIN_STOP_HITS} AS r_stopword, "
        "n_lines <= 1 OR max_line_freq * 2 <= n_lines AS r_dupline "
        "FROM sig) "
        "SELECT doc_id, r_wordcount, r_meanlen, r_symbol, r_stopword, "
        "r_dupline, r_wordcount AND r_meanlen AND r_symbol AND r_stopword "
        "AND r_dupline AS keep FROM rules"
    )


def sql_bigram_stats(src: str = "documents", top_k: int = 200,
                     min_total: int = 2) -> str:
    from .text import BPE_TOKEN_PATTERN

    return (
        f"WITH toks AS (SELECT doc_id, "
        f"regexp_extract_all(COALESCE(text, ''), '{BPE_TOKEN_PATTERN}') AS bt "
        f"FROM {src}), "
        "pairs AS (SELECT doc_id, bt[i] || ' ' || bt[i + 1] AS pair "
        "FROM toks, UNNEST(generate_series(1, len(bt) - 1)) AS t(i) "
        "WHERE len(bt) >= 2) "
        "SELECT pair, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs "
        f"FROM pairs GROUP BY pair HAVING COUNT(*) >= {min_total} "
        f"ORDER BY n_total DESC, pair LIMIT {top_k}"
    )


def _duck_flog2(expr: str) -> str:
    """DuckDB twin of curate.flog2: integer floor(log2(x)) via
    length(bin(x))-1. The CAST matters — DuckDB SUM() returns HUGEINT,
    and bin() must see the same 64-bit lexical form Spark's bin() sees."""
    return f"(length(bin(CAST({expr} AS BIGINT))) - 1)"


def sql_importance_sample(src: str = "documents", n_buckets: int = 256,
                          cap: int = 24, salt: str = "dsir-v1") -> str:
    """DuckDB twin of curate.importance_sample with the stopword-ratio
    'en' predicate as the target domain: same portable token-bucket hash,
    same integer-bit log-likelihood ratios, same power-of-two acceptance
    rule — bit-identical keep decisions."""
    hits = f"len(list_filter(tokens, t -> list_contains({_stop_list()}, t)))"
    hdoc = duck_h64(f"'{salt}' || ':' || CAST(doc_id AS VARCHAR)")
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        f"lang AS (SELECT doc_id, len(tokens) > 0 AND {hits} * 20 >= "
        "len(tokens) AS tgt, tokens FROM toks), "
        "tok AS (SELECT doc_id, tgt, unnest(tokens) AS token FROM lang), "
        f"db AS (SELECT doc_id, tgt, {duck_h64('token')} % {n_buckets} "
        "AS bucket, COUNT(*) AS n_db FROM tok GROUP BY 1, 2, 3), "
        "stats AS (SELECT bucket, "
        f"{_duck_flog2('SUM(CASE WHEN tgt THEN n_db ELSE 0 END) + 1')} - "
        f"{_duck_flog2('SUM(n_db) + 1')} AS l FROM db GROUP BY bucket), "
        "perdoc AS (SELECT doc_id, CAST(SUM(n_db * l) AS BIGINT) AS logw "
        "FROM db JOIN stats USING (bucket) GROUP BY doc_id), "
        f"scored AS (SELECT d.doc_id, COALESCE(p.logw, 0) AS logw_bits "
        f"FROM {src} d LEFT JOIN perdoc p ON d.doc_id = p.doc_id), "
        "mx AS (SELECT MAX(logw_bits) AS lmax FROM scored) "
        "SELECT doc_id, CAST(logw_bits AS BIGINT) AS logw_bits, "
        f"CAST(LEAST(lmax - logw_bits, {cap}) AS INTEGER) AS deficit, "
        f"({hdoc} % (CAST(1 AS BIGINT) << "
        f"CAST(LEAST(lmax - logw_bits, {cap}) AS INTEGER))) = 0 AS keep "
        "FROM scored, mx"
    )


def sql_tfidf_terms(src: str = "documents", k: int = 3) -> str:
    """DuckDB twin of text.tfidf_terms: integer-quantized IDF
    (flog2(n_docs // df)), top-k per doc by (score DESC, token)."""
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        "flat AS (SELECT doc_id, unnest(tokens) AS token FROM toks), "
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM flat "
        "GROUP BY 1, 2), "
        "dfq AS (SELECT token, COUNT(*) AS df_docs FROM tf GROUP BY token), "
        f"nd AS (SELECT COUNT(*) AS n FROM {src}), "
        "scored AS (SELECT doc_id, token, tf, df_docs, "
        f"tf * {_duck_flog2('n // df_docs')} AS score "
        "FROM tf JOIN dfq USING (token), nd) "
        "SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, "
        "CAST(df_docs AS BIGINT) AS df_docs, CAST(score AS BIGINT) AS score "
        "FROM (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score DESC, token) AS rk FROM scored) "
        f"WHERE rk <= {k}"
    )


def sql_surprisal_buckets(src: str = "documents", n_buckets: int = 3) -> str:
    """DuckDB twin of text.surprisal_buckets: integer-bit unigram
    surprisal, fixed-point mean, rank-exact equal-population buckets."""
    from .text import SURPRISAL_EMPTY, SURPRISAL_FIXED_POINT

    return (
        f"WITH toks AS ({toks_cte(src)}), "
        "flat AS (SELECT doc_id, unnest(tokens) AS token FROM toks), "
        "ct AS (SELECT token, COUNT(*) AS c FROM flat GROUP BY token), "
        "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM ct), "
        f"bits AS (SELECT token, {_duck_flog2('t')} - {_duck_flog2('c')} "
        "AS b FROM ct, tot), "
        "perdoc AS (SELECT doc_id, COUNT(*) AS n_tokens, "
        "CAST(SUM(b) AS BIGINT) AS sum_bits "
        "FROM flat JOIN bits USING (token) GROUP BY doc_id), "
        "scored AS (SELECT d.doc_id, "
        "CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(sum_bits, 0) AS BIGINT) AS sum_bits, "
        "CASE WHEN COALESCE(n_tokens, 0) > 0 THEN "
        f"(COALESCE(sum_bits, 0) * {SURPRISAL_FIXED_POINT}) // n_tokens "
        f"ELSE {SURPRISAL_EMPTY} END AS avg_q "
        f"FROM {src} d LEFT JOIN perdoc USING (doc_id)), "
        f"n AS (SELECT COUNT(*) AS nt FROM {src}) "
        "SELECT doc_id, n_tokens, sum_bits, CAST(avg_q AS BIGINT) AS avg_q, "
        "CAST(((row_number() OVER (ORDER BY avg_q, doc_id) - 1) "
        f"* {n_buckets}) // nt AS INTEGER) AS bucket FROM scored, n"
    )


def sql_novelty(src: str = "documents", n: int = 4) -> str:
    """DuckDB twin of text.novelty_scores: df==1 shingles over the same
    distinct (doc, shingle) relation, integer-exact percentage."""
    return (
        f"WITH toks AS ({toks_cte(src)}), sh AS ({shingles_cte(n)}), "
        "dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle), "
        "perdoc AS (SELECT doc_id, COUNT(*) AS n_shingles, "
        "SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_novel "
        "FROM sh JOIN dfreq USING (shingle) GROUP BY doc_id) "
        "SELECT d.doc_id, "
        "CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles, "
        "CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel, "
        "CASE WHEN COALESCE(n_shingles, 0) > 0 THEN "
        "CAST((n_novel * 100) // n_shingles AS BIGINT) ELSE NULL END "
        f"AS novel_pct FROM {src} d LEFT JOIN perdoc USING (doc_id)"
    )


def sql_semantic_contamination(src: str = "embeddings",
                               threshold: float = 0.8,
                               eval_mod: int = 10) -> str:
    """DuckDB twin of decontam.semantic_contamination over the
    deterministic vec_id-stride eval split (eval = vec_id % eval_mod == 0):
    identical hash-derived hyperplane buckets, identical hamming-1 probe
    expansion, identical left-fold cosine — bit-identical hits."""
    from .similarity import probe_masks

    masks = ", ".join(str(m) for m in probe_masks(ANN_PLANES))
    bkt = duck_lsh_bucket("embedding")
    cos = duck_cosine("t.embedding", "e.embedding")
    return (
        f"WITH tr AS (SELECT vec_id, embedding, CAST({bkt} AS INTEGER) AS b "
        f"FROM {src} WHERE vec_id % {eval_mod} <> 0), "
        f"ev0 AS (SELECT vec_id AS eid, embedding, CAST({bkt} AS INTEGER) "
        f"AS b0 FROM {src} WHERE vec_id % {eval_mod} = 0), "
        f"ev AS (SELECT eid, embedding, xor(b0, m) AS b FROM ev0, "
        f"unnest([{masks}]) AS u(m)), "
        "hits AS (SELECT t.vec_id, COUNT(*) AS n_hits, "
        f"round(MAX({cos}), 4) AS max_cos_r "
        "FROM tr t JOIN ev e USING (b) "
        f"WHERE {cos} >= {threshold} GROUP BY t.vec_id) "
        "SELECT d.vec_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "h.max_cos_r AS max_cos_r, COALESCE(h.n_hits, 0) > 0 AS contaminated "
        f"FROM (SELECT vec_id FROM {src} WHERE vec_id % {eval_mod} <> 0) d "
        "LEFT JOIN hits h USING (vec_id)"
    )


def _bpe_cte_chain(src: str, n_merges: int) -> str:
    """Shared CTE chain for the BPE twins: word frequencies, char-split
    symbols, then per round (pair count → argmax by (cnt DESC, pair) →
    greedy leftmost fold). The fold is list_reduce over a list-of-lists
    lift (acc and elements both list<string>, DuckDB's fixed-acc-type
    constraint) — the SAME left fold bpe._apply_merge runs, so every
    intermediate tokenization is identical and all n_merges argmaxes
    match the Spark loop exactly."""
    from .text import BPE_TOKEN_PATTERN

    parts = [
        ("v AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM "
         "(SELECT unnest(regexp_extract_all(COALESCE(text, ''), "
         f"'{BPE_TOKEN_PATTERN}')) AS word FROM {src}) "
         "WHERE strpos(word, chr(31)) = 0 GROUP BY word)"),
        ("w0 AS (SELECT word, freq, list_transform(range(1, "
         "length(word) + 1), i -> word[i]) AS syms FROM v)"),
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"pc{k} AS (SELECT pair, SUM(freq) AS cnt FROM "
            "(SELECT freq, unnest(list_transform(range(1, len(syms)), "
            f"i -> syms[i] || chr(31) || syms[i + 1])) AS pair FROM w{k-1}) "
            "GROUP BY pair)")
        parts.append(
            f"win{k} AS (SELECT string_split(pair, chr(31))[1] AS wa, "
            "string_split(pair, chr(31))[2] AS wb, cnt FROM "
            f"pc{k} ORDER BY cnt DESC, pair LIMIT 1)")
        parts.append(
            f"w{k} AS (SELECT word, freq, list_reduce("
            "list_transform(syms, s -> [s]), (acc, x) -> CASE WHEN "
            "len(acc) > 0 AND acc[-1] = wa AND x[1] = wb THEN "
            "list_append(acc[1:len(acc)-1], wa || wb) ELSE "
            f"list_append(acc, x[1]) END) AS syms FROM w{k-1}, win{k})")
    return "WITH " + ", ".join(parts)


def sql_bpe_merges(src: str = "documents", n_merges: int = 8) -> str:
    """DuckDB twin of bpe.bpe_merge_table."""
    rows = " UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS merge_rank, wa AS lhs, "
        f"wb AS rhs, CAST(cnt AS BIGINT) AS pair_count FROM win{k}"
        for k in range(1, n_merges + 1)
    )
    return f"{_bpe_cte_chain(src, n_merges)} {rows}"


def sql_bpe_vocab(src: str = "documents", n_merges: int = 8) -> str:
    """DuckDB twin of bpe.bpe_vocab."""
    return (
        f"{_bpe_cte_chain(src, n_merges)} "
        "SELECT word, freq, CAST(len(syms) AS BIGINT) AS n_syms, "
        f"array_to_string(syms, ' ') AS toks FROM w{n_merges}"
    )


def sql_hll_registers(src: str, col: str, p: int = 8) -> str:
    """DuckDB twin of sketches.hll_registers: identical portable hash,
    identical integer leading-zero rank via length(bin(w))."""
    vbits = 60 - p
    mask = (1 << vbits) - 1
    h = duck_h64(f"CAST({col} AS VARCHAR)")
    return (
        f"WITH hx AS (SELECT CAST(({h} >> {vbits}) AS INTEGER) AS bucket, "
        f"({h} & {mask}) AS w FROM {src} WHERE {col} IS NOT NULL) "
        f"SELECT bucket, CAST(MAX(CASE WHEN w = 0 THEN {vbits + 1} "
        f"ELSE {vbits} - (length(bin(CAST(w AS BIGINT))) - 1) END) "
        "AS INTEGER) AS rho FROM hx GROUP BY bucket"
    )


def sql_hll_estimate(src: str, col: str, p: int = 8) -> str:
    """DuckDB twin of sketches.hll_estimate: the same bucket-ordered
    left fold of exact power-of-two reciprocals (sql_pagerank's
    list_prepend + list_reduce shape), same repr()-embedded alpha — the
    raw_est double matches bit-for-bit."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return (
        f"WITH regs AS ({sql_hll_registers(src, col, p)}), "
        "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_present, "
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(CAST(1.0 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << rho) "
        "AS DOUBLE) ORDER BY bucket)), (acc, x) -> acc + x) "
        "AS s_present FROM regs), "
        f"e AS (SELECT CAST(COUNT(DISTINCT {col}) AS BIGINT) "
        f"AS exact_distinct FROM {src} WHERE {col} IS NOT NULL) "
        "SELECT *, CAST(floor(abs(raw_est - exact_distinct) * 10000.0 "
        "/ exact_distinct) AS BIGINT) AS err_bp FROM ("
        f"SELECT CAST({m} AS BIGINT) AS m, n_present, "
        f"CAST({m} - n_present AS BIGINT) AS n_zero, "
        f"CAST({alpha!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE) "
        f"/ (s_present + CAST({m} - n_present AS DOUBLE)) AS raw_est, "
        "exact_distinct FROM a, e)"
    )


def _duck_cms_idx(col: str, d: int, w: int) -> list[str]:
    """DuckDB twins of sketches._cms_idx_exprs — same portable hash,
    same MinHash permutation constants, same mod-w fold."""
    h = duck_hmod(f"CAST({col} AS VARCHAR)")
    return [
        f"CAST(({perm_expr(h, *MINHASH_PERMS[i])}) % {w} AS INTEGER)"
        for i in range(d)
    ]


def sql_cms_counters(src: str, col: str, d: int = 4, w: int = 256) -> str:
    """DuckDB twin of sketches.cms_counters."""
    idx = _duck_cms_idx(col, d, w)
    arms = " UNION ALL ".join(
        f"SELECT {i} AS hrow, {idx[i]} AS idx FROM {src} "
        f"WHERE {col} IS NOT NULL"
        for i in range(d)
    )
    return (
        f"SELECT hrow, idx, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM ({arms}) GROUP BY hrow, idx"
    )


def sql_cms_estimates(src: str, col: str, k: int = 50,
                      d: int = 4, w: int = 256) -> str:
    """DuckDB twin of sketches.cms_estimates: exact counts per value,
    re-hash the value through the same d index expressions, min over the
    joined counter cells, top-k by (est DESC, value)."""
    idx = _duck_cms_idx("value", d, w)
    probes = " UNION ALL ".join(
        f"SELECT value, exact_cnt, {i} AS hrow, {idx[i]} AS idx FROM e"
        for i in range(d)
    )
    return (
        f"WITH cnts AS ({sql_cms_counters(src, col, d, w)}), "
        f"e AS (SELECT {col} AS value, CAST(COUNT(*) AS BIGINT) "
        f"AS exact_cnt FROM {src} WHERE {col} IS NOT NULL GROUP BY 1), "
        f"vc AS ({probes}), "
        "est AS (SELECT value, exact_cnt, MIN(cnt) AS est_cnt "
        "FROM vc JOIN cnts USING (hrow, idx) GROUP BY 1, 2) "
        "SELECT value, exact_cnt, est_cnt, est_cnt - exact_cnt "
        f"AS overcount FROM est ORDER BY est_cnt DESC, value LIMIT {k}"
    )


def _duck_bloom_pos(col: str, m: int, k: int) -> list[str]:
    h = duck_hmod(f"CAST({col} AS VARCHAR)")
    return [f"(({perm_expr(h, *MINHASH_PERMS[i])}) % {m})" for i in range(k)]


def sql_bloom_bits(src: str, col: str, m: int = 16384, k: int = 4) -> str:
    """DuckDB twin of sketches.bloom_bits."""
    arms = " UNION ALL ".join(
        f"SELECT {p} AS pos FROM {src} WHERE {col} IS NOT NULL"
        for p in _duck_bloom_pos(col, m, k)
    )
    return (
        "SELECT CAST(pos // 64 AS INTEGER) AS word_idx, "
        "bit_or(CASE WHEN CAST(pos % 64 AS INTEGER) = 63 THEN CAST(-9223372036854775808 AS BIGINT) ELSE CAST(1 AS BIGINT) << CAST(pos % 64 AS INTEGER) END) AS bits "
        f"FROM ({arms}) GROUP BY 1"
    )


def sql_bloom_fpr(src: str, col: str, probe_offset: int,
                  m: int = 16384, k: int = 4) -> str:
    """DuckDB twin of sketches.bloom_fpr with the probe set derived as
    {col} + probe_offset (the same synthetic disjoint probe construction
    the Spark entry uses)."""
    pos = _duck_bloom_pos("value", m, k)
    probes = " UNION ALL ".join(
        f"SELECT value, {p} AS pos FROM pv" for p in pos)
    return (
        f"WITH bloom AS ({sql_bloom_bits(src, col, m, k)}), "
        f"pv AS (SELECT DISTINCT {col} + {probe_offset} AS value "
        f"FROM {src} WHERE {col} IS NOT NULL), "
        f"cells AS (SELECT value, CAST(pos // 64 AS INTEGER) AS word_idx, "
        "CASE WHEN CAST(pos % 64 AS INTEGER) = 63 THEN CAST(-9223372036854775808 AS BIGINT) ELSE CAST(1 AS BIGINT) << CAST(pos % 64 AS INTEGER) END AS mask "
        f"FROM ({probes})), "
        "hits AS (SELECT value, COUNT(*) = SUM(CASE WHEN "
        "(COALESCE(bits, 0) & mask) = mask THEN 1 ELSE 0 END) AS hit "
        "FROM cells LEFT JOIN bloom USING (word_idx) GROUP BY value), "
        f"ins AS (SELECT CAST(COUNT(DISTINCT {col}) AS BIGINT) AS "
        f"n_inserted FROM {src} WHERE {col} IS NOT NULL) "
        f"SELECT CAST({m} AS BIGINT) AS m, CAST({k} AS BIGINT) AS k, "
        "n_inserted, CAST(COUNT(*) AS BIGINT) AS n_probes, "
        "CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_false_pos, "
        "CAST((SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 10000) // COUNT(*) "
        "AS BIGINT) AS fpr_bp FROM hits, ins GROUP BY n_inserted"
    )


def sql_blocklist(src: str = "documents",
                  blocked_sources: list[str] | None = None,
                  bad_words: list[str] | None = None,
                  max_hits: int = 1) -> str:
    """DuckDB twin of text.blocklist_filter."""
    from .text import BAD_WORDS, BLOCKED_SOURCES

    srcs = "[" + ", ".join(
        f"'{s}'" for s in (blocked_sources or BLOCKED_SOURCES)) + "]"
    words = "[" + ", ".join(
        f"'{w}'" for w in (bad_words or BAD_WORDS)) + "]"
    return (
        "WITH t AS (SELECT doc_id, source, "
        "CASE WHEN trim(COALESCE(text, '')) = '' "
        "THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split_regex(trim(text), '\\s+') END AS tokens "
        f"FROM {src}), "
        "m AS (SELECT doc_id, source, "
        f"COALESCE(list_contains({srcs}, source), FALSE) AS src_blocked, "
        "CAST(len(tokens) AS BIGINT) AS n_tokens, "
        f"CAST(len(list_filter(tokens, t -> list_contains({words}, t))) "
        "AS BIGINT) AS n_bad_hits FROM t) "
        "SELECT doc_id, source, src_blocked, n_tokens, n_bad_hits, "
        f"(NOT src_blocked) AND n_bad_hits <= {max_hits} AS keep FROM m"
    )


def sql_pmi(src: str = "documents", top_k: int = 100,
            min_count: int = 5) -> str:
    """DuckDB twin of text.pmi_collocations — same bigram-margin PMI
    with the identical integer-bit quantization."""
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        "big AS (SELECT tokens[i] AS w1, tokens[i + 1] AS w2 FROM toks, "
        "UNNEST(generate_series(1, len(tokens) - 1)) AS t(i) "
        "WHERE len(tokens) >= 2), "
        "pair AS (SELECT w1, w2, COUNT(*) AS n_ab FROM big GROUP BY 1, 2), "
        "l AS (SELECT w1, SUM(n_ab) AS n_a FROM pair GROUP BY 1), "
        "r AS (SELECT w2, SUM(n_ab) AS n_b FROM pair GROUP BY 1), "
        "tot AS (SELECT SUM(n_ab) AS n FROM pair) "
        "SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab, "
        "CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, "
        f"CAST({_duck_flog2('n_ab')} + {_duck_flog2('n')} - "
        f"{_duck_flog2('n_a')} - {_duck_flog2('n_b')} AS BIGINT) "
        "AS pmi_bits "
        "FROM pair JOIN l USING (w1) JOIN r USING (w2), tot "
        f"WHERE n_ab >= {min_count} "
        f"ORDER BY pmi_bits DESC, n_ab DESC, w1, w2 LIMIT {top_k}"
    )


def _duck_hist_cte(src: str, col: str) -> str:
    return (
        f"SELECT (length(bin(CAST({col} + 1 AS BIGINT))) - 1) AS bucket, "
        f"COUNT(*) AS cnt FROM {src} "
        f"WHERE {col} IS NOT NULL AND {col} >= 0 GROUP BY 1"
    )


def sql_hist_log2(src: str, col: str) -> str:
    """DuckDB twin of sketches.hist_log2."""
    return (
        f"WITH h AS ({_duck_hist_cte(src, col)}) "
        "SELECT CAST(bucket AS BIGINT) AS bucket, "
        "CAST(cnt AS BIGINT) AS cnt, "
        "CAST((CAST(1 AS BIGINT) << CAST(bucket AS INTEGER)) - 1 "
        "AS BIGINT) AS lo, "
        "CAST((CAST(1 AS BIGINT) << CAST(bucket + 1 AS INTEGER)) - 2 "
        "AS BIGINT) AS hi FROM h"
    )


def sql_hist_quantiles(src: str, col: str,
                       ps: tuple[int, ...] = (50, 90, 99)) -> str:
    """DuckDB twin of sketches.hist_quantiles (window cumsum instead of
    the Spark-side sorted fold — same integer readout)."""
    sel = ["CAST(t.n AS BIGINT) AS n_total"]
    for p in ps:
        bq = f"(SELECT MIN(bucket) FROM c WHERE cum * 100 >= {p} * t.n)"
        sel.append(f"CAST({bq} AS BIGINT) AS p{p}_bucket")
        sel.append(
            f"CAST((CAST(1 AS BIGINT) << CAST({bq} + 1 AS INTEGER)) - 2 "
            f"AS BIGINT) AS p{p}_hi")
    return (
        f"WITH h AS ({_duck_hist_cte(src, col)}), "
        "c AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum "
        "FROM h), t AS (SELECT SUM(cnt) AS n FROM h) "
        f"SELECT {', '.join(sel)} FROM t"
    )


def sql_winnow(src: str = "documents", k: int = 3, w: int = 4) -> str:
    """DuckDB twin of text.winnow_fingerprints — lateral window unnest
    instead of the Spark-side nested transform, same leftmost-min rule."""
    parts = ", ".join(f"tokens[i + {j}]" for j in range(k))
    gram = duck_h64(f"concat_ws(' ', {parts})")
    win = f"list_slice(hs, j, j + {w - 1})"
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        f"h AS (SELECT doc_id, CASE WHEN len(tokens) >= {k} "
        f"THEN list_transform(generate_series(1, len(tokens) - {k - 1}), "
        f"i -> {gram}) ELSE CAST([] AS BIGINT[]) END AS hs FROM toks) "
        "SELECT DISTINCT doc_id, "
        f"CAST(j + list_position({win}, list_min({win})) - 1 AS BIGINT) "
        "AS pos, "
        f"list_min({win}) AS fp "
        f"FROM h, UNNEST(generate_series(1, len(hs) - {w - 1})) AS t(j) "
        f"WHERE len(hs) >= {w}"
    )


def sql_source_report(src: str = "documents") -> str:
    """DuckDB twin of curate.source_report — same integer basis-point
    rates, same stopword-ratio 'en' rule as text.lang_id."""
    return (
        "WITH t AS (SELECT source, "
        "CASE WHEN trim(COALESCE(text, '')) = '' "
        "THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split_regex(trim(text), '\\s+') END AS tokens, "
        f"COALESCE(text, '') AS ntext FROM {src}), "
        "d AS (SELECT source, CAST(len(tokens) AS BIGINT) AS nt, "
        "CAST(length(ntext) AS BIGINT) AS nc, sha256(ntext) AS sha, "
        "CASE WHEN len(tokens) > 0 AND "
        f"len(list_filter(tokens, x -> list_contains({_stop_list()}, x)))"
        " * 20 >= len(tokens) THEN 1 ELSE 0 END AS en FROM t), "
        "g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(nt) AS BIGINT) AS n_tokens, "
        "CAST(SUM(nc) AS BIGINT) AS n_chars, "
        "CAST(COUNT(DISTINCT sha) AS BIGINT) AS n_unique, "
        "CAST(SUM(en) AS BIGINT) AS n_en FROM d GROUP BY source) "
        "SELECT source, n_docs, n_tokens, n_chars, n_unique, "
        "CAST(((n_docs - n_unique) * 10000) // n_docs AS BIGINT) "
        "AS dup_bp, n_en, "
        "CAST((n_en * 10000) // n_docs AS BIGINT) AS en_bp, "
        "CAST(n_tokens // n_docs AS BIGINT) AS mean_tokens FROM g"
    )


def sql_bigram_surprisal(src: str = "documents") -> str:
    """DuckDB twin of text.bigram_surprisal — identical train slice
    ('en' by stopword ratio), LM counts, backoff rule, and integer-bit
    arithmetic."""
    from .text import BACKOFF_PENALTY_BITS, OOV_BITS_EXTRA

    en = (f"len(list_filter(tokens, x -> list_contains({_stop_list()}, x)))"
          " * 20 >= len(tokens) AND len(tokens) > 0")
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        f"train AS (SELECT tokens FROM toks WHERE {en}), "
        "uni AS (SELECT w, COUNT(*) AS c_w FROM "
        "(SELECT unnest(tokens) AS w FROM train) GROUP BY 1), "
        "big AS (SELECT w1, w2, COUNT(*) AS c_b FROM "
        "(SELECT tokens[i] AS w1, tokens[i + 1] AS w2 FROM train, "
        "UNNEST(generate_series(1, len(tokens) - 1)) AS t(i) "
        "WHERE len(tokens) >= 2) GROUP BY 1, 2), "
        "tot AS (SELECT SUM(c_w) AS t FROM uni), "
        "trans AS (SELECT doc_id, tokens[i] AS w1, tokens[i + 1] AS w2 "
        "FROM toks, UNNEST(generate_series(1, len(tokens) - 1)) AS g(i) "
        "WHERE len(tokens) >= 2), "
        "sc AS (SELECT doc_id, CASE "
        f"WHEN c_b IS NOT NULL THEN {_duck_flog2('up.c_w')} - "
        f"{_duck_flog2('c_b')} "
        f"WHEN uc.c_w IS NOT NULL THEN {BACKOFF_PENALTY_BITS} + "
        f"{_duck_flog2('t + 1')} - {_duck_flog2('uc.c_w')} "
        f"ELSE {_duck_flog2('t + 1')} + {OOV_BITS_EXTRA} END AS bits "
        "FROM trans "
        "LEFT JOIN big USING (w1, w2) "
        "LEFT JOIN uni up ON trans.w1 = up.w "
        "LEFT JOIN uni uc ON trans.w2 = uc.w, tot), "
        "pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored, "
        "CAST(SUM(bits) AS BIGINT) AS sum_bits FROM sc GROUP BY 1) "
        f"SELECT d.doc_id, COALESCE(n_scored, 0) AS n_scored, "
        "COALESCE(sum_bits, 0) AS sum_bits, "
        "CASE WHEN COALESCE(n_scored, 0) > 0 THEN "
        "CAST((sum_bits * 1000000) // n_scored AS BIGINT) END "
        f"AS mean_microbits FROM {src} d LEFT JOIN pd USING (doc_id)"
    )


def sql_hll_by_group(src: str, group: str, col: str, p: int = 8) -> str:
    """DuckDB twin of sketches.hll_by_group — the grouped register
    build, one row per (group, bucket)."""
    vbits = 60 - p
    mask = (1 << vbits) - 1
    h = duck_h64(f"CAST({col} AS VARCHAR)")
    return (
        f"WITH hx AS (SELECT {group} AS grp, "
        f"CAST(({h} >> {vbits}) AS INTEGER) AS bucket, "
        f"({h} & {mask}) AS w FROM {src} WHERE {col} IS NOT NULL) "
        f"SELECT grp AS {group}, bucket, "
        f"CAST(MAX(CASE WHEN w = 0 THEN {vbits + 1} "
        f"ELSE {vbits} - (length(bin(CAST(w AS BIGINT))) - 1) END) "
        "AS INTEGER) AS rho FROM hx GROUP BY grp, bucket"
    )


def sql_nfc(src: str = "documents") -> str:
    """DuckDB twin of text.nfc_normalize — DuckDB's nfc_normalize and
    CPython's unicodedata.normalize both implement UAX #15."""
    return (
        f"WITH t AS (SELECT doc_id, COALESCE(text, '') AS raw FROM {src}),"
        " n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM t) "
        "SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_chars_raw, "
        "CAST(length(nfc) AS BIGINT) AS n_chars_nfc, "
        "raw <> nfc AS changed, sha256(nfc) AS sha_nfc FROM n"
    )


def sql_containment(src: str = "documents", n: int = 4, min_pct: int = 80,
                    max_df: int | None = None) -> str:
    """DuckDB twin of dedup.containment_pairs."""
    df_filter = (
        f", rare AS (SELECT shingle FROM sh GROUP BY 1 "
        f"HAVING count(*) <= {max_df}), "
        "shf AS (SELECT sh.* FROM sh JOIN rare USING (shingle))"
        if max_df is not None else ", shf AS (SELECT * FROM sh)"
    )
    return (
        f"WITH toks AS ({toks_cte(src)}), sh AS ({shingles_cte(n)})"
        f"{df_filter}, "
        "sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY 1), "
        "inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, "
        "count(*) AS n_inter FROM shf a JOIN shf b "
        "ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT d1, d2, n_inter, "
        "CAST(LEAST(s1.n_sh, s2.n_sh) AS BIGINT) AS n_small, "
        "CAST((n_inter * 10000) // LEAST(s1.n_sh, s2.n_sh) AS BIGINT) "
        "AS containment_bp "
        "FROM inter JOIN sizes s1 ON s1.doc_id = d1 "
        "JOIN sizes s2 ON s2.doc_id = d2 "
        f"WHERE n_inter * 100 >= {min_pct} * LEAST(s1.n_sh, s2.n_sh)"
    )


def sql_hist_by_group(src: str, group: str, col: str) -> str:
    """DuckDB twin of sketches.hist_by_group."""
    return (
        f"SELECT {group}, "
        f"CAST(length(bin(CAST({col} + 1 AS BIGINT))) - 1 AS BIGINT) "
        "AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM {src} WHERE {col} IS NOT NULL AND {col} >= 0 "
        "GROUP BY 1, 2"
    )


def _centroid_cte(src: str, group: str = "label",
                  vec: str = "embedding", dim: int = 64,
                  q: int = 1_000_000) -> str:
    return (
        f"SELECT {group}, CAST(i AS BIGINT) AS dim, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CAST(floor(CAST({vec}[i] AS DOUBLE) * {q}) AS BIGINT))"
        f" // COUNT(*) AS BIGINT) AS c_micro "
        f"FROM {src}, UNNEST(generate_series(1, {dim})) AS t(i) "
        f"GROUP BY 1, 2"
    )


def sql_label_centroids(src: str = "embeddings", group: str = "label",
                        vec: str = "embedding", dim: int = 64) -> str:
    """DuckDB twin of similarity.label_centroids — same micro-unit
    quantization, exact integer sums and division."""
    return _centroid_cte(src, group, vec, dim)


def sql_label_centroid_sim(src: str = "embeddings", group: str = "label",
                           vec: str = "embedding", dim: int = 64) -> str:
    """DuckDB twin of similarity.label_centroid_sim — integer dot/norm
    sums (order-free because exact), one IEEE sqrt+division."""
    return (
        f"WITH cent AS ({_centroid_cte(src, group, vec, dim)}), "
        "dots AS (SELECT a.%(g)s AS l1, b.%(g)s AS l2, "
        "SUM(a.c_micro * b.c_micro) AS dot FROM cent a JOIN cent b "
        "ON a.dim = b.dim AND a.%(g)s < b.%(g)s GROUP BY 1, 2), "
        "norms AS (SELECT %(g)s, SUM(c_micro * c_micro) AS nrm "
        "FROM cent GROUP BY 1) "
        "SELECT l1, l2, CAST(dot AS DOUBLE) / "
        "(sqrt(CAST(n1.nrm AS DOUBLE)) * sqrt(CAST(n2.nrm AS DOUBLE))) "
        "AS cos FROM dots JOIN norms n1 ON n1.%(g)s = l1 "
        "JOIN norms n2 ON n2.%(g)s = l2"
        % {"g": group}
    )


def sql_editdist_verify(src: str, max_dist: int = 20, cap: int = 200,
                        n: int = 4) -> str:
    """DuckDB twin of dedup.editdist_verify — candidates from the same
    16-perm LSH banding the minhash oracle builds, then levenshtein
    over the identical length-capped prefixes."""
    band_rows = []
    for band in range(LSH_BANDS):
        cols = ", ".join(
            f"CAST(mh{band * LSH_ROWS + r} AS VARCHAR)"
            for r in range(LSH_ROWS)
        )
        band_rows.append(
            f"SELECT doc_id, {band} AS band, "
            f"md5(concat_ws('_', {cols})) AS sig_h FROM sig"
        )
    stacked = " UNION ALL ".join(band_rows)
    return (
        f"WITH toks AS ({toks_cte(src)}), {_minhash_sig_cte(n)}, "
        f"stacked AS ({stacked}), "
        "cands AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM stacked a "
        "JOIN stacked b ON a.band = b.band AND a.sig_h = b.sig_h "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2), "
        f"txt AS (SELECT doc_id, left(COALESCE(text, ''), {cap}) AS t "
        f"FROM {src}) "
        "SELECT d1, d2, CAST(levenshtein(t1.t, t2.t) AS BIGINT) AS dist, "
        f"levenshtein(t1.t, t2.t) <= {max_dist} AS is_dup "
        "FROM cands JOIN txt t1 ON t1.doc_id = d1 "
        "JOIN txt t2 ON t2.doc_id = d2"
    )


def sql_bm25_topk(src: str = "documents", query_terms: list[str] = (),
                  k: int = 20) -> str:
    """DuckDB twin of text.bm25_topk — same integer-cleared saturation,
    same bit-quantized idf, same token-ordered double fold."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    idf = _duck_flog2("(2 * n_docs - 2 * df_docs + 1) // (2 * df_docs + 1)")
    return (
        f"WITH toks AS ({toks_cte(src)}), "
        "dls AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl, tokens "
        "FROM toks), "
        "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(dl) AS BIGINT) AS s_tokens FROM dls), "
        "tf AS (SELECT doc_id, dl, token, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM (SELECT doc_id, dl, unnest(tokens) AS token FROM dls) u "
        f"WHERE token IN ({terms}) GROUP BY doc_id, dl, token), "
        "dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_docs "
        "FROM tf GROUP BY token), "
        "v AS (SELECT tf.doc_id, tf.token, "
        f"CAST({idf} * 22 * s_tokens * tf AS DOUBLE) / "
        "CAST(10 * s_tokens * tf + 3 * s_tokens + 9 * tf.dl * n_docs "
        "AS DOUBLE) AS v "
        "FROM tf JOIN dfreq USING (token), st), "
        "sc AS (SELECT doc_id, list_reduce(list_prepend("
        "CAST(0.0 AS DOUBLE), list(v ORDER BY token)), "
        "(acc, x) -> acc + x) AS bm25 FROM v GROUP BY doc_id) "
        f"SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id LIMIT {k}"
    )


def sql_knn_graph(src: str = "embeddings", k: int = 5) -> str:
    """DuckDB twin of similarity.knn_graph — same bucket equi-join and
    per-src ranked window, no query-side filter."""
    cos = duck_cosine("q.embedding", "c.embedding")
    return (
        f"WITH b AS ({sql_lsh_buckets(src)}), "
        f"e AS (SELECT s.vec_id, s.embedding, b.bucket FROM {src} s "
        "JOIN b ON b.vec_id = s.vec_id), "
        f"scored AS (SELECT q.vec_id AS src, c.vec_id AS dst, {cos} AS cos "
        "FROM e q JOIN e c ON q.bucket = c.bucket "
        "AND q.vec_id <> c.vec_id), "
        "ranked AS (SELECT src, dst, row_number() OVER "
        "(PARTITION BY src ORDER BY cos DESC, dst) AS rank FROM scored) "
        f"SELECT src, dst, CAST(rank AS INTEGER) AS rank "
        f"FROM ranked WHERE rank <= {k}"
    )


def sql_near_dup_keep_best(src: str, n: int = 4) -> str:
    """DuckDB twin of dedup.near_dup_keep_best — the groups twin plus
    one length join and the same (n_chars DESC, id) window."""
    return (
        f"WITH g AS ({sql_near_dup_groups(src, n=n)}), "
        f"ln AS (SELECT doc_id, CAST(length(COALESCE(text, '')) AS BIGINT) "
        f"AS n_chars FROM (SELECT * FROM {src} s) raw), "
        "j AS (SELECT g.doc_id, g.canonical_doc_id, ln.n_chars "
        "FROM g JOIN ln USING (doc_id)), "
        "r AS (SELECT doc_id, canonical_doc_id, row_number() OVER "
        "(PARTITION BY canonical_doc_id ORDER BY n_chars DESC, doc_id) "
        "AS rk FROM j) "
        "SELECT doc_id, canonical_doc_id AS cluster_id, rk = 1 AS keep "
        "FROM r"
    )


def sql_bpe_encode_counts(src: str = "documents", n_merges: int = 8) -> str:
    """DuckDB twin of bpe.bpe_encode_counts — the shared merge-chain
    CTEs, then per-doc pretoken counts joined to the final
    tokenization's piece counts."""
    from .text import BPE_TOKEN_PATTERN

    return (
        f"{_bpe_cte_chain(src, n_merges)} "
        "SELECT dw.doc_id, CAST(SUM(dw.c) AS BIGINT) AS n_words, "
        f"CAST(SUM(dw.c * len(w{n_merges}.syms)) AS BIGINT) AS n_pieces "
        "FROM (SELECT doc_id, word, COUNT(*) AS c FROM "
        "(SELECT doc_id, unnest(regexp_extract_all(COALESCE(text, ''), "
        f"'{BPE_TOKEN_PATTERN}')) AS word FROM {src}) u "
        "WHERE strpos(word, chr(31)) = 0 GROUP BY doc_id, word) dw "
        f"JOIN w{n_merges} USING (word) GROUP BY dw.doc_id"
    )


def sql_split_leakage(src: str = "documents", salt: str = "split-v1",
                      weights: list[tuple[str, int]] | None = None) -> str:
    """DuckDB twin of curate.split_leakage_report."""
    return (
        f"WITH sp AS ({sql_dataset_splits(src, salt=salt, weights=weights)}), "
        f"sh AS (SELECT doc_id, sha256(COALESCE(text, '')) AS sha "
        f"FROM {src}), "
        "j AS (SELECT sh.doc_id, sh.sha, sp.split FROM sh "
        "JOIN sp USING (doc_id)) "
        "SELECT LEAST(a.split, b.split) AS split_lo, "
        "GREATEST(a.split, b.split) AS split_hi, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(COUNT(DISTINCT a.sha) AS BIGINT) AS n_shas "
        "FROM j a JOIN j b ON a.sha = b.sha AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2"
    )


def sql_span_decontam(src: str = "documents", window: int = 32,
                      overlap: int = 8, n: int = 4,
                      eval_mod: int = 10) -> str:
    """DuckDB twin of decontam.span_decontaminate over the doc_id-stride
    eval split (eval = doc_id % eval_mod == 0, train = the rest)."""
    parts = ", ".join(f"tokens[i + {j}]" for j in range(n))
    sh = (
        f"unnest(CASE WHEN len(tokens) >= {n} THEN "
        f"list_transform(generate_series(1, len(tokens) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) ELSE CAST([] AS VARCHAR[]) END)"
    )
    train = f"(SELECT * FROM {src} WHERE doc_id % {eval_mod} <> 0)"
    return (
        f"WITH ch AS ({sql_chunk_documents(train, window, overlap)}), "
        "ctoks AS (SELECT doc_id, chunk_idx, "
        "CASE WHEN trim(chunk_text) = '' THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split_regex(trim(chunk_text), '\\s+') END AS tokens "
        "FROM ch), "
        "csh AS (SELECT DISTINCT doc_id, chunk_idx, shingle FROM "
        f"(SELECT doc_id, chunk_idx, {sh} AS shingle FROM ctoks) s), "
        f"etoks AS (SELECT doc_id, tokens FROM ({toks_cte(src)}) tk "
        f"WHERE doc_id % {eval_mod} = 0), "
        "ev AS (SELECT DISTINCT shingle FROM "
        f"(SELECT doc_id, {sh} AS shingle FROM etoks) e), "
        "hits AS (SELECT doc_id, chunk_idx, COUNT(*) AS nh FROM csh "
        "JOIN ev USING (shingle) GROUP BY 1, 2) "
        "SELECT ch.doc_id, ch.chunk_idx, ch.n_tokens, "
        "CAST(COALESCE(nh, 0) AS BIGINT) AS n_hits, "
        "COALESCE(nh, 0) = 0 AS keep "
        "FROM ch LEFT JOIN hits USING (doc_id, chunk_idx)"
    )


def sql_span_cleaned(src: str = "documents", window: int = 32,
                     overlap: int = 8, n: int = 4,
                     eval_mod: int = 10) -> str:
    """DuckDB twin of decontam.span_cleaned_corpus."""
    stride = window - overlap
    return (
        f"WITH sp AS ({sql_span_decontam(src, window, overlap, n, eval_mod)}), "
        f"ch AS ({sql_chunk_documents(f'(SELECT * FROM {src} WHERE doc_id % {eval_mod} <> 0)', window, overlap)}), "
        "lastc AS (SELECT doc_id, MAX(chunk_idx) AS lastx FROM ch "
        "GROUP BY doc_id), "
        "seg AS (SELECT ch.doc_id, ch.chunk_idx, sp.keep, "
        "CASE WHEN NOT sp.keep THEN CAST([] AS VARCHAR[]) "
        "WHEN ch.chunk_idx = lastc.lastx THEN toks ELSE toks[1:" 
        f"{stride}] END AS s "
        "FROM (SELECT *, CASE WHEN trim(chunk_text) = '' "
        "THEN CAST([] AS VARCHAR[]) "
        "ELSE string_split_regex(trim(chunk_text), '\\s+') END AS toks "
        "FROM ch) ch "
        "JOIN sp USING (doc_id, chunk_idx) JOIN lastc USING (doc_id)) "
        "SELECT doc_id, "
        "COALESCE(array_to_string(flatten(list(s ORDER BY chunk_idx)), "
        "' '), '') AS cleaned_text, "
        "CAST(SUM(len(s)) AS BIGINT) AS n_tokens_kept, "
        "CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) "
        "AS n_chunks_dropped "
        "FROM seg GROUP BY doc_id"
    )
