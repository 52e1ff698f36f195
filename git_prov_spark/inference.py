"""KG inference & maintenance over the (repo, subj, pred, obj, obj_type)
triple relation — RDFS entailment materialization and owl:sameAs
canonical rewriting.

The reference stores the PROV graph in Jena TDB and leans on Jena's
reasoners when a client asks for entailed triples
(services/SparqlService.java:16-31 executes over the raw model; Jena's
InfModel is the upstream path). A KG *construction* pipeline at 100 TB
cannot reason per-query — it materializes the closure once, at build
time, as another batch stage. Two operators cover the fragments that
matter for PROV-style graphs:

- :func:`rdfs_closure` — the ρdf fragment (Muñoz, Pérez, Gutierrez,
  "Minimal deductive systems for RDF", ESWC 2007): rdfs5/11 (transitive
  subPropertyOf / subClassOf), rdfs7 (property subsumption), rdfs2/3
  (domain / range typing), rdfs9 (class subsumption of rdf:type).
  These rules STRATIFY — sp-closure feeds rdfs7, whose output feeds
  domain/range, whose output feeds rdfs9 — so one ordered pass is the
  full fixpoint; no instance-level iteration is ever needed.
- :func:`sameas_canonicalize` — owl:sameAs alias merging: connected
  components over the sameAs pair graph, every IRI rewritten to its
  component minimum. This is the triple-level twin of the pipeline's
  agent canonicalization (pipeline/agents.py) and the standard
  "canonicalize then materialize" treatment of sameAs at scale.

Scale notes (100 TB):
- The SCHEMA (ontology) is small by nature — 10^3..10^5 classes and
  properties even for giant KGs — while the INSTANCE data is the 100 TB
  side. Every rule here is therefore a BROADCAST equi-join of the
  instance relation against a closed schema relation: zero instance
  shuffles until the final distinct. The schema closure itself runs
  distributed (operators.transitive_closure, path doubling) so a
  pathological million-edge ontology still closes in O(log depth)
  rounds.
- The final `distinct` is the one unavoidable shuffle — entailed
  triples collide with asserted ones. It partitions on the full row, so
  AQE splits skewed reducers; there is no hot key by construction
  (subjects spread).
- sameas_canonicalize shuffles the sameAs PAIRS (tiny vs instance data)
  per label-propagation round; the instance rewrite is two equi-joins
  against the (node, label) map — broadcastable whenever the alias
  population fits (the common case: aliases ≪ entities), a plain
  shuffled join otherwise.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import transitive_closure

RDF_TYPE = "rdf:type"
RDFS_SUBCLASS = "rdfs:subClassOf"
RDFS_SUBPROP = "rdfs:subPropertyOf"
RDFS_DOMAIN = "rdfs:domain"
RDFS_RANGE = "rdfs:range"

TRIPLE_COLS = ["repo", "subj", "pred", "obj", "obj_type"]


def _schema_pairs(schema: DataFrame, pred: str) -> DataFrame:
    return (
        schema.where(F.col("pred") == pred)
        .select(F.col("subj").alias("sub"), F.col("obj").alias("sup"))
        .distinct()
    )


def rdfs_closure(instance: DataFrame, schema: DataFrame) -> DataFrame:
    """Materialized ρdf closure of `instance ∪ schema`.

    Both inputs are TRIPLE_COLS relations; `schema` holds the
    rdfs:subClassOf / subPropertyOf / domain / range assertions (its
    other rows are ignored for inference but kept in the output).
    Returns the DISTINCT union of asserted and entailed triples:

      rdfs5/11: sc+ and sp+ transitive closures (emitted as triples,
                schema repo column preserved per closed pair's seed row
                is NOT tracked — closure rows reuse the schema rows'
                repo via a min aggregate for determinism);
      rdfs7:    (x P y), (P sp+ Q)      → (x Q y)
      rdfs2:    (x P y), (P domain C)   → (x rdf:type C)   [after rdfs7]
      rdfs3:    (x P y), (P range C)    → (y rdf:type C)   [obj IRIs only]
      rdfs9:    (x rdf:type C), (C sc+ D) → (x rdf:type D) [after rdfs2/3]
    """
    sc = _schema_pairs(schema, RDFS_SUBCLASS)
    sp = _schema_pairs(schema, RDFS_SUBPROP)
    sc_closed = transitive_closure(sc, "sub", "sup").select(
        F.col("src").alias("sub"), F.col("dst").alias("sup"))
    sp_closed = transitive_closure(sp, "sub", "sup").select(
        F.col("src").alias("sub"), F.col("dst").alias("sup"))
    dom = _schema_pairs(schema, RDFS_DOMAIN)
    rng = _schema_pairs(schema, RDFS_RANGE)

    # rdfs7 — property subsumption over the CLOSED sp relation
    sub_props = (
        instance.join(F.broadcast(sp_closed),
                      F.col("pred") == F.col("sub"))
        .select("repo", "subj", F.col("sup").alias("pred"),
                "obj", "obj_type")
    )
    # `base` feeds four rule branches of the final union and is
    # deliberately NOT persisted: each branch is a column-pruned parquet
    # scan + a broadcast join — re-executing that beats writing 10^6
    # wide rows to block-manager memory and reading them back (measured
    # at sf0.1: 6.0 s recompute vs 8.6 s persisted, and persist also
    # pins executor memory the final distinct wants). At 100 TB the
    # same holds: scans are the cheap, infinitely-parallel part.
    base = instance.select(*TRIPLE_COLS).unionByName(sub_props)

    # rdfs2 / rdfs3 — domain & range typing over sp-closed assertions
    typed_dom = (
        base.join(F.broadcast(dom), F.col("pred") == F.col("sub"))
        .select("repo", "subj", F.lit(RDF_TYPE).alias("pred"),
                F.col("sup").alias("obj"), F.lit("iri").alias("obj_type"))
    )
    typed_rng = (
        base.where(F.col("obj_type") == "iri")
        .join(F.broadcast(rng), F.col("pred") == F.col("sub"))
        .select("repo", F.col("obj").alias("subj"),
                F.lit(RDF_TYPE).alias("pred"),
                F.col("sup").alias("obj"), F.lit("iri").alias("obj_type"))
    )

    # rdfs9 — class subsumption over every rdf:type triple now known
    types = (
        base.where(F.col("pred") == RDF_TYPE)
        .unionByName(typed_dom).unionByName(typed_rng)
    )
    super_types = (
        types.join(F.broadcast(sc_closed), F.col("obj") == F.col("sub"))
        .select("repo", "subj", F.lit(RDF_TYPE).alias("pred"),
                F.col("sup").alias("obj"), F.lit("iri").alias("obj_type"))
    )

    # closed schema pairs re-emitted as triples; repo = min over the
    # schema rows that asserted the predicate (deterministic, and the
    # common case is one schema graph anyway)
    schema_repo = schema.agg(F.min("repo").alias("repo"))
    closed_schema = (
        sc_closed.select("sub", F.lit(RDFS_SUBCLASS).alias("pred"), "sup")
        .unionByName(
            sp_closed.select("sub", F.lit(RDFS_SUBPROP).alias("pred"), "sup"))
        .crossJoin(F.broadcast(schema_repo))
        .select("repo", F.col("sub").alias("subj"), "pred",
                F.col("sup").alias("obj"), F.lit("iri").alias("obj_type"))
    )

    return (
        base.unionByName(typed_dom)
        .unionByName(typed_rng)
        .unionByName(super_types)
        .unionByName(schema.select(*TRIPLE_COLS))
        .unionByName(closed_schema)
        .distinct()
    )


def sql_rdfs_closure(instance_sql: str, schema_sql: str) -> str:
    """DuckDB twin of :func:`rdfs_closure` — recursive CTEs for the two
    schema closures (a recursive closure and path doubling compute the
    same fixpoint relation), then the identical rule joins."""
    return f"""
WITH RECURSIVE
inst AS MATERIALIZED ({instance_sql}),
sch AS MATERIALIZED ({schema_sql}),
sc(sub, sup) AS (
  SELECT DISTINCT subj, obj FROM sch WHERE pred = '{RDFS_SUBCLASS}'
  UNION
  SELECT sc.sub, s.obj FROM sc JOIN sch s
    ON s.pred = '{RDFS_SUBCLASS}' AND s.subj = sc.sup),
sp(sub, sup) AS (
  SELECT DISTINCT subj, obj FROM sch WHERE pred = '{RDFS_SUBPROP}'
  UNION
  SELECT sp.sub, s.obj FROM sp JOIN sch s
    ON s.pred = '{RDFS_SUBPROP}' AND s.subj = sp.sup),
dom AS (SELECT DISTINCT subj AS sub, obj AS sup FROM sch
        WHERE pred = '{RDFS_DOMAIN}'),
rng AS (SELECT DISTINCT subj AS sub, obj AS sup FROM sch
        WHERE pred = '{RDFS_RANGE}'),
subp AS (SELECT i.repo, i.subj, sp.sup AS pred, i.obj, i.obj_type
         FROM inst i JOIN sp ON i.pred = sp.sub),
base AS MATERIALIZED (
  SELECT repo, subj, pred, obj, obj_type FROM inst
  UNION ALL SELECT * FROM subp),
tdom AS (SELECT b.repo, b.subj, '{RDF_TYPE}' AS pred, d.sup AS obj,
                'iri' AS obj_type
         FROM base b JOIN dom d ON b.pred = d.sub),
trng AS (SELECT b.repo, b.obj AS subj, '{RDF_TYPE}' AS pred,
                r.sup AS obj, 'iri' AS obj_type
         FROM base b JOIN rng r ON b.pred = r.sub
         WHERE b.obj_type = 'iri'),
typs AS (SELECT * FROM base WHERE pred = '{RDF_TYPE}'
         UNION ALL SELECT * FROM tdom UNION ALL SELECT * FROM trng),
styp AS (SELECT t.repo, t.subj, '{RDF_TYPE}' AS pred, c.sup AS obj,
                'iri' AS obj_type
         FROM typs t JOIN sc c ON t.obj = c.sub),
srepo AS (SELECT MIN(repo) AS repo FROM sch),
csch AS (
  SELECT srepo.repo, x.sub AS subj, x.pred, x.sup AS obj,
         'iri' AS obj_type
  FROM (SELECT sub, '{RDFS_SUBCLASS}' AS pred, sup FROM sc
        UNION ALL SELECT sub, '{RDFS_SUBPROP}', sup FROM sp) x, srepo)
SELECT DISTINCT repo, subj, pred, obj, obj_type FROM (
  SELECT * FROM base
  UNION ALL SELECT * FROM tdom
  UNION ALL SELECT * FROM trng
  UNION ALL SELECT * FROM styp
  UNION ALL SELECT repo, subj, pred, obj, obj_type FROM sch
  UNION ALL SELECT * FROM csch) u
"""


def sameas_canonicalize(triples: DataFrame, sameas: DataFrame,
                        n_iter: int = 8) -> DataFrame:
    """Rewrite every IRI in `triples` to the canonical representative of
    its owl:sameAs equivalence class (component minimum), then dedup.

    `sameas` is an (src, dst) pair relation (direction irrelevant —
    sameAs is symmetric; the component step symmetrizes). Fixed-round
    min-label propagation (graph.components_sync semantics, inlined to
    keep this module free of a circular import) so a DuckDB twin can
    unroll identical rounds; each round propagates one hop, so 8 rounds
    cover alias chains of diameter ≤ 8 — past any real alias chain
    (deeper graphs: operators.connected_components, pointer jumping).

    Literals (obj_type != 'iri') are never rewritten. Subjects and
    object IRIs not in any sameAs pair pass through unchanged (the left
    joins miss)."""
    from .graph import components_sync

    comp = components_sync(sameas, n_iter=n_iter)
    cs = comp.select(F.col("node").alias("_s"), F.col("label").alias("_sl"))
    co = comp.select(F.col("node").alias("_o"), F.col("label").alias("_ol"))
    # no broadcast HINT: the alias map is usually tiny and AQE broadcasts
    # it on its own; forcing the hint would collect an arbitrarily large
    # alias population onto the driver instead of degrading to the
    # shuffled join the docstring promises
    return (
        triples.join(cs, triples["subj"] == cs["_s"], "left")
        .join(co,
              (triples["obj"] == co["_o"]) & (triples["obj_type"] == "iri"),
              "left")
        .select(
            "repo",
            F.coalesce("_sl", "subj").alias("subj"),
            "pred",
            F.coalesce("_ol", "obj").alias("obj"),
            "obj_type",
        )
        .distinct()
    )


def sql_sameas_canonicalize(triples_sql: str, pairs_sql: str,
                            n_iter: int = 8) -> str:
    """DuckDB twin of :func:`sameas_canonicalize` — embeds the unrolled
    components twin (graph.sql_components_sync) as a subquery, then the
    same two left joins + CASE rewrite + DISTINCT."""
    from .graph import sql_components_sync

    comp_sql = sql_components_sync(pairs_sql, n_iter=n_iter)
    return f"""
WITH t AS MATERIALIZED ({triples_sql}),
cmp AS MATERIALIZED ({comp_sql})
SELECT DISTINCT t.repo,
  COALESCE(cs.label, t.subj) AS subj,
  t.pred,
  CASE WHEN t.obj_type = 'iri' THEN COALESCE(co.label, t.obj)
       ELSE t.obj END AS obj,
  t.obj_type
FROM t
LEFT JOIN cmp cs ON cs.node = t.subj
LEFT JOIN cmp co ON co.node = t.obj AND t.obj_type = 'iri'
"""


# --------------------------------------------------------------------------
# SHACL-lite: shape validation over the triple relation
# --------------------------------------------------------------------------

SHACL_SHAPE_COLS = "shape string, target_class string, path string, " \
                   "constraint string, value string"


def shacl_report(triples: DataFrame, shapes: DataFrame) -> DataFrame:
    """Violations of a SHACL-style shape relation against the KG —
    (shape, focus, constraint, expected, node, actual), one row per
    violating focus (count constraints) or per violating value (term
    constraints); an empty result is a clean bill.

    `shapes` rows are (shape, target_class, path, constraint, value);
    constraints cover the core-profile checks a KG build gates on:

      minCount n  — every target_class instance has ≥ n values of path
      maxCount n  — ... at most n
      class C     — every value of path is an IRI typed rdf:type C
      datatype T  — every value's obj_type is exactly T
      nodeKind k  — 'iri' or 'literal'

    The reference has no validator (its output shape is fixed by
    construction); any pipeline ACCEPTING external KG batches needs one
    — this is the graph-shaped sibling of dq.dq_report's table
    contracts.

    Scale notes: the shape relation is tiny (broadcast in every join);
    targets = one broadcast join against the distinct rdf:type
    sub-relation; count constraints are ONE hash-aggregate over the
    matched (focus, path) rows; term constraints are a broadcast-
    filtered scan plus, for `class`, one anti-join against the typed-
    node set (shuffle on obj — the value side, narrow rows). Nothing
    here touches more than (focus, pred, obj, obj_type)-width rows."""
    types = (
        triples.where(F.col("pred") == RDF_TYPE)
        .select(F.col("subj").alias("tnode"), F.col("obj").alias("tcls"))
        .distinct()
    )
    targets = (
        types.join(F.broadcast(shapes),
                   types["tcls"] == shapes["target_class"])
        .select("shape", "target_class", "path", "constraint", "value",
                F.col("tnode").alias("focus"))
    )
    vals = triples.select(F.col("subj").alias("vfocus"), "pred",
                          "obj", "obj_type")

    cnt_t = targets.where(F.col("constraint").isin("minCount", "maxCount"))
    cnts = (
        cnt_t.join(vals, (cnt_t["focus"] == vals["vfocus"])
                   & (cnt_t["path"] == vals["pred"]), "left")
        .groupBy("shape", "focus", "path", "constraint", "value")
        .agg(F.count("obj").alias("n"))
    )
    bound = F.col("value").cast("long")
    cnt_bad = cnts.where(
        ((F.col("constraint") == "minCount") & (F.col("n") < bound))
        | ((F.col("constraint") == "maxCount") & (F.col("n") > bound))
    ).select(
        "shape", "focus", "constraint",
        F.col("value").alias("expected"),
        F.lit(None).cast("string").alias("node"),
        F.col("n").cast("string").alias("actual"),
    )

    term_t = targets.where(
        F.col("constraint").isin("class", "datatype", "nodeKind"))
    tv = term_t.join(vals, (term_t["focus"] == vals["vfocus"])
                     & (term_t["path"] == vals["pred"]))

    dt_bad = tv.where(
        (F.col("constraint") == "datatype")
        & (F.col("obj_type") != F.col("value"))
    )
    nk_bad = tv.where(
        (F.col("constraint") == "nodeKind")
        & (((F.col("value") == "iri") & (F.col("obj_type") != "iri"))
           | ((F.col("value") == "literal") & (F.col("obj_type") == "iri")))
    )
    cls = tv.where(F.col("constraint") == "class")
    cls_lit = cls.where(F.col("obj_type") != "iri")  # a literal is never C
    cls_untyped = (
        cls.where(F.col("obj_type") == "iri")
        .join(types, (cls["obj"] == types["tnode"])
              & (F.col("value") == types["tcls"]), "left_anti")
    )

    def _term_rows(df: DataFrame) -> DataFrame:
        return df.select(
            "shape", "focus", "constraint",
            F.col("value").alias("expected"),
            F.col("obj").alias("node"),
            F.col("obj_type").alias("actual"),
        )

    return (
        cnt_bad
        .unionByName(_term_rows(dt_bad))
        .unionByName(_term_rows(nk_bad))
        .unionByName(_term_rows(cls_lit))
        .unionByName(_term_rows(cls_untyped))
        .distinct()
    )


def sql_shacl_report(triples_sql: str, shapes_sql: str) -> str:
    """DuckDB twin of :func:`shacl_report` — identical target join,
    count aggregate, and term checks."""
    return f"""
WITH t AS MATERIALIZED ({triples_sql}),
sh AS MATERIALIZED ({shapes_sql}),
typ AS MATERIALIZED (
  SELECT DISTINCT subj AS tnode, obj AS tcls FROM t
  WHERE pred = '{RDF_TYPE}'),
tgt AS MATERIALIZED (
  SELECT sh.shape, sh.target_class, sh.path, sh."constraint", sh.value,
         typ.tnode AS focus
  FROM typ JOIN sh ON typ.tcls = sh.target_class),
vals AS (SELECT subj AS vfocus, pred, obj, obj_type FROM t),
cnts AS (
  SELECT g.shape, g.focus, g."constraint", g.value,
         COUNT(v.obj) AS n
  FROM tgt g LEFT JOIN vals v
    ON v.vfocus = g.focus AND v.pred = g.path
  WHERE g."constraint" IN ('minCount', 'maxCount')
  GROUP BY g.shape, g.focus, g.path, g."constraint", g.value),
cnt_bad AS (
  SELECT shape, focus, "constraint", value AS expected,
         CAST(NULL AS VARCHAR) AS node, CAST(n AS VARCHAR) AS actual
  FROM cnts
  WHERE ("constraint" = 'minCount' AND n < CAST(value AS BIGINT))
     OR ("constraint" = 'maxCount' AND n > CAST(value AS BIGINT))),
tv AS (
  SELECT g.shape, g.focus, g."constraint", g.value, v.obj, v.obj_type
  FROM tgt g JOIN vals v ON v.vfocus = g.focus AND v.pred = g.path
  WHERE g."constraint" IN ('class', 'datatype', 'nodeKind')),
term_bad AS (
  SELECT shape, focus, "constraint", value AS expected, obj AS node,
         obj_type AS actual
  FROM tv
  WHERE ("constraint" = 'datatype' AND obj_type <> value)
     OR ("constraint" = 'nodeKind' AND (
          (value = 'iri' AND obj_type <> 'iri')
          OR (value = 'literal' AND obj_type = 'iri')))
     OR ("constraint" = 'class' AND obj_type <> 'iri')
     OR ("constraint" = 'class' AND obj_type = 'iri' AND NOT EXISTS (
          SELECT 1 FROM typ
          WHERE typ.tnode = tv.obj AND typ.tcls = tv.value)))
SELECT DISTINCT * FROM (
  SELECT * FROM cnt_bad UNION ALL SELECT * FROM term_bad) u
"""


def schema_summary(triples: DataFrame) -> DataFrame:
    """(src_sig, pred, dst_sig, n) — the quotient ("summary") graph of
    the KG: nodes collapsed to their TYPE SIGNATURE (sorted '|'-joined
    rdf:type class set; '(untyped)' when none), edges counted between
    signatures. The schema-sanity readout of a KG build — it answers
    "what links what, and how often" in a relation as small as the
    ontology, however large the instance graph.

    Scale: one hash-aggregate builds the signature per node (collect_set
    bounded by a node's type count — ontologies are shallow), two
    equi-joins tag edge endpoints (broadcastable when the node count
    allows, shuffled otherwise), one final hash-aggregate over the tiny
    signature space. rdf:type edges themselves are excluded (they ARE
    the signatures); literal objects are excluded (no target node)."""
    types = (
        triples.where(F.col("pred") == RDF_TYPE)
        .groupBy(F.col("subj").alias("node"))
        .agg(F.concat_ws(
            "|", F.array_sort(F.collect_set("obj"))).alias("sig"))
    )
    edges = (
        triples.where((F.col("obj_type") == "iri")
                      & (F.col("pred") != RDF_TYPE))
        .select("subj", "pred", "obj")
    )
    ssig = types.select(F.col("node").alias("_sn"), F.col("sig").alias("_ss"))
    osig = types.select(F.col("node").alias("_on"), F.col("sig").alias("_os"))
    return (
        edges.join(ssig, edges["subj"] == ssig["_sn"], "left")
        .join(osig, edges["obj"] == osig["_on"], "left")
        .groupBy(
            F.coalesce("_ss", F.lit("(untyped)")).alias("src_sig"),
            "pred",
            F.coalesce("_os", F.lit("(untyped)")).alias("dst_sig"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sql_schema_summary(triples_sql: str) -> str:
    """DuckDB twin of :func:`schema_summary` — string_agg(DISTINCT ..
    ORDER BY) reproduces the sorted signature exactly."""
    return f"""
WITH t AS MATERIALIZED ({triples_sql}),
sig AS (
  SELECT subj AS node, string_agg(DISTINCT obj, '|' ORDER BY obj) AS sig
  FROM t WHERE pred = '{RDF_TYPE}' GROUP BY subj),
e AS (SELECT subj, pred, obj FROM t
      WHERE obj_type = 'iri' AND pred <> '{RDF_TYPE}')
SELECT COALESCE(s.sig, '(untyped)') AS src_sig, e.pred,
       COALESCE(o.sig, '(untyped)') AS dst_sig,
       CAST(COUNT(*) AS BIGINT) AS n
FROM e LEFT JOIN sig s ON s.node = e.subj
LEFT JOIN sig o ON o.node = e.obj
GROUP BY 1, 2, 3
"""


def store_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """('added'|'removed', repo, subj, pred, obj, obj_type) — the triple
    diff between two KG builds; the incremental-publishing primitive
    (ship the delta, not the snapshot) and the drift monitor between a
    re-translation and the store it replaces.

    Two anti-joins on the full identity, each tagged and unioned.
    Scale: both sides partition on the same 5-column identity hash, so
    at 100 TB this is one co-partitioned shuffle per side (or zero when
    both stores were WRITTEN bucketed by the store's (repo_bucket, pred)
    layout and read back with bucket pruning); output is |difference|-
    sized, typically ≪ either snapshot."""
    o = old.select(*TRIPLE_COLS).distinct()
    n = new.select(*TRIPLE_COLS).distinct()
    added = n.join(o, TRIPLE_COLS, "left_anti").select(
        F.lit("added").alias("change"), *TRIPLE_COLS)
    removed = o.join(n, TRIPLE_COLS, "left_anti").select(
        F.lit("removed").alias("change"), *TRIPLE_COLS)
    return added.unionByName(removed)


def sql_store_delta(old_sql: str, new_sql: str) -> str:
    """DuckDB twin of :func:`store_delta` — EXCEPT both ways."""
    cols = ", ".join(TRIPLE_COLS)
    return (
        f"WITH o AS MATERIALIZED (SELECT DISTINCT {cols} FROM ({old_sql}) xo), "
        f"n AS MATERIALIZED (SELECT DISTINCT {cols} FROM ({new_sql}) xn) "
        f"SELECT 'added' AS change, * FROM (SELECT * FROM n EXCEPT "
        f"SELECT * FROM o) a "
        f"UNION ALL SELECT 'removed', * FROM (SELECT * FROM o EXCEPT "
        f"SELECT * FROM n) r"
    )


def rdfs_closure_delta(base_closed: DataFrame, delta: DataFrame,
                       schema: DataFrame) -> DataFrame:
    """NEW entailments when `delta` instance triples arrive at an
    already-closed store: closure(old ∪ Δ) ∖ closure(old), computed in
    time LINEAR IN Δ — the incremental-maintenance twin of
    :func:`rdfs_closure` (semi-naive evaluation, Δ-restricted).

    Sound and complete for ρdf because every instance rule has exactly
    ONE instance antecedent (schema antecedents broadcast): any triple
    entailed by old ∪ Δ but not by old alone must derive from a Δ
    triple, and its whole derivation chain stays inside Δ's own closure
    (rdfs7 → rdfs2/3 → rdfs9 stratification). So the delta closure is
    rdfs_closure(Δ, schema) minus what the store already holds — one
    anti-join against the closed base, |Δ|-sized left side.

    Scale: this is the operator that makes materialized reasoning
    viable at 100 TB — re-closing the world per ingest batch is
    O(|store|); this is O(|Δ| + lookup), with the anti-join
    co-partitioned on the store's identity layout."""
    return (
        rdfs_closure(delta, schema)
        .join(base_closed.select(*TRIPLE_COLS), TRIPLE_COLS, "left_anti")
    )


def sql_rdfs_closure_delta(old_sql: str, delta_sql: str,
                           schema_sql: str) -> str:
    """DuckDB twin — the DEFINITION, not the incremental algorithm:
    closure(old ∪ Δ) EXCEPT closure(old). The gate passing is therefore
    a proof the linear-in-Δ path equals the recompute-the-world path."""
    both = f"SELECT * FROM ({old_sql}) a UNION ALL SELECT * FROM ({delta_sql}) b"
    return (
        f"SELECT * FROM ({sql_rdfs_closure(both, schema_sql)}) full_c "
        f"EXCEPT SELECT * FROM ({sql_rdfs_closure(old_sql, schema_sql)}) old_c"
    )


def negative_samples(triples: DataFrame, entities: DataFrame,
                     k: int = 2, salt: str = "neg-v1") -> DataFrame:
    """(subj, pred, obj, neg_obj, neg_idx) — deterministic corrupted
    triples for KG-embedding training (the TransE/DistMult negative-
    sampling pass): each positive (s, p, o) IRI triple yields `k`
    corruptions replacing the object with a pseudo-random entity drawn
    by portable hash of (salt, s, p, o, neg_idx) mod |E|. Self-
    collisions (drawn entity == true object) are dropped, not resampled
    — the standard filtered-sampling trade (a resample loop would make
    the row's value depend on corpus-global state).

    Determinism is the point: the same (triple, salt) draws the same
    negatives on any cluster size — reproducible epochs, auditable
    leakage, and a DuckDB twin that verifies every drawn row.

    Scale: entities get a dense 0..|E|-1 index via a range-partitioned
    global row number (no single-task sort); the draw joins triples ⋈
    entities ON the computed index — an equi-join that broadcasts when
    the entity dictionary fits and shuffles co-partitioned otherwise.
    Text never moves; every row is (4 strings, 2 longs)."""
    from .corpus.hashing import spark_h64
    from .operators import global_row_number

    ent = global_row_number(
        entities.select(F.col(entities.columns[0]).alias("entity"))
        .distinct(), order_by=["entity"], out_col="eidx")
    ent = ent.withColumn("eidx", F.col("eidx") - 1)  # dense 0-based
    n_ent = ent.groupBy(F.lit(1).alias("_k")).agg(
        F.count(F.lit(1)).alias("n_ent")).drop("_k")
    pos = triples.where(F.col("obj_type") == "iri") \
        .select("subj", "pred", "obj")
    expanded = pos.crossJoin(F.broadcast(n_ent)).selectExpr(
        "*", f"explode(sequence(0, {k - 1})) AS neg_idx")
    drawn = expanded.withColumn(
        "_draw",
        F.expr(spark_h64(
            f"concat_ws('\\u001f', '{salt}', subj, pred, obj, "
            "cast(neg_idx as string))")) % F.col("n_ent"))
    return (
        drawn.join(ent, drawn["_draw"] == ent["eidx"])
        .where(F.col("entity") != F.col("obj"))
        .select("subj", "pred", "obj",
                F.col("entity").alias("neg_obj"), "neg_idx")
    )


def sql_negative_samples(triples_sql: str, entities_sql: str,
                         k: int = 2, salt: str = "neg-v1") -> str:
    """DuckDB twin of :func:`negative_samples` — same dense entity
    index (row_number over the sorted distinct entities), same portable
    hash draw."""
    from .corpus.hashing import duck_h64

    h = duck_h64(
        f"concat_ws(chr(31), '{salt}', subj, pred, obj, "
        "CAST(neg_idx AS VARCHAR))")
    return f"""
WITH ent AS MATERIALIZED (
  SELECT entity, row_number() OVER (ORDER BY entity) - 1 AS eidx
  FROM (SELECT DISTINCT * FROM ({entities_sql}) re) e),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ent FROM ent),
pos AS (SELECT subj, pred, obj FROM ({triples_sql}) t
        WHERE obj_type = 'iri'),
ex AS (SELECT pos.*, i AS neg_idx FROM pos,
       unnest(range(0, {k})) AS t(i)),
dr AS (SELECT ex.*, ({h}) % n_ent AS draw FROM ex, ne)
SELECT dr.subj, dr.pred, dr.obj, ent.entity AS neg_obj,
       CAST(dr.neg_idx AS INTEGER) AS neg_idx
FROM dr JOIN ent ON ent.eidx = dr.draw
WHERE ent.entity <> dr.obj
"""


def characteristic_sets(triples: DataFrame) -> DataFrame:
    """(sig, n_subjects, n_triples) — Neumann & Moerkotte's
    characteristic sets (ICDE 2011): subjects grouped by the SET of
    predicates they carry. THE cardinality statistic a SPARQL optimizer
    keeps — star-join selectivity over a subject is read off the
    signatures that contain the star's predicates (n_subjects sums),
    and per-predicate multiplicity within a signature is
    n_triples / n_subjects. Distinct-predicate signatures also bound
    the schema's real shape far tighter than per-predicate counts.

    Scale: two hash-aggregates — (subj → sorted predicate set), then
    (sig → counts); the signature space is ontology-sized. The per-
    subject collect_set is bounded by a subject's predicate count (tens,
    even for fat hubs — it is the DISTINCT predicates, not the edges)."""
    per_subj = (
        triples.groupBy("subj")
        .agg(F.concat_ws("|", F.array_sort(
            F.collect_set("pred"))).alias("sig"),
             F.count(F.lit(1)).alias("_n"))
    )
    return (
        per_subj.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("n_subjects"),
             F.sum("_n").alias("n_triples"))
    )


def sql_characteristic_sets(triples_sql: str) -> str:
    """DuckDB twin of :func:`characteristic_sets`."""
    return (
        f"WITH t AS MATERIALIZED ({triples_sql}), "
        "ps AS (SELECT subj, string_agg(DISTINCT pred, '|' ORDER BY pred) "
        "AS sig, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY subj) "
        "SELECT sig, CAST(COUNT(*) AS BIGINT) AS n_subjects, "
        "CAST(SUM(n) AS BIGINT) AS n_triples FROM ps GROUP BY sig"
    )


def star_cardinality(triples: DataFrame, pred_a: str,
                     pred_b: str) -> DataFrame:
    """(sig, n_subjects, n_a, n_b, est_num, est_den, actual) — the
    characteristic-set star-join cardinality ESTIMATE next to the exact
    answer, per signature: what a SPARQL optimizer would predict for
    { ?s pred_a ?x . ?s pred_b ?y } within each subject class, and what
    the join really produces.

    The classic per-set independence estimate (Neumann & Moerkotte):
    within a set, est = n_subjects · (n_a/n_subjects) · (n_b/n_subjects)
    = n_a·n_b / n_subjects — kept as an EXACT integer rational
    (est_num, est_den), no floats; `actual` = Σ_s cnt_a(s)·cnt_b(s).
    Signatures not containing both predicates estimate (and produce) 0
    and are filtered.

    Scale: the same two hash-aggregates as characteristic_sets, with the
    two predicate counts riding the first as conditional sums — the
    statistic AND its evaluation in one pass, no self-join (the exact
    star count folds from per-subject multiplicities)."""
    per_subj = (
        triples.groupBy("subj")
        .agg(F.concat_ws("|", F.array_sort(
            F.collect_set("pred"))).alias("sig"),
             F.sum((F.col("pred") == pred_a).cast("long")).alias("ca"),
             F.sum((F.col("pred") == pred_b).cast("long")).alias("cb"))
    )
    return (
        per_subj.where((F.col("ca") > 0) & (F.col("cb") > 0))
        .groupBy("sig")
        .agg(F.count(F.lit(1)).alias("n_subjects"),
             F.sum("ca").alias("n_a"),
             F.sum("cb").alias("n_b"),
             F.sum(F.col("ca") * F.col("cb")).alias("actual"))
        .select("sig", "n_subjects", "n_a", "n_b",
                (F.col("n_a") * F.col("n_b")).alias("est_num"),
                F.col("n_subjects").alias("est_den"),
                "actual")
    )


def sql_star_cardinality(triples_sql: str, pred_a: str,
                         pred_b: str) -> str:
    """DuckDB twin of :func:`star_cardinality`."""
    return (
        f"WITH t AS MATERIALIZED ({triples_sql}), "
        "ps AS (SELECT subj, string_agg(DISTINCT pred, '|' ORDER BY pred) "
        "AS sig, "
        f"SUM(CASE WHEN pred = '{pred_a}' THEN 1 ELSE 0 END) AS ca, "
        f"SUM(CASE WHEN pred = '{pred_b}' THEN 1 ELSE 0 END) AS cb "
        "FROM t GROUP BY subj) "
        "SELECT sig, CAST(COUNT(*) AS BIGINT) AS n_subjects, "
        "CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b, "
        "CAST(SUM(ca) * SUM(cb) AS BIGINT) AS est_num, "
        "CAST(COUNT(*) AS BIGINT) AS est_den, "
        "CAST(SUM(ca * cb) AS BIGINT) AS actual "
        "FROM ps WHERE ca > 0 AND cb > 0 GROUP BY sig"
    )
