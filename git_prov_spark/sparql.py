"""SPARQL SELECT (subset) frontend — raw query strings over the triples table.

The reference accepts arbitrary SPARQL text and answers it with Jena ARQ over
the stored per-repo model (services/SparqlService.java:16-31,
controllers/SparqlController.java:33-43). This module closes the string gap
on top of the existing BGP compiler (queries.bgp): it parses a practical
SELECT subset and compiles it to the same Catalyst self-join plan — Catalyst
is the optimizer/executor, exactly as ARQ is for the reference.

Supported subset (documented, validated — anything else raises SparqlError):

    PREFIX foo: <iri>                           -- any number
    CONSTRUCT { s p o . ... } WHERE ...         -- template → triple DF;
    CONSTRUCT WHERE { BGP }                     --   §10.2.2 shorthand (the
                                                --   BGP is the template);
                                                --   ORDER BY/LIMIT/OFFSET
                                                --   cut the solution seq
                                                --   pre-template (§16.2)
    ASK { ... }                                 -- → bool (ask())
    DESCRIBE term|?var [...] [WHERE { ... }]    -- → subject triples (vars
                                                --   need the WHERE; one
                                                --   semi join, no collect)
    SELECT [DISTINCT] ?a ?b | *                 -- projection
    SELECT ?a (expr AS ?alias) ...              -- expression projection
                                                --   (non-aggregate queries)
    SELECT ?g (COUNT([DISTINCT] ?v|*) AS ?n)    -- aggregates: COUNT, SUM,
           (MIN(?v) AS ?lo)                     --   MIN, MAX, AVG (lexical
           (SUM([DISTINCT] ?a * ?b) AS ?dot)    --   -> double), SAMPLE (min
           (GROUP_CONCAT([DISTINCT] ?v;         --   witness), GROUP_CONCAT
                SEPARATOR=",") AS ?cs) ...      --   (sorted, deterministic);
    WHERE { s p o . s p o .                     --   args may be full value
                                                --   expressions; DISTINCT on
                                                --   any aggregate (value-
                                                --   level; no-op on MIN/
                                                --   MAX/SAMPLE) (r5)
            { SELECT ... } .                    -- subquery (SPARQL 1.1 §12):
                                                --   evaluates bottom-up, then
                                                --   joins on projected vars
            ?a path ?b .                        -- property paths, see below
            { s p o } UNION { s p o } .         -- alternative branches
            OPTIONAL { s p o . ... } .          -- left-join blocks
            MINUS { s p o . ... } .             -- anti-join on shared vars
            GRAPH ?g { s p o . ... } .          -- ?g binds the graph (repo)
            GRAPH "owner/name" { ... } .        --   name; constant scopes
            BIND(expr AS ?v) .                  -- value expressions below
            VALUES ?v { t1 t2 } .
            VALUES (?a ?b) { (t1 t2) (t3 t4) }  -- inline data (no UNDEF)
            FILTER(expr) }                      -- boolean expressions:
    Value expressions (BIND / FILTER operands / ORDER BY):
      term | STR | CONCAT | LCASE | UCASE | STRLEN | IF(cond, ve, ve) |
      COALESCE(ve, ...) | STRBEFORE/STRAFTER(ve, ve) |
      REPLACE(ve, pat, rep) (regex) | SUBSTR(ve, start[, len]) (1-based) |
      YEAR/MONTH/DAY/HOURS/MINUTES/SECONDS(ve) (xsd:dateTime lexical) |
      ABS/CEIL/FLOOR/ROUND(ve) (XPath: ROUND ties toward +INF) |
      MD5/SHA1/SHA256/SHA384/SHA512(ve) (lowercase hex) |
      ENCODE_FOR_URI(ve) | IRI/URI(ve) (≡ STR: lexical value) |
      DATATYPE(?v) (a map-side expression over the variable's term-metadata
      companion wherever the var came from a pattern; meta-less vars hoist
      through one equi join on the store's obj_type — both usable in
      projection expressions, ORDER BY, FILTERs and nested BINDs) |
      LANG(ve) (the term's language tag — real tags when the store carries
      '@tag' obj_type metadata; "" for untagged terms) |
      LANGMATCHES(ve, ve) (RFC 4647 basic filtering) |
      SAMETERM(ve, ve) (value + term-metadata equality) |
      STRLANG(ve, "tag") / STRDT(ve, dtype) (construct tagged/typed
      bindings — top-level BIND / projection expression only) |
      TZ(ve) ("Z" / "+hh:mm" / "") |
      TIMEZONE(ve) (xsd:dayTimeDuration lexical; unbound when no tz),
      with arithmetic ve + ve, -, *, / (double promotion), parenthesized.
      NOW()/RAND()/UUID()/STRUUID() exist in SEEDED deterministic form:
      execute(..., now="...", seed=N) pins NOW to the given constant and
      compiles RAND/UUID to a per-solution md5 of (string-typed bound
      columns, seed, call index); unseeded use is a loud parse error.
    FILTER grammar: e || e, e && e, !e, (e),    --   numeric comparison when
      ve OP ve with OP in = != < <= > >=,       --   a side is a number or
      ve [NOT] IN (t1, t2), regex(ve, "pat"),   --   numeric fn, else code-
      bound(?v), STRSTARTS/STRENDS/CONTAINS/    --   point string order
      LANGMATCHES (ve, ve),                     --   (like ARQ on simple
      [NOT] EXISTS { patterns },                --   literals)
      isIRI/isURI/isLiteral/isNumeric(?v),
      isBlank(?v) (constant false: no bnodes in this store or the reference)
      EXISTS and isIRI/isLiteral/isNumeric compile to ONE left-semi/anti
      join (EXISTS on the block's shared variables; is* against the graph's
      IRI-term / numeric-literal set) — top-level conjunct position only.
    GROUP BY ?g ...                             -- required iff aggregates
    HAVING(?alias > n) / HAVING(AGG(x) > n)     -- =  != > >= < <= over an
    ORDER BY [ASC|DESC](?v | expr | AGG(x))     --   alias or an INLINE
                                                --   aggregate (same single
                                                --   hash-agg, hidden col);
                                                --   expr and inline-agg
                                                --   sort keys allowed
    LIMIT n OFFSET m                            -- optional (either order)

Property paths (predicate position; SPARQL 1.1 [88]-[95] subset):

    pred            plain predicate        ^elt     inverse
    elt+            one-or-more            elt*     zero-or-more
    elt?            zero-or-one            !(p1|^p2|...)  negated prop set
    elt1 / elt2     sequence               elt1 | elt2   alternation
    ( path )        grouping

`+`/`*` compile to the distributed closure operators: when either endpoint
of a top-level `+`/`*` is a constant, the compiler runs SEEDED reachability
(operators.reachable_from — frontier ∘ edges, |reachable|-bounded) instead
of materializing the full closure and post-filtering; var-var paths use
path-doubling (operators.transitive_closure). The zero-length component of
`*` relates every term of the (repo-scoped) graph to itself, per spec —
with a constant endpoint it contributes just the seed.

Terms: ?var, <full-iri>, pname:local, "literal", "literal"^^dtype,
"literal"@tag, and the keyword `a` (rdf:type). Full IRIs are reverse-
mapped onto the store's CURIE vocabulary (iri.NAMESPACES + the per-repo
gitprov namespace when `repo` is passed; longest namespace prefix wins).

TYPED TERM MODEL (r5): when the queried frame carries obj_type, every
pattern variable binds a hidden term-metadata companion column
(queries.TERM_META: 'iri' | datatype CURIE | '@tag' for language-tagged
literals), so shared-variable joins, MINUS/EXISTS and DISTINCT are
TERM-correct — "7"^^xsd:int never joins/equals "7"^^xsd:string or "7"@en —
and DATATYPE/LANG/isIRI/isLiteral/isNumeric compile as map-side
expressions, no join. EXPLICITLY typed/tagged constants ("x"@en,
"1"^^xsd:int) match term-exactly in patterns, =/!= FILTERs, [NOT] IN
lists (each typed member compiles through the = path per §17.4.1.9) and
VALUES blocks (an all-typed column joins term-exactly via its companion
and can INTRODUCE typed terms; mixing plain and typed in one column is
a loud error) — numeric datatypes compare numerically per §17.1,
non-castable operands are type errors and the row drops; PLAIN
constants keep legacy lexical matching — the documented compatibility
rule. Where metadata is absent (property-path
endpoints, bare (s,p,o) frames, vars bound in only some UNION branches)
everything degrades to value-level behavior. GROUP BY keys are
TERM-level (same lexical under different datatypes/tags groups
separately; the projected key column shows the lexical, which may then
repeat across rows) and COUNT(DISTINCT ?v) counts distinct terms;
other aggregate INPUTS (SUM/MIN/MAX/SAMPLE/GROUP_CONCAT) stay
value-level (documented divergence).

FILTER inside OPTIONAL (§8.3): a block filter over only block variables
applies to the block's solutions pre-join (group scoping, equivalent); a
filter referencing ANY outer variable compiles into the left join's ON
condition (ARQ's LeftJoin(expr)) — including the outer-only-vars scope
corner. EXISTS / is* / DATATYPE-containing filters stay block-scoped.
Solution multiplicity is SPARQL's BAG semantics (§18.5), matching what ARQ
gives the reference: projecting a subset of the bound variables keeps one
row per WHERE solution (SELECT DISTINCT dedups), UNION concatenates branch
multisets (a solution produced by both branches appears twice), fixed-
length property paths (sequence `/`, alternation `|`, negated sets) carry
route multiplicity, and aggregates count bag solutions. Only the spec's
own set-valued forms dedup: `+` `*` `?` closures (ALP evaluation,
§18.4), CONSTRUCT output (a graph is a set), and DISTINCT itself. Queried
cross-repo (repo=None), the default graph is the set-union MERGE of the
per-repo graphs — pattern relations dedup after the repo column projects
away, so multiplicity never counts repo copies of one triple.
Property paths and block-scoped FILTERs work inside OPTIONAL / UNION /
MINUS / FILTER-EXISTS groups (each group evaluates as BGP ⋈ path
relations → its own FILTERs, then joins the outer solutions); CONSTRUCT
templates stay plain-predicate only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iri import NAMESPACES, gitprov_ns
from .queries import TERM_META, Pattern, TypedLit, bgp, term_meta


class SparqlError(ValueError):
    """Query text outside the supported SELECT subset."""


# SPARQL ECHAR escapes (grammar rule [160])
_ECHAR = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
          '"': '"', "'": "'", "\\": "\\"}


def _unescape_literal(body: str) -> str:
    def sub(m: re.Match) -> str:
        c = m.group(1)
        if c not in _ECHAR:
            raise SparqlError(f"unsupported string escape \\{c}")
        return _ECHAR[c]

    return re.sub(r"\\(.)", sub, body)


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)                      # whitespace / comment
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<lit>"(?:[^"\\]|\\.)*")
  | (?P<lang>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<dtype>\^\^)
  | (?P<pname>[A-Za-z][A-Za-z0-9_.-]*:[A-Za-z0-9_.%-]*)
  | (?P<word>[A-Za-z][A-Za-z0-9_]*)
  | (?P<num>[0-9]+(?:\.[0-9]+)?)
  | (?P<punct>[{}().=!,*<>+/|^&;?-])
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlError(f"unexpected character at offset {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            tokens.append((kind, m.group()))
    return tokens


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------

# FILTER expression AST (nested tuples, like BindExpr):
#   ('or'|'and', [exprs]) | ('not', expr)
#   ('cmp', op, ve, ve)            op ∈ = != < <= > >=
#   ('in', ve, [consts], negated)
#   ('regex', ve, pattern)
#   ('bound', varname)
#   ('boolfn', 'strstarts'|'strends'|'contains', [ve, ve])
#   ('exists', Group, negated)     — compiled to a semi/anti join, so it
#                                    is only legal as a top-level conjunct
# value expressions (ve) are BindExpr (shared with BIND), extended with
# ('num', tok) numeric literals and lcase/ucase/strlen functions.
FilterExpr = tuple


# -- property-path AST (SPARQL 1.1 grammar [88]-[91] subset) ----------------

@dataclass(frozen=True)
class PathPred:
    pred: str


@dataclass(frozen=True)
class PathInv:
    inner: "PathExpr"


@dataclass(frozen=True)
class PathSeq:
    parts: tuple


@dataclass(frozen=True)
class PathAlt:
    parts: tuple


@dataclass(frozen=True)
class PathPlus:
    inner: "PathExpr"


@dataclass(frozen=True)
class PathStar:
    inner: "PathExpr"


@dataclass(frozen=True)
class PathOpt:
    """`elt?` — zero-or-one: inner ∪ the identity relation over graph terms."""
    inner: "PathExpr"


@dataclass(frozen=True)
class PathNeg:
    """`!(iri | ^iri | ...)` — negated property set (SPARQL 1.1 [95]):
    forward edges whose predicate is NOT in `fwd`, plus reversed edges
    whose predicate is NOT in `inv` (either tuple may be empty; at least
    one is populated). A single-member set parses as !iri / !^iri."""
    fwd: tuple
    inv: tuple


PathExpr = (PathPred | PathInv | PathSeq | PathAlt | PathPlus | PathStar
            | PathOpt | PathNeg)

# BIND / value expression AST: ('const', value) | ('num', tok) |
# ('var', name) | ('concat', [exprs]) | ('str'|'lcase'|'ucase'|'strlen', expr)
# | ('arith', '+'|'-'|'*'|'/', expr, expr)
BindExpr = tuple


@dataclass
class Group:
    """A braced graph-pattern group: plain triple patterns + property-path
    patterns + block-scoped FILTERs (the shape of OPTIONAL / MINUS / UNION
    branches and FILTER-EXISTS blocks)."""
    patterns: list = field(default_factory=list)   # [(s, pred, o)]
    paths: list = field(default_factory=list)      # [(s, PathExpr, o)]
    filters: list = field(default_factory=list)    # [FilterExpr]


@dataclass
class Agg:
    func: str             # 'count'|'sum'|'min'|'max'|'avg'|'sample'|'group_concat'
    var: str | None       # plain-?var argument; None = COUNT(*) or expr arg
    distinct: bool
    alias: str            # output column name (no '?')
    sep: str = " "        # GROUP_CONCAT separator (SEPARATOR=".." clause)
    expr: tuple | None = None  # value-expression argument (BindExpr), r5


@dataclass
class SelectQuery:
    prefixes: dict[str, str] = field(default_factory=dict)
    distinct: bool = False
    variables: list[str] | None = None      # None = SELECT *
    aggregates: list[Agg] = field(default_factory=list)
    select_order: list[str] = field(default_factory=list)  # output col order
    patterns: list[Pattern] = field(default_factory=list)
    # (s, PathExpr, o) — any non-plain predicate position (+ * / | ^)
    path_patterns: list[tuple] = field(default_factory=list)
    unions: list[list[Group]] = field(default_factory=list)  # UNION chains
    subqueries: list["SelectQuery"] = field(default_factory=list)
    optionals: list[Group] = field(default_factory=list)
    minuses: list[Group] = field(default_factory=list)
    binds: list[tuple] = field(default_factory=list)    # (BindExpr, out var)
    # (BindExpr, alias) — (expr AS ?alias) projection expressions; applied
    # like trailing BINDs once the WHERE solutions exist
    proj_exprs: list[tuple] = field(default_factory=list)
    values_blocks: list[tuple] = field(default_factory=list)  # (vars, rows)
    filters: list[FilterExpr] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    # (BindExpr, alias) — GROUP BY (expr AS ?alias) keys (r5): computed
    # map-side like a BIND, then grouped on the alias (which group_by also
    # lists), so the plan stays one hash-aggregate
    group_exprs: list[tuple] = field(default_factory=list)
    # (alias-name | inline Agg, op, num) — inline aggregates become hidden
    # columns of the projection hash-aggregate (r5)
    having: list[tuple] = field(default_factory=list)
    # (var-name | BindExpr | inline Agg, asc) — plain vars stay strings,
    # expression sort keys carry their BindExpr, inline aggregates (r5)
    # become hidden columns of the projection hash-aggregate
    order_by: list[tuple] = field(default_factory=list)
    # (graph-term, Group): GRAPH ?g { ... } / GRAPH "owner/name" { ... }
    graphs: list[tuple] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    construct: list[Pattern] | None = None  # CONSTRUCT template
    form: str = "select"                    # select | construct | ask | describe
    describe_terms: list[str] = field(default_factory=list)
    describe_vars: list[str] = field(default_factory=list)
    describe_where: bool = False            # a WHERE clause was parsed


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], repo: str | None,
                 now: str | None = None, seed: int | None = None):
        self.toks = tokens
        self.i = 0
        self.q = SelectQuery()
        # seeded deterministic forms of SPARQL's nondeterministic builtins:
        # NOW() substitutes the caller's `now` constant at parse time (ARQ
        # also fixes one value per query execution); RAND()/UUID()/STRUUID()
        # compile to a per-solution hash of (bound columns, seed, call
        # index). Unseeded use stays a loud parse error — the oracle gate
        # (and any reproducible pipeline) needs determinism.
        self.now = now
        self.seed = seed
        self.n_nondet = 0
        # reverse map full IRI prefix -> CURIE prefix for constant resolution
        self.ns = dict(NAMESPACES)
        if repo is not None:
            self.ns["gitprov"] = gitprov_ns(repo)

    # -- token helpers ----------------------------------------------------
    def _peek(self) -> tuple[str, str]:
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def _next(self) -> tuple[str, str]:
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, value: str) -> None:
        kind, tok = self._next()
        if tok.upper() != value.upper():
            raise SparqlError(f"expected {value!r}, got {tok!r}")

    def _kw(self, value: str) -> bool:
        kind, tok = self._peek()
        if kind == "word" and tok.upper() == value.upper():
            self.i += 1
            return True
        return False

    # -- grammar ----------------------------------------------------------
    def parse(self) -> SelectQuery:
        while self._kw("PREFIX"):
            kind, pname = self._next()
            if kind != "pname" or not pname.endswith(":"):
                raise SparqlError(f"bad PREFIX name {pname!r}")
            kind, iri = self._next()
            if kind != "iri":
                raise SparqlError(f"bad PREFIX iri {iri!r}")
            self.q.prefixes[pname[:-1]] = iri[1:-1]
        if self._kw("CONSTRUCT"):
            self.q.form = "construct"
            kind, tok = self._peek()
            if kind == "word" and tok.upper() == "WHERE":
                # CONSTRUCT WHERE { BGP } shorthand (§10.2.2): the WHERE
                # pattern IS the template — filled in post-parse, once the
                # group is known to be a plain BGP
                self._construct_shorthand = True
            else:
                self.q.construct = self._parse_template()
        elif self._kw("ASK"):
            self.q.form = "ask"
        elif self._kw("DESCRIBE"):
            self.q.form = "describe"
            while True:
                k = self._peek()[0]
                if k in ("pname", "iri"):
                    self.q.describe_terms.append(
                        self._term(as_pattern=False))
                elif k == "var":
                    self.q.describe_vars.append(self._next()[1][1:])
                else:
                    break
            if not self.q.describe_terms and not self.q.describe_vars:
                raise SparqlError(
                    "DESCRIBE needs one or more constant terms or ?vars")
            if self._peek()[0] == "eof":
                if self.q.describe_vars:
                    raise SparqlError(
                        "DESCRIBE with variables needs a WHERE clause "
                        "(§16.4: the vars must be bound by a pattern)")
                return self.q
            # DESCRIBE ... WHERE { ... }: the group binds the describe
            # vars; constants are described unconditionally (ARQ-style)
            self.q.describe_where = True
        else:
            self._expect("SELECT")
            self.q.distinct = self._kw("DISTINCT")
            self._parse_projection()
        if self.q.form == "ask":
            self._kw("WHERE")        # WHERE is optional for ASK
        else:
            self._expect("WHERE")
        self._expect("{")
        self._parse_group()
        if self.q.form == "select":
            self._parse_modifiers()
        elif self.q.form == "construct":
            if getattr(self, "_construct_shorthand", False):
                if (self.q.path_patterns or self.q.unions
                        or self.q.optionals or self.q.minuses or self.q.binds
                        or self.q.filters or self.q.values_blocks
                        or self.q.subqueries or self.q.graphs):
                    raise SparqlError(
                        "CONSTRUCT WHERE shorthand allows only a plain "
                        "BGP (§10.2.2) — spell the template out for "
                        "anything richer")
                if not self.q.patterns:
                    raise SparqlError("empty CONSTRUCT WHERE pattern")
                self.q.construct = list(self.q.patterns)
            # solution modifiers apply to the solution sequence BEFORE
            # template instantiation (§16.2): ORDER BY + LIMIT selects the
            # top-N solutions; grouping forms have no construct meaning
            self._parse_modifiers()
            if self.q.aggregates or self.q.group_by or self.q.having:
                raise SparqlError(
                    "GROUP BY / HAVING / aggregates are not allowed in "
                    "CONSTRUCT (no projection to aggregate into)")
        if self._peek()[0] != "eof":
            raise SparqlError(f"trailing input at {self._peek()[1]!r}")
        return self.q

    def _parse_template(self) -> list[Pattern]:
        out = self._parse_braced_patterns()
        if not out:
            raise SparqlError("empty CONSTRUCT template")
        return out

    def _pred_position(self) -> str | PathExpr:
        """Predicate position: a plain term (str — ?var or constant) or a
        PathExpr when any path operator (+ * / | ^ parens) appears.
        Path-ness is carried out of band (SelectQuery.path_patterns), never
        as a string suffix — a full-IRI predicate may legitimately END in
        '+', so in-band marking would misclassify it."""
        if self._peek()[0] == "var":  # variable predicate: no path ops allowed
            return self._next()[1]
        path = self._parse_path()
        if isinstance(path, PathPred):
            return path.pred  # plain predicate — stays a regular pattern
        return path

    # Path := Seq ('|' Seq)* ; Seq := Elt ('/' Elt)* ;
    # Elt := '^'? Primary ('+'|'*')? ; Primary := term | '(' Path ')'
    def _parse_path(self) -> PathExpr:
        parts = [self._parse_path_seq()]
        while self._peek()[1] == "|":
            self.i += 1
            parts.append(self._parse_path_seq())
        return parts[0] if len(parts) == 1 else PathAlt(tuple(parts))

    def _parse_path_seq(self) -> PathExpr:
        parts = [self._parse_path_elt()]
        while self._peek()[1] == "/":
            self.i += 1
            parts.append(self._parse_path_elt())
        return parts[0] if len(parts) == 1 else PathSeq(tuple(parts))

    def _parse_path_elt(self) -> PathExpr:
        inverse = False
        if self._peek()[1] == "^":
            self.i += 1
            inverse = True
        if self._peek()[1] == "!":
            self.i += 1
            prim: PathExpr = self._parse_negated_set()
        elif self._peek()[1] == "(":
            self.i += 1
            prim = self._parse_path()
            self._expect(")")
        else:
            term = self._term(as_pattern=True, predicate=True)
            if term.startswith("?"):
                raise SparqlError("property paths need constant predicates")
            prim = PathPred(term)
        mod = self._peek()[1]
        if mod == "+":
            self.i += 1
            prim = PathPlus(prim)
        elif mod == "*":
            self.i += 1
            prim = PathStar(prim)
        elif mod == "?":
            self.i += 1
            prim = PathOpt(prim)
        elif mod == "{":
            self.i += 1
            prim = self._finish_path_range(prim)
        return PathInv(prim) if inverse else prim

    def _finish_path_range(self, prim: PathExpr) -> PathExpr:
        """ARQ's path quantifiers `e{n}` / `e{n,m}` / `e{n,}` / `e{,m}`
        (dropped from the SPARQL 1.1 REC but kept by Jena's engine, which
        the reference delegates to — services/SparqlService.java:26),
        desugared at parse time onto the existing AST: a fixed count is a
        sequence of n copies, a bounded range the multiset alternation of
        its fixed lengths (§18.4 union), an open range n-1 copies feeding
        `+`. Zero lower bounds take the `?`/`*` zero-length-path nodes, so
        the compiler and the seeded constant-endpoint fast path are
        untouched. Caller has consumed the '{'."""
        lo: int | None = None
        hi: int | None = None
        kind, tok = self._next()
        if kind == "num":
            lo = int(tok)
            kind, tok = self._next()
        if tok == ",":
            kind, tok = self._next()
            if kind == "num":
                hi = int(tok)
                kind, tok = self._next()
        else:
            hi = lo
        if tok != "}" or (lo is None and hi is None):
            raise SparqlError("malformed path quantifier {n,m}")
        lo = lo or 0
        if hi is not None and hi < max(lo, 1):
            raise SparqlError(
                f"path quantifier upper bound below lower: {{{lo},{hi}}}"
                + (" — e{0} (the pure zero-length path) is out of subset;"
                   " use e? or e* for zero-length semantics" if hi == 0
                   else "")
            )

        def n_seq(n: int) -> PathExpr:
            return prim if n == 1 else PathSeq(tuple([prim] * n))

        if hi is None:  # {n,} — unbounded
            if lo == 0:
                return PathStar(prim)
            if lo == 1:
                return PathPlus(prim)
            return PathSeq(tuple([prim] * (lo - 1) + [PathPlus(prim)]))
        alts = [n_seq(k) for k in range(max(lo, 1), hi + 1)]
        expr = alts[0] if len(alts) == 1 else PathAlt(tuple(alts))
        # {0,m}: zero-length ∪ lengths 1..m — PathOpt carries the
        # distinct-when-zero-length convention shared with `?`/`*`
        return PathOpt(expr) if lo == 0 else expr

    def _parse_negated_set(self) -> PathNeg:
        """After '!': iri | ^iri | '(' iri-or-^iri ('|' ...)* ')' — the
        PathNegatedPropertySet production ([95]); members must be plain
        (possibly inverted) predicates, no nested path operators."""
        fwd: list[str] = []
        inv: list[str] = []

        def member() -> None:
            inverted = self._peek()[1] == "^"
            if inverted:
                self.i += 1
            term = self._term(as_pattern=True, predicate=True)
            if term.startswith("?"):
                raise SparqlError("negated property sets need constant IRIs")
            (inv if inverted else fwd).append(term)

        if self._peek()[1] == "(":
            self.i += 1
            member()
            while self._peek()[1] == "|":
                self.i += 1
                member()
            self._expect(")")
        else:
            member()
        return PathNeg(tuple(fwd), tuple(inv))

    def _parse_braced_patterns(self) -> list[Pattern]:
        g = self._parse_block()
        if g.filters:
            raise SparqlError("FILTER is not allowed in this block")
        if g.paths:
            raise SparqlError("property paths are not allowed in this block")
        return g.patterns

    def _parse_block(self) -> Group:
        """{ s p o . ... FILTER(...) ... } — triple patterns (property
        paths allowed in predicate position) plus block-scoped FILTERs
        (applied to the block's own solutions before it joins the outer
        group, SPARQL group-scoping)."""
        self._expect("{")
        g = Group()
        while self._peek()[1] != "}":
            kind, tok = self._peek()
            if kind == "eof":
                raise SparqlError("unterminated pattern group")
            if kind == "word" and tok.upper() == "FILTER":
                self.i += 1
                self._expect("(")
                g.filters.append(self._parse_f_or())
                self._expect(")")
            else:
                s = self._term(as_pattern=True)
                p = self._pred_position()
                o = self._term(as_pattern=True)
                if isinstance(p, str):
                    g.patterns.append((s, p, o))
                else:
                    g.paths.append((s, p, o))
            if self._peek()[1] == ".":
                self.i += 1
        self.i += 1
        return g

    _AGG_FUNCS = ("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE",
                  "GROUP_CONCAT")

    def _parse_projection(self) -> None:
        kind, tok = self._peek()
        if tok == "*":
            self.i += 1
            self.q.variables = None
            return
        out: list[str] = []
        while True:
            kind, tok = self._peek()
            if kind == "var":
                self.i += 1
                out.append(tok[1:])
                self.q.select_order.append(tok[1:])
            elif tok == "(":
                nxt = (self.toks[self.i + 1]
                       if self.i + 1 < len(self.toks) else ("eof", ""))
                if (nxt[0] == "word"
                        and nxt[1].upper() in self._AGG_FUNCS):
                    self.i += 1
                    self.q.aggregates.append(self._parse_agg())
                    self.q.select_order.append(self.q.aggregates[-1].alias)
                else:
                    # (expr AS ?alias) — expression projection (SPARQL
                    # SelectClause [9]): compiled like a trailing BIND, so
                    # DATATYPE/LANG/STRLANG/... work here without a hoist
                    self.i += 1
                    expr = self._parse_bind_expr()
                    self._expect("AS")
                    knd, alias = self._next()
                    if knd != "var":
                        raise SparqlError("projection expression needs "
                                          "`AS ?alias`")
                    self._expect(")")
                    self.q.proj_exprs.append((expr, alias[1:]))
                    out.append(alias[1:])
                    self.q.select_order.append(alias[1:])
            else:
                break
        if not out and not self.q.aggregates:
            raise SparqlError("SELECT needs ?vars, (AGG(...) AS ?alias), or *")
        self.q.variables = out

    def _parse_agg(self) -> Agg:
        """After the opening '(': AGG([DISTINCT] ?v | *) AS ?alias )."""
        agg = self._parse_agg_core()
        self._expect("AS")
        kind, alias = self._next()
        if kind != "var":
            raise SparqlError("AS needs a ?alias variable")
        self._expect(")")
        agg.alias = alias[1:]
        return agg

    def _parse_agg_core(self) -> Agg:
        """AGG([DISTINCT] ?v | expr | *) through its closing ')' — shared
        by projection aggregates (which add AS ?alias) and inline HAVING
        aggregates (which get a hidden alias at compile time)."""
        kind, fn = self._next()
        if kind != "word" or fn.upper() not in self._AGG_FUNCS:
            raise SparqlError(
                f"aggregate must be one of {self._AGG_FUNCS}, got {fn!r}"
            )
        func = fn.lower()
        self._expect("(")
        distinct = self._kw("DISTINCT")
        var: str | None = None
        expr: tuple | None = None
        if self._peek()[1] == "*":
            self.i += 1
            if func != "count" or distinct:
                raise SparqlError("only COUNT(*) may take *")
        elif (self._peek()[0] == "var"
              and self.i + 1 < len(self.toks)
              and self.toks[self.i + 1][1] in (")", ";")):
            # plain ?var argument (the fast path: meta-aware COUNT
            # DISTINCT and column-direct aggregation)
            var = self._next()[1][1:]
        else:
            # full value-expression argument (r5): SUM(?a * ?b),
            # MIN(STRLEN(?x)), COUNT(DISTINCT CONCAT(?a, ?b)), ...
            expr = self._parse_bind_expr()
        sep = " "
        if self._peek()[1] == ";":  # GROUP_CONCAT(?v; SEPARATOR=", ")
            if func != "group_concat":
                raise SparqlError("SEPARATOR is only valid in GROUP_CONCAT")
            self.i += 1
            if not self._kw("SEPARATOR"):
                raise SparqlError("expected SEPARATOR after ';'")
            self._expect("=")
            kind, lit = self._next()
            if kind != "lit":
                raise SparqlError("SEPARATOR needs a string literal")
            sep = _unescape_literal(lit[1:-1])
        self._expect(")")
        return Agg(func=func, var=var, distinct=distinct, alias="",
                   sep=sep, expr=expr)

    def _parse_group(self) -> None:
        while True:
            kind, tok = self._peek()
            if tok == "}":
                self.i += 1
                return
            if tok == "{":
                nxt = (self.toks[self.i + 1]
                       if self.i + 1 < len(self.toks) else ("eof", ""))
                if nxt[0] == "word" and nxt[1].upper() == "SELECT":
                    self.i += 1
                    self.q.subqueries.append(self._parse_subquery())
                    self._expect("}")
                    if self._peek()[1] == ".":
                        self.i += 1
                    continue
                branches = [self._parse_block()]
                while self._kw("UNION"):
                    branches.append(self._parse_block())
                if len(branches) < 2:
                    raise SparqlError(
                        "a braced group must be a UNION chain "
                        "({ ... } UNION { ... }) or a { SELECT ... } subquery"
                    )
                if any(not b.patterns and not b.paths for b in branches):
                    raise SparqlError("empty UNION branch")
                self.q.unions.append(branches)
            elif kind == "word" and tok.upper() == "FILTER":
                self.i += 1
                self._parse_filter()
            elif kind == "word" and tok.upper() == "GRAPH":
                # GRAPH term { patterns }: the term is ?var (binds each
                # solution's graph name — the repo column, the analog of the
                # reference's named TDB models, StoreService.java:38-44) or
                # a constant naming one graph ("owner/name" literal or IRI)
                self.i += 1
                gterm = self._term(as_pattern=True)
                block = self._parse_block()
                if not block.patterns and not block.paths:
                    raise SparqlError("empty GRAPH block")
                self.q.graphs.append((gterm, block))
            elif kind == "word" and tok.upper() in ("OPTIONAL", "MINUS"):
                keyword = tok.upper()
                self.i += 1
                block = self._parse_block()
                if not block.patterns and not block.paths:
                    raise SparqlError(f"empty {keyword} block")
                if keyword == "OPTIONAL":
                    self.q.optionals.append(block)
                else:
                    self.q.minuses.append(block)
            elif kind == "word" and tok.upper() == "BIND":
                self.i += 1
                self._parse_bind()
            elif kind == "word" and tok.upper() == "VALUES":
                self.i += 1
                self._parse_values()
            else:
                s = self._term(as_pattern=True)
                p = self._pred_position()
                o = self._term(as_pattern=True)
                if isinstance(p, str):
                    self.q.patterns.append((s, p, o))
                else:
                    self.q.path_patterns.append((s, p, o))
            if self._peek()[1] == ".":
                self.i += 1

    def _parse_subquery(self) -> SelectQuery:
        """{ SELECT ... WHERE { ... } [modifiers] } — a nested child parser
        shares the token stream and namespace table; the inner query
        evaluates fully (its own grouping/ordering/LIMIT), then joins the
        outer solutions on its PROJECTED variables, per SPARQL 1.1 §12."""
        sub = _Parser([], None, self.now, self.seed)
        sub.toks = self.toks
        sub.i = self.i
        sub.ns = self.ns
        sub.n_nondet = self.n_nondet   # RAND/UUID call indices stay unique
        sub.q.prefixes = dict(self.q.prefixes)
        sub._expect("SELECT")
        sub.q.distinct = sub._kw("DISTINCT")
        sub._parse_projection()
        sub._expect("WHERE")
        sub._expect("{")
        sub._parse_group()
        sub._parse_modifiers()
        self.i = sub.i
        self.n_nondet = sub.n_nondet
        return sub.q

    def _parse_bind(self) -> None:
        """BIND ( expr AS ?v ) — expr: term | STR(?v) | CONCAT(e1, e2, ...)."""
        self._expect("(")
        expr = self._parse_bind_expr()
        self._expect("AS")
        kind, var = self._next()
        if kind != "var":
            raise SparqlError("BIND needs `AS ?var`")
        self._expect(")")
        self.q.binds.append((expr, var[1:]))

    _UNARY_STR_FNS = {"STR": "str", "LCASE": "lcase", "UCASE": "ucase",
                      "STRLEN": "strlen"}

    def _parse_bind_expr(self) -> BindExpr:
        """Value expression with arithmetic: add/sub over mul/div over
        primaries (numeric promotion to double, SPARQL operator mapping)."""
        left = self._parse_mul_expr()
        while self._peek()[1] in ("+", "-"):
            op = self._next()[1]
            left = ("arith", op, left, self._parse_mul_expr())
        return left

    def _parse_mul_expr(self) -> BindExpr:
        left = self._parse_prim_expr()
        while self._peek()[1] in ("*", "/"):
            op = self._next()[1]
            left = ("arith", op, left, self._parse_prim_expr())
        return left

    _DT_FNS = {"YEAR": "year", "MONTH": "month", "DAY": "day",
               "HOURS": "hours", "MINUTES": "minutes", "SECONDS": "seconds"}
    _STR2_FNS = {"STRBEFORE": "strbefore", "STRAFTER": "strafter"}
    _NUM_FNS = {"ABS": "abs", "CEIL": "ceil", "FLOOR": "floor",
                "ROUND": "round"}
    _HASH_FNS = {"MD5": "md5", "SHA1": "sha1", "SHA256": "sha256",
                 "SHA384": "sha384", "SHA512": "sha512"}

    def _parse_fn_args(self, lo: int, hi: int, what: str) -> list:
        """'(' expr (',' expr)* ')' with arity validation."""
        self._expect("(")
        args = [self._parse_bind_expr()]
        while self._peek()[1] == ",":
            self.i += 1
            args.append(self._parse_bind_expr())
        self._expect(")")
        if not (lo <= len(args) <= hi):
            want = str(lo) if lo == hi else f"{lo}-{hi}"
            raise SparqlError(f"{what} takes {want} argument(s)")
        return args

    def _parse_prim_expr(self) -> BindExpr:
        kind, tok = self._peek()
        if tok == "(":
            self.i += 1
            inner = self._parse_bind_expr()
            self._expect(")")
            return inner
        up = tok.upper() if kind == "word" else ""
        if up == "IF":
            # IF(boolean-condition, then, else) — the condition re-uses the
            # FILTER grammar (minus EXISTS, which is a join, not a value)
            self.i += 1
            self._expect("(")
            cond = self._parse_f_or()
            self._expect(",")
            a = self._parse_bind_expr()
            self._expect(",")
            b = self._parse_bind_expr()
            self._expect(")")
            return ("if", cond, a, b)
        if up == "COALESCE":
            self.i += 1
            return ("coalesce", self._parse_fn_args(1, 99, "COALESCE"))
        if up in self._STR2_FNS:
            self.i += 1
            return (self._STR2_FNS[up], self._parse_fn_args(2, 2, up))
        if up == "REPLACE":
            self.i += 1
            return ("replace", self._parse_fn_args(3, 3, "REPLACE"))
        if up == "SUBSTR":
            self.i += 1
            return ("substr", self._parse_fn_args(2, 3, "SUBSTR"))
        if up in self._DT_FNS:
            self.i += 1
            return (self._DT_FNS[up], self._parse_fn_args(1, 1, up)[0])
        if up in self._NUM_FNS:
            self.i += 1
            return (self._NUM_FNS[up], self._parse_fn_args(1, 1, up)[0])
        if up in self._HASH_FNS:
            self.i += 1
            return (self._HASH_FNS[up], self._parse_fn_args(1, 1, up)[0])
        if up == "ENCODE_FOR_URI":
            self.i += 1
            return ("encode_for_uri", self._parse_fn_args(1, 1, up)[0])
        if up in ("IRI", "URI"):
            # the term model is all-string lexical forms (constants are
            # already prefix-expanded by the term parser; no BASE support),
            # so IRI(e) is the string value of e — same compile as STR
            self.i += 1
            return ("str", self._parse_fn_args(1, 1, up)[0])
        if up == "DATATYPE":
            # term-level typing lives on the triple (obj_type), not in the
            # lexical form — compiled as a left join at BIND-apply time
            self.i += 1
            return ("datatype", self._parse_fn_args(1, 1, up)[0])
        if up == "LANG":
            self.i += 1
            return ("lang", self._parse_fn_args(1, 1, "LANG")[0])
        if up == "LANGMATCHES":
            self.i += 1
            return ("langmatches", self._parse_fn_args(2, 2, "LANGMATCHES"))
        if up == "TZ":
            self.i += 1
            return ("tz", self._parse_fn_args(1, 1, "TZ")[0])
        if up == "TIMEZONE":
            self.i += 1
            return ("timezone", self._parse_fn_args(1, 1, "TIMEZONE")[0])
        if up in ("STRLANG", "STRDT"):
            # constructs a language-tagged / datatype-carrying literal: the
            # value lands in the variable's value column, the tag/datatype
            # in its hidden term-metadata companion (queries.term_meta) —
            # legal only as the TOP-LEVEL expression of a BIND or projection
            # expression (a nested use would lose the second column; the
            # binds loop raises there)
            self.i += 1
            args = self._parse_fn_args(2, 2, up)
            tagexpr = args[1]
            if tagexpr[0] != "const":
                raise SparqlError(
                    f"{up} takes a constant tag/datatype second argument")
            tag = tagexpr[1]
            if up == "STRLANG":
                return ("strlang", args[0], "@" + str(tag).lower())
            return ("strdt", args[0], str(tag))
        if up in ("NOW", "RAND", "UUID", "STRUUID"):
            self.i += 1
            self._expect("(")
            self._expect(")")
            if up == "NOW":
                if self.now is None:
                    raise SparqlError(
                        "NOW() is nondeterministic — pass now=\"...\" (an "
                        "xsd:dateTime lexical) to execute() to pin it")
                return ("const", self.now)
            if self.seed is None:
                raise SparqlError(
                    f"{up}() is nondeterministic — pass seed=N to "
                    "execute() for the seeded per-solution form")
            self.n_nondet += 1
            kinds = {"RAND": "rand", "UUID": "uuid", "STRUUID": "struuid"}
            return (kinds[up], int(self.seed), self.n_nondet)
        if kind == "word" and (
            tok.upper() == "CONCAT" or tok.upper() in self._UNARY_STR_FNS
        ):
            fn = tok.upper()
            self.i += 1
            self._expect("(")
            args = [self._parse_bind_expr()]
            while self._peek()[1] == ",":
                self.i += 1
                args.append(self._parse_bind_expr())
            self._expect(")")
            if fn in self._UNARY_STR_FNS:
                if len(args) != 1:
                    raise SparqlError(f"{fn} takes exactly one argument")
                return (self._UNARY_STR_FNS[fn], args[0])
            return ("concat", args)
        if kind == "num":
            self.i += 1
            return ("num", tok)
        if kind == "var":
            self.i += 1
            return ("var", tok[1:])
        # _term would echo a quoted literal that HAPPENS to start with '?'
        # (e.g. "?e1") — classify on the token kind, never the spelling
        return ("const", self._term(as_pattern=False))

    def _parse_values(self) -> None:
        """VALUES ?v { t1 t2 } | VALUES (?a ?b) { (t1 t2) (t3 t4) }."""
        names: list[str] = []
        if self._peek()[0] == "var":
            names.append(self._next()[1][1:])
        else:
            self._expect("(")
            while self._peek()[0] == "var":
                names.append(self._next()[1][1:])
            self._expect(")")
        if not names:
            raise SparqlError("VALUES needs at least one ?var")
        self._expect("{")
        rows: list[tuple] = []
        while self._peek()[1] != "}":
            if self._peek()[0] == "eof":
                raise SparqlError("unterminated VALUES block")
            if len(names) == 1 and self._peek()[1] != "(":
                row = [self._term(as_pattern=False)]
            else:
                self._expect("(")
                row = []
                while self._peek()[1] != ")":
                    row.append(self._term(as_pattern=False))
                self.i += 1
            if len(row) != len(names) or any(t.startswith("?") for t in row):
                raise SparqlError(
                    "VALUES rows must be constant and match the var list "
                    "(UNDEF is out of subset)"
                )
            rows.append(tuple(row))
        self.i += 1
        if not rows:
            raise SparqlError("empty VALUES block")
        # Per-column term discipline: a column is either ALL explicitly
        # typed/tagged (term-exact inline terms) or ALL plain (legacy
        # value-level matching). Mixing would silently give two different
        # join semantics inside one inline relation — reject loudly.
        for j, n in enumerate(names):
            flags = [isinstance(r[j], TypedLit) for r in rows]
            if any(flags) and not all(flags):
                raise SparqlError(
                    f"VALUES column ?{n} mixes plain and explicitly "
                    "typed/tagged literals (a column is term-exact or "
                    "value-level as a whole; split the VALUES block)"
                )
        self.q.values_blocks.append((names, rows))

    def _parse_filter(self) -> None:
        """FILTER ( expr ): full boolean expression grammar — ||, &&, !,
        comparisons (= != < <= > >= over value expressions), [NOT] IN,
        regex(expr, "pat"), bound(?v), STRSTARTS/STRENDS/CONTAINS, and
        [NOT] EXISTS { patterns } (top-level conjunct only; it compiles to
        a semi/anti join, not a row predicate)."""
        self._expect("(")
        self.q.filters.append(self._parse_f_or())
        self._expect(")")

    def _parse_f_or(self) -> FilterExpr:
        parts = [self._parse_f_and()]
        while (self._peek()[1] == "|"
               and self.i + 1 < len(self.toks)
               and self.toks[self.i + 1][1] == "|"):
            self.i += 2
            parts.append(self._parse_f_and())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def _parse_f_and(self) -> FilterExpr:
        parts = [self._parse_f_unary()]
        while (self._peek()[1] == "&"
               and self.i + 1 < len(self.toks)
               and self.toks[self.i + 1][1] == "&"):
            self.i += 2
            parts.append(self._parse_f_unary())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def _parse_f_unary(self) -> FilterExpr:
        # '!' is negation here; '!=' only ever follows a value expression,
        # which _parse_f_primary handles in comparison position
        if (self._peek()[1] == "!"
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1][1] != "="):
            self.i += 1
            return ("not", self._parse_f_unary())
        return self._parse_f_primary()

    _BOOL_FNS = ("STRSTARTS", "STRENDS", "CONTAINS", "LANGMATCHES",
                 "SAMETERM")

    def _parse_f_primary(self) -> FilterExpr:
        kind, tok = self._peek()
        up = tok.upper() if kind == "word" else ""
        if tok == "(":
            # '(' opens either a boolean group — (?a = 1 || ?b = 2) — or a
            # parenthesized ARITHMETIC operand — (?a + 1) > 2. Try boolean
            # first; on failure rewind and re-parse as a comparison whose
            # left side is the parenthesized value expression. Both parses
            # only advance self.i (no q mutation), so rewinding is safe.
            mark = self.i
            try:
                self.i += 1
                inner = self._parse_f_or()
                self._expect(")")
                return inner
            except SparqlError:
                self.i = mark
                ve = self._parse_bind_expr()
                return self._parse_f_comparison(ve)
        if up in ("EXISTS", "NOT"):
            negated = up == "NOT"
            self.i += 1
            if negated and not self._kw("EXISTS"):
                raise SparqlError("expected EXISTS after NOT in FILTER")
            g = self._parse_block()
            if not g.patterns and not g.paths:
                raise SparqlError("empty EXISTS block")
            return ("exists", g, negated)
        if up in ("ISIRI", "ISURI", "ISLITERAL", "ISNUMERIC"):
            self.i += 1
            self._expect("(")
            kind, var = self._next()
            if kind != "var":
                raise SparqlError(f"{up}() needs a ?var argument")
            self._expect(")")
            fn = {"ISIRI": "isiri", "ISURI": "isiri",
                  "ISLITERAL": "isliteral", "ISNUMERIC": "isnumeric"}[up]
            return ("termfn", fn, var[1:])
        if up == "ISBLANK":
            # the KG mints a full IRI for every node (iri.py) and the
            # reference emits no blank nodes either (qualified names
            # throughout GitProvService.java), so isBlank is constant false.
            # Divergence note: SPARQL says isBlank(unbound) is an error
            # (row drops); here !isBlank(?unbound) keeps the row.
            self.i += 1
            self._expect("(")
            kind, var = self._next()
            if kind != "var":
                raise SparqlError("isBlank() needs a ?var argument")
            self._expect(")")
            return ("litbool", False)
        if up == "BOUND":
            self.i += 1
            self._expect("(")
            kind, var = self._next()
            if kind != "var":
                raise SparqlError("bound() needs a ?var argument")
            self._expect(")")
            return ("bound", var[1:])
        if up == "REGEX":
            self.i += 1
            self._expect("(")
            ve = self._parse_bind_expr()
            self._expect(",")
            kind, pat = self._next()
            if kind != "lit":
                raise SparqlError("regex() needs a string-literal pattern")
            self._expect(")")
            return ("regex", ve, _unescape_literal(pat[1:-1]))
        if up in self._BOOL_FNS:
            self.i += 1
            self._expect("(")
            a = self._parse_bind_expr()
            self._expect(",")
            b = self._parse_bind_expr()
            self._expect(")")
            return ("boolfn", up.lower(), [a, b])
        return self._parse_f_comparison(self._parse_bind_expr())

    def _parse_f_comparison(self, ve: BindExpr) -> FilterExpr:
        kind2, tok2 = self._peek()
        up2 = tok2.upper() if kind2 == "word" else ""
        if up2 == "IN" or (
            up2 == "NOT"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1][1].upper() == "IN"
        ):
            negated = up2 == "NOT"
            self.i += 2 if negated else 1
            self._expect("(")
            values: list[str] = []
            while True:
                v = self._term(as_pattern=False)
                if v.startswith("?"):
                    raise SparqlError("IN list must be constants")
                values.append(v)
                nxt = self._next()[1]
                if nxt == ")":
                    break
                if nxt != ",":
                    raise SparqlError(
                        f"expected ',' or ')' in IN list, got {nxt!r}"
                    )
            return ("in", ve, values, negated)
        kind2, op = self._next()
        if op == "!":
            self._expect("=")
            op = "!="
        elif op in ("<", ">") and self._peek()[1] == "=":
            self.i += 1
            op += "="
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise SparqlError(f"FILTER operator {op!r} unsupported")
        return ("cmp", op, ve, self._parse_bind_expr())

    def _parse_modifiers(self) -> None:
        if self._kw("GROUP"):
            self._expect("BY")
            while True:
                kind, tok = self._peek()
                if kind == "var":
                    self.q.group_by.append(self._next()[1][1:])
                elif tok == "(":
                    # GROUP BY (expr AS ?alias) (r5): the key expression
                    # reuses the BIND compiler, computed map-side before
                    # the hash-aggregate — same plan shape as a plain key
                    self.i += 1
                    expr = self._parse_bind_expr()
                    self._expect("AS")
                    kind2, var = self._next()
                    if kind2 != "var":
                        raise SparqlError(
                            "GROUP BY (expr AS ?alias): alias must be a "
                            "variable")
                    self._expect(")")
                    alias = var[1:]
                    self.q.group_exprs.append((expr, alias))
                    self.q.group_by.append(alias)
                else:
                    break
            if not self.q.group_by:
                raise SparqlError("empty GROUP BY")
        while self._kw("HAVING"):
            self._expect("(")
            kind, tok = self._peek()
            colspec: str | Agg
            if kind == "word" and tok.upper() in self._AGG_FUNCS:
                # inline aggregate (r5): HAVING (SUM(?v) > 10) — computed
                # as a hidden column in the SAME hash-aggregate, filtered,
                # then dropped by the projection
                colspec = self._parse_agg_core()
            else:
                kind, var = self._next()
                if kind != "var":
                    raise SparqlError(
                        "HAVING supports ?alias OP number or "
                        "AGG(arg) OP number")
                colspec = var[1:]
            kind, op = self._next()
            if op in ("<", ">") and self._peek()[1] == "=":
                self.i += 1
                op += "="
            elif op == "!":
                self._expect("=")
                op = "!="
            if op not in ("=", "!=", "<", "<=", ">", ">="):
                raise SparqlError(f"HAVING operator {op!r} unsupported")
            kind, num = self._next()
            if kind != "num":
                raise SparqlError("HAVING right side must be a number")
            self._expect(")")
            self.q.having.append((colspec, op, float(num)))
        if self._kw("ORDER"):
            self._expect("BY")
            # sort keys: ?var | ASC/DESC(expr) | (expr) | fn(...) — plain
            # vars keep the (name, asc) string shape; expression keys carry
            # the BindExpr (compiled by _bind_col at sort time, so aggregate
            # aliases and arithmetic both work)
            expr_words = (set(self._UNARY_STR_FNS) | set(self._DT_FNS)
                          | set(self._STR2_FNS) | set(self._NUM_FNS)
                          | set(self._HASH_FNS)
                          | {"CONCAT", "IF", "COALESCE", "SUBSTR",
                             "REPLACE", "LANG", "TZ", "TIMEZONE",
                             "ENCODE_FOR_URI", "IRI", "URI", "DATATYPE"})
            while True:
                kind, tok = self._peek()
                up = tok.upper() if kind == "word" else ""
                if kind == "var":
                    self.i += 1
                    self.q.order_by.append((tok[1:], True))
                elif up in ("ASC", "DESC"):
                    asc = up == "ASC"
                    self.i += 1
                    self._expect("(")
                    k2, t2 = self._peek()
                    if k2 == "word" and t2.upper() in self._AGG_FUNCS:
                        # inline aggregate sort key (r5): hidden column of
                        # the same hash-aggregate, like inline HAVING
                        self.q.order_by.append((self._parse_agg_core(), asc))
                    elif (self._peek()[0] == "var"
                            and self.toks[self.i + 1][1] == ")"):
                        self.q.order_by.append((self._next()[1][1:], asc))
                    else:
                        self.q.order_by.append((self._parse_bind_expr(), asc))
                    self._expect(")")
                elif up in self._AGG_FUNCS:
                    self.q.order_by.append((self._parse_agg_core(), True))
                elif tok == "(" or up in expr_words:
                    self.q.order_by.append((self._parse_bind_expr(), True))
                else:
                    break
            if not self.q.order_by:
                raise SparqlError("empty ORDER BY")
        # LIMIT and OFFSET may appear in either order (SPARQL grammar)
        while True:
            if self.q.limit is None and self._kw("LIMIT"):
                kind, n = self._next()
                if kind != "num" or "." in n:
                    raise SparqlError("LIMIT needs an integer")
                self.q.limit = int(n)
            elif self.q.offset is None and self._kw("OFFSET"):
                kind, n = self._next()
                if kind != "num" or "." in n:
                    raise SparqlError("OFFSET needs an integer")
                self.q.offset = int(n)
            else:
                break

    # -- terms ------------------------------------------------------------
    def _term(self, as_pattern: bool, predicate: bool = False) -> str:
        kind, tok = self._next()
        if kind == "var":
            return tok
        if kind == "word" and tok == "a" and predicate:
            return "rdf:type"
        if kind == "pname":
            return tok  # CURIE, the store's native vocabulary
        if kind == "iri":
            return self._curie_of(tok[1:-1])
        if kind == "lit":
            value = _unescape_literal(tok[1:-1])
            if self._peek()[0] == "dtype":   # "lex"^^type — term-exact match
                self.i += 1
                knd, dt = self._next()
                if knd == "pname":
                    return TypedLit(value, dt)
                if knd == "iri":
                    return TypedLit(value, self._curie_of(dt[1:-1]))
                raise SparqlError(f"bad datatype after ^^: {dt!r}")
            if self._peek()[0] == "lang":    # "lex"@tag — language-tagged
                tag = self._next()[1][1:].lower()  # BCP47 case-insensitive;
                return TypedLit(value, "@" + tag)  # store convention: lower
            return value
        raise SparqlError(f"unsupported term {tok!r}")

    def _curie_of(self, iri: str) -> str:
        namespaces = {**self.ns, **self.q.prefixes}
        # longest-prefix match: with overlapping namespaces (one a prefix of
        # another) dict order could map the IRI onto the wrong CURIE
        for prefix, ns in sorted(
            namespaces.items(), key=lambda kv: len(kv[1]), reverse=True
        ):
            if iri.startswith(ns):
                return f"{prefix}:{iri[len(ns):]}"
        return iri  # unknown namespace: matched verbatim (usually matches nothing)


def parse(query: str, repo: str | None = None, *,
          now: str | None = None, seed: int | None = None) -> SelectQuery:
    return _Parser(_tokenize(query), repo, now, seed).parse()


# --------------------------------------------------------------------------
# Compile + execute
# --------------------------------------------------------------------------

def _push_inv(expr: PathExpr, inv: bool = False) -> PathExpr:
    """Normalize inverses down to the leaves: ^(a/b) = ^b/^a, ^(e+) = (^e)+,
    ^^e = e — after this, PathInv never wraps a composite, so the closure
    compiler's seeded fast path sees every `+`/`*` at its real position."""
    if isinstance(expr, PathInv):
        return _push_inv(expr.inner, not inv)
    if isinstance(expr, PathPred):
        return PathInv(expr) if inv else expr
    if isinstance(expr, PathSeq):
        parts = [_push_inv(p, inv) for p in expr.parts]
        return PathSeq(tuple(reversed(parts)) if inv else tuple(parts))
    if isinstance(expr, PathAlt):
        return PathAlt(tuple(_push_inv(p, inv) for p in expr.parts))
    if isinstance(expr, PathPlus):
        return PathPlus(_push_inv(expr.inner, inv))
    if isinstance(expr, PathOpt):
        return PathOpt(_push_inv(expr.inner, inv))
    if isinstance(expr, PathNeg):
        # ^!(p1|^p2) = !(^p1|p2): inversion swaps the member sets
        return PathNeg(expr.inv, expr.fwd) if inv else expr
    return PathStar(_push_inv(expr.inner, inv))


def _graph_terms(gdf: DataFrame) -> DataFrame:
    """All terms of the (repo-scoped) graph — the zero-length path domain."""
    return (
        gdf.select(F.col("subj").alias("node"))
        .unionByName(gdf.select(F.col("obj").alias("node")))
        .distinct()
    )


def _path_rel(gdf: DataFrame, expr: PathExpr) -> DataFrame:
    """Compile a path expression to its (src, dst) relation over the graph.
    Composites are plain relational algebra (joins/unions); `+`/`*` use the
    path-doubling closure — the SEEDED alternative for constant endpoints
    lives in _solutions, which intercepts top-level `+`/`*` before calling
    this."""
    from .operators import transitive_closure

    if isinstance(expr, PathPred):
        return gdf.where(F.col("pred") == expr.pred).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
    if isinstance(expr, PathInv):
        inner = _path_rel(gdf, expr.inner)
        return inner.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    if isinstance(expr, PathSeq):
        # SPARQL §9.1 translates p1/p2 to triple patterns over a fresh
        # middle variable and projects it away WITHOUT dedup, so a pair
        # connected via k intermediates has multiplicity k (bag). The join
        # below is exactly that — no distinct.
        rel = _path_rel(gdf, expr.parts[0])
        for part in expr.parts[1:]:
            nxt = _path_rel(gdf, part)
            rel = (
                rel.join(nxt, rel["dst"] == nxt["src"])
                .select(rel["src"].alias("src"), nxt["dst"].alias("dst"))
            )
        return rel
    if isinstance(expr, PathAlt):
        # p1|p2 ≡ { s p1 o } UNION { s p2 o }: multiset union (§18.4) — a
        # pair reachable through both alternatives counts twice
        rel = _path_rel(gdf, expr.parts[0])
        for part in expr.parts[1:]:
            rel = rel.unionByName(_path_rel(gdf, part))
        return rel
    if isinstance(expr, PathPlus):
        return transitive_closure(_path_rel(gdf, expr.inner))
    if isinstance(expr, PathNeg):
        # negated property set: one scan per direction, NOT IN on the
        # predicate (a map-side filter — no closure, no join)
        parts = []
        if expr.fwd:
            parts.append(
                gdf.where(~F.col("pred").isin(*expr.fwd)).select(
                    F.col("subj").alias("src"), F.col("obj").alias("dst")
                )
            )
        if expr.inv:
            parts.append(
                gdf.where(~F.col("pred").isin(*expr.inv)).select(
                    F.col("obj").alias("src"), F.col("subj").alias("dst")
                )
            )
        rel = parts[0]
        for p in parts[1:]:
            # two-direction NPS is the multiset union of the forward and
            # inverse path patterns (§18.4) — keep cross-direction dups
            rel = rel.unionByName(p)
        return rel
    if isinstance(expr, PathOpt):
        # zero-or-one: inner ∪ identity over every graph term (the
        # zero-length component, same domain as PathStar's)
        ident = _graph_terms(gdf).select(
            F.col("node").alias("src"), F.col("node").alias("dst")
        )
        return _path_rel(gdf, expr.inner).unionByName(ident).distinct()
    # PathStar: closure ∪ identity over every graph term (SPARQL zero-length
    # path semantics — any term relates to itself)
    ident = _graph_terms(gdf).select(
        F.col("node").alias("src"), F.col("node").alias("dst")
    )
    return (
        transitive_closure(_path_rel(gdf, expr.inner))
        .unionByName(ident)
        .distinct()
    )


def _seeded_path_rel(
    gdf: DataFrame, expr: PathPlus | PathStar, s: str, o: str
) -> DataFrame:
    """(src, dst) relation of a top-level `+`/`*` with ≥1 constant endpoint:
    seeded reachability (operators.reachable_from) — intermediates bounded
    by the seed's reachable set, never the whole graph's closure."""
    from .operators import reachable_from

    spark = gdf.sparkSession
    inner = _path_rel(gdf, expr.inner)
    if not s.startswith("?"):  # constant subject: forward reachability
        nodes = reachable_from(inner, s)
        rel = nodes.select(F.lit(s).alias("src"), F.col("dst"))
        if isinstance(expr, PathStar):
            rel = rel.unionByName(
                spark.createDataFrame([(s, s)], "src string, dst string")
            ).distinct()
        return rel
    # constant object: reachability over the transposed relation
    transposed = inner.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    nodes = reachable_from(transposed, o)
    rel = nodes.select(F.col("dst").alias("src"), F.lit(o).alias("dst"))
    if isinstance(expr, PathStar):
        rel = rel.unionByName(
            spark.createDataFrame([(o, o)], "src string, dst string")
        ).distinct()
    return rel


def _bind_col(expr: BindExpr, df: DataFrame) -> F.Column:
    kind, payload = expr[0], expr[1]
    if kind == "arith":
        op, a, b = expr[1], expr[2], expr[3]
        ca = _bind_col(a, df).cast("double")
        cb = _bind_col(b, df).cast("double")
        return {"+": ca + cb, "-": ca - cb, "*": ca * cb, "/": ca / cb}[op]
    if kind in ("const", "num"):
        # numeric literals stay string-typed here (BIND output parity);
        # comparisons re-cast both sides to double via _is_numeric_expr
        return F.lit(payload)
    if kind == "var":
        if payload not in df.columns:
            raise SparqlError(f"expression references unbound variable ?{payload}")
        return F.col(payload)
    if kind == "str":
        return _bind_col(payload, df).cast("string")
    if kind == "lcase":
        return F.lower(_bind_col(payload, df).cast("string"))
    if kind == "ucase":
        return F.upper(_bind_col(payload, df).cast("string"))
    if kind == "strlen":
        return F.length(_bind_col(payload, df).cast("string"))
    if kind == "if":
        # payload is a FilterExpr condition (EXISTS — a join — raises below)
        return F.when(_filter_col(payload, df), _bind_col(expr[2], df)) \
                .otherwise(_bind_col(expr[3], df))
    if kind == "coalesce":
        return F.coalesce(*[_bind_col(a, df) for a in payload])
    if kind in ("strbefore", "strafter"):
        a = _bind_col(payload[0], df).cast("string")
        b = _bind_col(payload[1], df).cast("string")
        pos = F.instr(a, b)
        if kind == "strbefore":
            # SPARQL §17.4.3.8: empty separator → "", not found → ""
            return (F.when(b == F.lit(""), F.lit(""))
                    .when(pos > 0, a.substr(F.lit(1), pos - 1))
                    .otherwise(F.lit("")))
        # STRAFTER: empty separator → the whole string, not found → ""
        return (F.when(b == F.lit(""), a)
                .when(pos > 0, a.substr(pos + F.length(b), F.length(a)))
                .otherwise(F.lit("")))
    if kind == "replace":
        # SPARQL REPLACE is regex-based (fn:replace)
        return F.regexp_replace(
            _bind_col(payload[0], df).cast("string"),
            _bind_col(payload[1], df).cast("string"),
            _bind_col(payload[2], df).cast("string"),
        )
    if kind == "substr":
        # XPath fn:substring: 1-based start; no length = through the end
        a = _bind_col(payload[0], df).cast("string")
        start = _bind_col(payload[1], df).cast("int")
        length = (_bind_col(payload[2], df).cast("int")
                  if len(payload) > 2 else F.length(a))
        return a.substr(start, length)
    if kind in ("year", "month", "day", "hours", "minutes", "seconds"):
        # accessors over the store's xsd:dateTime lexical forms (ISO-8601;
        # statements.py date_format emits them); SECONDS truncates to the
        # integer second (the store never writes fractional seconds)
        fn = {"year": F.year, "month": F.month, "day": F.dayofmonth,
              "hours": F.hour, "minutes": F.minute, "seconds": F.second}[kind]
        return fn(F.to_timestamp(_bind_col(payload, df).cast("string")))
    if kind == "lang":
        # language tags live in the variable's term-metadata companion
        # column ('@tag' in the store's obj_type vocabulary) — a map-side
        # expression when the var carries one; constants answer from their
        # own parse-time tag; everything else has no tag (the KG emitter
        # writes none, mirroring the reference)
        if payload[0] == "var" and term_meta(payload[1]) in df.columns:
            m = F.col(term_meta(payload[1]))
            return F.when(
                m.startswith("@"), m.substr(F.lit(2), F.length(m))
            ).otherwise(F.lit(""))
        if payload[0] == "const" and isinstance(payload[1], TypedLit):
            meta = payload[1].meta
            return F.lit(meta[1:] if meta.startswith("@") else "")
        return F.lit("")
    if kind == "langmatches":
        # RFC 4647 basic filtering, case-insensitive: "*" matches any
        # NON-EMPTY tag; otherwise exact tag or prefix at a "-" boundary.
        # Over this store LANG is always "" so every match is false, but
        # the compile is generic (literal-range args still work).
        lang = F.lower(_bind_col(payload[0], df).cast("string"))
        rng = F.lower(_bind_col(payload[1], df).cast("string"))
        return F.when(lang == "", F.lit(False)).otherwise(
            F.when(rng == "*", F.lit(True)).otherwise(
                (lang == rng) | lang.startswith(F.concat(rng, F.lit("-")))
            )
        )
    if kind in ("tz", "timezone"):
        # TZ: the timezone suffix of the dateTime LEXICAL form ("Z",
        # "+05:30", ... or "" when absent). TIMEZONE: the same offset as an
        # xsd:dayTimeDuration lexical ("Z" → "PT0S", "-05:00" → "-PT5H",
        # "+05:30" → "PT5H30M"); the store's own dateTimes always carry Z
        # (statements.py date_format), the compile handles the general form.
        s = _bind_col(payload, df).cast("string")
        suffix = F.regexp_extract(s, r"(Z|[+-]\d{2}:\d{2})$", 1)
        if kind == "tz":
            return suffix
        hh = F.regexp_extract(suffix, r"[+-](\d{2}):", 1).cast("int")
        mm = F.regexp_extract(suffix, r":(\d{2})$", 1).cast("int")
        sign = F.when(suffix.startswith("-"), F.lit("-")).otherwise(F.lit(""))
        # canonical dayTimeDuration: zero components are omitted, and the
        # all-zero offset ("+00:00", like "Z") is PT0S — never "PT0H"
        dur = F.concat(
            sign, F.lit("PT"),
            F.when(hh > 0, F.concat(hh.cast("string"), F.lit("H")))
            .otherwise(F.lit("")),
            F.when(mm > 0, F.concat(mm.cast("string"), F.lit("M")))
            .otherwise(F.lit("")),
        )
        return (
            F.when(suffix == "Z", F.lit("PT0S"))
            .when(suffix == "", F.lit(None).cast("string"))  # no tz: unbound
            .when((hh == 0) & (mm == 0), F.lit("PT0S"))
            .otherwise(dur)
        )
    if kind == "abs":
        return F.abs(_bind_col(payload, df).cast("double"))
    if kind in ("ceil", "floor"):
        # XPath fn:ceiling / fn:floor; result kept double (Spark's ceil/floor
        # return LONG — cast back so comparisons and oracles see one type)
        fn = F.ceil if kind == "ceil" else F.floor
        return fn(_bind_col(payload, df).cast("double")).cast("double")
    if kind == "round":
        # XPath fn:round rounds ties toward +INF (round(-2.5) = -2), which is
        # floor(x + 0.5) — NOT Spark's / DuckDB's half-away-from-zero round()
        c = _bind_col(payload, df).cast("double")
        return F.floor(c + F.lit(0.5)).cast("double")
    if kind in ("md5", "sha1"):
        fn = F.md5 if kind == "md5" else F.sha1
        return fn(_bind_col(payload, df).cast("string").cast("binary"))
    if kind in ("sha256", "sha384", "sha512"):
        return F.sha2(_bind_col(payload, df).cast("string").cast("binary"),
                      int(kind[3:]))
    if kind == "encode_for_uri":
        # SPARQL §17.4.2.8: percent-encode everything outside RFC 3986
        # unreserved. url_encode is application/x-www-form-urlencoded (Java
        # URLEncoder): space→'+', '*' kept verbatim, '~'→'%7E'. Those are the
        # ONLY divergences, and each fix-up below is unambiguous post-encode:
        # a '+' can only come from a space (literal '+' became '%2B'), '%7E'
        # only from '~', '*' only from a literal '*'. Hex case already upper.
        c = F.url_encode(_bind_col(payload, df).cast("string"))
        c = F.replace(c, F.lit("+"), F.lit("%20"))
        c = F.replace(c, F.lit("%7E"), F.lit("~"))
        return F.replace(c, F.lit("*"), F.lit("%2A"))
    if kind == "datatype":
        # when the variable carries its term-metadata companion (typed-mode
        # bgp bindings), DATATYPE is a pure map-side expression — usable in
        # projection expressions, ORDER BY, FILTERs and nested BINDs alike.
        # IRI terms → unbound (SPARQL type error); '@tag' → rdf:langString
        # (RDF 1.1). Meta-less vars (path/BIND-bound) fall back to the
        # legacy one-join hoist (_bind_datatype) where the caller supports
        # it, else this clear error.
        if (isinstance(payload, tuple) and payload[0] == "var"
                and term_meta(payload[1]) in df.columns):
            m = F.col(term_meta(payload[1]))
            return (F.when(m == "iri", F.lit(None).cast("string"))
                    .when(m.startswith("@"), F.lit("rdf:langString"))
                    .otherwise(m))
        raise SparqlError(
            "DATATYPE needs the graph's term typing and is only supported "
            "inside BIND expressions and FILTER operands (its compile is a "
            "join) — bind it to a variable first to use it elsewhere"
        )
    if kind in ("rand", "uuid", "struuid"):
        # seeded deterministic forms: a per-solution hash of the bound
        # columns + the seed + the call index (two RAND() calls in one
        # query differ), '\\x1f'-joined. md5-based so the DuckDB oracle
        # twins reproduce the arithmetic bit-for-bit ((‘0x’||hex)::UBIGINT
        # there vs conv() here). RAND → [0,1) from the first 13 hex chars
        # (52 bits: exact in a double); UUID → v4-shaped hex.
        seed, idx = expr[1], expr[2]
        dtypes = getattr(df, "dtypes", None)
        if dtypes is None:
            raise SparqlError(
                "RAND/UUID/STRUUID cannot appear inside an OPTIONAL "
                "filter's left-join condition")
        # solution identity = the STRING-typed bound columns (term
        # lexicals); doubles/longs from earlier numeric BINDs are excluded
        # -- their textual form is not portable across engines
        key = F.concat_ws(
            "",
            *[F.col(c) for c, t in dtypes
              if t == "string" and not c.endswith(TERM_META)],
            F.lit(f"seed:{seed}"), F.lit(f"call:{idx}"),
        )
        h = F.md5(key)
        if kind == "rand":
            return (F.conv(h.substr(1, 13), 16, 10).cast("double")
                    / F.lit(float(1 << 52)))
        u = F.concat(
            h.substr(1, 8), F.lit("-"), h.substr(9, 4), F.lit("-4"),
            h.substr(14, 3), F.lit("-8"), h.substr(18, 3), F.lit("-"),
            h.substr(21, 12),
        )
        # UUID() is an IRI term per §17.4.1.6 (urn:uuid:...); STRUUID() the
        # bare string form
        return F.concat(F.lit("urn:uuid:"), u) if kind == "uuid" else u
    if kind in ("strlang", "strdt"):
        raise SparqlError(
            f"{kind.upper()} is only supported as the top-level expression "
            "of a BIND or projection expression (its tag/datatype lands in "
            "the variable's term-metadata column, which nested expressions "
            "cannot carry)"
        )
    return F.concat(*[_bind_col(a, df).cast("string") for a in payload])


def _is_numeric_expr(expr: BindExpr) -> bool:
    if (expr[0] == "const" and isinstance(expr[1], TypedLit)
            and expr[1].meta in _NUMERIC_XSD):
        return True   # "5"^^xsd:int compares numerically (SPARQL §17.1)
    return expr[0] in ("num", "strlen", "arith", "rand",
                       "abs", "ceil", "floor", "round",
                       "year", "month", "day", "hours", "minutes", "seconds")


def _term_meta_col(ve: BindExpr, df) -> F.Column | None:
    """Column holding a value expression's term metadata, when resolvable:
    a variable with its companion column, or an explicitly typed constant
    (parse-time meta). None = legacy value-level operand."""
    if ve[0] == "var" and term_meta(ve[1]) in df.columns:
        return F.col(term_meta(ve[1]))
    if ve[0] == "const" and isinstance(ve[1], TypedLit):
        return F.lit(ve[1].meta)
    return None


def _has_explicit_type(ve: BindExpr) -> bool:
    return ve[0] == "const" and isinstance(ve[1], TypedLit)


def _filter_col(expr: FilterExpr, df: DataFrame) -> F.Column:
    """Compile a FILTER expression to a boolean Column (everything except
    EXISTS, which _apply_filters turns into a semi/anti join)."""
    kind = expr[0]
    if kind == "or":
        cond = _filter_col(expr[1][0], df)
        for e in expr[1][1:]:
            cond = cond | _filter_col(e, df)
        return cond
    if kind == "and":
        cond = _filter_col(expr[1][0], df)
        for e in expr[1][1:]:
            cond = cond & _filter_col(e, df)
        return cond
    if kind == "not":
        return ~_filter_col(expr[1], df)
    if kind == "litbool":
        return F.lit(expr[1])
    if kind == "bound":
        # a var never bound anywhere in the query is simply false, matching
        # SPARQL's bound() over an unbound variable
        if expr[1] not in df.columns:
            return F.lit(False)
        return F.col(expr[1]).isNotNull()
    if kind == "regex":
        # SPARQL REGEX is an unanchored substring match, like rlike
        return _bind_col(expr[1], df).cast("string").rlike(expr[2])
    if kind == "boolfn":
        if expr[1] == "langmatches":  # boolean value expr; same compile
            return _bind_col(("langmatches", expr[2]), df)
        if expr[1] == "sameterm":
            # sameTerm(a, b): value equality AND term-metadata equality
            # wherever both sides carry resolvable metadata; meta-less
            # operands degrade to value equality (the legacy model)
            va = _bind_col(expr[2][0], df).cast("string")
            vb = _bind_col(expr[2][1], df).cast("string")
            ma = _term_meta_col(expr[2][0], df)
            mb = _term_meta_col(expr[2][1], df)
            cond = va == vb
            if ma is not None and mb is not None:
                cond = cond & ma.eqNullSafe(mb)
            return cond
        a = _bind_col(expr[2][0], df).cast("string")
        b = _bind_col(expr[2][1], df).cast("string")
        return {"strstarts": a.startswith(b), "strends": a.endswith(b),
                "contains": a.contains(b)}[expr[1]]
    if kind == "in":
        # §17.4.1.9: e IN (x1, x2) ≡ e = x1 || e = x2 — typed/tagged
        # members route through the SAME = compile (term equality /
        # numeric promotion), plain members keep the one-shot isin
        plain = [v for v in expr[2] if not isinstance(v, TypedLit)]
        conds = []
        if plain:
            conds.append(_bind_col(expr[1], df).isin(*plain))
        conds.extend(
            _filter_col(("cmp", "=", expr[1], ("const", v)), df)
            for v in expr[2] if isinstance(v, TypedLit)
        )
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        return ~cond if expr[3] else cond
    if kind == "termfn":
        # nested isIRI/isLiteral/isNumeric (inside !, ||, IF, ...) is a row
        # predicate when the variable carries its term-metadata companion;
        # without one it only exists as a top-level conjunct (the join
        # compile in _apply_filters) — the error below explains
        fn, var = expr[1], expr[2]
        if var not in df.columns:
            return F.lit(False)
        if term_meta(var) in df.columns:
            m = F.col(term_meta(var))
            pred = {"isiri": m == "iri", "isliteral": m != "iri",
                    "isnumeric": m.isin(*_NUMERIC_XSD)}[fn]
            return F.col(var).isNotNull() & pred
        raise SparqlError(
            "isIRI/isLiteral/isNumeric over a variable without term "
            "metadata (path- or BIND-bound) is only supported as a "
            "top-level FILTER conjunct (it compiles to a join there)"
        )
    if kind == "cmp":
        op, ve1, ve2 = expr[1], expr[2], expr[3]
        c1, c2 = _bind_col(ve1, df), _bind_col(ve2, df)
        if _is_numeric_expr(ve1) or _is_numeric_expr(ve2):
            # SPARQL numeric comparison: a non-numeric operand is a type
            # error and the row drops — try_cast maps it to null, whose
            # comparison is null, which where() filters out (plain cast
            # would hard-fail the job under ANSI mode)
            c1, c2 = c1.try_cast("double"), c2.try_cast("double")
        elif op in ("=", "!="):
            # non-numeric explicitly-typed constant vs a term-metadata-
            # carrying variable: =/!= is TERM equality ("x"@en never equals
            # "x"^^xsd:string, whatever the lexicals say). Simplification
            # vs SPARQL §17.3: incompatible-type pairs yield false/true
            # here, not a type error (documented divergence).
            m1, m2 = _term_meta_col(ve1, df), _term_meta_col(ve2, df)
            if m1 is not None and m2 is not None and (
                _has_explicit_type(ve1) or _has_explicit_type(ve2)
            ):
                eq = (c1 == c2) & (m1 == m2)
                return eq if op == "=" else ~eq
        return {"=": c1 == c2, "!=": c1 != c2, "<": c1 < c2,
                "<=": c1 <= c2, ">": c1 > c2, ">=": c1 >= c2}[op]
    raise SparqlError(
        f"{'EXISTS' if kind == 'exists' else 'isIRI/isLiteral'} is only "
        "supported as a top-level FILTER conjunct "
        "(it compiles to a join, not a row predicate)"
    )


def _apply_filters(
    df: DataFrame, filters: list, triples: DataFrame, repo: str | None
) -> DataFrame:
    """Apply FILTER expressions: top-level conjuncts are split so each
    EXISTS/NOT EXISTS becomes ONE left-semi/left-anti join against its
    BGP's distinct shared-variable bindings (never a row-by-row subquery),
    and everything else one where() predicate."""
    conjuncts: list = []
    stack = list(filters)
    while stack:
        e = stack.pop(0)
        if e[0] == "and":
            stack = list(e[1]) + stack
        else:
            conjuncts.append(e)
    for e in conjuncts:
        if e[0] == "exists":
            g, negated = e[1], e[2]
            ex = _group_solutions(triples, g, repo)
            shared = [c for c in ex.columns if c in df.columns]
            if not shared:
                raise SparqlError(
                    "EXISTS block shares no variable with the outer patterns"
                )
            df = df.join(
                ex.select(*shared), shared,
                "left_anti" if negated else "left_semi",
            )
        elif e[0] == "termfn":
            # isIRI(?v) / isLiteral(?v) / isNumeric(?v): when the variable
            # carries its term-metadata companion (typed-mode binding) these
            # are pure ROW PREDICATES on the metadata — no join at all. The
            # legacy semi/anti join against the graph's term sets remains
            # for meta-less vars (path-bound, bare frames). Unbound (null)
            # args are errors per SPARQL §17.2, i.e. the row drops.
            fn, var = e[1], e[2]
            if var not in df.columns:
                df = df.where(F.lit(False))
                continue
            if term_meta(var) in df.columns:
                m = F.col(term_meta(var))
                pred = {
                    "isiri": m == "iri",
                    "isliteral": m != "iri",
                    "isnumeric": m.isin(*_NUMERIC_XSD),
                }[fn]
                df = df.where(F.col(var).isNotNull() & pred)
                continue
            if fn == "isnumeric":
                # isNumeric(?v): semi join against the graph's distinct
                # numeric-typed literal terms (same store-level-typing
                # argument as isIRI above)
                num = _numeric_terms(triples, repo) \
                    .withColumnRenamed("term", var)
                df = df.where(F.col(var).isNotNull()) \
                       .join(num, var, "left_semi")
                continue
            iri = _iri_terms(triples, repo).withColumnRenamed("term", var)
            df = df.where(F.col(var).isNotNull()).join(
                iri, var, "left_semi" if fn == "isiri" else "left_anti"
            )
        else:
            dt_vars: set = set()
            e2 = _rewrite_datatype(e, dt_vars, _meta_vars(df))
            if dt_vars:
                # FILTER(DATATYPE(?v) ...): hoist each term's datatype as a
                # temp column (one left join against the graph's literal→
                # datatype map), filter on the rewritten predicate, drop.
                # NULL datatypes (IRI terms, unknown lexicals) compare to
                # null and the row drops — SPARQL's type-error semantics.
                tmps = []
                for v in sorted(dt_vars):
                    df = _bind_datatype(
                        df, ("var", v), _DT_TMP + v, triples, repo)
                    tmps.append(_DT_TMP + v)
                df = df.where(_filter_col(e2, df)).drop(*tmps)
            else:
                df = df.where(_filter_col(e2, df))
    return df


def _meta_vars(df: DataFrame) -> set:
    """Variables whose term-metadata companion column is present — their
    DATATYPE() compiles as a map-side expression, no hoist join needed."""
    return {c[: -len(TERM_META)] for c in df.columns
            if c.endswith(TERM_META)}


#: xsd numeric datatypes (SPARQL §17.1 operand data types + derived ints)
_NUMERIC_XSD = (
    "xsd:int", "xsd:integer", "xsd:long", "xsd:short", "xsd:byte",
    "xsd:decimal", "xsd:float", "xsd:double", "xsd:nonNegativeInteger",
    "xsd:positiveInteger", "xsd:unsignedInt", "xsd:unsignedLong",
)


def _numeric_terms(triples: DataFrame, repo: str | None) -> DataFrame:
    """Distinct lexical forms typed with a numeric xsd datatype somewhere in
    the (repo-scoped) graph. On a bare (s,p,o) frame without obj_type, no
    term classifies numeric (conservative, mirrors _iri_terms' object
    rule)."""
    gdf = triples
    if repo is not None and "repo" in gdf.columns:
        gdf = gdf.where(F.col("repo") == repo)
    if "obj_type" not in gdf.columns:
        return gdf.select(F.col("obj").alias("term")).limit(0)
    return (
        gdf.where(F.col("obj_type").isin(*_NUMERIC_XSD))
        .select(F.col("obj").alias("term"))
        .distinct()
    )


def _iri_terms(triples: DataFrame, repo: str | None) -> DataFrame:
    """Distinct terms known to be IRIs in the (repo-scoped) graph: all
    subjects, all predicates, and objects whose triple is typed
    obj_type='iri' (the store's term-typing column; on a bare (s,p,o)
    frame without it, objects are conservatively non-IRI). A lexical form
    appearing as both an IRI and a literal somewhere classifies as IRI."""
    gdf = triples
    if repo is not None:
        gdf = gdf.where(F.col("repo") == repo)
    terms = gdf.select(F.col("subj").alias("term")).unionByName(
        gdf.select(F.col("pred").alias("term"))
    )
    if "obj_type" in gdf.columns:
        terms = terms.unionByName(
            gdf.where(F.col("obj_type") == "iri")
            .select(F.col("obj").alias("term"))
        )
    return terms.distinct()


def _join_path_pattern(
    triples: DataFrame, df: DataFrame | None,
    s: str, raw_expr: PathExpr, o: str,
    repo: str | None, pp_idx: int,
) -> DataFrame:
    """Join one (s, PathExpr, o) relation into the running solution set
    (None → this relation starts it). Constant-endpoint `+`/`*` take the
    seeded fast path; const-const becomes a 0/1-row existence marker."""
    expr = _push_inv(raw_expr)
    gdf = triples
    if repo is not None:
        gdf = gdf.where(F.col("repo") == repo)
    elif "repo" in gdf.columns:
        # cross-repo: the queried graph is the MERGE (set-union) of the
        # per-repo named graphs — dedup once so path multiplicity counts
        # routes, never repo copies of the same edge
        gdf = gdf.select("subj", "pred", "obj").distinct()
    seedable = isinstance(expr, (PathPlus, PathStar)) and (
        not s.startswith("?") or not o.startswith("?")
    )
    rel = (
        _seeded_path_rel(gdf, expr, s, o)
        if seedable
        else _path_rel(gdf, expr)
    )
    cols: dict[str, str] = {}
    for term, col in ((s, "src"), (o, "dst")):
        if term.startswith("?"):
            name = term[1:]
            if name in cols:
                rel = rel.where(F.col(col) == F.col(cols[name]))
            else:
                cols[name] = col
        else:
            rel = rel.where(F.col(col) == term)
    if not cols:
        # both endpoints constant: the pattern is an existence test —
        # a 0-or-1-row relation cross-joined in acts as the filter
        # (ASK { c1 pred+ c2 } is the reachability question, answered
        # by the seeded traversal above, never a full closure)
        marker = f"_pp_exists_{pp_idx}"
        rel = rel.limit(1).select(F.lit(True).alias(marker))
        return rel if df is None else df.crossJoin(rel).drop(marker)
    # no dedup: the relation's multiplicity IS the path's solution
    # multiplicity (closures arrive as sets from ALP evaluation; fixed-
    # length composites carry spec bag multiplicity from _path_rel)
    rel = rel.select(*[F.col(c).alias(v) for v, c in cols.items()])
    if df is None:
        return rel
    shared = [c for c in rel.columns if c in df.columns]
    return df.join(rel, shared) if shared else df.crossJoin(rel)


def _drop_pp_markers(df: DataFrame) -> DataFrame:
    """Strip internal `_pp_exists_N` existence-marker columns once all path
    relations have joined in. When a const-const path STARTS the solution
    set (df was None in _join_path_pattern) the marker is the frame's only
    column until later relations cross-join against it — without this, a
    query like `SELECT * WHERE { <c1> p+ <c2> . ?s p2+ ?o }` leaked the
    marker into its results. Kept only when it is the sole column (a pure
    existence query, e.g. ASK over one const-const path, needs the row)."""
    markers = [c for c in df.columns if c.startswith("_pp_exists_")]
    if markers and len(markers) < len(df.columns):
        return df.drop(*markers)
    return df


def _group_solutions(triples: DataFrame, g: Group, repo: str | None) -> DataFrame:
    """Solution set of one braced group: BGP ⋈ path relations, then the
    group's own FILTERs — the evaluation unit behind OPTIONAL / MINUS /
    UNION branches and FILTER-EXISTS blocks."""
    df = bgp(triples, g.patterns, repo=repo, typed=True) if g.patterns else None
    for pp_idx, (s, raw_expr, o) in enumerate(g.paths):
        df = _join_path_pattern(triples, df, s, raw_expr, o, repo, pp_idx)
    if df is None:
        raise SparqlError("empty pattern group")
    df = _drop_pp_markers(df)
    return _apply_filters(df, g.filters, triples, repo)


def _group_bound_vars(g: Group) -> set:
    """Variables a Group's own patterns/paths bind (its solution domain)."""
    out = {t[1:] for pat in g.patterns for t in pat if t.startswith("?")}
    out |= {t[1:] for s, _p, o in g.paths for t in (s, o)
            if t.startswith("?")}
    return out


def _filter_ref_vars(e) -> tuple[set, bool]:
    """(variables a FILTER expression references, needs-relational-compile)
    — the second flag marks EXISTS / is* / DATATYPE content, whose compile
    is a join or a hoist and therefore cannot move into a left-join
    condition."""
    vars_: set = set()
    joinish = False

    def walk(x) -> None:
        nonlocal joinish
        if isinstance(x, tuple):
            if x and x[0] == "var":
                vars_.add(x[1])
                return
            if x and x[0] == "bound":
                vars_.add(x[1])
                return
            if x and x[0] == "termfn":
                vars_.add(x[2])
                joinish = True
                return
            if x and x[0] in ("exists", "datatype"):
                joinish = True
            for y in x:
                walk(y)
        elif isinstance(x, list):
            for y in x:
                walk(y)

    walk(e)
    return vars_, joinish


def _rename_vars(e, mapping: dict):
    """Rewrite ('var'/'bound', name) references per `mapping` — used to
    point a left-join condition's block-side variables at their renamed
    (suffixed) columns."""
    if isinstance(e, tuple):
        if e and e[0] in ("var", "bound") and e[1] in mapping:
            return (e[0], mapping[e[1]])
        return tuple(_rename_vars(x, mapping) for x in e)
    if isinstance(e, list):
        return [_rename_vars(x, mapping) for x in e]
    return e


def _graph_var_solutions(
    triples: DataFrame, g: Group, gvar: str, repo: str | None
) -> DataFrame:
    """GRAPH ?g { patterns }: like a BGP, but every pattern additionally
    projects the triple's repo column as ?g — and because ?g is then a
    SHARED column across the block's patterns, the equi-join keeps all of a
    solution's triples inside ONE named graph, which is exactly SPARQL's
    GRAPH semantics over the reference's per-repo models. ?g in a term
    position (e.g. GRAPH ?g { ?g prov:label ?l }) equates graph name and
    term, same as any repeated variable. Property paths inside GRAPH ?var
    are out of subset (a closure must not hop across graphs; use a constant
    graph term, which scopes the whole block)."""
    if g.paths:
        raise SparqlError(
            "property paths inside GRAPH ?var are out of subset "
            "(use a constant graph term)"
        )
    if not g.patterns:
        raise SparqlError("empty GRAPH block")
    gdf = triples
    if repo is not None:
        gdf = gdf.where(F.col("repo") == repo)
    typed = "obj_type" in triples.columns
    result: DataFrame | None = None
    for s, p, o in g.patterns:
        df = gdf
        cols = {gvar: "repo"}
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if term.startswith("?"):
                name = term[1:]
                if name in cols:
                    df = df.where(F.col(col) == F.col(cols[name]))
                    if typed and "obj" in (col, cols[name]) \
                            and col != cols[name]:
                        # term equality across positions: the object must
                        # be an IRI (bgp's typed-mode rule)
                        df = df.where(F.col("obj_type") == "iri")
                else:
                    cols[name] = col
            else:
                df = df.where(F.col(col) == term)
                if typed and isinstance(term, TypedLit):
                    df = (df.where(F.col("obj_type") == term.meta)
                          if col == "obj" else df.where(F.lit(False)))
        proj_cols = [F.col(c).alias(v) for v, c in cols.items()]
        if typed:
            # same term-metadata companions as bgp typed mode — the graph
            # var binds graph NAMES (term type iri); shared companion
            # names make cross-pattern joins term-exact for free
            proj_cols += [
                (F.col("obj_type") if c == "obj" else F.lit("iri"))
                .alias(term_meta(v))
                for v, c in cols.items()
            ]
        proj = df.select(*proj_cols)
        if result is None:
            result = proj
        else:
            shared = [c for c in proj.columns if c in result.columns]
            result = result.join(proj, shared)
    # no dedup needed: ?g (the repo column) is projected on every pattern,
    # so each pattern relation is already a set of distinct rows
    return _apply_filters(result, g.filters, triples, repo)


def _solutions(triples: DataFrame, q: SelectQuery, repo: str | None) -> DataFrame:
    """The WHERE clause's solution set: BGP joins + property-path relations +
    UNION/OPTIONAL/MINUS blocks + VALUES/BIND columns + FILTER row
    predicates, one column per bound variable."""
    if (not q.patterns and not q.path_patterns and not q.unions
            and not q.subqueries and not q.graphs and not q.values_blocks):
        raise SparqlError("WHERE contains no triple patterns")
    df = bgp(triples, q.patterns, repo=repo, typed=True) if q.patterns else None
    for pp_idx, (s, raw_expr, o) in enumerate(q.path_patterns):
        df = _join_path_pattern(triples, df, s, raw_expr, o, repo, pp_idx)
    if df is not None:
        df = _drop_pp_markers(df)
    for branches in q.unions:
        if any(not b.patterns and not b.paths for b in branches):
            raise SparqlError("empty UNION branch")
        dfs = [_group_solutions(triples, b, repo) for b in branches]
        # term-metadata companions survive the union only when EVERY branch
        # binds them — a branch missing one would null-fill it, and a null
        # meta on a non-null value would silently drop rows at the next
        # equi-join (degrade that var to the legacy value level instead)
        metas = [set(c for c in d.columns if c.endswith(TERM_META))
                 for d in dfs]
        keep = set.intersection(*metas)
        dfs = [d.drop(*(m - keep)) if (m - keep) else d
               for d, m in zip(dfs, metas)]
        u = dfs[0]
        for d in dfs[1:]:
            u = u.unionByName(d, allowMissingColumns=True)
        # SPARQL bag semantics (what ARQ gives the reference): UNION
        # concatenates the branch solution multisets, so a solution
        # produced by BOTH branches appears twice — under COUNT/SUM and
        # in plain SELECT rows alike. SELECT DISTINCT (and only it)
        # dedups, at projection time in _finish_select.
        if df is None:
            df = u
        else:
            shared = [c for c in u.columns if c in df.columns]
            if not shared:
                raise SparqlError(
                    "UNION group shares no variable with the other patterns"
                )
            for b in branches:
                bound = {
                    t[1:]
                    for pat in b.patterns for t in pat if t.startswith("?")
                } | {
                    t[1:]
                    for s_, _p, o_ in b.paths for t in (s_, o_)
                    if t.startswith("?")
                }
                missing = [v for v in shared
                           if v not in bound and not v.endswith(TERM_META)]
                if missing:
                    # an unbound shared var would null the join key and
                    # silently drop the branch's solutions — out of subset
                    raise SparqlError(
                        f"every UNION branch must bind the join "
                        f"variable(s) {missing} when combined with other "
                        "patterns"
                    )
            df = df.join(u, shared)
    for subq in q.subqueries:
        # SPARQL 1.1 §12: the subquery evaluates bottom-up in full (own
        # grouping / ordering / LIMIT), then its projected variables join
        # the outer solutions — one more equi-join in the same plan
        sdf = _finish_select(_solutions(triples, subq, repo), subq)
        if df is None:
            df = sdf
        else:
            shared = [c for c in sdf.columns if c in df.columns]
            df = df.join(sdf, shared) if shared else df.crossJoin(sdf)
    for gterm, g in q.graphs:
        if gterm.startswith("?"):
            gsol = _graph_var_solutions(triples, g, gterm[1:], repo)
        elif repo is not None and gterm != repo:
            # dataset already scoped to one named graph; a different
            # constant graph matches nothing
            gsol = _group_solutions(triples, g, repo).where(F.lit(False))
        else:
            # constant graph = evaluate the block repo-scoped to it
            gsol = _group_solutions(triples, g, gterm)
        if df is None:
            df = gsol
        else:
            shared = [c for c in gsol.columns if c in df.columns]
            df = df.join(gsol, shared) if shared else df.crossJoin(gsol)
    for opt_idx, g in enumerate(q.optionals):
        # SPARQL §8.3: OPTIONAL { P FILTER(E) } is LeftJoin(outer, P, E).
        # A filter over only the block's own variables is equivalent
        # applied to the block's solutions BEFORE the join (group scoping,
        # the cheap plan — one less conditional join); a filter referencing
        # ANY outer variable must become the left join's ON condition (the
        # spec's famous scope corner — ARQ's LeftJoin(expr)). EXISTS / is* /
        # DATATYPE-containing filters compile relationally and stay block-
        # scoped; referencing outer vars from those is out of subset.
        block_bound = _group_bound_vars(g)
        pre: list = []
        on_conds: list = []
        for f in g.filters:
            fv, joinish = _filter_ref_vars(f)
            if fv <= block_bound or joinish:
                pre.append(f)   # unbound refs raise in the block compile
            elif fv <= (block_bound | set(df.columns)):
                on_conds.append(f)
            else:
                raise SparqlError(
                    f"OPTIONAL filter references variables bound neither "
                    f"in the block nor in the outer patterns: "
                    f"{sorted(fv - block_bound - set(df.columns))}"
                )
        opt = _group_solutions(
            triples, Group(g.patterns, g.paths, pre), repo)
        shared = [c for c in opt.columns if c in df.columns]
        if not [c for c in shared if not c.endswith(TERM_META)]:
            raise SparqlError(
                "OPTIONAL block shares no variable with the required patterns"
            )
        if not on_conds:
            df = df.join(opt, shared, "left")
            continue
        # conditional left join: rename every block column so names stay
        # unique, equate the shared ones, compile the filters with block-
        # only vars rewritten to their renamed columns, then restore names.
        # Metadata companions rename META-AWARE (v's `v#m` → `v{sfx}#m`,
        # the companion of the renamed var) so LANG/DATATYPE/sameTerm over
        # block vars still resolve inside the ON condition.
        sfx = f"#opt{opt_idx}"

        def _sfx_name(c: str) -> str:
            if c.endswith(TERM_META):
                return term_meta(c[: -len(TERM_META)] + sfx)
            return c + sfx

        opt_r = opt.select(
            [F.col(c).alias(_sfx_name(c)) for c in opt.columns])
        cond = None
        for c in shared:
            eq = F.col(c) == F.col(_sfx_name(c))
            cond = eq if cond is None else cond & eq
        from types import SimpleNamespace

        ns = SimpleNamespace(columns=list(df.columns) + list(opt_r.columns))
        rename = {v: v + sfx for v in opt.columns
                  if v not in df.columns and not v.endswith(TERM_META)}
        for f in on_conds:
            cond = cond & _filter_col(_rename_vars(f, rename), ns)
        joined = df.join(opt_r, cond, "left")
        df = joined.select(
            *df.columns,
            *[F.col(_sfx_name(c)).alias(c) for c in opt.columns
              if c not in df.columns],
        )
    for g in q.minuses:
        # SPARQL MINUS: drop solutions compatible (equal on shared vars)
        # with some minus solution; disjoint domains remove nothing
        m = _group_solutions(triples, g, repo)
        shared = [c for c in m.columns if c in df.columns]
        if shared:
            df = df.join(m.select(*shared).distinct(), shared, "left_anti")
    for names, rows in q.values_blocks:
        spark = triples.sparkSession
        # an all-typed column (parser-enforced: no mixing) carries its
        # term metadata as the hidden companion, so the inline relation
        # joins TERM-exactly against metadata-carrying pattern vars and
        # can introduce typed terms for downstream joins/builtins; plain
        # columns keep the legacy value-level equi-join
        typed = [isinstance(rows[0][j], TypedLit) for j in range(len(names))]
        cols: list[str] = []
        for j, n in enumerate(names):
            cols.append(n)
            if typed[j]:
                cols.append(term_meta(n))
        data = [
            tuple(x for j, v in enumerate(r)
                  for x in ((str(v), v.meta) if typed[j] else (str(v),)))
            for r in rows
        ]
        vdf = spark.createDataFrame(
            data, ", ".join(f"`{c}` string" for c in cols)
        )
        if df is None:
            df = vdf
        else:
            shared = [c for c in names if c in df.columns]
            # term-exact join keys where BOTH sides carry the companion;
            # a meta-less outer var degrades to the value join (documented)
            join_keys = list(shared)
            drop_metas = []
            for n in shared:
                if not typed[names.index(n)]:
                    continue
                if term_meta(n) in df.columns:
                    join_keys.append(term_meta(n))
                else:
                    drop_metas.append(term_meta(n))
            if drop_metas:
                vdf = vdf.drop(*drop_metas)
            df = df.join(F.broadcast(vdf), join_keys) if join_keys \
                else df.crossJoin(F.broadcast(vdf))
    for expr, name in q.binds:
        df = _apply_bind(df, expr, name, triples, repo)
    df = _apply_filters(df, q.filters, triples, repo)
    # (expr AS ?alias) projection expressions — same compile as a BIND, but
    # applied after the WHERE filters (the alias is not in scope there)
    for expr, name in q.proj_exprs:
        df = _apply_bind(df, expr, name, triples, repo)
    return df


def _apply_bind(
    df: DataFrame, expr: BindExpr, name: str,
    triples: DataFrame, repo: str | None,
) -> DataFrame:
    """Bind one value expression as column `name` (BIND and projection
    expressions share this). STRLANG/STRDT additionally write the
    constructed tag/datatype into the variable's term-metadata companion;
    DATATYPE over a metadata-carrying var is a pure expression, over a
    meta-less var it hoists through the legacy one-join literal→datatype
    map (_bind_datatype)."""
    if name in df.columns:
        raise SparqlError(f"BIND would rebind already-bound ?{name}")
    if expr[0] in ("strlang", "strdt"):
        value = _bind_col(expr[1], df).cast("string")
        return (df.withColumn(name, value)
                .withColumn(term_meta(name), F.lit(expr[2])))
    dt_vars: set = set()
    expr2 = _rewrite_datatype(expr, dt_vars, _meta_vars(df))
    if dt_vars:
        # DATATYPE over meta-less vars nested anywhere in the expression:
        # bind each term's datatype as a temp column first (one left join
        # against the graph's literal→datatype map per var), then compile
        # the rewritten expression against it
        tmps = []
        for v in sorted(dt_vars):
            df = _bind_datatype(df, ("var", v), _DT_TMP + v, triples, repo)
            tmps.append(_DT_TMP + v)
        return df.withColumn(name, _bind_col(expr2, df)).drop(*tmps)
    return df.withColumn(name, _bind_col(expr2, df))


#: temp-column prefix for DATATYPE(?v) hoisted out of a larger expression
_DT_TMP = "__dt__"


def _rewrite_datatype(e, found: set, have_meta: set = frozenset()):
    """Replace ("datatype", ("var", v)) sub-expressions with a reference to
    their hoisted temp column, collecting the source vars — this is what
    lets DATATYPE appear inside FILTER operands and nested BIND expressions
    even when its compile is a join. Vars in `have_meta` carry their
    term-metadata companion column and compile directly in _bind_col, so
    they are left in place (no join at all)."""
    if isinstance(e, tuple):
        if e and e[0] == "datatype":
            arg = e[1]
            if not (isinstance(arg, tuple) and arg[0] == "var"):
                raise SparqlError("DATATYPE takes a single ?var argument")
            if arg[1] in have_meta:
                return e
            found.add(arg[1])
            return ("var", _DT_TMP + arg[1])
        return tuple(_rewrite_datatype(x, found, have_meta) for x in e)
    if isinstance(e, list):
        return [_rewrite_datatype(x, found, have_meta) for x in e]
    return e


def _bind_datatype(
    df: DataFrame, arg: BindExpr, name: str,
    triples: DataFrame, repo: str | None,
) -> DataFrame:
    """BIND(DATATYPE(?v) AS ?dt): term typing is store-level (the obj_type
    column on each triple), not derivable from the lexical form, so this is
    ONE equi left join against the graph's distinct literal→datatype map
    (AQE picks broadcast when the map is small; at full scale the distinct
    literal set is large and must shuffle — never force-broadcast it).
    IRI terms and unknown lexical forms get NULL (SPARQL: type error →
    unbound). A lexical form stored under two datatypes resolves to min()
    deterministically — a documented divergence of the lexical term model
    (rare: the KG emitter types each attribute consistently). Datatypes are
    returned in the store's own CURIE spelling ('xsd:int', matching every
    serializer in store.py)."""
    if arg[0] != "var":
        raise SparqlError("DATATYPE takes a single ?var argument")
    var = arg[1]
    if var not in df.columns:
        raise SparqlError(f"DATATYPE references unbound variable ?{var}")
    gdf = triples
    if repo is not None and "repo" in gdf.columns:
        gdf = gdf.where(F.col("repo") == repo)
    if "obj_type" not in gdf.columns:
        # bare (s,p,o) frame: no typing available — every term is unbound
        return df.withColumn(name, F.lit(None).cast("string"))
    dtmap = (
        gdf.where(F.col("obj_type") != "iri")
        .groupBy(F.col("obj").alias(var))
        .agg(F.min("obj_type").alias(name))
    )
    return df.join(dtmap, var, "left")


def construct(triples: DataFrame, query: str, repo: str | None = None, *,
              now: str | None = None, seed: int | None = None) -> DataFrame:
    """Run a SPARQL CONSTRUCT (subset) string: template patterns instantiated
    once per WHERE solution → a (subj, pred, obj) triple DataFrame.

    Each template pattern is a projection of the solution set (constants as
    literals), unioned and set-deduped — still one declarative plan, so a
    CONSTRUCT feeding a serializer or the store never materializes on the
    driver. Solutions that leave a template variable unbound (via OPTIONAL)
    skip that template instance, per SPARQL semantics.
    """
    q = parse(query, repo=repo, now=now, seed=seed)
    if q.construct is None:
        raise SparqlError("not a CONSTRUCT query (use execute for SELECT)")
    sol = _solutions(triples, q, repo)
    # solution modifiers (§16.2, r5): ORDER BY / OFFSET / LIMIT cut the
    # solution sequence BEFORE template instantiation — ORDER BY + LIMIT
    # is the meaningful combo (top-N solutions feed the template; the
    # output graph is still a set)
    if q.order_by:
        sol = _order(sol, q)
    if q.offset is not None:
        sol = sol.offset(q.offset)
    if q.limit is not None:
        sol = sol.limit(q.limit)
    parts = []
    for s, p, o in q.construct:
        cols = []
        for term, name in ((s, "subj"), (p, "pred"), (o, "obj")):
            if term.startswith("?"):
                v = term[1:]
                if v not in sol.columns:
                    raise SparqlError(
                        f"CONSTRUCT template var ?{v} unbound in WHERE"
                    )
                cols.append(F.col(v).alias(name))
            else:
                cols.append(F.lit(term).alias(name))
        parts.append(
            sol.select(*cols).where(
                F.col("subj").isNotNull()
                & F.col("pred").isNotNull()
                & F.col("obj").isNotNull()
            )
        )
    out = parts[0]
    for t in parts[1:]:
        out = out.unionByName(t)
    return out.distinct()


def query(triples: DataFrame, text: str, repo: str | None = None, *,
          now: str | None = None, seed: int | None = None):
    """One entry point for any supported SPARQL string — dispatches on the
    parsed query form, like the reference's single SPARQL endpoint
    (controllers/SparqlController.java:33-43): SELECT → bindings DataFrame,
    CONSTRUCT → triples DataFrame, ASK → bool, DESCRIBE → subject triples."""
    form = parse(text, repo=repo, now=now, seed=seed).form
    if form == "select":
        return execute(triples, text, repo=repo, now=now, seed=seed)
    fn = {"construct": construct, "ask": ask, "describe": describe}[form]
    return fn(triples, text, repo=repo, now=now, seed=seed)


def ask(triples: DataFrame, query: str, repo: str | None = None, *,
        now: str | None = None, seed: int | None = None) -> bool:
    """Run a SPARQL ASK (subset) string: True iff the WHERE clause has at
    least one solution. Short-circuits with limit(1) — the scan stops at
    the first matching partition batch."""
    q = parse(query, repo=repo, now=now, seed=seed)
    if q.form != "ask":
        raise SparqlError(f"{q.form.upper()} query: use the matching function")
    return bool(_solutions(triples, q, repo).limit(1).take(1))


def describe(triples: DataFrame, query: str, repo: str | None = None, *,
             now: str | None = None, seed: int | None = None) -> DataFrame:
    """Run a SPARQL DESCRIBE (subset) string: all triples whose subject is
    one of the given constant terms, or (r5, §16.4) one of the values a
    DESCRIBE variable takes over the WHERE clause's solutions —
    (subj, pred, obj, obj_type). Constant-only DESCRIBE stays a pushed-down
    subject filter; the WHERE form compiles to ONE left-semi join of the
    store against the distinct resource set (never a collected isin list —
    the resource set is unbounded), with constants described
    unconditionally (ARQ behavior) via a unioned literal row."""
    q = parse(query, repo=repo, now=now, seed=seed)
    if q.form != "describe":
        raise SparqlError(f"{q.form.upper()} query: use the matching function")
    df = triples
    if repo is not None:
        df = df.where(F.col("repo") == repo)
    if not q.describe_where:
        out = df.where(F.col("subj").isin(q.describe_terms)).select(
            "subj", "pred", "obj", "obj_type"
        )
        if repo is None and "repo" in df.columns:
            # a DESCRIBE result is a GRAPH: cross-repo, dedup the merge so
            # a triple stored in several repos appears once
            out = out.distinct()
        return out
    sol = _solutions(triples, q, repo)
    missing = [v for v in q.describe_vars if v not in sol.columns]
    if missing:
        raise SparqlError(f"DESCRIBE of unbound variables: {missing}")
    spark = triples.sparkSession
    parts = [
        sol.select(F.col(v).alias("subj")).where(F.col(v).isNotNull())
        for v in q.describe_vars
    ]
    if q.describe_terms:
        parts.append(spark.createDataFrame(
            [(t,) for t in q.describe_terms], "subj string"))
    resources = parts[0]
    for p in parts[1:]:
        resources = resources.unionByName(p)
    out = df.join(resources.distinct(), "subj", "left_semi").select(
        "subj", "pred", "obj", "obj_type"
    )
    if repo is None and "repo" in df.columns:
        out = out.distinct()
    return out


def execute(triples: DataFrame, query: str, repo: str | None = None, *,
            now: str | None = None, seed: int | None = None) -> DataFrame:
    """Run a SPARQL SELECT (subset) string over the triples DataFrame.

    `repo` prunes to one named graph (the reference's per-repo model) and
    binds the gitprov: namespace for full-IRI constants. `now` (an
    xsd:dateTime lexical) and `seed` enable the seeded deterministic forms
    of NOW()/RAND()/UUID()/STRUUID(); without them those builtins stay a
    loud parse error.
    """
    q = parse(query, repo=repo, now=now, seed=seed)
    if q.form != "select":
        raise SparqlError(f"{q.form.upper()} query: use the matching function")
    return _finish_select(_solutions(triples, q, repo), q)


def _finish_select(df: DataFrame, q: SelectQuery) -> DataFrame:
    """Projection / aggregation / HAVING / ORDER / LIMIT over a solution
    set — shared by execute() and subquery evaluation. Term-metadata
    companion columns ride along through DISTINCT (term-level dedup: two
    solutions differing only in a datatype/tag stay two solutions) and
    ORDER BY (so DATATYPE/LANG sort keys compile map-side), then drop
    before the result leaves the engine."""
    if q.having and not q.aggregates and not q.group_by:
        raise SparqlError(
            "HAVING requires an aggregate projection or GROUP BY")
    if q.aggregates and q.proj_exprs:
        raise SparqlError(
            "mixing (expr AS ?alias) projections with aggregates is out of "
            "subset (project group keys, aggregate aliases, or BIND first)"
        )
    # GROUP BY (expr AS ?alias) keys (r5): computed here like trailing
    # BINDs — a map-side projection ahead of the hash-aggregate, so the
    # grouped plan is unchanged apart from the key column's definition
    for gexpr, galias in q.group_exprs:
        if galias in df.columns:
            raise SparqlError(
                f"GROUP BY alias would rebind already-bound ?{galias}")
        df = df.withColumn(galias, _bind_col(gexpr, df))
    if q.aggregates or (q.group_by and (
            q.having or any(isinstance(k, Agg) for k, _ in q.order_by))):
        # Aggregation runs over the solution set (the full-binding rows are
        # distinct tuples: each pattern's matched triple is determined by its
        # variable bindings plus constants, so no spurious duplicates exist —
        # matching SPARQL COUNT semantics over a triple-SET store). Shuffle
        # is one hash-aggregate on the GROUP BY keys with map-side partials.
        missing = [v for v in (q.variables or []) + q.group_by
                   if v not in df.columns]
        if missing:
            raise SparqlError(f"aggregate query references unbound: {missing}")
        stray = [v for v in (q.variables or []) if v not in q.group_by]
        if stray:
            raise SparqlError(
                f"projected vars must appear in GROUP BY: {stray}"
            )
        def _agg_column(a: Agg) -> F.Column:
            if a.var is not None and a.var not in df.columns:
                raise SparqlError(f"aggregate over unbound variable ?{a.var}")
            # value-expression argument (r5): compiled map-side by the same
            # BIND expression compiler, then aggregated — SUM(?a * ?b) is
            # one projected column into the same single hash-aggregate
            arg = _bind_col(a.expr, df) if a.expr is not None else (
                F.col(a.var) if a.var is not None else None)
            if a.func == "count" and arg is None:
                c = F.count(F.lit(1))
            elif a.func == "count" and a.distinct and a.expr is not None:
                c = F.countDistinct(arg)
            elif a.func == "count" and a.distinct:
                # COUNT(DISTINCT ?v) counts distinct TERMS when the var
                # carries metadata: "7"^^xsd:int and "7"@en are two. The
                # meta operand is coalesced so multi-arg countDistinct's
                # any-null row drop fires only on an unbound value.
                m = term_meta(a.var)
                if m in df.columns:
                    c = F.count_distinct(
                        F.col(a.var), F.coalesce(F.col(m), F.lit("")))
                else:
                    c = F.countDistinct(a.var)
            elif a.func == "count":
                c = F.count(arg)
            elif a.func == "sum":
                # SPARQL SUM over numeric literals: cast the lexical form;
                # DISTINCT (r5) sums the distinct value set — still one
                # hash-aggregate (Spark plans distinct-aggs map-side)
                c = (F.sum_distinct(arg.cast("double")) if a.distinct
                     else F.sum(arg.cast("double")))
            elif a.func == "avg":
                # AVG(DISTINCT ?v) (r5) = sum/count over the distinct
                # value set (no avg_distinct builtin); null on empty input
                # either way
                c = (F.sum_distinct(arg.cast("double"))
                     / F.count_distinct(arg.cast("double"))
                     if a.distinct else F.avg(arg.cast("double")))
            elif a.func in ("min", "max"):
                # DISTINCT is a semantic no-op on MIN/MAX (§18.5.1 applies
                # Distinct to the multiset; the extremum is unchanged)
                c = F.min(arg) if a.func == "min" else F.max(arg)
            elif a.func == "sample":
                # SPARQL SAMPLE is implementation-defined; pick min for a
                # deterministic (and oracle-reproducible) witness —
                # DISTINCT is likewise a no-op here
                c = F.min(arg)
            else:  # group_concat — sorted for determinism (ARQ emits
                # solution order, which a distributed plan cannot promise);
                # DISTINCT (r5) concatenates the distinct value set
                collect = F.collect_set if a.distinct else F.collect_list
                c = F.array_join(
                    F.array_sort(collect(arg.cast("string"))),
                    a.sep,
                )
            return c

        cols = [_agg_column(a).alias(a.alias) for a in q.aggregates]
        # inline HAVING aggregates (r5) become hidden columns of the SAME
        # hash-aggregate ('#' cannot appear in a user variable name), so
        # HAVING (SUM(?v) > 10) costs no second aggregation
        having_names: dict[int, str] = {}
        for i, (colspec, _op, _num) in enumerate(q.having):
            if isinstance(colspec, Agg):
                having_names[i] = name = f"#having{i}"
                cols.append(_agg_column(colspec).alias(name))
        # inline ORDER BY aggregates (r5) ride the same hash-aggregate as
        # hidden '#orderN' columns, kept through the projection just long
        # enough to sort on, then dropped
        order_names: dict[int, str] = {}
        for i, (key, _asc) in enumerate(q.order_by):
            if isinstance(key, Agg):
                order_names[i] = name = f"#order{i}"
                cols.append(_agg_column(key).alias(name))
        # GROUP BY is TERM-level where metadata exists (r5): each key's
        # hidden companion joins the grouping keys, so "7"^^xsd:int and
        # "7"@en land in different groups (one hash-aggregate either way —
        # the extra key column changes distribution, not plan shape). The
        # projection below keeps only the visible value column; a lexical
        # may therefore legitimately repeat across output rows. Other
        # aggregate INPUTS (SUM/MIN/MAX/SAMPLE/GROUP_CONCAT) stay
        # value-level — documented divergence, module doc.
        gkeys = []
        for v in q.group_by:
            gkeys.append(v)
            if term_meta(v) in df.columns:
                gkeys.append(term_meta(v))
        grouped = df.groupBy(*gkeys) if gkeys else df.groupBy()
        df = grouped.agg(*cols)
        # HAVING runs BEFORE the projection (§18.2.4 order) so hidden
        # inline-aggregate columns are still in scope; for alias refs the
        # row predicate commutes with projection/DISTINCT, so alias-based
        # HAVING behaves exactly as before
        for i, (colspec, op, num) in enumerate(q.having):
            name = having_names.get(i, colspec)
            if name not in df.columns:
                raise SparqlError(
                    f"HAVING references unknown column ?{colspec}")
            c = F.col(name).cast("double")
            cond = {"=": c == num, "!=": c != num, "<": c < num,
                    "<=": c <= num, ">": c > num, ">=": c >= num}[op]
            df = df.where(cond)
        if order_names:
            if q.distinct:
                raise SparqlError(
                    "ORDER BY an inline aggregate with SELECT DISTINCT is "
                    "out of subset (DISTINCT dedups the projection first, "
                    "leaving the sort key undefined — alias the aggregate)"
                )
            # sort on the hidden columns pre-drop: Project over Sort
            # preserves row order, so the final select just prunes them
            df = df.select(*q.select_order,
                           *[order_names[i] for i in sorted(order_names)])
            keys = []
            for i, (key, asc) in enumerate(q.order_by):
                c = (F.col(order_names[i]) if i in order_names
                     else (F.col(key) if isinstance(key, str)
                           else _bind_col(key, df)))
                keys.append(c.asc() if asc else c.desc())
            df = df.orderBy(*keys).select(*q.select_order)
        else:
            df = df.select(*q.select_order)
            if q.distinct:
                # SELECT DISTINCT over aggregated rows: group keys are
                # unique per row, but a projection that drops them (or
                # equal counts across groups) can duplicate — SPARQL
                # dedups the projection
                df = df.distinct()
            df = _order(df, q)
    elif q.variables is not None:
        missing = [v for v in q.variables if v not in df.columns]
        if missing:
            raise SparqlError(f"SELECT of unbound variables: {missing}")
        # bag semantics (§18.5): the projection keeps one row per WHERE
        # solution — duplicates under the narrower column set survive
        # unless the query says DISTINCT. Metadata companions of projected
        # vars ride along for term-level DISTINCT; §15.1 evaluation order
        # puts ORDER BY BEFORE the projection (sort keys may reference
        # unprojected vars and their metadata), except under DISTINCT,
        # where the spec restricts sort keys to projected variables.
        if q.distinct:
            metas = [term_meta(v) for v in q.variables
                     if term_meta(v) in df.columns]
            df = df.select(*q.variables, *metas).distinct()
            df = _order(df, q)
        else:
            df = _order(df, q).select(*q.variables)
    elif q.distinct:
        df = df.distinct()  # SELECT DISTINCT * (term-level: metas included)
        df = _order(df, q)
    else:
        df = _order(df, q)
    drop = [c for c in df.columns if c.endswith(TERM_META)]
    if drop and len(drop) < len(df.columns):
        df = df.drop(*drop)
    if q.offset is not None:
        df = df.offset(q.offset)
    if q.limit is not None:
        df = df.limit(q.limit)
    return df


def _order(df: DataFrame, q: SelectQuery) -> DataFrame:
    if not q.order_by:
        return df
    keys = []
    for v, asc in q.order_by:
        if isinstance(v, Agg):
            raise SparqlError(
                "ORDER BY an aggregate requires GROUP BY or an aggregate "
                "projection (there is no group to aggregate over)")
        c = F.col(v) if isinstance(v, str) else _bind_col(v, df)
        keys.append(c.asc() if asc else c.desc())
    return df.orderBy(*keys)


# --------------------------------------------------------------------------
# SPARQL UPDATE (subset) — graph-store maintenance as pure batch set algebra
# --------------------------------------------------------------------------
#
# The reference mutates its TDB dataset through Jena when repos are
# re-translated (services/StoreService.java); a Spark KG store is immutable
# parquet, so UPDATE compiles to a new triple RELATION:
#     out = (store ∖ deleted) ∪ inserted        (set semantics per graph)
# which the caller re-materializes (store.write_triples — at 100 TB with
# (repo_bucket, pred) partition keys only changed partitions rewrite under
# dynamic partition overwrite). Supported forms:
#     INSERT DATA { quads }            DELETE DATA { quads }
#     DELETE WHERE { bgp }
#     DELETE { tmpl } INSERT { tmpl } WHERE { group }   (either optional)
# Quad data allows GRAPH <name> { ... } blocks (the store's repo column is
# the graph name — the convention GRAPH queries already use); plain data
# triples need the repo= argument. Deleted and inserted rows are both
# computed against the ORIGINAL store (spec §3.1.3), applied delete-first.
#
# DELETION identity follows the engine's matching semantics exactly,
# because deletes are ANTI-JOINS of the store against per-template
# conditions, not re-guessed rows: a template variable deletes the very
# (obj, obj_type) terms it was bound to (the term-metadata companion rides
# into the anti-join), a TypedLit constant deletes term-exactly, and a
# plain constant deletes lexically — precisely what that constant MATCHES
# in a WHERE pattern (queries.bgp), so DELETE WHERE removes exactly the
# rows its own pattern matched, never more, never fewer.

@dataclass
class UpdateQuery:
    form: str  # insert_data | delete_data | delete_where | modify
    # (graph|None, (term, ot) ×3): ot is the obj_type a CONSTANT inserts
    # with ('iri', 'string', or the TypedLit meta); None marks a variable
    quads: list[tuple] = field(default_factory=list)
    delete_templates: list[tuple] = field(default_factory=list)
    insert_templates: list[tuple] = field(default_factory=list)
    where: SelectQuery | None = None


def _update_term(p: _Parser, predicate: bool = False) -> tuple[str, str | None]:
    """A template/data term plus the obj_type it would INSERT with. The
    token KIND decides iri-vs-string (post-_term both are plain str —
    fine for matching, ambiguous for insertion): pname/iri/'a' → 'iri',
    quoted literal → 'string' (or the TypedLit's own meta), var → None."""
    kind = p._peek()[0]
    t = p._term(as_pattern=True, predicate=predicate)
    if kind == "var":
        return t, None
    if isinstance(t, TypedLit):
        return t, t.meta
    # plain quoted literals mint the store-wide xsd:string identity —
    # the vocabulary every pipeline emitter and serializer uses (a bare
    # 'string' tag would create rows nothing else matches)
    return t, ("xsd:string" if kind == "lit" else "iri")


def _parse_update_triples(p: _Parser, allow_vars: bool,
                          graph: str | None) -> list[tuple]:
    """{ s p o . ... } with optional GRAPH <g> { ... } sub-blocks (data
    blocks only). '.'-separated plain triples — paths / FILTER / blocks
    are meaningless in templates and fail the term reader loudly."""
    p._expect("{")
    out: list[tuple] = []
    while p._peek()[1] != "}":
        if p._peek()[0] == "eof":
            raise SparqlError("unterminated update block")
        if p._kw("GRAPH"):
            if graph is not None:
                raise SparqlError("nested GRAPH blocks in update data")
            gterm, got = _update_term(p)
            if got is None and not allow_vars:
                # data blocks: constant graph names only (IRI/CURIE or the
                # store's quoted form); templates may route per-solution
                # via GRAPH ?g (bound by a GRAPH ?g pattern in WHERE)
                raise SparqlError("GRAPH needs a constant graph name")
            out.extend(_parse_update_triples(p, allow_vars, gterm))
        else:
            s = _update_term(p)
            pr = _update_term(p, predicate=True)
            o = _update_term(p)
            if not allow_vars:
                for _term_, ot in (s, pr, o):
                    if ot is None:
                        raise SparqlError(
                            "variables are not allowed in DATA blocks")
            out.append((graph, s, pr, o))
        if p._peek()[1] == ".":
            p.i += 1
    p.i += 1  # consume '}'
    if not out:
        raise SparqlError("empty update block")
    return out


def parse_update(text: str, repo: str | None = None, *,
                 now: str | None = None,
                 seed: int | None = None) -> UpdateQuery:
    p = _Parser(_tokenize(text), repo, now, seed)
    while p._kw("PREFIX"):  # same prologue as the query forms
        kind, pname = p._next()
        if kind != "pname" or not pname.endswith(":"):
            raise SparqlError(f"bad PREFIX name {pname!r}")
        kind, iri = p._next()
        if kind != "iri":
            raise SparqlError(f"bad PREFIX iri {iri!r}")
        p.q.prefixes[pname[:-1]] = iri[1:-1]
    uq = UpdateQuery(form="")
    # graph-management forms (§3.2): CLEAR/DROP drop a graph's triples,
    # COPY/MOVE/ADD move whole graphs (repo-column relabeling). SILENT
    # is accepted and meaningless here — these are total functions on
    # the relation (an absent graph is just an empty selection).
    if p._kw("CLEAR") or p._kw("DROP"):
        p._kw("SILENT")
        p._expect("GRAPH")
        gterm, got = _update_term(p)
        if got is None:
            raise SparqlError("CLEAR/DROP GRAPH needs a constant name")
        uq.form = "clear"
        uq.quads = [(gterm, None, None, None)]
        if p._peek()[0] != "eof":
            raise SparqlError(f"trailing input at {p._peek()[1]!r}")
        return uq
    for verb in ("COPY", "MOVE", "ADD"):
        if p._kw(verb):
            p._kw("SILENT")
            p._kw("GRAPH")
            src, sot = _update_term(p)
            p._expect("TO")
            p._kw("GRAPH")
            dst, dot = _update_term(p)
            if sot is None or dot is None:
                raise SparqlError(f"{verb} needs constant graph names")
            uq.form = verb.lower()
            uq.quads = [(src, dst, None, None)]
            if p._peek()[0] != "eof":
                raise SparqlError(f"trailing input at {p._peek()[1]!r}")
            return uq
    if p._kw("INSERT"):
        if p._kw("DATA"):
            uq.form = "insert_data"
            uq.quads = _parse_update_triples(p, allow_vars=False, graph=None)
        else:
            uq.form = "modify"
            uq.insert_templates = _parse_update_triples(
                p, allow_vars=True, graph=None)
    elif p._kw("DELETE"):
        if p._kw("DATA"):
            uq.form = "delete_data"
            uq.quads = _parse_update_triples(p, allow_vars=False, graph=None)
        elif p._kw("WHERE"):
            uq.form = "delete_where"
            p._expect("{")
            p._parse_group()
            q = p.q
            if (q.path_patterns or q.unions or q.optionals or q.minuses
                    or q.binds or q.filters or q.values_blocks
                    or q.subqueries or q.graphs):
                raise SparqlError(
                    "DELETE WHERE takes a plain BGP (§3.1.3.3) — use "
                    "DELETE {..} WHERE {..} for anything richer")
            # the pattern IS the template; raw terms carry their own
            # identity (TypedLit meta / plain-lexical / variable)
            uq.delete_templates = [
                (None, (s, None), (pr, None), (o, None))
                for s, pr, o in q.patterns
            ]
            uq.where = q
            q.form = "select"
            if p._peek()[0] != "eof":
                raise SparqlError(f"trailing input at {p._peek()[1]!r}")
            return uq
        else:
            uq.form = "modify"
            uq.delete_templates = _parse_update_triples(
                p, allow_vars=True, graph=None)
            if p._kw("INSERT"):
                uq.insert_templates = _parse_update_triples(
                    p, allow_vars=True, graph=None)
    else:
        raise SparqlError("update must start with INSERT or DELETE")
    if uq.form == "modify":
        p._expect("WHERE")
        p._expect("{")
        p._parse_group()
        p._parse_modifiers()
        q = p.q
        if q.aggregates or q.group_by or q.having:
            raise SparqlError("GROUP BY / aggregates in UPDATE WHERE")
        uq.where = q
        q.form = "select"
    if p._peek()[0] != "eof":
        raise SparqlError(f"trailing input at {p._peek()[1]!r}")
    return uq


def _quad_rows_df(spark, quads: list[tuple], repo: str | None) -> DataFrame:
    rows = []
    for graph, (s, _), (pr, _), (o, oot) in quads:
        g = graph if graph is not None else repo
        if g is None:
            raise SparqlError(
                "DATA block triple outside GRAPH needs repo= scope")
        rows.append((g, str(s), str(pr), str(o), oot))
    return spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, "
              "obj_type string")


def _apply_delete(base: DataFrame, sol: DataFrame, templates: list[tuple],
                  repo: str | None) -> DataFrame:
    """Anti-join the store against each delete template: variable
    positions equi-join the solution's bound terms (object variables
    carry their term-metadata companion, so the deletion is term-exact);
    constants become store-side predicates with the same identity they
    MATCH with (TypedLit term-exact, plain lexical). One anti-join per
    template — templates are few; each is a broadcastable distinct
    projection of the solution set."""
    for graph, (s, _), (pr, _), (o, _) in templates:
        # dict-keyed so a variable repeated across positions (?x p ?x,
        # GRAPH ?g { ?g ... }) projects ONCE — duplicate columns in the
        # join's right side would make every reference ambiguous
        need: dict[str, None] = {}    # solution columns the join consumes
        var_conds: list[tuple] = []   # (store col, solution col) equi pairs
        const_conds: list = []        # store-side predicates
        if graph is not None and graph.startswith("?") \
                and not isinstance(graph, TypedLit):
            gv = graph[1:]
            if gv not in sol.columns:
                raise SparqlError(f"template graph ?{gv} unbound in WHERE")
            need[gv] = None
            var_conds.append(("repo", gv))
        elif graph is not None:
            const_conds.append(base["repo"] == F.lit(str(graph)))
        elif repo is not None:
            const_conds.append(base["repo"] == F.lit(repo))
        for term, col in ((s, "subj"), (pr, "pred")):
            if term.startswith("?") and not isinstance(term, TypedLit):
                v = term[1:]
                if v not in sol.columns:
                    raise SparqlError(f"template var ?{v} unbound in WHERE")
                need[v] = None
                var_conds.append((col, v))
            else:
                if isinstance(term, TypedLit):
                    raise SparqlError(
                        "a literal cannot stand in subject/predicate "
                        "position of a delete template")
                const_conds.append(base[col] == F.lit(str(term)))
        if o.startswith("?") and not isinstance(o, TypedLit):
            v = o[1:]
            if v not in sol.columns:
                raise SparqlError(f"template var ?{v} unbound in WHERE")
            need[v] = None
            var_conds.append(("obj", v))
            meta = term_meta(v)
            if meta in sol.columns:
                need[meta] = None
                var_conds.append(("obj_type", meta))
        elif isinstance(o, TypedLit):
            const_conds.append(base["obj"] == F.lit(str(o)))
            const_conds.append(base["obj_type"] == F.lit(o.meta))
        else:
            const_conds.append(base["obj"] == F.lit(str(o)))
        right = (sol.select(*need).distinct() if need
                 else sol.limit(1).select(F.lit(1).alias("_x")))
        conds = const_conds + [base[c] == right[v] for c, v in var_conds]
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        # no forced broadcast: the solution projection can be store-sized
        # (DELETE WHERE over a broad pattern); AQE broadcasts small sides
        # on its own and shuffles the rest
        base = base.join(right, cond, "left_anti")
    return base


def _insert_rows(sol: DataFrame, templates: list[tuple],
                 repo: str | None) -> DataFrame | None:
    """Template quads → 5-col rows, one instance per solution. Variable
    objects insert with the obj_type they were BOUND with (term-metadata
    companion); companion-less vars (BIND products) insert as xsd:string
    (the engine's BIND expressions produce literals). Solutions leaving
    a template var unbound (OPTIONAL) skip that instance, as in
    CONSTRUCT."""
    parts = []
    for graph, (s, _), (pr, _), (o, oot) in templates:
        g = graph if graph is not None else repo
        if g is None:
            raise SparqlError(
                "INSERT template needs a graph — repo= scope, a GRAPH "
                "<name> block, or per-solution GRAPH ?g routing")
        if g.startswith("?") and not isinstance(g, TypedLit):
            gv = g[1:]
            if gv not in sol.columns:
                raise SparqlError(f"template graph ?{gv} unbound in WHERE")
            cols = [F.col(gv).alias("repo")]
        else:
            cols = [F.lit(str(g)).alias("repo")]
        for term, name in ((s, "subj"), (pr, "pred")):
            if term.startswith("?") and not isinstance(term, TypedLit):
                v = term[1:]
                if v not in sol.columns:
                    raise SparqlError(f"template var ?{v} unbound in WHERE")
                cols.append(F.col(v).alias(name))
            else:
                if isinstance(term, TypedLit):
                    raise SparqlError(
                        "a literal cannot stand in subject/predicate "
                        "position of an insert template")
                cols.append(F.lit(str(term)).alias(name))
        if o.startswith("?") and not isinstance(o, TypedLit):
            v = o[1:]
            if v not in sol.columns:
                raise SparqlError(f"template var ?{v} unbound in WHERE")
            cols.append(F.col(v).alias("obj"))
            meta = term_meta(v)
            cols.append(
                (F.col(meta) if meta in sol.columns
                 else F.lit("xsd:string")).alias("obj_type"))
        else:
            cols.append(F.lit(str(o)).alias("obj"))
            cols.append(F.lit(oot).alias("obj_type"))
        parts.append(sol.select(*cols).where(
            F.col("repo").isNotNull() & F.col("subj").isNotNull()
            & F.col("pred").isNotNull() & F.col("obj").isNotNull()))
    if not parts:
        return None
    out = parts[0]
    for t in parts[1:]:
        out = out.unionByName(t)
    return out.distinct()


_STORE_COLS = ["repo", "subj", "pred", "obj", "obj_type"]


def update(triples: DataFrame, text: str, repo: str | None = None, *,
           now: str | None = None, seed: int | None = None) -> DataFrame:
    """Apply a SPARQL UPDATE string to the triple relation; returns the
    new (repo, subj, pred, obj, obj_type) relation. With repo=None a
    DELETE matches across every graph; INSERTs always need a graph —
    repo= or a GRAPH data block."""
    uq = parse_update(text, repo=repo, now=now, seed=seed)
    spark = triples.sparkSession
    base = triples.select(*_STORE_COLS)
    if uq.form == "clear":
        g = str(uq.quads[0][0])
        return base.where(F.col("repo") != g)
    if uq.form in ("copy", "move", "add"):
        src, dst = (str(t) for t in uq.quads[0][:2])
        moved = base.where(F.col("repo") == src).select(
            F.lit(dst).alias("repo"), "subj", "pred", "obj", "obj_type")
        if uq.form == "add":      # union into dst, set semantics
            return base.unionByName(moved).distinct()
        kept = base.where(F.col("repo") != dst)   # COPY/MOVE replace dst
        if uq.form == "move":
            kept = kept.where(F.col("repo") != src)
        return kept.unionByName(moved)
    if uq.form == "insert_data":
        return base.unionByName(
            _quad_rows_df(spark, uq.quads, repo)).distinct()
    if uq.form == "delete_data":
        # ground quads delete TERM-exactly: the anti-join keys include
        # obj_type, with plain quoted literals carrying the same
        # xsd:string identity INSERT DATA mints (matching the pipeline
        # emitters' vocabulary; an explicit "msg"^^other still works)
        dele = _quad_rows_df(spark, uq.quads, repo)
        return base.join(F.broadcast(dele), _STORE_COLS, "left_anti")
    sol = _solutions(base, uq.where, repo)
    out = base
    if uq.delete_templates:
        out = _apply_delete(out, sol, uq.delete_templates, repo)
    if uq.insert_templates:
        inserted = _insert_rows(sol, uq.insert_templates, repo)
        if inserted is not None:
            out = out.unionByName(inserted).distinct()
    return out
