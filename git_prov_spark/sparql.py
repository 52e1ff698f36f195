"""SPARQL SELECT (subset) frontend — raw query strings over the triples table.

The reference accepts arbitrary SPARQL text and answers it with Jena ARQ over
the stored per-repo model (services/SparqlService.java:16-31,
controllers/SparqlController.java:33-43). This module closes the string gap
on top of the existing BGP compiler (queries.bgp): it parses a practical
SELECT subset and compiles it to the same Catalyst self-join plan — Catalyst
is the optimizer/executor, exactly as ARQ is for the reference.

Supported subset (documented, validated — anything else raises SparqlError):

    PREFIX foo: <iri>                           -- any number
    CONSTRUCT { s p o . ... }                   -- template → triple DF
    ASK { ... }                                 -- → bool (ask())
    DESCRIBE term [term ...]                    -- → subject triples, no WHERE
    SELECT [DISTINCT] ?a ?b | *                 -- projection
    SELECT ?g (COUNT([DISTINCT] ?v|*) AS ?n)    -- aggregates: COUNT, SUM,
           (MIN(?v) AS ?lo) ...                 --   MIN, MAX, AVG (SUM/AVG
    WHERE { s p o . s p o .                     --   cast lexical -> double)
            ?a pred+ ?b .                       -- one-or-more property path
            { s p o } UNION { s p o } .         -- alternative branches
            OPTIONAL { s p o . ... } .          -- left-join blocks
            FILTER(?v = term) .                 -- =, !=, IN (...); the right
            FILTER(?v IN (t1, t2)) }            --   side may be another ?var
    GROUP BY ?g ...                             -- required iff aggregates
    HAVING(?alias > n) ...                      -- =  != > >= < <= over the
    ORDER BY [ASC|DESC](?v) ...                 --   aggregated columns
    LIMIT n OFFSET m                            -- optional (either order)

Terms: ?var, <full-iri>, pname:local, "literal" (optional ^^type, matched on
the lexical form), and the keyword `a` (rdf:type). Full IRIs are reverse-
mapped onto the store's CURIE vocabulary (iri.NAMESPACES + the per-repo
gitprov namespace when `repo` is passed). Bindings follow the BGP compiler's
set semantics (SELECT behaves as SELECT DISTINCT — the store is a triple SET,
so patterns cannot produce duplicate bindings anyway).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iri import NAMESPACES, gitprov_ns
from .queries import Pattern, bgp


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
  | (?P<dtype>\^\^)
  | (?P<pname>[A-Za-z][A-Za-z0-9_.-]*:[A-Za-z0-9_.%-]*)
  | (?P<word>[A-Za-z][A-Za-z0-9_]*)
  | (?P<num>[0-9]+(?:\.[0-9]+)?)
  | (?P<punct>[{}().=!,*<>+])
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

@dataclass
class Filter:
    var: str          # variable name (no '?')
    op: str           # '=', '!=', or 'in'
    value: str | list[str]  # resolved constant(s), or a var name if rhs_var
    rhs_var: bool = False   # right side is another variable (?a = ?b)


@dataclass
class Agg:
    func: str             # 'count' | 'sum' | 'min' | 'max'
    var: str | None       # None = COUNT(*)
    distinct: bool
    alias: str            # output column name (no '?')


@dataclass
class SelectQuery:
    prefixes: dict[str, str] = field(default_factory=dict)
    distinct: bool = False
    variables: list[str] | None = None      # None = SELECT *
    aggregates: list[Agg] = field(default_factory=list)
    select_order: list[str] = field(default_factory=list)  # output col order
    patterns: list[Pattern] = field(default_factory=list)
    path_patterns: list[Pattern] = field(default_factory=list)  # pred+ (pred stored bare)
    unions: list[list[list[Pattern]]] = field(default_factory=list)  # chains of branches
    optionals: list[list[Pattern]] = field(default_factory=list)
    filters: list[Filter] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    having: list[tuple[str, str, float]] = field(default_factory=list)  # (col, op, num)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: int | None = None
    offset: int | None = None
    construct: list[Pattern] | None = None  # CONSTRUCT template
    form: str = "select"                    # select | construct | ask | describe
    describe_terms: list[str] = field(default_factory=list)


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], repo: str | None):
        self.toks = tokens
        self.i = 0
        self.q = SelectQuery()
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
            self.q.construct = self._parse_template()
        elif self._kw("ASK"):
            self.q.form = "ask"
        elif self._kw("DESCRIBE"):
            self.q.form = "describe"
            while self._peek()[0] in ("pname", "iri"):
                self.q.describe_terms.append(self._term(as_pattern=False))
            if not self.q.describe_terms:
                raise SparqlError("DESCRIBE needs one or more constant terms")
            if self._peek()[0] != "eof":
                raise SparqlError(
                    f"DESCRIBE takes no WHERE clause (at {self._peek()[1]!r})"
                )
            return self.q
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
        if self._peek()[0] != "eof":
            raise SparqlError(f"trailing input at {self._peek()[1]!r}")
        return self.q

    def _parse_template(self) -> list[Pattern]:
        out = self._parse_braced_patterns()
        if not out:
            raise SparqlError("empty CONSTRUCT template")
        return out

    def _pred_term(self) -> tuple[str, bool]:
        """Predicate position: (term, is_path). Path-ness is carried out of
        band (SelectQuery.path_patterns), never as a string suffix — a
        full-IRI predicate may legitimately END in '+', so in-band marking
        would misclassify it."""
        p = self._term(as_pattern=True, predicate=True)
        if self._peek()[1] == "+":
            self.i += 1
            if p.startswith("?"):
                raise SparqlError("property path + needs a constant predicate")
            return p, True
        return p, False

    def _parse_braced_patterns(self) -> list[Pattern]:
        self._expect("{")
        out: list[Pattern] = []
        while self._peek()[1] != "}":
            if self._peek()[0] == "eof":
                raise SparqlError("unterminated pattern group")
            s = self._term(as_pattern=True)
            p = self._term(as_pattern=True, predicate=True)
            o = self._term(as_pattern=True)
            out.append((s, p, o))
            if self._peek()[1] == ".":
                self.i += 1
        self.i += 1
        return out

    _AGG_FUNCS = ("COUNT", "SUM", "MIN", "MAX", "AVG")

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
                self.i += 1
                self.q.aggregates.append(self._parse_agg())
                self.q.select_order.append(self.q.aggregates[-1].alias)
            else:
                break
        if not out and not self.q.aggregates:
            raise SparqlError("SELECT needs ?vars, (AGG(...) AS ?alias), or *")
        self.q.variables = out

    def _parse_agg(self) -> Agg:
        """After the opening '(': AGG([DISTINCT] ?v | *) AS ?alias )."""
        kind, fn = self._next()
        if kind != "word" or fn.upper() not in self._AGG_FUNCS:
            raise SparqlError(
                f"aggregate must be one of {self._AGG_FUNCS}, got {fn!r}"
            )
        func = fn.lower()
        self._expect("(")
        distinct = self._kw("DISTINCT")
        kind, arg = self._next()
        if arg == "*":
            if func != "count" or distinct:
                raise SparqlError("only COUNT(*) may take *")
            var = None
        elif kind == "var":
            var = arg[1:]
        else:
            raise SparqlError(f"aggregate argument must be ?var or *, got {arg!r}")
        self._expect(")")
        self._expect("AS")
        kind, alias = self._next()
        if kind != "var":
            raise SparqlError("AS needs a ?alias variable")
        self._expect(")")
        return Agg(func=func, var=var, distinct=distinct, alias=alias[1:])

    def _parse_group(self) -> None:
        while True:
            kind, tok = self._peek()
            if tok == "}":
                self.i += 1
                return
            if tok == "{":
                branches = [self._parse_braced_patterns()]
                while self._kw("UNION"):
                    branches.append(self._parse_braced_patterns())
                if len(branches) < 2:
                    raise SparqlError(
                        "a braced group must be a UNION chain "
                        "({ ... } UNION { ... })"
                    )
                self.q.unions.append(branches)
            elif kind == "word" and tok.upper() == "FILTER":
                self.i += 1
                self._parse_filter()
            elif kind == "word" and tok.upper() == "OPTIONAL":
                self.i += 1
                self._expect("{")
                block: list[Pattern] = []
                while self._peek()[1] != "}":
                    if self._peek()[0] == "eof":
                        raise SparqlError("unterminated OPTIONAL block")
                    s = self._term(as_pattern=True)
                    p = self._term(as_pattern=True, predicate=True)
                    o = self._term(as_pattern=True)
                    block.append((s, p, o))
                    if self._peek()[1] == ".":
                        self.i += 1
                self.i += 1  # consume '}'
                if not block:
                    raise SparqlError("empty OPTIONAL block")
                self.q.optionals.append(block)
            else:
                s = self._term(as_pattern=True)
                p, is_path = self._pred_term()
                o = self._term(as_pattern=True)
                if is_path:
                    self.q.path_patterns.append((s, p, o))
                else:
                    self.q.patterns.append((s, p, o))
            if self._peek()[1] == ".":
                self.i += 1

    def _parse_filter(self) -> None:
        self._expect("(")
        kind, var = self._next()
        if kind != "var":
            raise SparqlError("FILTER supports ?var (=|!=|IN) constant(s)")
        kind, op = self._next()
        if op == "!":
            self._expect("=")
            op = "!="
        elif kind == "word" and op.upper() == "IN":
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
                    raise SparqlError(f"expected ',' or ')' in IN list, got {nxt!r}")
            self._expect(")")
            self.q.filters.append(Filter(var[1:], "in", values))
            return
        elif op != "=":
            raise SparqlError(f"FILTER operator {op!r} unsupported (=, !=, IN)")
        rhs_kind = self._peek()[0]
        value = self._term(as_pattern=False)
        self._expect(")")
        rhs_var = rhs_kind == "var"
        self.q.filters.append(
            Filter(var[1:], op, value[1:] if rhs_var else value, rhs_var)
        )

    def _parse_modifiers(self) -> None:
        if self._kw("GROUP"):
            self._expect("BY")
            while self._peek()[0] == "var":
                self.q.group_by.append(self._next()[1][1:])
            if not self.q.group_by:
                raise SparqlError("empty GROUP BY")
        while self._kw("HAVING"):
            self._expect("(")
            kind, var = self._next()
            if kind != "var":
                raise SparqlError("HAVING supports ?col OP number")
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
            self.q.having.append((var[1:], op, float(num)))
        if self._kw("ORDER"):
            self._expect("BY")
            while True:
                kind, tok = self._peek()
                if kind == "var":
                    self.i += 1
                    self.q.order_by.append((tok[1:], True))
                elif kind == "word" and tok.upper() in ("ASC", "DESC"):
                    asc = tok.upper() == "ASC"
                    self.i += 1
                    self._expect("(")
                    kind, v = self._next()
                    if kind != "var":
                        raise SparqlError("ORDER BY ASC/DESC needs a ?var")
                    self._expect(")")
                    self.q.order_by.append((v[1:], asc))
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
            if self._peek()[0] == "dtype":   # "lex"^^type — match lexical form
                self.i += 1
                self._next()                 # consume (and ignore) the type
            return value
        raise SparqlError(f"unsupported term {tok!r}")

    def _curie_of(self, iri: str) -> str:
        namespaces = {**self.ns, **self.q.prefixes}
        for prefix, ns in namespaces.items():
            if iri.startswith(ns):
                return f"{prefix}:{iri[len(ns):]}"
        return iri  # unknown namespace: matched verbatim (usually matches nothing)


def parse(query: str, repo: str | None = None) -> SelectQuery:
    return _Parser(_tokenize(query), repo).parse()


# --------------------------------------------------------------------------
# Compile + execute
# --------------------------------------------------------------------------

def _solutions(triples: DataFrame, q: SelectQuery, repo: str | None) -> DataFrame:
    """The WHERE clause's solution set: BGP joins + OPTIONAL left joins +
    FILTER row predicates, one column per bound variable."""
    if not q.patterns and not q.path_patterns and not q.unions:
        raise SparqlError("WHERE contains no triple patterns")
    df = bgp(triples, q.patterns, repo=repo) if q.patterns else None
    for s, path_pred, o in q.path_patterns:
        # one-or-more property path: the closure relation joins in like any
        # other pattern. Constant endpoints filter the closure; at scale,
        # seed-constrained reachability should pre-filter the edge set
        # instead (see operators.transitive_closure docstring).
        from .operators import transitive_closure

        edges = triples
        if repo is not None:
            edges = edges.where(F.col("repo") == repo)
        edges = edges.where(F.col("pred") == path_pred).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        closure = transitive_closure(edges)
        cols: dict[str, str] = {}
        rel = closure
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
            raise SparqlError(
                "property path needs at least one variable endpoint"
            )
        rel = rel.select(*[F.col(c).alias(v) for v, c in cols.items()]).distinct()
        if df is None:
            df = rel
        else:
            shared = [c for c in rel.columns if c in df.columns]
            df = df.join(rel, shared) if shared else df.crossJoin(rel)
    for branches in q.unions:
        if any(not b for b in branches):
            raise SparqlError("empty UNION branch")
        dfs = [bgp(triples, b, repo=repo) for b in branches]
        u = dfs[0]
        for d in dfs[1:]:
            u = u.unionByName(d, allowMissingColumns=True)
        u = u.distinct()  # set semantics across branches
        if df is None:
            df = u
        else:
            shared = [c for c in u.columns if c in df.columns]
            if not shared:
                raise SparqlError(
                    "UNION group shares no variable with the other patterns"
                )
            for b in branches:
                bound = {t[1:] for pat in b for t in pat if t.startswith("?")}
                missing = [v for v in shared if v not in bound]
                if missing:
                    # an unbound shared var would null the join key and
                    # silently drop the branch's solutions — out of subset
                    raise SparqlError(
                        f"every UNION branch must bind the join "
                        f"variable(s) {missing} when combined with other "
                        "patterns"
                    )
            df = df.join(u, shared)
    for block in q.optionals:
        opt = bgp(triples, block, repo=repo)
        shared = [c for c in opt.columns if c in df.columns]
        if not shared:
            raise SparqlError(
                "OPTIONAL block shares no variable with the required patterns"
            )
        df = df.join(opt, shared, "left")
    for flt in q.filters:
        if flt.var not in df.columns:
            raise SparqlError(f"FILTER on unbound variable ?{flt.var}")
        if flt.op == "in":
            cond = F.col(flt.var).isin(*flt.value)
        elif flt.rhs_var:
            if flt.value not in df.columns:
                raise SparqlError(f"FILTER on unbound variable ?{flt.value}")
            cond = F.col(flt.var) == F.col(flt.value)
        else:
            cond = F.col(flt.var) == flt.value
        df = df.where(cond if flt.op in ("=", "in") else ~cond)
    return df


def construct(triples: DataFrame, query: str, repo: str | None = None) -> DataFrame:
    """Run a SPARQL CONSTRUCT (subset) string: template patterns instantiated
    once per WHERE solution → a (subj, pred, obj) triple DataFrame.

    Each template pattern is a projection of the solution set (constants as
    literals), unioned and set-deduped — still one declarative plan, so a
    CONSTRUCT feeding a serializer or the store never materializes on the
    driver. Solutions that leave a template variable unbound (via OPTIONAL)
    skip that template instance, per SPARQL semantics.
    """
    q = parse(query, repo=repo)
    if q.construct is None:
        raise SparqlError("not a CONSTRUCT query (use execute for SELECT)")
    sol = _solutions(triples, q, repo)
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


def query(triples: DataFrame, text: str, repo: str | None = None):
    """One entry point for any supported SPARQL string — dispatches on the
    parsed query form, like the reference's single SPARQL endpoint
    (controllers/SparqlController.java:33-43): SELECT → bindings DataFrame,
    CONSTRUCT → triples DataFrame, ASK → bool, DESCRIBE → subject triples."""
    form = parse(text, repo=repo).form
    fn = {"select": execute, "construct": construct,
          "ask": ask, "describe": describe}[form]
    return fn(triples, text, repo=repo)


def ask(triples: DataFrame, query: str, repo: str | None = None) -> bool:
    """Run a SPARQL ASK (subset) string: True iff the WHERE clause has at
    least one solution. Short-circuits with limit(1) — the scan stops at
    the first matching partition batch."""
    q = parse(query, repo=repo)
    if q.form != "ask":
        raise SparqlError(f"{q.form.upper()} query: use the matching function")
    return bool(_solutions(triples, q, repo).limit(1).take(1))


def describe(triples: DataFrame, query: str, repo: str | None = None) -> DataFrame:
    """Run a SPARQL DESCRIBE (subset) string: all triples whose subject is
    one of the given constant terms — (subj, pred, obj, obj_type). The
    subject filter pushes down to the scan; with the partitioned store it
    prunes to the repo's buckets."""
    q = parse(query, repo=repo)
    if q.form != "describe":
        raise SparqlError(f"{q.form.upper()} query: use the matching function")
    df = triples
    if repo is not None:
        df = df.where(F.col("repo") == repo)
    return df.where(F.col("subj").isin(q.describe_terms)).select(
        "subj", "pred", "obj", "obj_type"
    )


def execute(triples: DataFrame, query: str, repo: str | None = None) -> DataFrame:
    """Run a SPARQL SELECT (subset) string over the triples DataFrame.

    `repo` prunes to one named graph (the reference's per-repo model) and
    binds the gitprov: namespace for full-IRI constants.
    """
    q = parse(query, repo=repo)
    if q.form != "select":
        raise SparqlError(f"{q.form.upper()} query: use the matching function")
    df = _solutions(triples, q, repo)
    if q.having and not q.aggregates:
        raise SparqlError("HAVING requires an aggregate projection")
    if q.aggregates:
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
        cols = []
        for a in q.aggregates:
            if a.var is not None and a.var not in df.columns:
                raise SparqlError(f"aggregate over unbound variable ?{a.var}")
            if a.func == "count" and a.var is None:
                c = F.count(F.lit(1))
            elif a.func == "count" and a.distinct:
                c = F.countDistinct(a.var)
            elif a.func == "count":
                c = F.count(a.var)
            elif a.func in ("sum", "avg"):
                # SPARQL SUM/AVG over numeric literals: cast the lexical form
                agg_fn = F.sum if a.func == "sum" else F.avg
                c = agg_fn(F.col(a.var).cast("double"))
            elif a.func == "min":
                c = F.min(a.var)
            else:
                c = F.max(a.var)
            if a.distinct and a.func != "count":
                raise SparqlError("DISTINCT is supported on COUNT only")
            cols.append(c.alias(a.alias))
        grouped = df.groupBy(*q.group_by) if q.group_by else df.groupBy()
        df = grouped.agg(*cols).select(*q.select_order)
        if q.distinct:
            # SELECT DISTINCT over aggregated rows: group keys are unique
            # per row, but a projection that drops them (or equal counts
            # across groups) can duplicate — SPARQL dedups the projection
            df = df.distinct()
        for col, op, num in q.having:
            if col not in df.columns:
                raise SparqlError(f"HAVING references unknown column ?{col}")
            c = F.col(col).cast("double")
            cond = {"=": c == num, "!=": c != num, "<": c < num,
                    "<=": c <= num, ">": c > num, ">=": c >= num}[op]
            df = df.where(cond)
    elif q.variables is not None:
        missing = [v for v in q.variables if v not in df.columns]
        if missing:
            raise SparqlError(f"SELECT of unbound variables: {missing}")
        df = df.select(*q.variables).distinct()  # set semantics (see module doc)
    if q.order_by:
        df = df.orderBy(*[
            F.asc(v) if asc else F.desc(v) for v, asc in q.order_by
        ])
    if q.offset is not None:
        df = df.offset(q.offset)
    if q.limit is not None:
        df = df.limit(q.limit)
    return df
