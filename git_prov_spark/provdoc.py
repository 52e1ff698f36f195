"""Per-repo PROV document exporters: PROV-N, PROV-JSON, PROV-XML, DOT.

Completes the reference's document formats (ProvenanceService.java:216-250):
with store.py's Turtle / RDF/XML / TriG / N-Triples / JSON-lines, every DATA
format of the 11 is covered; SVG / PDF / HTML (r4), PNG (r5.s2 — stdlib
zlib encoder) and JPEG (r5.s2 — baseline T.81 codec in raster.py, numpy +
stdlib) close the presentation renders: ALL ELEVEN formats now ship.

Two surfaces share one assembler per format:
* `*_text(triples, repo)` — one-repo driver-side export, mirroring the
  reference's per-model HTTP responses (like store.turtle_text);
* `prov_documents(triples, fmt)` — the corpus path: one document PER repo
  for the whole store, assembled on executors via groupBy(repo)
  .applyInPandas (see its docstring for the scale bounds).
The bulk path for whole-corpus triple interchange remains the distributed
line-oriented sinks (write_ntriples / write_trig / write_rdfxml).

Fidelity notes (simplified but valid documents):
* element attributes come from the element subject's literal triples
  (rdfs:label → prov:label, foaf:*, gitprov:* carried with their types);
* activity start time from prov:startedAtTime;
* generation/invalidation/usage times are pulled from the qualified nodes
  (prov:qualifiedGeneration/... → prov:atTime) and inlined into the
  first-class statements;
* derivations carry activity + the reference's (deliberately mismatched,
  quirk SURVEY §5.3.5) generation/usage ids and the diff-stat attributes.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Tuple
from xml.sax.saxutils import escape, quoteattr

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iri import NAMESPACES, gitprov_ns

_ELEMENT_TYPES = {"prov:Entity": "entity", "prov:Activity": "activity",
                  "prov:Agent": "agent"}

_ATTR_PRED_MAP = {"rdfs:label": "prov:label"}  # PROV-N's conventional name


class _Graph:
    """Compact index of one repo's triples (driver- or executor-side);
    fed incrementally via add_rows so the bulk path can stream Arrow
    batches into it without ever holding the group's DataFrame whole."""

    def __init__(self, rows=()):
        self.types: dict[str, str] = {}
        self.attrs: dict[str, list[tuple[str, str, str]]] = {}
        self.edges: dict[str, list[tuple[str, str]]] = {}
        self.obj_of: dict[tuple[str, str], str] = {}
        self.add_rows(rows)

    def add_rows(self, rows) -> None:
        for r in rows:
            if r.pred == "rdf:type":
                self.types.setdefault(r.subj, r.obj)
            elif r.obj_type == "iri":
                self.edges.setdefault(r.pred, []).append((r.subj, r.obj))
            else:
                self.attrs.setdefault(r.subj, []).append(
                    (r.pred, r.obj, r.obj_type)
                )
            self.obj_of[(r.subj, r.pred)] = r.obj

    def attr(self, subj: str, pred: str) -> str | None:
        return self.obj_of.get((subj, pred))

    def elements(self, kind: str) -> list[str]:
        return sorted(s for s, t in self.types.items()
                      if _ELEMENT_TYPES.get(t) == kind)

    def qualified_time(self, qual_pred: str) -> dict[str, str]:
        """subject → atTime, via its qualified node."""
        out = {}
        for s, q in self.edges.get(qual_pred, []):
            t = self.attr(q, "prov:atTime")
            if t is not None:
                out[s] = t
        return out


def _collect_graph(
    triples: DataFrame, repo: str,
    max_triples: int | None = None,
) -> _Graph:
    """Driver-side graph collect behind EVERY per-repo document export
    (PROVN/JSON/XML/DOT/SVG/PDF/HTML). Guarded: past `max_triples`
    (default store.DRIVER_EXPORT_MAX_TRIPLES) it raises
    store.ExportTooLarge instead of OOMing the driver — huge single-repo
    graphs must take the distributed sharded path
    (prov_document_parts / store.write_ntriples / store.write_rdfxml)."""
    from .store import DRIVER_EXPORT_MAX_TRIPLES, guard_driver_export

    scoped = triples.where(F.col("repo") == repo)
    guard_driver_export(
        scoped, repo, "per-repo document export",
        DRIVER_EXPORT_MAX_TRIPLES if max_triples is None else max_triples,
    )
    return _Graph(
        scoped.select("subj", "pred", "obj", "obj_type").collect()
    )


def _attr_pairs(g: _Graph, subj: str, skip: set[str] = frozenset()):
    out = []
    for pred, obj, obj_type in sorted(g.attrs.get(subj, [])):
        if pred in skip:
            continue
        out.append((_ATTR_PRED_MAP.get(pred, pred), obj, obj_type))
    return out


# --------------------------------------------------------------------------
# PROV-N
# --------------------------------------------------------------------------

def _provn_literal(value: str, obj_type: str) -> str:
    quoted = '"' + value.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if obj_type in ("xsd:string",):
        return quoted
    return f"{quoted} %% {obj_type}"


def _provn_attr_block(pairs) -> str:
    if not pairs:
        return ""
    inner = ", ".join(
        f"{p}={_provn_literal(v, t)}" for p, v, t in pairs
    )
    return f", [{inner}]"


def provn_text(triples: DataFrame, repo: str) -> str:
    return _provn_doc(_collect_graph(triples, repo), repo)


def _provn_lines(g: _Graph, repo: str):
    yield "document"
    for p, ns in NAMESPACES.items():
        yield f"prefix {p} <{ns}>"
    yield f"prefix gitprov <{gitprov_ns(repo)}>"
    yield ""
    for e in g.elements("entity"):
        yield f"entity({e}{_provn_attr_block(_attr_pairs(g, e))})"
    for a in g.elements("activity"):
        start = g.attr(a, "prov:startedAtTime") or "-"
        pairs = _attr_pairs(g, a, skip={"prov:startedAtTime"})
        yield f"activity({a}, {start}, -{_provn_attr_block(pairs)})"
    for ag in g.elements("agent"):
        yield f"agent({ag}{_provn_attr_block(_attr_pairs(g, ag))})"
    gen_t = g.qualified_time("prov:qualifiedGeneration")
    for e, c in sorted(g.edges.get("prov:wasGeneratedBy", [])):
        yield f"wasGeneratedBy({e}, {c}, {gen_t.get(e, '-')})"
    inv_t = g.qualified_time("prov:qualifiedInvalidation")
    for e, c in sorted(g.edges.get("prov:wasInvalidatedBy", [])):
        yield f"wasInvalidatedBy({e}, {c}, {inv_t.get(e, '-')})"
    use_t = g.qualified_time("prov:qualifiedUsage")
    for c, e in sorted(g.edges.get("prov:used", [])):
        yield f"used({c}, {e}, {use_t.get(c, '-')})"
    for c, a in sorted(g.edges.get("prov:wasAssociatedWith", [])):
        q = g.attr(c, "prov:qualifiedAssociation")
        role = g.attr(q, "prov:hadRole") if q else None
        block = f', [prov:role="{role}"]' if role else ""
        yield f"wasAssociatedWith({c}, {a}, -{block})"
    for c2, c1 in sorted(g.edges.get("prov:wasInformedBy", [])):
        yield f"wasInformedBy({c2}, {c1})"
    for e, b in sorted(g.edges.get("prov:specializationOf", [])):
        yield f"specializationOf({e}, {b})"
    for e2, e1 in sorted(g.edges.get("prov:wasDerivedFrom", [])):
        d = g.attr(e2, "prov:qualifiedDerivation")
        act = g.attr(d, "prov:hadActivity") if d else None
        gen = g.attr(d, "prov:hadGeneration") if d else None
        use = g.attr(d, "prov:hadUsage") if d else None
        pairs = _attr_pairs(g, d, skip=set()) if d else []
        if act:
            yield (
                f"wasDerivedFrom({e2}, {e1}, {act}, {gen or '-'}, "
                f"{use or '-'}{_provn_attr_block(pairs)})"
            )
        else:
            yield f"wasDerivedFrom({e2}, {e1})"
    yield "endDocument"


def _provn_doc(g: _Graph, repo: str) -> str:
    return "\n".join(_provn_lines(g, repo))


# --------------------------------------------------------------------------
# PROV-JSON (W3C PROV-JSON member submission layout)
# --------------------------------------------------------------------------

def _json_attr_value(value: str, obj_type: str):
    if obj_type == "xsd:string":
        return value
    return {"$": value, "type": obj_type}


def provjson_text(triples: DataFrame, repo: str) -> str:
    return _provjson_doc(_collect_graph(triples, repo), repo)


def _provjson_doc(g: _Graph, repo: str) -> str:
    doc: dict = {"prefix": {**NAMESPACES, "gitprov": gitprov_ns(repo)}}

    def element_block(kind: str) -> dict:
        out = {}
        for el in g.elements(kind):
            attrs: dict = {}
            for p, v, t in _attr_pairs(g, el):
                attrs.setdefault(p, []).append(_json_attr_value(v, t))
            out[el] = attrs
        return out

    for kind in ("entity", "activity", "agent"):
        block = element_block(kind)
        if block:
            doc[kind] = block

    def edge_block(pred: str, key: str, s_name: str, o_name: str,
                   time_pred: str | None = None) -> None:
        edges = sorted(g.edges.get(pred, []))
        if not edges:
            return
        times = g.qualified_time(time_pred) if time_pred else {}
        block = {}
        for i, (s, o) in enumerate(edges):
            rec = {s_name: s, o_name: o}
            if s in times:
                rec["prov:time"] = times[s]
            block[f"_:{key}{i}"] = rec
        doc[key] = block

    edge_block("prov:wasGeneratedBy", "wasGeneratedBy",
               "prov:entity", "prov:activity", "prov:qualifiedGeneration")
    edge_block("prov:wasInvalidatedBy", "wasInvalidatedBy",
               "prov:entity", "prov:activity", "prov:qualifiedInvalidation")
    edge_block("prov:used", "used",
               "prov:activity", "prov:entity", "prov:qualifiedUsage")
    edge_block("prov:wasAssociatedWith", "wasAssociatedWith",
               "prov:activity", "prov:agent")
    edge_block("prov:wasInformedBy", "wasInformedBy",
               "prov:informed", "prov:informant")
    edge_block("prov:specializationOf", "specializationOf",
               "prov:specificEntity", "prov:generalEntity")
    edge_block("prov:wasDerivedFrom", "wasDerivedFrom",
               "prov:generatedEntity", "prov:usedEntity")
    return json.dumps(doc, indent=1, sort_keys=True)


# --------------------------------------------------------------------------
# PROV-XML (simplified: elements + references, one prov:document)
# --------------------------------------------------------------------------

def provxml_text(triples: DataFrame, repo: str) -> str:
    return _provxml_doc(_collect_graph(triples, repo), repo)


def _provxml_lines(g: _Graph, repo: str):
    xmlns = "".join(f' xmlns:{p}="{ns}"' for p, ns in NAMESPACES.items())
    xmlns += f' xmlns:gitprov="{escape(gitprov_ns(repo))}"'
    yield f'<?xml version="1.0" encoding="UTF-8"?>\n<prov:document{xmlns}>'

    def attr_elems(subj: str, skip: set[str] = frozenset()):
        for p, v, t in _attr_pairs(g, subj, skip):
            if p == "prov:label":
                yield f"  <prov:label>{escape(v)}</prov:label>"
            else:
                yield (
                    f'  <prov:other prov:name={quoteattr(p)} '
                    f'prov:type={quoteattr(t)}>{escape(v)}</prov:other>'
                )

    for kind, tag in (("entity", "prov:entity"), ("activity", "prov:activity"),
                      ("agent", "prov:agent")):
        for el in g.elements(kind):
            yield f' <{tag} prov:id={quoteattr(el)}>'
            if kind == "activity":
                start = g.attr(el, "prov:startedAtTime")
                if start:
                    yield f"  <prov:startTime>{escape(start)}</prov:startTime>"
                yield from attr_elems(el, skip={"prov:startedAtTime"})
            else:
                yield from attr_elems(el)
            yield f" </{tag}>"

    def edge_elems(pred: str, tag: str, s_tag: str, o_tag: str,
                   time_pred: str | None = None):
        times = g.qualified_time(time_pred) if time_pred else {}
        for s, o in sorted(g.edges.get(pred, [])):
            yield f" <{tag}>"
            yield f'  <{s_tag} prov:ref={quoteattr(s)}/>'
            yield f'  <{o_tag} prov:ref={quoteattr(o)}/>'
            if s in times:
                yield f"  <prov:time>{escape(times[s])}</prov:time>"
            yield f" </{tag}>"

    yield from edge_elems("prov:wasGeneratedBy", "prov:wasGeneratedBy",
                          "prov:entity", "prov:activity",
                          "prov:qualifiedGeneration")
    yield from edge_elems("prov:wasInvalidatedBy", "prov:wasInvalidatedBy",
                          "prov:entity", "prov:activity",
                          "prov:qualifiedInvalidation")
    yield from edge_elems("prov:used", "prov:used",
                          "prov:activity", "prov:entity",
                          "prov:qualifiedUsage")
    yield from edge_elems("prov:wasAssociatedWith", "prov:wasAssociatedWith",
                          "prov:activity", "prov:agent")
    yield from edge_elems("prov:wasInformedBy", "prov:wasInformedBy",
                          "prov:informed", "prov:informant")
    yield from edge_elems("prov:specializationOf", "prov:specializationOf",
                          "prov:specificEntity", "prov:generalEntity")
    yield from edge_elems("prov:wasDerivedFrom", "prov:wasDerivedFrom",
                          "prov:generatedEntity", "prov:usedEntity")
    yield "</prov:document>"


def _provxml_doc(g: _Graph, repo: str) -> str:
    return "\n".join(_provxml_lines(g, repo))


# --------------------------------------------------------------------------
# DOT (graph description — the reference maps application/msword to DOT)
# --------------------------------------------------------------------------

def dot_text(triples: DataFrame, repo: str, max_edges: int = 50_000) -> str:
    """Directed graph of the repo's IRI-valued edges, predicate-labeled.
    Shares _dot_doc with the distributed bulk exporter (one assembler per
    format, like the PROV-N/JSON/XML pairs above)."""
    return _dot_doc(_collect_graph(triples, repo), repo, max_edges=max_edges)


def _dot_lines(g: _Graph, repo: str, max_edges: int = 50_000):
    edges = sorted(
        (s, p, o) for p, so in g.edges.items() for s, o in so
    )
    if len(edges) > max_edges:
        raise ValueError(f"graph exceeds max_edges={max_edges}; export a subset")

    def q(s: str) -> str:
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'

    yield f"digraph {q(repo)} {{"
    for s, p, o in edges:
        yield f"  {q(s)} -> {q(o)} [label={q(p)}];"
    yield "}"


def _dot_doc(g: _Graph, repo: str, max_edges: int = 50_000) -> str:
    return "\n".join(_dot_lines(g, repo, max_edges=max_edges))


# --------------------------------------------------------------------------
# Graph visualization: SVG and PDF documents
#
# The reference serves image/svg+xml and application/pdf renderings of the
# per-repo PROV graph (ProvController.java:69, rendered by ProvToolbox's
# InteropFramework, which shells out to graphviz). Capability parity here
# is a dependency-free deterministic renderer over the same _Graph
# assembly: longest-path layering (PROV edges point newer→older, so the
# oldest elements form the top row), lexicographic within-row order, and
# the PROV diagram convention the reference's own output uses — yellow
# ellipse per prov:Entity, blue rectangle per prov:Activity, orange
# pentagon per prov:Agent (ProvToolbox fills; identity is double-encoded
# by SHAPE, every node carries a dark outline and a direct black label,
# full IRI in the SVG <title> tooltip). PNG/JPEG stay out of scope:
# raster encoders need codecs this container doesn't ship.
# --------------------------------------------------------------------------

_VIZ_FILL = {"entity": (1.0, 0.988, 0.529),     # #FFFC87
             "activity": (0.624, 0.694, 0.988),  # #9FB1FC
             "agent": (0.996, 0.827, 0.498),     # #FED37F
             "other": (1.0, 1.0, 1.0)}
_VIZ_W, _VIZ_H, _VIZ_GX, _VIZ_GY, _VIZ_M = 150, 42, 30, 70, 24


def _hex(rgb: tuple[float, float, float]) -> str:
    return "#" + "".join(f"{round(c * 255):02X}" for c in rgb)


def _viz_label(node: str, limit: int = 22) -> str:
    return node if len(node) <= limit else node[: limit - 1] + "…"


def _viz_layout(g: _Graph, max_nodes: int = 2_000, max_edges: int = 8_000):
    """Deterministic layered layout: rank = longest path to a sink (Kahn
    over reversed edges, O(V+E)); any cycle leftovers (not expected in a
    PROV DAG) drop into one extra bottom row. Returns (positions, kinds,
    edges, width, height)."""
    from collections import deque

    edges = sorted(
        (s, p, o) for p, so in g.edges.items() for s, o in so
    )
    if len(edges) > max_edges:
        raise ValueError(
            f"graph exceeds max_edges={max_edges}; export a subset"
        )
    nodes = sorted({n for s, _, o in edges for n in (s, o)} | set(g.types))
    if len(nodes) > max_nodes:
        raise ValueError(
            f"graph exceeds max_nodes={max_nodes}; export a subset"
        )
    out_adj: dict[str, list[str]] = {}
    in_adj: dict[str, list[str]] = {}
    for s, _, o in edges:
        if s != o:
            out_adj.setdefault(s, []).append(o)
            in_adj.setdefault(o, []).append(s)
    pending = {n: len(out_adj.get(n, ())) for n in nodes}
    ready = deque(n for n in nodes if pending[n] == 0)
    # self-loops (s == o) are excluded from the layout adjacency above, so
    # drawing them would stack a zero-length arrow + label on the node
    # center — drop them from the drawn edge list too (the HTML relations
    # table counts from g.edges directly, so loop relations still count)
    drawn = [(s, p, o) for s, p, o in edges if s != o]
    rank: dict[str, int] = {}
    while ready:
        n = ready.popleft()
        rank[n] = max(
            (rank[o] + 1 for o in out_adj.get(n, ()) if o in rank), default=0
        )
        for p in in_adj.get(n, ()):
            pending[p] -= 1
            if pending[p] == 0:
                ready.append(p)
    if len(rank) < len(nodes):  # cycle leftovers
        extra = 1 + max(rank.values(), default=-1)
        for n in nodes:
            rank.setdefault(n, extra)
    rows: dict[int, list[str]] = {}
    for n in nodes:
        rows.setdefault(rank[n], []).append(n)
    pos: dict[str, tuple[int, int]] = {}
    for r in sorted(rows):
        for i, n in enumerate(sorted(rows[r])):
            pos[n] = (_VIZ_M + i * (_VIZ_W + _VIZ_GX),
                      _VIZ_M + r * (_VIZ_H + _VIZ_GY))
    width = _VIZ_M * 2 + max(
        (len(v) for v in rows.values()), default=1
    ) * (_VIZ_W + _VIZ_GX) - _VIZ_GX
    height = _VIZ_M * 2 + (max(rows, default=0) + 1) * (_VIZ_H + _VIZ_GY) \
        - _VIZ_GY
    kinds = {
        n: _ELEMENT_TYPES.get(g.types.get(n, ""), "other") for n in nodes
    }
    return pos, kinds, drawn, width, height


def svg_text(triples: DataFrame, repo: str,
             max_nodes: int = 2_000, max_edges: int = 8_000) -> str:
    """image/svg+xml rendering of one repo's PROV graph
    (ProvController.java:69)."""
    return _svg_doc(_collect_graph(triples, repo), repo,
                    max_nodes=max_nodes, max_edges=max_edges)


def _svg_lines(g: _Graph, repo: str,
               max_nodes: int = 2_000, max_edges: int = 8_000):
    from xml.sax.saxutils import escape, quoteattr

    pos, kinds, edges, width, height = _viz_layout(
        g, max_nodes=max_nodes, max_edges=max_edges
    )
    yield '<?xml version="1.0" encoding="UTF-8"?>'
    yield (f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
           f'height="{height}" viewBox="0 0 {width} {height}">')
    yield f"  <title>PROV graph of {escape(repo)}</title>"
    yield ("  <defs><marker id=\"arrow\" viewBox=\"0 0 8 8\" refX=\"7\" "
           "refY=\"4\" markerWidth=\"7\" markerHeight=\"7\" "
           "orient=\"auto-start-reverse\"><path d=\"M0,0 L8,4 L0,8 z\" "
           "fill=\"#444444\"/></marker></defs>")
    # edges under nodes: center-to-center, arrowhead at the object end,
    # predicate label at the midpoint in muted ink
    for s, p, o in edges:
        (x1, y1), (x2, y2) = pos[s], pos[o]
        cx1, cy1 = x1 + _VIZ_W // 2, y1 + _VIZ_H // 2
        cx2, cy2 = x2 + _VIZ_W // 2, y2 + _VIZ_H // 2
        yield (f'  <line x1="{cx1}" y1="{cy1}" x2="{cx2}" y2="{cy2}" '
               'stroke="#444444" stroke-width="1" marker-end="url(#arrow)"/>')
        mx, my = (cx1 + cx2) // 2, (cy1 + cy2) // 2
        yield (f'  <text x="{mx}" y="{my - 3}" font-size="8" '
               f'fill="#555555" text-anchor="middle" '
               f'font-family="Helvetica,sans-serif">{escape(p)}</text>')
    for n in sorted(pos):
        x, y = pos[n]
        kind, fill = kinds[n], _hex(_VIZ_FILL[kinds[n]])
        style = f'fill="{fill}" stroke="#333333" stroke-width="1"'
        if kind == "activity":
            shape = (f'<rect x="{x}" y="{y}" width="{_VIZ_W}" '
                     f'height="{_VIZ_H}" rx="4" {style}/>')
        elif kind == "agent":  # pentagon (PROV-O diagram convention)
            pts = (f"{x + _VIZ_W // 2},{y} {x + _VIZ_W},{y + _VIZ_H // 2} "
                   f"{x + _VIZ_W - 25},{y + _VIZ_H} {x + 25},{y + _VIZ_H} "
                   f"{x},{y + _VIZ_H // 2}")
            shape = f'<polygon points="{pts}" {style}/>'
        elif kind == "entity":
            shape = (f'<ellipse cx="{x + _VIZ_W // 2}" cy="{y + _VIZ_H // 2}" '
                     f'rx="{_VIZ_W // 2}" ry="{_VIZ_H // 2}" {style}/>')
        else:
            shape = (f'<rect x="{x}" y="{y}" width="{_VIZ_W}" '
                     f'height="{_VIZ_H}" {style}/>')
        yield f"  <g>{shape}<title>{escape(n)}</title>"
        yield (f'    <text x="{x + _VIZ_W // 2}" y="{y + _VIZ_H // 2 + 3}" '
               f'font-size="9" fill="#111111" text-anchor="middle" '
               f'font-family="Helvetica,sans-serif">'
               f"{escape(_viz_label(n))}</text>")
        yield "  </g>"
    yield "</svg>"


def _svg_doc(g: _Graph, repo: str,
             max_nodes: int = 2_000, max_edges: int = 8_000) -> str:
    return "\n".join(_svg_lines(g, repo,
                                max_nodes=max_nodes, max_edges=max_edges))


def html_text(triples: DataFrame, repo: str,
              max_nodes: int = 2_000, max_edges: int = 8_000) -> str:
    """Self-contained text/html visualization of one repo's PROV graph.

    Capability parity with the reference's /viz endpoint
    (ProvOVizController.java:33-46), which turtle-serializes the repo's
    model and POSTs it to the external provoviz.org service, returning
    that service's HTML. Calling out to a third-party renderer is neither
    possible nor desirable here, so the same user-facing artifact — an
    HTML page visualizing the repo's provenance — is produced locally and
    deterministically: summary tiles (element/edge counts), a legend in
    the PROV diagram convention the SVG renderer pins, the embedded SVG
    itself, and a per-predicate edge-count table. Zero external fetches
    (no scripts, no fonts, no CSS URLs), so the document is archival."""
    return _html_doc(_collect_graph(triples, repo), repo,
                     max_nodes=max_nodes, max_edges=max_edges)


def _html_lines(g: _Graph, repo: str,
                max_nodes: int = 2_000, max_edges: int = 8_000):
    from xml.sax.saxutils import escape

    n_by_kind = {k: len(g.elements(k)) for k in ("entity", "activity", "agent")}
    pred_counts = sorted((p, len(so)) for p, so in g.edges.items())
    n_edges = sum(c for _, c in pred_counts)
    yield "<!DOCTYPE html>"
    yield '<html lang="en"><head><meta charset="utf-8"/>'
    yield f"<title>Provenance of {escape(repo)}</title>"
    yield ("<style>body{font-family:Helvetica,Arial,sans-serif;margin:24px;"
           "color:#111}table{border-collapse:collapse}td,th{border:1px solid"
           " #ccc;padding:3px 10px;font-size:13px;text-align:left}"
           ".tiles{display:flex;gap:16px;margin:12px 0}.tile{border:1px "
           "solid #ccc;border-radius:6px;padding:8px 16px;text-align:center}"
           ".tile b{display:block;font-size:22px}.legend span{display:"
           "inline-block;width:14px;height:14px;margin:0 6px -2px 14px;"
           "border:1px solid #333}.svgwrap{overflow:auto;border:1px solid "
           "#ccc;margin:12px 0;max-height:720px}</style></head><body>"
    )
    yield f"<h1>PROV graph of {escape(repo)}</h1>"
    yield '<div class="tiles">'
    for label, n in (("entities", n_by_kind["entity"]),
                     ("activities", n_by_kind["activity"]),
                     ("agents", n_by_kind["agent"]),
                     ("relations", n_edges)):
        yield f'  <div class="tile"><b>{n}</b>{label}</div>'
    yield "</div>"
    yield ('<p class="legend">'
           f'<span style="background:{_hex(_VIZ_FILL["entity"])};'
           'border-radius:50%"></span>prov:Entity'
           f'<span style="background:{_hex(_VIZ_FILL["activity"])}">'
           "</span>prov:Activity"
           f'<span style="background:{_hex(_VIZ_FILL["agent"])}"></span>'
           "prov:Agent</p>")
    yield '<div class="svgwrap">'
    svg = _svg_lines(g, repo, max_nodes=max_nodes, max_edges=max_edges)
    next(svg)  # drop the <?xml?> declaration: the SVG embeds inline
    yield from svg
    yield "</div>"
    yield "<h2>Relations</h2>"
    yield "<table><tr><th>predicate</th><th>count</th></tr>"
    for p, c in pred_counts:
        yield f"<tr><td>{escape(p)}</td><td>{c}</td></tr>"
    yield "</table></body></html>"


def _html_doc(g: _Graph, repo: str,
              max_nodes: int = 2_000, max_edges: int = 8_000) -> str:
    return "\n".join(_html_lines(g, repo,
                                 max_nodes=max_nodes, max_edges=max_edges))


def _pdf_escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in "()\\":
            out.append("\\" + ch)
        elif " " <= ch <= "~":
            out.append(ch)
        else:
            b = ch.encode("latin-1", "replace")[0]  # '?' for non-latin-1
            out.append(f"\\{b:03o}")
    return "".join(out)


def pdf_text(triples: DataFrame, repo: str,
             max_nodes: int = 2_000, max_edges: int = 8_000) -> str:
    """application/pdf rendering of the same layout
    (ProvController.java:69): a minimal self-contained PDF 1.4 — one page
    sized to the graph, an uncompressed vector content stream, Helvetica.
    Returned as a latin-1-safe str; `.encode("latin-1")` yields the file
    bytes (pinned by tests/test_provviz.py round-trip through the xref)."""
    return _pdf_doc(_collect_graph(triples, repo), repo,
                    max_nodes=max_nodes, max_edges=max_edges)


def _pdf_doc(g: _Graph, repo: str,
             max_nodes: int = 2_000, max_edges: int = 8_000) -> str:
    pos, kinds, edges, width, height = _viz_layout(
        g, max_nodes=max_nodes, max_edges=max_edges
    )

    def y_(y: float) -> float:  # SVG y-down → PDF y-up
        return height - y

    c: list[str] = ["0.267 0.267 0.267 RG 1 w"]
    for s, p, o in edges:
        (x1, y1), (x2, y2) = pos[s], pos[o]
        cx1, cy1 = x1 + _VIZ_W / 2, y_(y1 + _VIZ_H / 2)
        cx2, cy2 = x2 + _VIZ_W / 2, y_(y2 + _VIZ_H / 2)
        c.append(f"{cx1:.1f} {cy1:.1f} m {cx2:.1f} {cy2:.1f} l S")
        # arrowhead: filled triangle at the object end
        dx, dy = cx2 - cx1, cy2 - cy1
        ln = (dx * dx + dy * dy) ** 0.5 or 1.0
        ux, uy = dx / ln, dy / ln
        bx, by = cx2 - 8 * ux, cy2 - 8 * uy
        px, py = -uy * 3.5, ux * 3.5
        c.append("0.267 0.267 0.267 rg "
                 f"{cx2:.1f} {cy2:.1f} m {bx + px:.1f} {by + py:.1f} l "
                 f"{bx - px:.1f} {by - py:.1f} l f")
        mx, my = (cx1 + cx2) / 2, (cy1 + cy2) / 2
        c.append("BT /F1 7 Tf 0.333 0.333 0.333 rg "
                 f"{mx - len(p) * 1.75:.1f} {my + 2:.1f} Td "
                 f"({_pdf_escape(p)}) Tj ET")
    k_bez = 0.5523  # 4-arc Bézier circle constant
    for n in sorted(pos):
        x, y = pos[n]
        r, g_, b = _VIZ_FILL[kinds[n]]
        c.append(f"{r:.3f} {g_:.3f} {b:.3f} rg 0.2 0.2 0.2 RG")
        if kinds[n] == "entity":
            cx, cy = x + _VIZ_W / 2, y_(y + _VIZ_H / 2)
            rx, ry = _VIZ_W / 2, _VIZ_H / 2
            kx, ky = rx * k_bez, ry * k_bez
            c.append(
                f"{cx + rx:.1f} {cy:.1f} m "
                f"{cx + rx:.1f} {cy + ky:.1f} {cx + kx:.1f} {cy + ry:.1f} "
                f"{cx:.1f} {cy + ry:.1f} c "
                f"{cx - kx:.1f} {cy + ry:.1f} {cx - rx:.1f} {cy + ky:.1f} "
                f"{cx - rx:.1f} {cy:.1f} c "
                f"{cx - rx:.1f} {cy - ky:.1f} {cx - kx:.1f} {cy - ry:.1f} "
                f"{cx:.1f} {cy - ry:.1f} c "
                f"{cx + kx:.1f} {cy - ry:.1f} {cx + rx:.1f} {cy - ky:.1f} "
                f"{cx + rx:.1f} {cy:.1f} c B"
            )
        elif kinds[n] == "agent":
            c.append(
                f"{x + _VIZ_W / 2:.1f} {y_(y):.1f} m "
                f"{x + _VIZ_W:.1f} {y_(y + _VIZ_H / 2):.1f} l "
                f"{x + _VIZ_W - 25:.1f} {y_(y + _VIZ_H):.1f} l "
                f"{x + 25:.1f} {y_(y + _VIZ_H):.1f} l "
                f"{x:.1f} {y_(y + _VIZ_H / 2):.1f} l h B"
            )
        else:
            c.append(f"{x:.1f} {y_(y + _VIZ_H):.1f} {_VIZ_W} {_VIZ_H} re B")
        label = _viz_label(n)
        c.append("BT /F1 8 Tf 0.067 0.067 0.067 rg "
                 f"{x + _VIZ_W / 2 - len(label) * 2.0:.1f} "
                 f"{y_(y + _VIZ_H / 2) - 3:.1f} Td "
                 f"({_pdf_escape(label)}) Tj ET")
    stream = "\n".join(c)

    objs = [
        "<< /Type /Catalog /Pages 2 0 R >>",
        "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {width} {height}] "
         "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        f"<< /Length {len(stream.encode('latin-1', 'replace'))} >>\n"
        f"stream\n{stream}\nendstream",
        ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
         "/Encoding /WinAnsiEncoding >>"),
    ]
    parts = ["%PDF-1.4\n"]
    offsets = []
    pos_b = len(parts[0])
    for i, body in enumerate(objs, start=1):
        offsets.append(pos_b)
        piece = f"{i} 0 obj\n{body}\nendobj\n"
        parts.append(piece)
        pos_b += len(piece.encode("latin-1", "replace"))
    xref_at = pos_b
    xref = ["xref", f"0 {len(objs) + 1}", "0000000000 65535 f "]
    xref += [f"{off:010d} 00000 n " for off in offsets]
    trailer = (
        "trailer\n<< /Size "
        f"{len(objs) + 1} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    )
    return "".join(parts) + "\n".join(xref) + "\n" + trailer


# --------------------------------------------------------------------------
# Distributed bulk export: one document per repo, assembled on executors
# --------------------------------------------------------------------------

_DOC_ASSEMBLERS = {
    "provn": _provn_doc,
    "provjson": _provjson_doc,
    "provxml": _provxml_doc,
    "dot": _dot_doc,
    "svg": _svg_doc,
    "pdf": _pdf_doc,
    "html": _html_doc,
}

# line-generator assemblers: formats whose documents can be EMITTED in
# bounded chunks (PROV-JSON is one json.dumps tree — its parts path chunks
# the dumped string, bounding the Arrow cell but not the dump itself)
_LINE_ASSEMBLERS = {
    "provn": _provn_lines,
    "provxml": _provxml_lines,
    "dot": _dot_lines,
    "svg": _svg_lines,
    "html": _html_lines,
}

DOC_PART_LINES = 20_000


def _graph_from_batches(batches) -> _Graph:
    """Fold streamed Arrow batches into the compact index — the group's
    pandas frames are released batch-by-batch, never held together."""
    g = _Graph()
    for pdf in batches:
        g.add_rows(pdf[["subj", "pred", "obj", "obj_type"]]
                   .itertuples(index=False))
    return g


def prov_documents(triples: DataFrame, fmt: str = "provn") -> DataFrame:
    """(repo, doc) — one PROV document per repo, assembled distributed.

    The driver-side `*_text` exporters above mirror the reference's one-model
    HTTP responses; this is the corpus path: `groupBy(repo).applyInPandas`
    with the ITERATOR variant gives each executor ONE repo's triples as a
    stream of Arrow batches (one shuffle on the natural key): peak task
    memory is the compact graph index + the document string, not
    index + whole-group DataFrame + document. Remaining scale bounds are
    inherent to the one-cell contract (the reference holds the same
    per-repo model in Jena memory, ProvenanceService.java:216-250): the
    index must fit executor memory and the document one Arrow string cell
    (<2 GiB). For hot repos beyond that, use `prov_document_parts` —
    bounded cells, streamed emission.
    """
    try:
        assemble = _DOC_ASSEMBLERS[fmt]
    except KeyError:
        raise ValueError(
            f"fmt {fmt!r} not in {sorted(_DOC_ASSEMBLERS)}"
        ) from None
    def build(key: Tuple[Any, ...],
              batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        repo = key[0]
        g = _graph_from_batches(batches)
        yield pd.DataFrame({"repo": [repo], "doc": [assemble(g, repo)]})

    return (
        triples.select("repo", "subj", "pred", "obj", "obj_type")
        .groupBy("repo")
        .applyInPandas(build, "repo string, doc string")
    )


def prov_document_parts(
    triples: DataFrame, fmt: str = "provn",
    part_lines: int = DOC_PART_LINES,
    **fmt_kwargs,
) -> DataFrame:
    """(repo, part_idx, part) — the hot-repo-safe bulk exporter: each
    repo's document is emitted as ordered bounded chunks, so no single
    Arrow cell (and, for the line formats, no task-side string) ever holds
    a whole mega-repo document. Reassembly is exact byte parity:
    '\\n'.join(parts in part_idx order) == prov_documents' doc.

    Line formats stream: graph index + part_lines lines is the task's peak
    beyond the index. PROV-JSON (a single json.dumps tree) is chunked
    after the dump — cells bounded, dump itself still O(doc). Extra
    fmt_kwargs go to the assembler (e.g. max_edges for 'dot', whose
    driver-surface default of 50k is exactly what this path outgrows)."""
    base_lines_of = _LINE_ASSEMBLERS.get(fmt)
    if base_lines_of is not None:
        def lines_of(g, repo):
            yield from base_lines_of(g, repo, **fmt_kwargs)
    else:
        if fmt not in _DOC_ASSEMBLERS:
            raise ValueError(
                f"fmt {fmt!r} not in {sorted(_DOC_ASSEMBLERS)}"
            )
        whole = _DOC_ASSEMBLERS[fmt]

        def lines_of(g, repo):  # noqa: F811 — json fallback, see docstring
            yield from whole(g, repo, **fmt_kwargs).split("\n")

    def build(key: Tuple[Any, ...],
              batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        repo = key[0]
        g = _graph_from_batches(batches)
        chunk, idx = [], 0
        for line in lines_of(g, repo):
            chunk.append(line)
            if len(chunk) >= part_lines:
                yield pd.DataFrame(
                    {"repo": [repo], "part_idx": [idx],
                     "part": ["\n".join(chunk)]}
                )
                chunk, idx = [], idx + 1
        if chunk or idx == 0:
            yield pd.DataFrame(
                {"repo": [repo], "part_idx": [idx], "part": ["\n".join(chunk)]}
            )

    return (
        triples.select("repo", "subj", "pred", "obj", "obj_type")
        .groupBy("repo")
        .applyInPandas(build, "repo string, part_idx int, part string")
    )


# ---------------------------------------------------------------------------
# PNG raster export (S6 completion) — stdlib zlib + numpy, no codec libs
# ---------------------------------------------------------------------------
#
# The reference serves raster graph images through ProvToolbox+graphviz
# (ProvController.java:69); this container ships no image codecs, but PNG
# needs none — the format is zlib-compressed filtered scanlines plus CRC'd
# chunks, all stdlib. The renderer rasterizes the SAME deterministic
# layered layout the SVG/PDF exporters use (shapes + edges; text labels
# remain the vector layers' concern — a font rasterizer is out of scope,
# and every consumer that needs labels has svg_text/pdf_bytes/html_text).

def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib as _z

    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", _z.crc32(tag + payload) & 0xFFFFFFFF))


def png_encode(arr) -> bytes:
    """RGB uint8 (H, W, 3) array -> PNG bytes (8-bit truecolor, filter 0
    scanlines, one zlib stream). Deterministic: fixed compression level,
    no ancillary chunks, no timestamps."""
    import struct
    import zlib as _z

    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", _z.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(data: bytes):
    """Minimal PNG reader for the encoder's own dialect (8-bit RGB,
    filter 0) — the round-trip test's independent half."""
    import struct
    import zlib as _z

    import numpy as np

    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    i, idat, w, h = 8, b"", None, None
    while i < len(data):
        (ln,) = struct.unpack(">I", data[i:i + 4])
        tag = data[i + 4:i + 8]
        payload = data[i + 8:i + 8 + ln]
        (crc,) = struct.unpack(">I", data[i + 8 + ln:i + 12 + ln])
        assert crc == (_z.crc32(tag + payload) & 0xFFFFFFFF), "bad CRC"
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert (depth, ctype) == (8, 2)
        elif tag == b"IDAT":
            idat += payload
        i += 12 + ln
    rows = _z.decompress(idat)
    stride = 1 + w * 3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = rows[y * stride:(y + 1) * stride]
        assert row[0] == 0, "only filter 0 emitted"
        out[y] = np.frombuffer(row[1:], dtype=np.uint8).reshape(w, 3)
    return out


def _rgb255(t):
    return tuple(int(round(c * 255)) for c in t)


def _render_raster(g: _Graph, repo: str, max_nodes: int = 2_000,
                   max_edges: int = 8_000):
    import numpy as np

    pos, kinds, edges, width, height = _viz_layout(
        g, max_nodes=max_nodes, max_edges=max_edges)
    canvas = np.full((height, width, 3), 255, dtype=np.uint8)

    def line(x1, y1, x2, y2, color):
        n = max(abs(x2 - x1), abs(y2 - y1), 1)
        xs = np.rint(np.linspace(x1, x2, n + 1)).astype(int)
        ys = np.rint(np.linspace(y1, y2, n + 1)).astype(int)
        ok = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
        canvas[ys[ok], xs[ok]] = color

    ink = (68, 68, 68)
    for s, _p, o in edges:
        (x1, y1), (x2, y2) = pos[s], pos[o]
        line(x1 + _VIZ_W // 2, y1 + _VIZ_H // 2,
             x2 + _VIZ_W // 2, y2 + _VIZ_H // 2, ink)

    border = (51, 51, 51)
    for n in sorted(pos):
        x, y = pos[n]
        kind = kinds[n]
        fill = _rgb255(_VIZ_FILL[kind])
        # masks are computed on the node's own (H, W) tile, never the
        # whole canvas — without this the render is O(nodes x canvas)
        tile = canvas[y:y + _VIZ_H, x:x + _VIZ_W]
        yy, xx = np.mgrid[0:_VIZ_H, 0:_VIZ_W]
        if kind == "entity":
            cx, cy = _VIZ_W / 2, _VIZ_H / 2
            rx, ry = _VIZ_W / 2, _VIZ_H / 2
            d_out = (((xx + 0.5) - cx) / rx) ** 2 \
                + (((yy + 0.5) - cy) / ry) ** 2
            d_in = ((((xx + 0.5) - cx) / (rx - 1.5)) ** 2
                    + (((yy + 0.5) - cy) / (ry - 1.5)) ** 2)
            tile[d_out <= 1.0] = border
            tile[d_in <= 1.0] = fill
        elif kind == "agent":
            pts = [(_VIZ_W / 2, 0), (_VIZ_W, _VIZ_H / 2),
                   (_VIZ_W - 25, _VIZ_H), (25, _VIZ_H), (0, _VIZ_H / 2)]
            cx = sum(p[0] for p in pts) / 5.0
            cy = sum(p[1] for p in pts) / 5.0

            def poly_mask(shrink):
                m = np.ones((_VIZ_H, _VIZ_W), dtype=bool)
                for (ax, ay), (bx, by) in zip(pts, pts[1:] + pts[:1]):
                    # pull each vertex toward the centroid for the inset
                    ax2 = ax + (cx - ax) * shrink
                    ay2 = ay + (cy - ay) * shrink
                    bx2 = bx + (cx - bx) * shrink
                    by2 = by + (cy - by) * shrink
                    cross = ((bx2 - ax2) * ((yy + 0.5) - ay2)
                             - (by2 - ay2) * ((xx + 0.5) - ax2))
                    ref = ((bx2 - ax2) * (cy - ay2)
                           - (by2 - ay2) * (cx - ax2))
                    m &= (cross * ref) >= 0
                return m
            tile[poly_mask(0.0)] = border
            tile[poly_mask(0.06)] = fill
        else:  # activity / other: rectangle
            tile[:, :] = border
            tile[1:-1, 1:-1] = fill
    return canvas


def png_bytes(triples: DataFrame, repo: str, max_nodes: int = 2_000,
              max_edges: int = 8_000,
              max_triples: int | None = None) -> bytes:
    """image/png rendering of one repo's PROV graph — the raster twin of
    svg_text, closing SURVEY §2.1 S6's last format gap without any
    image library (ProvController.java:69 serves the graphviz raster)."""
    return png_encode(_render_raster(
        _collect_graph(triples, repo, max_triples=max_triples), repo,
        max_nodes=max_nodes, max_edges=max_edges))


def png_documents(triples: DataFrame) -> DataFrame:
    """(repo, png) — the distributed bulk twin: one PNG per repo via
    groupBy(repo).applyInPandas, binary column (same one-repo-per-task
    contract and bounds as prov_documents)."""
    def build(key: Tuple[Any, ...],
              batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        repo = key[0]
        g = _graph_from_batches(batches)
        yield pd.DataFrame({"repo": [repo],
                            "png": [png_encode(_render_raster(g, repo))]})

    return (
        triples.select("repo", "subj", "pred", "obj", "obj_type")
        .groupBy("repo")
        .applyInPandas(build, "repo string, png binary")
    )


def jpeg_bytes(triples: DataFrame, repo: str, quality: int = 90,
               max_nodes: int = 2_000, max_edges: int = 8_000,
               max_triples: int | None = None) -> bytes:
    """image/jpeg rendering of one repo's PROV graph — the lossy raster
    twin of png_bytes, via the stdlib+numpy baseline codec
    (git_prov_spark/raster.py). With PNG this closes every format of
    SURVEY §2.1 S6 (ProvController.java:69 serves graphviz rasters)."""
    from .raster import jpeg_encode

    return jpeg_encode(_render_raster(
        _collect_graph(triples, repo, max_triples=max_triples), repo,
        max_nodes=max_nodes, max_edges=max_edges), quality=quality)


def jpeg_documents(triples: DataFrame, quality: int = 90) -> DataFrame:
    """(repo, jpeg) — distributed one-JPEG-per-repo bulk twin."""
    from .raster import jpeg_encode

    def build(key: Tuple[Any, ...],
              batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        repo = key[0]
        g = _graph_from_batches(batches)
        yield pd.DataFrame({
            "repo": [repo],
            "jpeg": [jpeg_encode(_render_raster(g, repo),
                     quality=quality)]})

    return (
        triples.select("repo", "subj", "pred", "obj", "obj_type")
        .groupBy("repo")
        .applyInPandas(build, "repo string, jpeg binary")
    )
