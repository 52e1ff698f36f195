"""Query-result serialization (SURVEY.md §2.11 Q2).

The reference formats SPARQL result sets 9 ways (services/SparqlService.java:
33-82 — text/XML/CSV/TSV/JSON/…). Here the result set is a DataFrame of
variable bindings (from sparql.execute / queries.bgp), so:

* `write_results` — distributed sinks (csv / tsv / json-lines) for bulk
  results: plain `df.write`, scales with the result, never touches the
  driver.
* `results_text` — driver-side strings in the W3C SPARQL-results shapes
  (csv / tsv / json / xml) plus an aligned `text` table, for the
  interactive/per-request sizes the reference serves over HTTP. Collects —
  use only on bounded results.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

DISTRIBUTED_FORMATS = ("csv", "tsv", "json")
TEXT_FORMATS = ("csv", "tsv", "json", "xml", "text")


def write_results(df: DataFrame, path: str, fmt: str = "csv",
                  mode: str = "overwrite") -> None:
    if fmt == "csv":
        df.write.mode(mode).option("header", True).csv(path)
    elif fmt == "tsv":
        df.write.mode(mode).option("header", True).option("sep", "\t").csv(path)
    elif fmt == "json":
        df.write.mode(mode).json(path)
    else:
        raise ValueError(f"distributed formats: {DISTRIBUTED_FORMATS}, got {fmt!r}")


def _cell(v) -> str:
    return "" if v is None else str(v)


def results_text(df: DataFrame, fmt: str = "json", max_rows: int = 10_000,
                 uri_cols: frozenset[str] | set[str] = frozenset()) -> str:
    """Small-result serialization; raises if the result exceeds max_rows
    (bulk results belong in write_results).

    `uri_cols` names the binding columns whose values are IRIs: the W3C
    JSON/XML result formats type them `uri` / `<uri>` per spec (the
    reference's Jena serializer does the same). Columns not listed
    serialize as plain literals — the store keeps CURIEs/IRIs as strings,
    so the caller (who knows which SELECT vars bound to subjects/predicates
    or to `obj` rows with obj_type='iri') supplies the hint."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"result exceeds max_rows={max_rows}; use write_results")
    cols = df.columns
    if fmt == "csv" or fmt == "tsv":
        sep = "," if fmt == "csv" else "\t"

        def q(s: str) -> str:
            if fmt == "csv":
                if any(ch in s for ch in ',"\n'):
                    return '"' + s.replace('"', '""') + '"'
                return s
            # W3C SPARQL-results TSV: tab/newline/backslash in a value
            # MUST be backslash-escaped or the row structure corrupts
            return (s.replace("\\", "\\\\").replace("\t", "\\t")
                    .replace("\n", "\\n").replace("\r", "\\r"))

        lines = [sep.join(q(c) for c in cols)]
        lines += [sep.join(q(_cell(r[c])) for c in cols) for r in rows]
        return "\n".join(lines)
    if fmt == "json":  # W3C SPARQL 1.1 Query Results JSON
        return json.dumps(
            {
                "head": {"vars": cols},
                "results": {
                    "bindings": [
                        {
                            c: {
                                "type": "uri" if c in uri_cols else "literal",
                                "value": _cell(r[c]),
                            }
                            for c in cols
                            if r[c] is not None
                        }
                        for r in rows
                    ]
                },
            },
            indent=1,
        )
    if fmt == "xml":  # W3C SPARQL Query Results XML
        head = "".join(f'  <variable name="{escape(c)}"/>\n' for c in cols)
        body = []
        for r in rows:
            bindings = "".join(
                f'    <binding name="{escape(c)}">'
                f"<{'uri' if c in uri_cols else 'literal'}>"
                f"{escape(_cell(r[c]))}"
                f"</{'uri' if c in uri_cols else 'literal'}></binding>\n"
                for c in cols
                if r[c] is not None
            )
            body.append(f"  <result>\n{bindings}  </result>\n")
        return (
            '<?xml version="1.0"?>\n'
            '<sparql xmlns="http://www.w3.org/2005/sparql-results#">\n'
            f" <head>\n{head} </head>\n"
            f" <results>\n{''.join(body)} </results>\n"
            "</sparql>"
        )
    if fmt == "text":  # aligned table
        widths = [
            max(len(c), *(len(_cell(r[c])) for r in rows)) if rows else len(c)
            for c in cols
        ]
        def fmt_row(vals):
            return " | ".join(v.ljust(w) for v, w in zip(vals, widths))
        lines = [fmt_row(cols), "-+-".join("-" * w for w in widths)]
        lines += [fmt_row([_cell(r[c]) for c in cols]) for r in rows]
        return "\n".join(lines)
    raise ValueError(f"text formats: {TEXT_FORMATS}, got {fmt!r}")
