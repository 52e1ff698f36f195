"""ID minting / sanitization (DESIGN.md §3) — Spark Column exprs + Python mirrors.

Each function exists twice: a Column-returning Spark form (JVM-side, codegen'd —
no Python in the hot path) and a `py_` mirror used by the pure-Python oracle and
golden-string tests. The two MUST stay in lock-step; `tests/test_iri.py` checks
them against each other on adversarial inputs.

Reference semantics:
  - san:       ProvenanceService.java:538-540 (`"file-" + replaceAll("[/\\\\. ]","-")`)
  - spec:      ProvenanceService.java:528-530
  - agent id:  ProvenanceService.java:367-369 (space -> dash)
  - entity id: ProvenanceService.java:329 (space -> dash, no-op after san)
  - escaping:  ProvenanceService.java:263-265 (canonicalized here per DESIGN.md §3)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java replaceAll("[/\\. ]", "-"): slash, backslash, dot, space.
_SAN_RE = r"[/\\. ]"
_ESCAPE_RE = r"[^A-Za-z0-9._-]"

# every ASCII char (0x00-0x7F) outside [A-Za-z0-9._-] — the translate()
# fast path for escape_local_name (char-class regexps in Spark 4 run ~35x
# slower than translate; see tests/test_iri.py mirror checks). NUL is
# included: a string containing \x00 is still pure-ASCII (octet_length ==
# length) so it takes this path and must escape like the regexp does.
_ILLEGAL_ASCII = "".join(
    c for c in map(chr, range(0, 128))
    if not (c.isascii() and c.isalnum()) and c not in "._-"
)
_SAN_CHARS = "/\\. "

NAMESPACES = {
    "prov": "http://www.w3.org/ns/prov#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def gitprov_ns(repo: str) -> str:
    """Per-repo namespace for the `gitprov:` prefix (DESIGN.md §2)."""
    return f"gitprov://{repo}#"


# --------------------------------------------------------------------------
# Spark Column forms
# --------------------------------------------------------------------------

def escape_local_name(c: Column) -> Column:
    """Canonical XSD-local-name escape (DESIGN.md §3).

    Semantics = regexp_replace(c, [^A-Za-z0-9._-], "_"), but pure-ASCII rows
    (octet_length == length) take a translate() fast path; only rare
    non-ASCII rows pay for the regex engine.
    """
    ascii_fast = F.translate(c, _ILLEGAL_ASCII, "_" * len(_ILLEGAL_ASCII))
    return F.when(
        F.octet_length(c) == F.length(c), ascii_fast
    ).otherwise(F.regexp_replace(c, _ESCAPE_RE, "_"))


def san(path: Column) -> Column:
    """Base-filename id: `file-<path with [/\\. ] -> '-'>`.

    translate ≡ the reference's single-char regex class [/\\. ] -> '-'.
    """
    return F.concat(F.lit("file-"), F.translate(path, _SAN_CHARS, "----"))


def spec(path: Column, sha: Column) -> Column:
    """Specialized (file-version) id: `<san(path)>_commit-<sha>`."""
    return F.concat(san(path), F.lit("_commit-"), sha)


def agent_local(login: Column) -> Column:
    """Agent id local part: login with spaces dashed, then escaped."""
    return escape_local_name(F.translate(login, " ", "-"))


def curie(local: Column) -> Column:
    """Wrap a local name into the per-repo `gitprov:` CURIE."""
    return F.concat(F.lit("gitprov:"), local)


def entity_curie(path: Column, sha: Column) -> Column:
    return curie(escape_local_name(F.translate(spec(path, sha), " ", "-")))


def base_entity_curie(path: Column) -> Column:
    return curie(escape_local_name(F.translate(san(path), " ", "-")))


def commit_curie(sha: Column) -> Column:
    return curie(F.concat(F.lit("commit-"), sha))


def agent_curie(login: Column) -> Column:
    return curie(agent_local(login))


# --------------------------------------------------------------------------
# Python mirrors (oracle + golden tests)
# --------------------------------------------------------------------------

def py_escape_local_name(s: str) -> str:
    return re.sub(_ESCAPE_RE, "_", s)


def py_san(path: str) -> str:
    return "file-" + re.sub(_SAN_RE, "-", path)


def py_spec(path: str, sha: str) -> str:
    return py_san(path) + "_commit-" + sha


def py_agent_local(login: str) -> str:
    return py_escape_local_name(login.replace(" ", "-"))


def py_entity_curie(path: str, sha: str) -> str:
    return "gitprov:" + py_escape_local_name(py_spec(path, sha).replace(" ", "-"))


def py_base_entity_curie(path: str) -> str:
    return "gitprov:" + py_escape_local_name(py_san(path).replace(" ", "-"))


def py_commit_curie(sha: str) -> str:
    return "gitprov:commit-" + sha


def py_agent_curie(login: str) -> str:
    return "gitprov:" + py_agent_local(login)


def py_ts(dt) -> str:
    """xsd:dateTime literal, UTC, second precision (DESIGN.md §2)."""
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")
