"""Pure-Python PROV oracle (SURVEY.md §5.2) — the correctness gold standard.

Re-implements, single-node and dumb-on-purpose, the reference translation loop
`ProvenanceService.java:116-189` over the fixture tables, emitting the triple
set per DESIGN.md §4. Every SURVEY.md §5.3 quirk is encoded:

  1. oldest-first commit processing (PS.java:128)
  2. agents from contributors; null-login fallback = first agent (ascending-login
     order) whose name matches OR has no name; uses that agent's login (PS.java:138-153)
  3. registerVersion for every changeset status incl. removed (PS.java:182)
  4. base entity once per path, specializationOf per file-version (PS.java:378-394)
  5. derivation's hadGeneration/hadUsage ids verbatim-mismatched (PS.java:495-497)
  6. agent foaf:homepage = owner URL (PS.java:341,346)
  7. id sanitization chain (PS.java:538-540, 528-530, 329, 263-265)
  8. prov:hadRole "authorship"; additions/changes/deletions xsd:int; startTime only

Deliberately NOT shared with the pipeline: changeset derivation here is a literal
snapshot-dict diff, so it independently checks the pipeline's window-based J4.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from .iri import (
    py_agent_curie,
    py_base_entity_curie,
    py_commit_curie,
    py_entity_curie,
    py_escape_local_name,
    py_san,
    py_spec,
    py_ts,
)

Triple = tuple[str, str, str, str, str]  # (repo, subj, pred, obj, obj_type)


def diff_counts(old: str, new: str) -> tuple[int, int]:
    """Multiset line diff: (additions, deletions). changes = additions + deletions."""
    o = Counter(old.split("\n"))
    n = Counter(new.split("\n"))
    additions = sum((n - o).values())
    deletions = sum((o - n).values())
    return additions, deletions


def _resolve_author(
    commit_row, agents: list[dict]
) -> str | None:
    """PS.java:138-153 — returns the association login, or None if unresolvable."""
    login = commit_row["author_login"]
    if login is not None and not (isinstance(login, float) and pd.isna(login)):
        return login
    name = commit_row["author_name"]
    for a in agents:  # ascending-login order (DESIGN.md §5)
        if a["name"] is None or a["name"] == name:
            return a["login"]
    return None


def oracle_triples(
    files: pd.DataFrame, commits: pd.DataFrame, contributors: pd.DataFrame
) -> set[Triple]:
    out: set[Triple] = set()
    for repo in sorted(commits["repo"].unique()):
        out |= _repo_triples(
            repo,
            files[files["repo"] == repo],
            commits[commits["repo"] == repo],
            contributors[contributors["repo"] == repo],
        )
    return out


def _norm_null(v):
    return None if v is None or (isinstance(v, float) and pd.isna(v)) else v


def _repo_triples(
    repo: str, files: pd.DataFrame, commits: pd.DataFrame, contributors: pd.DataFrame
) -> set[Triple]:
    owner = repo.split("/")[0]
    owner_url = f"https://github.com/{owner}"
    repo_url = f"https://github.com/{repo}"
    out: set[Triple] = set()

    def t(s: str, p: str, o: str, ot: str) -> None:
        out.add((repo, s, p, o, ot))

    commits = commits.sort_values("commit_seq")  # oldest-first (quirk 1)
    agents = [
        {"login": r.login, "type": r.type, "name": _norm_null(r.name),
         "email": _norm_null(r.email), "avatar_url": r.avatar_url}
        for r in contributors.sort_values("login").itertuples()
    ]

    # snapshots: seq -> {path: content}
    seq_of = dict(zip(commits["commit"], commits["commit_seq"]))
    snapshots: dict[int, dict[str, str]] = {}
    for r in files.itertuples():
        snapshots.setdefault(seq_of[r.commit], {})[r.path] = r.content

    versions: dict[str, list[str]] = {}   # path -> ordered changeset shas
    base_seen: set[str] = set()
    assoc_count: Counter = Counter()      # login -> resolved-commit count

    resolved = {}
    for row in commits.to_dict("records"):
        resolved[row["commit"]] = _resolve_author(row, agents)
        if resolved[row["commit"]] is not None:
            assoc_count[resolved[row["commit"]]] += 1

    # Agents (PS.java:332-365); contributions computed from resolved associations
    for a in agents:
        A = py_agent_curie(a["login"])
        t(A, "rdf:type", "prov:Agent", "iri")
        t(A, "prov:type", a["type"], "xsd:string")
        t(A, "foaf:homepage", owner_url, "xsd:anyURI")  # owner URL — quirk 6
        t(A, "rdfs:label", a["login"], "xsd:string")
        t(A, "gitprov:contributions", str(assoc_count.get(a["login"], 0)), "xsd:int")
        t(A, "foaf:img", a["avatar_url"], "xsd:anyURI")
        if a["email"] is not None:
            t(A, "foaf:mbox", a["email"], "xsd:string")
        if a["name"] is not None:
            t(A, "foaf:name", a["name"], "xsd:string")

    prev_snapshot: dict[str, str] = {}
    for row in commits.to_dict("records"):
        sha, seq = row["commit"], row["commit_seq"]
        ts = py_ts(row["authored_at"])
        C = py_commit_curie(sha)

        # Activity (PS.java:302-319)
        t(C, "rdf:type", "prov:Activity", "iri")
        t(C, "prov:startedAtTime", ts, "xsd:dateTime")
        t(C, "foaf:homepage", f"{repo_url}/commit/{sha}", "xsd:anyURI")
        t(C, "rdfs:label", row["message"], "xsd:string")

        # Association (PS.java:471-479)
        login = resolved[sha]
        if login is not None:
            A = py_agent_curie(login)
            AS = f"gitprov:association-{sha}"
            t(C, "prov:wasAssociatedWith", A, "iri")
            t(C, "prov:qualifiedAssociation", AS, "iri")
            t(AS, "rdf:type", "prov:Association", "iri")
            t(AS, "prov:agent", A, "iri")
            t(AS, "prov:hadRole", "authorship", "xsd:string")

        # Changeset = snapshot diff (DESIGN.md §5)
        snap = snapshots.get(seq, {})
        changes: list[tuple[str, str]] = []
        for path, content in snap.items():
            if path not in prev_snapshot:
                changes.append((path, "added"))
            elif prev_snapshot[path] != content:
                changes.append((path, "modified"))
        for path in prev_snapshot:
            if path not in snap:
                changes.append((path, "removed"))

        for path, status in changes:
            E = py_entity_curie(path, sha)
            B = py_base_entity_curie(path)
            san_e = py_escape_local_name(py_san(path).replace(" ", "-"))
            # Entity per file-version — every status (quirk 3 / PS.java:162-183)
            t(E, "rdf:type", "prov:Entity", "iri")
            t(E, "rdfs:label", path, "xsd:string")
            if path not in base_seen:  # base entity once (quirk 4)
                base_seen.add(path)
                t(B, "rdf:type", "prov:Entity", "iri")
                t(B, "rdfs:label", path, "xsd:string")
            t(E, "prov:specializationOf", B, "iri")

            if status in ("added", "modified"):
                G = f"gitprov:generation-{san_e}-{sha}"
                t(E, "prov:wasGeneratedBy", C, "iri")
                t(E, "prov:qualifiedGeneration", G, "iri")
                t(G, "rdf:type", "prov:Generation", "iri")
                t(G, "prov:activity", C, "iri")
                t(G, "prov:atTime", ts, "xsd:dateTime")
            if status == "removed":
                I = f"gitprov:invalidation-{san_e}-{sha}"
                t(E, "prov:wasInvalidatedBy", C, "iri")
                t(E, "prov:qualifiedInvalidation", I, "iri")
                t(I, "rdf:type", "prov:Invalidation", "iri")
                t(I, "prov:activity", C, "iri")
                t(I, "prov:atTime", ts, "xsd:dateTime")
            if status == "modified":
                p = versions[path][-1]  # previous change event — any status
                PE = py_entity_curie(path, p)
                U = f"gitprov:usage-{san_e}-{sha}-{p}"
                t(C, "prov:used", PE, "iri")
                t(C, "prov:qualifiedUsage", U, "iri")
                t(U, "rdf:type", "prov:Usage", "iri")
                t(U, "prov:entity", PE, "iri")
                t(U, "prov:atTime", ts, "xsd:dateTime")

                spec_e = py_escape_local_name(py_spec(path, sha).replace(" ", "-"))
                D = f"gitprov:derivation-{spec_e}-{p}"
                a_, d_ = diff_counts(prev_snapshot[path], snap[path])
                t(E, "prov:wasDerivedFrom", PE, "iri")
                t(E, "prov:qualifiedDerivation", D, "iri")
                t(D, "rdf:type", "prov:Derivation", "iri")
                t(D, "prov:entity", PE, "iri")
                t(D, "prov:hadActivity", C, "iri")
                # verbatim-mismatched internal ids (quirk 5, PS.java:495-497)
                t(D, "prov:hadGeneration", f"gitprov:generation-{sha}", "iri")
                t(D, "prov:hadUsage", f"gitprov:usage-{sha}-{p}", "iri")
                t(D, "gitprov:additions", str(a_), "xsd:int")
                t(D, "gitprov:changes", str(a_ + d_), "xsd:int")
                t(D, "gitprov:deletions", str(d_), "xsd:int")

            versions.setdefault(path, []).append(sha)  # quirk 3

        # Communication (PS.java:513-519)
        for p in row["parents"]:
            P = py_commit_curie(p)
            M = f"gitprov:information-{p}-{sha}"
            t(C, "prov:wasInformedBy", P, "iri")
            t(C, "prov:qualifiedCommunication", M, "iri")
            t(M, "rdf:type", "prov:Communication", "iri")
            t(M, "prov:activity", P, "iri")

        prev_snapshot = snap

    return out


def precision_recall(actual: set[Triple], expected: set[Triple]) -> tuple[float, float]:
    if not actual and not expected:
        return 1.0, 1.0
    tp = len(actual & expected)
    p = tp / len(actual) if actual else 0.0
    r = tp / len(expected) if expected else 0.0
    return p, r
