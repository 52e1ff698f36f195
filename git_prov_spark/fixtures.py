"""Deterministic synthetic `files`/`commits`/`contributors` fixtures (FIXTURES.md).

Pure function of parameters — no wall clock, no RNG state: every value derives
from (repo, seq, file index) via closed-form rules + sha1, so the local (pandas)
and distributed (Spark) backends generate byte-identical tables, and re-runs at
any parallelism level agree (SURVEY.md §5.2 determinism property).

Scenario files encode FIXTURES.md §3 cases 1-7; bulk files give volume + skew
(case 8). The `files` table has snapshot semantics: one row per (commit, path)
present in the tree at that commit.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pandas as pd

EPOCH = datetime(2020, 1, 1)

# Per-repo contributor cast (login, type, name, email) — ascending-login order is
# the canonical agent order (DESIGN.md §5).
CAST = [
    ("alice", "User", "Alice A", "alice@x.io"),
    ("bob smith", "User", "Bob S", "bob@x.io"),
    ("carol", "User", None, "carol@x.io"),
    ("dan", "User", "Dave D", "shared@x.io"),   # name + email shared with dave
    ("dave", "User", "Dave D", "shared@x.io"),  # -> linking ambiguity + alias merge
    ("erin", "Organization", "Erin Org", None),
]
_LOGINS = [c[0] for c in CAST]
_NAME_OF = {c[0]: c[2] for c in CAST}
_EMAIL_OF = {c[0]: c[3] for c in CAST}


def commit_sha(repo: str, seq: int) -> str:
    h = hashlib.sha1(f"{repo}:{seq}".encode()).hexdigest()
    return f"c{seq:04d}{h[:36]}"


def authored_at(seq: int) -> datetime:
    return EPOCH + timedelta(hours=seq)


def commit_message(repo: str, seq: int) -> str:
    if seq == 0:
        return ""
    if seq == 1:
        return "Fix: naïve café ☕"
    if seq == 2:
        return "multi\nline message"
    return f"commit {seq} of {repo}"


def commit_author(seq: int) -> tuple[str | None, str, str]:
    """(author_login, author_name, author_email) for commit `seq`."""
    if seq % 12 == 7:
        # null login, name matches alice -> name-match fallback wins
        return None, "Alice A", "alice@x.io"
    if seq % 12 == 9:
        # null login, unknown name -> first null-name agent (carol) wins
        return None, "Nobody Known", "nobody@x.io"
    if seq % 15 == 11:
        # login absent from contributors: agent IRI minted with no Agent node
        return "ghost", "Ghost G", "ghost@x.io"
    login = _LOGINS[seq % len(_LOGINS)]
    return login, _NAME_OF[login] or login.title(), _EMAIL_OF[login] or f"{login}@x.io"


def commit_parents(repo: str, seq: int) -> list[str]:
    if seq == 0:
        return []
    if seq >= 2 and seq % 5 == 4:  # merge commit, two parents
        return [commit_sha(repo, seq - 1), commit_sha(repo, seq - 2)]
    return [commit_sha(repo, seq - 1)]


# --------------------------------------------------------------------------
# Content model
# --------------------------------------------------------------------------

def bulk_content(path: str, version: int) -> str:
    """Deterministic multi-line content for bulk files.

    Built iteratively from v0: each version edits one line, appends one line,
    and every 3rd version deletes one line — lines are unique strings so
    multiset line-diff equals git-style diff counts.
    """
    lines = [f"{path} :: line {i}" for i in range(4)]
    for k in range(1, version + 1):
        lines[k % len(lines)] = f"{path} :: line {k % len(lines)} (edited v{k})"
        lines.append(f"{path} :: added in v{k}")
        if k % 3 == 0 and len(lines) > 3:
            del lines[(k * 2) % (len(lines) - 1)]
    return "\n".join(lines)


def lang_of(path: str) -> str:
    ext = path.rsplit(".", 1)[-1] if "." in path else ""
    return {"java": "java", "py": "py", "md": "md", "txt": "txt", "rs": "rs"}.get(
        ext, "unknown"
    )


# --------------------------------------------------------------------------
# Scenario files (FIXTURES.md §3 cases 1-7) — explicit event scripts.
# events: {seq: content} means "present from this seq on with this content";
# REMOVE marks disappearance at that seq. Requires n_commits >= 10.
# --------------------------------------------------------------------------

REMOVE = object()

_OLD_RENAME_CONTENT = "rename me\nsame bytes before and after\nend"


def scenario_scripts(repo: str) -> dict[str, dict[int, object]]:
    return {
        "src/main/App.java": {  # linear add -> modify -> modify
            0: "class App {}\nint x = 1;",
            2: "class App {}\nint x = 2;",
            5: "class App {}\nint x = 2;\n// more",
        },
        "docs/read me.txt": {1: "hello docs", 3: "hello docs, edited"},
        "a.b/c d.e": {0: "dotted and spaced path"},
        "win\\path.txt": {  # remove then re-add then modify
            2: "windows style",
            4: REMOVE,
            6: "windows style (back)",
            8: "windows style (back, edited)",
        },
        "old name.txt": {1: _OLD_RENAME_CONTENT, 7: REMOVE},
        "new name.txt": {7: _OLD_RENAME_CONTENT},  # rename: identical content sha
        "empty.txt": {0: "", 9: "  \n"},  # empty + whitespace-only change
    }


def _script_state(script: dict[int, object], seq: int) -> str | None:
    """Content of a scenario file at snapshot `seq` (None = absent)."""
    state: str | None = None
    for s in sorted(script):
        if s > seq:
            break
        v = script[s]
        state = None if v is REMOVE else v  # type: ignore[assignment]
    return state


# --------------------------------------------------------------------------
# Bulk files — closed-form presence/version
# --------------------------------------------------------------------------

def bulk_path(j: int) -> str:
    ext = ["java", "py", "md", "txt", "rs"][j % 5]
    return f"src/pkg{j % 13}/mod_{j}.{ext}"


def bulk_born(j: int, n_commits: int) -> int:
    return j % max(1, n_commits // 3)


def bulk_present(j: int, seq: int, n_commits: int) -> bool:
    born = bulk_born(j, n_commits)
    if seq < born:
        return False
    if j % 7 == 3 and born + 4 <= seq < born + 8:
        return False  # removed at born+4, re-added at born+8
    return True


def bulk_version(j: int, seq: int, n_commits: int) -> int:
    born = bulk_born(j, n_commits)
    m = 2 + (j % 4)  # modify cadence
    return max(0, (seq - born)) // m


# --------------------------------------------------------------------------
# Table generation
# --------------------------------------------------------------------------

@dataclass
class RepoSpec:
    repo: str
    n_commits: int
    n_files: int  # bulk files; scenario files added on top
    scenarios: bool = True


@dataclass
class FixtureParams:
    repos: list[RepoSpec] = field(
        default_factory=lambda: [
            RepoSpec("org0/hot", 12, 40),   # hot repo: ~50% of snapshot rows
            RepoSpec("org1/alpha", 10, 12),
            RepoSpec("org2/beta", 8, 6),
        ]
    )


def gen_commits(spec: RepoSpec) -> pd.DataFrame:
    rows = []
    for seq in range(spec.n_commits):
        login, name, email = commit_author(seq)
        rows.append(
            {
                "repo": spec.repo,
                "commit": commit_sha(spec.repo, seq),
                "parents": commit_parents(spec.repo, seq),
                "author_login": login,
                "author_name": name,
                "author_email": email,
                "authored_at": authored_at(seq),
                "message": commit_message(spec.repo, seq),
                "commit_seq": seq,
            }
        )
    return pd.DataFrame(rows)


def gen_contributors(spec: RepoSpec) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "repo": spec.repo,
                "login": login,
                "type": typ,
                "name": name,
                "email": email,
                "avatar_url": f"https://avatars.example/{login.replace(' ', '-')}.png",
            }
            for login, typ, name, email in CAST
        ]
    )


def file_rows_for(spec: RepoSpec, j: int) -> list[dict]:
    """All snapshot rows of bulk file j across this repo's commits.

    The unit of distributed generation: one (repo, file) per task row.
    """
    path = bulk_path(j)
    out = []
    for seq in range(spec.n_commits):
        if bulk_present(j, seq, spec.n_commits):
            v = bulk_version(j, seq, spec.n_commits)
            out.append(
                {
                    "repo": spec.repo,
                    "path": path,
                    "commit": commit_sha(spec.repo, seq),
                    "lang": lang_of(path),
                    "content": bulk_content(path, v),
                }
            )
    return out


def scenario_rows_for(spec: RepoSpec) -> list[dict]:
    out = []
    for path, script in scenario_scripts(spec.repo).items():
        for seq in range(spec.n_commits):
            content = _script_state(script, seq)
            if content is not None:
                out.append(
                    {
                        "repo": spec.repo,
                        "path": path,
                        "commit": commit_sha(spec.repo, seq),
                        "lang": lang_of(path),
                        "content": content,
                    }
                )
    return out


def gen_files(spec: RepoSpec) -> pd.DataFrame:
    rows: list[dict] = []
    if spec.scenarios and spec.n_commits >= 10:
        rows.extend(scenario_rows_for(spec))
    for j in range(spec.n_files):
        rows.extend(file_rows_for(spec, j))
    return pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )


def gen_tables(params: FixtureParams | None = None):
    """Local backend: (files, commits, contributors) as pandas DataFrames."""
    params = params or FixtureParams()
    files = pd.concat([gen_files(s) for s in params.repos], ignore_index=True)
    commits = pd.concat([gen_commits(s) for s in params.repos], ignore_index=True)
    contributors = pd.concat(
        [gen_contributors(s) for s in params.repos], ignore_index=True
    )
    return files, commits, contributors


# --------------------------------------------------------------------------
# Spark (distributed) backend — identical data, generated in parallel.
# --------------------------------------------------------------------------

FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def spark_gen_files(spark, params: FixtureParams):
    """Distributed snapshot generation: one task unit per (repo, file index).

    Driver materializes only the tiny (repo, j) spec list; content rows are
    produced executor-side via mapInPandas over the shared closed-form rules,
    so output is identical to `gen_tables` at any parallelism.
    """
    spec_by_repo = {s.repo: s for s in params.repos}
    units = []
    for s in params.repos:
        if s.scenarios and s.n_commits >= 10:
            units.append((s.repo, -1))  # scenario unit
        units.extend((s.repo, j) for j in range(s.n_files))
    units_df = spark.createDataFrame(units, "repo string, j int").repartition(
        max(2 * (spark.sparkContext.defaultParallelism or 8), 8)
    )

    def expand(batches):
        for pdf in batches:
            rows: list[dict] = []
            for repo, j in zip(pdf["repo"], pdf["j"]):
                s = spec_by_repo[repo]
                rows.extend(
                    scenario_rows_for(s) if j < 0 else file_rows_for(s, int(j))
                )
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    return units_df.mapInPandas(expand, FILES_SCHEMA)


def spark_gen_dims(spark, params: FixtureParams):
    """(commits, contributors) as Spark DataFrames (dims are driver-small)."""
    commits = pd.concat([gen_commits(s) for s in params.repos], ignore_index=True)
    contributors = pd.concat(
        [gen_contributors(s) for s in params.repos], ignore_index=True
    )
    commits_schema = (
        "repo string, commit string, parents array<string>, author_login string, "
        "author_name string, author_email string, authored_at timestamp, "
        "message string, commit_seq int"
    )
    contrib_schema = (
        "repo string, login string, type string, name string, email string, "
        "avatar_url string"
    )
    return (
        spark.createDataFrame(commits, schema=commits_schema),
        spark.createDataFrame(contributors, schema=contrib_schema),
    )


def bench_params(n_repos: int = 8, n_commits: int = 30, n_files: int = 400) -> FixtureParams:
    """Bench-scale params: repo 0 is hot (~50% of snapshot rows)."""
    repos = [RepoSpec("org0/hot", n_commits, n_files * max(1, n_repos - 1))]
    repos += [
        RepoSpec(f"org{i}/repo{i}", n_commits, n_files, scenarios=False)
        for i in range(1, n_repos)
    ]
    return FixtureParams(repos=repos)
