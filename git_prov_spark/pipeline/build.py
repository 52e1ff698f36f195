"""End-to-end KG construction: files/commits/contributors -> triples DataFrame.

Dataflow (DESIGN.md §6; the Spark re-architecture of
ProvenanceService.java:116-189):

  scan files ──slim──▶ change events (1 shuffle, window) ──▶ version chain
       │                     │                                (reuses partitioning)
       └──▶ blobs (dedup)    └─ modified ⋈ blobs ─▶ diff stats (pandas UDF)
  commits/contributors dims ──▶ author resolution (broadcast) + contributions
  all statement types ──inline──▶ unionByName ──▶ triples(repo,subj,pred,obj,obj_type)

Change events are persisted (MEMORY_AND_DISK) because six statement builders
read them; at production scale they are |version-events| rows, orders of
magnitude below snapshot rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .agents import (
    alias_components,
    canonicalize_contributors,
    canonicalize_logins,
    contributions,
    resolve_authors,
)
from .changelog import blobs, change_events
from .diffstats import with_diff_stats
from .statements import (
    activity_triples,
    agent_triples,
    association_triples,
    base_entity_triples,
    communication_triples,
    derivation_triples,
    enrich_with_ids,
    entity_triples,
    generation_triples,
    invalidation_triples,
    usage_triples,
)
from .versions import ensure_commit_seq, with_version_chain


def build_triples(
    files: DataFrame,
    commits: DataFrame,
    contributors: DataFrame,
    persist_events: bool = True,
    canonicalize_agents: bool = False,
) -> DataFrame:
    """files/commits/contributors → PROV triples.

    canonicalize_agents=True inserts the alias-merge stage (north_star:
    entity linking + connected-components union-find): login↔email
    components collapse to one canonical agent — associations rewrite to
    the canonical CURIE, one agent row carries the component's attributes,
    contributions roll up. Default off: output is byte-identical to the
    reference semantics (tests/test_agents.py asserts both)."""
    commits = ensure_commit_seq(commits)

    events = with_version_chain(change_events(files, commits))
    if persist_events:
        # eager materialization: the statement builders below become
        # concurrent stages of one job, and a lazily-persisted plan would be
        # recomputed by each of them before any populates the cache (Spark
        # dedupes cached partitions only once blocks are written)
        events = events.persist(StorageLevel.MEMORY_AND_DISK)
        events.count()
    # id minting AFTER the persist: slim rows in cache; the escaped-id
    # columns are cheap translate/concat exprs recomputed per branch
    events = enrich_with_ids(events)

    events_ts = events.join(
        commits.select("repo", "commit", "authored_at"), ["repo", "commit"]
    )
    modified = events_ts.where(F.col("status") == "modified")
    modified_stats = with_diff_stats(modified, blobs(files))

    resolved = resolve_authors(commits, contributors)
    if canonicalize_agents:
        alias_map = alias_components(commits, contributors)
        resolved = canonicalize_logins(resolved, alias_map)
        contributors = canonicalize_contributors(contributors, alias_map)
    contribs = contributions(resolved, contributors)

    parts = [
        activity_triples(commits),
        agent_triples(contribs),
        association_triples(resolved),
        communication_triples(commits),
        entity_triples(events),
        base_entity_triples(events),
        generation_triples(events_ts),
        invalidation_triples(events_ts),
        usage_triples(events_ts),
        derivation_triples(modified_stats),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
