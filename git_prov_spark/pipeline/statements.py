"""Per-statement-type triple emission (SURVEY.md §2.2 P1-P5, §2.3 J2, §2.8 F1-F6).

Each builder turns one input DataFrame into triple rows
(repo, subj, pred, obj, obj_type) per DESIGN.md §4 in a SINGLE pass: the fixed
per-row triple fan-out is expressed as `inline(array(struct(...)))` — a generate
node inside whole-stage codegen, never a repeated scan or a Python UDF.
Conditional attributes (null email/name) are dropped by an array-level filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..iri import (
    agent_curie,
    base_entity_curie,
    commit_curie,
    entity_curie,
    escape_local_name,
    san,
    spec,
)

TRIPLE_COLS = ["repo", "subj", "pred", "obj", "obj_type"]


def _t(subj: Column, pred: str, obj: Column | str, obj_type: str) -> Column:
    o = F.lit(obj) if isinstance(obj, str) else obj
    return F.struct(
        subj.cast("string").alias("subj"),
        F.lit(pred).alias("pred"),
        o.cast("string").alias("obj"),
        F.lit(obj_type).alias("obj_type"),
    )


def _emit(df: DataFrame, triples: list[Column]) -> DataFrame:
    # null-conditional attributes are dropped AFTER inline: a row-level filter
    # stays inside whole-stage codegen, whereas an array-level higher-order
    # F.filter is CodegenFallback and forces the whole projection into
    # interpreted mode (~10x slower at bench scale)
    return df.select("repo", F.inline(F.array(*triples))).where(
        F.col("obj").isNotNull()
    )


def xsd_ts(c: Column) -> Column:
    """xsd:dateTime literal, UTC second precision (ProvenanceService.java:559-563)."""
    return F.concat(F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z"))


def _san_escaped(path: Column) -> Column:
    """Escaped base filename local part — used inside generation/usage ids."""
    return escape_local_name(F.translate(san(path), " ", "-"))


def _spec_escaped(path: Column, sha: Column) -> Column:
    return escape_local_name(F.translate(spec(path, sha), " ", "-"))


def enrich_with_ids(events: DataFrame) -> DataFrame:
    """Mint the path/sha-derived id primitives ONCE per change event, before
    the events are persisted and fanned out to the statement builders.

    The escape is a per-char substitution, so escape(A+B) == escape(A) +
    escape(B): every composite id (entity, spec, generation, usage,
    derivation) is a concat of these primitives — builders never re-run
    sanitization over millions of emitted triples (it was the pipeline's
    hottest expression by far).

    Columns added: san_esc, entity_id, base_id, parent_entity_id (null when
    no parent version), commit_id.
    """
    san_esc = _san_escaped(F.col("path"))
    sha_esc = escape_local_name(F.translate(F.col("commit"), " ", "-"))
    parent_esc = escape_local_name(F.translate(F.col("parent_commit"), " ", "-"))
    spec_esc = F.concat(san_esc, F.lit("_commit-"), sha_esc)
    return events.withColumns(
        {
            "san_esc": san_esc,
            "spec_esc": spec_esc,
            "entity_id": F.concat(F.lit("gitprov:"), spec_esc),
            "base_id": F.concat(F.lit("gitprov:"), san_esc),
            # concat is null if any input is null — root versions get null
            "parent_entity_id": F.concat(
                F.lit("gitprov:"), san_esc, F.lit("_commit-"), parent_esc
            ),
            "commit_id": F.concat(F.lit("gitprov:commit-"), F.col("commit")),
        }
    )


# --------------------------------------------------------------------------
# Activities (P1; PS.java:302-319)
# --------------------------------------------------------------------------

def activity_triples(commits: DataFrame) -> DataFrame:
    C = commit_curie(F.col("commit"))
    commit_url = F.concat(
        F.lit("https://github.com/"), F.col("repo"), F.lit("/commit/"), F.col("commit")
    )
    return _emit(
        commits,
        [
            _t(C, "rdf:type", "prov:Activity", "iri"),
            _t(C, "prov:startedAtTime", xsd_ts(F.col("authored_at")), "xsd:dateTime"),
            _t(C, "foaf:homepage", commit_url, "xsd:anyURI"),
            _t(C, "rdfs:label", F.col("message"), "xsd:string"),
        ],
    )


# --------------------------------------------------------------------------
# Agents (P3; PS.java:332-365) — expects `contributions` column attached (A1)
# --------------------------------------------------------------------------

def agent_triples(contributors: DataFrame) -> DataFrame:
    A = agent_curie(F.col("login"))
    owner_url = F.concat(
        F.lit("https://github.com/"), F.split(F.col("repo"), "/").getItem(0)
    )
    return _emit(
        contributors,
        [
            _t(A, "rdf:type", "prov:Agent", "iri"),
            _t(A, "prov:type", F.col("type"), "xsd:string"),
            _t(A, "foaf:homepage", owner_url, "xsd:anyURI"),  # owner URL — quirk §5.3.6
            _t(A, "rdfs:label", F.col("login"), "xsd:string"),
            _t(A, "gitprov:contributions", F.col("contributions"), "xsd:int"),
            _t(A, "foaf:img", F.col("avatar_url"), "xsd:anyURI"),
            _t(A, "foaf:mbox", F.col("email"), "xsd:string"),    # null-filtered
            _t(A, "foaf:name", F.col("name"), "xsd:string"),     # null-filtered
        ],
    )


# --------------------------------------------------------------------------
# Associations (P5; PS.java:471-479) — expects resolved_login (J1)
# --------------------------------------------------------------------------

def association_triples(resolved_commits: DataFrame) -> DataFrame:
    df = resolved_commits.where(F.col("resolved_login").isNotNull())
    C = commit_curie(F.col("commit"))
    A = agent_curie(F.col("resolved_login"))
    AS = F.concat(F.lit("gitprov:association-"), F.col("commit"))
    return _emit(
        df,
        [
            _t(C, "prov:wasAssociatedWith", A, "iri"),
            _t(C, "prov:qualifiedAssociation", AS, "iri"),
            _t(AS, "rdf:type", "prov:Association", "iri"),
            _t(AS, "prov:agent", A, "iri"),
            _t(AS, "prov:hadRole", "authorship", "xsd:string"),
        ],
    )


# --------------------------------------------------------------------------
# Communications (J2; PS.java:513-519) — explode parents, no join needed
# --------------------------------------------------------------------------

def communication_triples(commits: DataFrame) -> DataFrame:
    df = commits.select("repo", "commit", F.explode("parents").alias("parent"))
    C = commit_curie(F.col("commit"))
    P = commit_curie(F.col("parent"))
    M = F.concat(F.lit("gitprov:information-"), F.col("parent"), F.lit("-"), F.col("commit"))
    return _emit(
        df,
        [
            _t(C, "prov:wasInformedBy", P, "iri"),
            _t(C, "prov:qualifiedCommunication", M, "iri"),
            _t(M, "rdf:type", "prov:Communication", "iri"),
            _t(M, "prov:activity", P, "iri"),
        ],
    )


# --------------------------------------------------------------------------
# Entities + specializationOf (P2, J5; PS.java:328-330, 378-394)
# --------------------------------------------------------------------------

def entity_triples(events: DataFrame) -> DataFrame:
    E = F.col("entity_id")
    B = F.col("base_id")
    return _emit(
        events,
        [
            _t(E, "rdf:type", "prov:Entity", "iri"),
            _t(E, "rdfs:label", F.col("path"), "xsd:string"),
            _t(E, "prov:specializationOf", B, "iri"),
        ],
    )


def base_entity_triples(events: DataFrame) -> DataFrame:
    df = events.where(F.col("is_first_version"))  # once per path (W3, quirk §5.3.4)
    B = F.col("base_id")
    return _emit(
        df,
        [
            _t(B, "rdf:type", "prov:Entity", "iri"),
            _t(B, "rdfs:label", F.col("path"), "xsd:string"),
        ],
    )


# --------------------------------------------------------------------------
# Generation / Invalidation / Usage (PS.java:405-462) — events + authored_at
# --------------------------------------------------------------------------

def generation_triples(events_ts: DataFrame) -> DataFrame:
    df = events_ts.where(F.col("status").isin("added", "modified"))
    E = F.col("entity_id")
    C = F.col("commit_id")
    G = F.concat(
        F.lit("gitprov:generation-"), F.col("san_esc"),
        F.lit("-"), F.col("commit"),
    )
    ts = xsd_ts(F.col("authored_at"))
    return _emit(
        df,
        [
            _t(E, "prov:wasGeneratedBy", C, "iri"),
            _t(E, "prov:qualifiedGeneration", G, "iri"),
            _t(G, "rdf:type", "prov:Generation", "iri"),
            _t(G, "prov:activity", C, "iri"),
            _t(G, "prov:atTime", ts, "xsd:dateTime"),
        ],
    )


def invalidation_triples(events_ts: DataFrame) -> DataFrame:
    df = events_ts.where(F.col("status") == "removed")
    E = F.col("entity_id")
    C = F.col("commit_id")
    I = F.concat(
        F.lit("gitprov:invalidation-"), F.col("san_esc"),
        F.lit("-"), F.col("commit"),
    )
    ts = xsd_ts(F.col("authored_at"))
    return _emit(
        df,
        [
            _t(E, "prov:wasInvalidatedBy", C, "iri"),
            _t(E, "prov:qualifiedInvalidation", I, "iri"),
            _t(I, "rdf:type", "prov:Invalidation", "iri"),
            _t(I, "prov:activity", C, "iri"),
            _t(I, "prov:atTime", ts, "xsd:dateTime"),
        ],
    )


def usage_triples(events_ts: DataFrame) -> DataFrame:
    df = events_ts.where(
        (F.col("status") == "modified") & F.col("parent_commit").isNotNull()
    )
    C = F.col("commit_id")
    PE = F.col("parent_entity_id")
    U = F.concat(
        F.lit("gitprov:usage-"), F.col("san_esc"),
        F.lit("-"), F.col("commit"), F.lit("-"), F.col("parent_commit"),
    )
    ts = xsd_ts(F.col("authored_at"))
    return _emit(
        df,
        [
            _t(C, "prov:used", PE, "iri"),
            _t(C, "prov:qualifiedUsage", U, "iri"),
            _t(U, "rdf:type", "prov:Usage", "iri"),
            _t(U, "prov:entity", PE, "iri"),
            _t(U, "prov:atTime", ts, "xsd:dateTime"),
        ],
    )


# --------------------------------------------------------------------------
# Derivations (PS.java:489-504) — modified events with diff stats attached
# --------------------------------------------------------------------------

def derivation_triples(modified_with_stats: DataFrame) -> DataFrame:
    df = modified_with_stats.where(F.col("parent_commit").isNotNull())
    E = F.col("entity_id")
    PE = F.col("parent_entity_id")
    C = F.col("commit_id")
    D = F.concat(
        F.lit("gitprov:derivation-"), F.col("spec_esc"),
        F.lit("-"), F.col("parent_commit"),
    )
    # quirk §5.3.5: hadGeneration/hadUsage reference ids that were never emitted
    G_bad = F.concat(F.lit("gitprov:generation-"), F.col("commit"))
    U_bad = F.concat(
        F.lit("gitprov:usage-"), F.col("commit"), F.lit("-"), F.col("parent_commit")
    )
    return _emit(
        df,
        [
            _t(E, "prov:wasDerivedFrom", PE, "iri"),
            _t(E, "prov:qualifiedDerivation", D, "iri"),
            _t(D, "rdf:type", "prov:Derivation", "iri"),
            _t(D, "prov:entity", PE, "iri"),
            _t(D, "prov:hadActivity", C, "iri"),
            _t(D, "prov:hadGeneration", G_bad, "iri"),
            _t(D, "prov:hadUsage", U_bad, "iri"),
            _t(D, "gitprov:additions", F.col("additions"), "xsd:int"),
            _t(D, "gitprov:changes", F.col("changes"), "xsd:int"),
            _t(D, "gitprov:deletions", F.col("deletions"), "xsd:int"),
        ],
    )
