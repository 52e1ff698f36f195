"""Golden-string id minting (SURVEY.md §2.8 F1-F5) + Spark/Python mirror lockstep."""

from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark import iri

ADVERSARIAL = [
    "src/main/App.java",
    "docs/read me.txt",
    "a.b/c d.e",
    "win\\path.txt",
    "noext",
    "many   spaces",
    "dots...everywhere",
    "mixed/sep\\and. space",
    "unicode-café.txt",
]


def test_golden_ids():
    # PS.java:538-540: [/\. ] and backslash all become '-'
    assert iri.py_san("src/main/App.java") == "file-src-main-App-java"
    assert iri.py_san("docs/read me.txt") == "file-docs-read-me-txt"
    assert iri.py_san("a.b/c d.e") == "file-a-b-c-d-e"
    assert iri.py_san("win\\path.txt") == "file-win-path-txt"
    # PS.java:528-530
    assert (
        iri.py_spec("src/main/App.java", "abc123")
        == "file-src-main-App-java_commit-abc123"
    )
    # PS.java:367-369
    assert iri.py_agent_curie("bob smith") == "gitprov:bob-smith"
    # escaping canonicalization (DESIGN.md §3)
    assert iri.py_escape_local_name("café") == "caf_"
    assert iri.py_entity_curie("unicode-café.txt", "s1") == (
        "gitprov:file-unicode-caf_-txt_commit-s1"
    )


def test_spark_python_mirrors_agree(spark):
    df = spark.createDataFrame(
        [(p, "sha1234") for p in ADVERSARIAL], "path string, sha string"
    )
    rows = df.select(
        "path",
        iri.entity_curie(F.col("path"), F.col("sha")).alias("e"),
        iri.base_entity_curie(F.col("path")).alias("b"),
        iri.agent_curie(F.col("path")).alias("a"),
    ).collect()
    for r in rows:
        assert r.e == iri.py_entity_curie(r.path, "sha1234")
        assert r.b == iri.py_base_entity_curie(r.path)
        assert r.a == iri.py_agent_curie(r.path)


def test_mirrors_agree_fuzz_unicode(spark):
    """Fuzz the translate-fast-path/regexp-fallback split in
    escape_local_name: for arbitrary unicode (ASCII-only rows take
    translate, others the regex engine) the Spark expression must equal the
    python mirror char-for-char."""
    import random

    rng = random.Random(99)
    alphabets = [
        "abcXYZ019._-", "/\\. ", "!@#$%^&*()+=[]{};:'\",<>?|`~",
        "éüß中文ру", "\U0001f600\U0001f680",
        "\t\n\r", "a b c", "\x00a\x00",  # NUL stays on the ASCII fast path
    ]
    cases = set()
    for _ in range(300):
        k = rng.randrange(0, 12)
        s = "".join(rng.choice(rng.choice(alphabets)) for _ in range(k))
        if "\n" not in s and "\r" not in s:  # parquet/NT-safe inputs
            cases.add(s)
    cases = sorted(cases)
    df = spark.createDataFrame([(c,) for c in cases], "path string")
    rows = df.select(
        "path",
        iri.escape_local_name(F.col("path")).alias("esc"),
        iri.san(F.col("path")).alias("san"),
    ).collect()
    for r in rows:
        assert r.esc == iri.py_escape_local_name(r.path), repr(r.path)
        assert r.san == iri.py_san(r.path), repr(r.path)
