"""Training-data corpus operators (dedup, similarity, text analysis, multimodal).

Beyond the reference's PROV operators (SURVEY.md §2), a KG/training-data
pipeline at 10^12-file scale needs corpus hygiene: exact + near dedup,
embedding similarity search, text quality signals, and multimodal-column
plumbing. Everything here is DataFrame-API / whole-stage-codegen friendly;
Python appears only inside Arrow-batched pandas UDFs (multimodal decode).

Every operator has a DuckDB-oracle twin in /root/repo/__spark_entry__.py —
the hash functions in `hashing.py` are chosen so Spark built-ins and DuckDB
SQL produce bit-identical values.
"""
