"""PySpark-native knowledge-graph construction engine.

A brand-new, Spark-first re-creation of the query and data-processing
capabilities of rdwornik/corporate-knowledge-extractor (reference at
/root/reference, read-only): staged per-document extraction -> alignment ->
synthesis of structured knowledge records -> dedup / link / canonicalize ->
materialized node + edge tables, expressed as lazy DataFrame plans over an
Iceberg-style table of source-code repositories
``(repo, path, commit, lang, content)``.

The reference is a single-process, eager, row-at-a-time Python pipeline
(see SURVEY.md). Nothing here is a port: every stage is a pure
``DataFrame -> DataFrame`` function built from pyspark.sql built-ins, with
vectorized pandas/Arrow UDFs only where per-document sequential state or
batched custom logic genuinely requires them.
"""

__version__ = "0.1.0"

from corporate_knowledge_extractor_spark.session import get_spark  # noqa: F401
