"""dirhash_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference (SmartDataInnovationLab/dirhash: distributed content-addressed
directory hashing — see /root/reference/dirhash.py), re-expressed on the
Spark DataFrame/Catalyst stack and extended with a general relational
surface plus LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
  session.py    SparkSession factory + runtime conf normalization
  catalog.py    named-table access over the driver parquet fixtures
  registry.py   query registry ({name: fn, oracle_sql}) backing __spark_entry__
  operators/    relational + LLM-pipeline operators (SURVEY.md §2)
  dirhash/      reference-parity pipeline (v1 hash codec, chunking, fold)
  streaming/    structured-streaming operators (windows, watermark dedup)
  multimodal/   binary-column plumbing (decode stubs, frame sampling)
"""

__version__ = "0.1.0"
