"""spark_ml_pipelines_example_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``RobertWSmith/spark-ml-pipelines-example`` (a Spark MLlib
pipeline tutorial: train/test split, StringIndexer → VectorAssembler →
RandomForest pipelines, cross-validation, evaluation — see
reference ``src/main/scala/com/github/robertwsmith/ml_pipelines/``),
widened into a general relational + streaming + ML + LLM-data-pipeline
engine designed for 100 TB scale:

- ``plans``      — SparkSession factory (AQE/Arrow/UTC), explain helpers
- ``sources``    — schema-enforced readers and save-mode-aware writers
- ``operators``  — composite operators Spark lacks natively (as-of join,
                   dedup families, similarity search, sessionization)
- ``functions``  — column-expression builders (cosine kernel, text stats)
- ``queries``    — the declared query inventory (SURVEY.md §2.2) with
                   DuckDB oracle SQL twins
- ``streaming``  — Structured Streaming twins of the batch semantics
- ``ml``         — the reference's ML pipeline surface (split / fit /
                   predict / cross-validate / evaluate) on pyspark.ml

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection, and whole-stage codegen; Python UDFs appear only as
Arrow-vectorized pandas UDFs and only where built-ins cannot express the
semantics.
"""

__version__ = "0.1.0"
