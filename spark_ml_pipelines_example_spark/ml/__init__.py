"""The reference's ML-pipeline surface, rebuilt on pyspark.ml.

Reference (``src/main/scala/com/github/robertwsmith/ml_pipelines/``) ships
six scopt CLIs: train/test split, {no_pipeline, pipeline,
cross_validation, xgboost*} × {ModelFit, Predict}. Here: ``jobs.py``
(argparse CLIs: split / fit / predict / cross_validate, with the
reference's defects fixed — see SURVEY §8) and ``metrics.py`` (the
evaluator surface, computed from ONE confusion-matrix job instead of the
reference's 4× recomputation, SURVEY §4.3.1)."""
