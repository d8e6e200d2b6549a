"""The reference's six driver programs as argparse CLIs (SURVEY §3).

Reference defects fixed (SURVEY §8):
- #2  TrainTestSplit actually performs the documented split + writes.
- #5  cross_validate saves the *fitted* CrossValidatorModel.
- #7  predict defaults to the test split, not train.
- #10 predict never requires the label column; labels are indexed only
      for evaluation, with handleInvalid='keep'.
- §4.3.1 the scored DataFrame is cached before metrics (one transform,
  one confusion-matrix job — not 4 recomputations).
- §4.3.2 no ``repartition(1)``: output keeps natural parallelism, with an
  optional ``--target-files`` coalesce for small-file control.

XGBoost (SURVEY §2.1 R18/R20): ``fit --classifier xgb`` is the true
parity path — ``xgboost.spark.SparkXGBClassifier`` with the reference's
params mapped 1:1 (XGB_PARAMS) plus the native-booster gain report with
the reference's print defect fixed — behind an import guard, since this
environment ships no xgboost package; ``gbt`` remains the documented
substitute where it is absent. The scopt option surface maps 1:1 to
argparse flags (``TrainTestSplit.scala:17-40``).

Usage:
  python -m spark_ml_pipelines_example_spark.ml.jobs split \\
      --input iris.csv --train tr.parquet --test te.parquet [--train-percent 0.7]
  python -m spark_ml_pipelines_example_spark.ml.jobs fit \\
      --train tr.parquet --model-dir m/ [--use-pipeline] [--overwrite]
  python -m spark_ml_pipelines_example_spark.ml.jobs predict \\
      --model-dir m/ --input te.parquet --output pred.parquet [--overwrite]
  python -m spark_ml_pipelines_example_spark.ml.jobs cross-validate \\
      --train tr.parquet --model-dir m/ [--overwrite]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.session import get_spark
from ..sources.io import make_save_mode
from ..sources.schemas import IRIS_PREDICTORS, IRIS_SCHEMA, IRIS_TARGET
from .metrics import ModelFitMetrics, random_forest_report

LABEL_COL = "label"
FEATURES_COL = "features"
PREDICTION_COL = "prediction"
PREDICTED_LABEL_COL = "prediction_species"

# reference no_pipeline/ModelFit.scala:107-110
RF_PARAMS = dict(numTrees=64, maxDepth=4, maxBins=64, minInfoGain=0.01, seed=42)


def train_test_split(
    spark: SparkSession,
    input_path: str,
    train_path: str,
    test_path: str,
    train_percent: float = 0.7,
    overwrite: bool = False,
    seed: int = 42,
) -> tuple[int, int]:
    """Reference ``TrainTestSplit.scala:42-53`` documented behavior (the
    checked-in body stops after the read — SURVEY §8.2)."""
    if train_path == test_path:
        raise ValueError("train and test paths must differ")  # scopt require, :58
    df = spark.read.schema(IRIS_SCHEMA).csv(input_path)
    train, test = df.randomSplit([train_percent, 1.0 - train_percent], seed=seed)
    mode = make_save_mode(overwrite)
    train.write.mode(mode).parquet(train_path)
    test.write.mode(mode).parquet(test_path)
    return train.count(), test.count()


# reference xgboost_pipeline/ModelFit.scala:39-49, mapped 1:1 onto
# xgboost.spark.SparkXGBClassifier parameter names:
#   setObjective("multi:softprob") → objective, setEta(0.3) → learning_rate,
#   setNumClass(3) → num_class, setMaxDepth(3) → max_depth,
#   setMaxBins(32) → max_bin, setNumRound(100) → n_estimators,
#   setNumWorkers(1) → num_workers, setNthread(1) → nthread.
XGB_PARAMS = dict(
    objective="multi:softprob",
    learning_rate=0.3,
    num_class=3,
    max_depth=3,
    max_bin=32,
    n_estimators=100,
    num_workers=1,
    nthread=1,
)


def xgboost_available() -> bool:
    try:
        import xgboost.spark  # noqa: F401

        return True
    except ImportError:
        return False


def build_pipeline(train: DataFrame, predictors=None, target: str = IRIS_TARGET, classifier: str = "rf"):
    """StringIndexer → VectorAssembler → classifier → IndexToString, the
    reference's 4-stage pipeline (``pipeline/ModelFit.scala:58-83``).
    ``classifier='xgb'`` is the true-XGBoost parity path (reference R18,
    xgboost_pipeline/ModelFit.scala) behind an import guard — the
    distributed ``xgboost.spark.SparkXGBClassifier`` with the reference's
    params mapped 1:1 (XGB_PARAMS); unavailable in environments without
    the xgboost package, where 'gbt' remains the documented substitute."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import GBTClassifier, RandomForestClassifier
    from pyspark.ml.feature import IndexToString, StringIndexer, VectorAssembler

    predictors = list(predictors or IRIS_PREDICTORS)
    indexer = (
        StringIndexer(stringOrderType="frequencyDesc", handleInvalid="keep")
        .setInputCol(target)
        .setOutputCol(LABEL_COL)
    )
    indexer_model = indexer.fit(train)
    assembler = VectorAssembler(inputCols=predictors, outputCol=FEATURES_COL)
    if classifier == "gbt":
        clf = GBTClassifier(
            labelCol=LABEL_COL, featuresCol=FEATURES_COL, maxIter=20, maxDepth=3, seed=42
        )
    elif classifier == "xgb":
        if not xgboost_available():
            raise ImportError(
                "classifier='xgb' needs the xgboost package "
                "(pip install xgboost); use 'gbt' as the documented "
                "substitute (SURVEY §2.1 R18)"
            )
        from xgboost.spark import SparkXGBClassifier

        clf = SparkXGBClassifier(
            label_col=LABEL_COL, features_col=FEATURES_COL, **XGB_PARAMS
        )
    else:
        clf = RandomForestClassifier(
            labelCol=LABEL_COL, featuresCol=FEATURES_COL, **RF_PARAMS
        )
    decoder = IndexToString(
        inputCol=PREDICTION_COL,
        outputCol=PREDICTED_LABEL_COL,
        labels=indexer_model.labels,
    )
    return Pipeline(stages=[indexer_model, assembler, clf, decoder])


def xgboost_report(model, input_cols, importance_type: str = "gain") -> str:
    """Reference R20 XGBoost metrics report (package.scala:118-146) with
    its defect FIXED: the reference prints ``model.getObjective`` for all
    six metadata lines (ETA/Alpha/NumClasses/MaxBins/MaxDepth all show
    the objective string); here each line reports its own parameter. The
    feature-importance block is the native booster's per-feature gain
    (``get_booster().get_score(importance_type='gain')``), sorted
    descending and padded like the reference's formatter."""
    booster = model.get_booster()
    lines = ["XGBoost Classification Model Metrics: "]
    lines.append(f"Objective:         {model.getOrDefault('objective')}")
    lines.append(f"ETA:               {model.getOrDefault('learning_rate')}")
    lines.append(f"Number of Classes: {model.getOrDefault('num_class')}")
    lines.append(f"Maximum Bins:      {model.getOrDefault('max_bin')}")
    lines.append(f"Maximum Depth:     {model.getOrDefault('max_depth')}")
    scores = booster.get_score(importance_type=importance_type)
    # booster names features f0..fn in assembler order
    named = {
        input_cols[int(k[1:])] if k.startswith("f") else k: v
        for k, v in scores.items()
    }
    width = max((len(c) for c in named), default=0)
    lines.append("Feature Importances: ")
    for k, v in sorted(named.items(), key=lambda kv: -kv[1]):
        lines.append(f"\t{k}{' ' * (width - len(k))} -> {v}")
    return "\n".join(lines)


def fit(
    spark: SparkSession,
    train_path: str,
    model_dir: str,
    overwrite: bool = False,
    classifier: str = "rf",
) -> str:
    from pyspark.ml.classification import RandomForestClassificationModel

    train = spark.read.parquet(train_path)
    pipeline = build_pipeline(train, classifier=classifier)
    model = pipeline.fit(train)
    writer = model.write().overwrite() if overwrite else model.write()
    writer.save(model_dir)

    scored = model.transform(train).cache()  # §4.3.1: one transform, cached
    report = str(ModelFitMetrics.calculate(scored))
    clf_model = model.stages[2]
    if isinstance(clf_model, RandomForestClassificationModel):
        report += "\n" + random_forest_report(clf_model)
    elif classifier == "xgb":
        report += "\n" + xgboost_report(clf_model, IRIS_PREDICTORS)
    scored.unpersist()
    return report


# Per-stage subdirectory names under <model_dir>, mirroring the reference's
# four NoPipelineModelFitConfig paths (no_pipeline/ModelFit.scala defaults).
STAGE_DIRS = ("string_indexer", "vector_assembler", "random_forest", "index_to_string")


def persist_pipeline_stage(stage, path: str, overwrite: bool = False) -> None:
    """Reference R21 ``persistPipelineStage`` (no_pipeline/ModelFit.scala:
    143-152): save one pipeline stage — fitted or unfitted — on its own,
    honoring the overwrite flag."""
    writer = stage.write().overwrite() if overwrite else stage.write()
    writer.save(path)


def fit_no_pipeline(
    spark: SparkSession,
    train_path: str,
    model_dir: str,
    overwrite: bool = False,
) -> str:
    """Reference ``no_pipeline/ModelFit.scala`` steps 4-14: fit and persist
    each stage INDIVIDUALLY (StringIndexerModel and
    RandomForestClassificationModel fitted; VectorAssembler and
    IndexToString unfitted transformers) under ``<model_dir>/<stage>``,
    instead of one composed PipelineModel directory. Same model math as
    ``fit`` — only the persistence layout differs."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import IndexToString, StringIndexer, VectorAssembler

    train = spark.read.parquet(train_path)
    base = model_dir.rstrip("/")

    indexer = (
        StringIndexer(stringOrderType="frequencyDesc", handleInvalid="keep")
        .setInputCol(IRIS_TARGET)
        .setOutputCol(LABEL_COL)
    )
    indexer_model = indexer.fit(train)
    persist_pipeline_stage(indexer_model, f"{base}/string_indexer", overwrite)

    assembler = VectorAssembler(inputCols=list(IRIS_PREDICTORS), outputCol=FEATURES_COL)
    persist_pipeline_stage(assembler, f"{base}/vector_assembler", overwrite)

    decoder = IndexToString(
        inputCol=PREDICTION_COL,
        outputCol=PREDICTED_LABEL_COL,
        labels=indexer_model.labels,
    )
    persist_pipeline_stage(decoder, f"{base}/index_to_string", overwrite)

    assembled = assembler.transform(indexer_model.transform(train))
    rf = RandomForestClassifier(labelCol=LABEL_COL, featuresCol=FEATURES_COL, **RF_PARAMS)
    rf_model = rf.fit(assembled)
    persist_pipeline_stage(rf_model, f"{base}/random_forest", overwrite)

    scored = decoder.transform(rf_model.transform(assembled)).cache()
    report = str(ModelFitMetrics.calculate(scored))
    report += "\n" + random_forest_report(rf_model)
    scored.unpersist()
    return report


def predict_no_pipeline(
    spark: SparkSession,
    model_dir: str,
    input_path: str,
    output_path: str,
    overwrite: bool = False,
) -> str | None:
    """Reference ``no_pipeline/Predict.scala``: load the four stages
    individually and chain their transforms by hand."""
    from pyspark.ml.classification import RandomForestClassificationModel
    from pyspark.ml.feature import IndexToString, StringIndexerModel, VectorAssembler

    base = model_dir.rstrip("/")
    indexer_model = StringIndexerModel.load(f"{base}/string_indexer")
    assembler = VectorAssembler.load(f"{base}/vector_assembler")
    rf_model = RandomForestClassificationModel.load(f"{base}/random_forest")
    decoder = IndexToString.load(f"{base}/index_to_string")

    test = spark.read.parquet(input_path)
    scored = decoder.transform(rf_model.transform(assembler.transform(test)))
    out = scored.drop(FEATURES_COL, "rawPrediction", "probability")
    out.write.mode(make_save_mode(overwrite)).parquet(output_path)

    if IRIS_TARGET in test.columns:
        written = spark.read.parquet(output_path)
        labeled = indexer_model.transform(written.drop(LABEL_COL))
        return str(ModelFitMetrics.calculate(labeled))
    return None


def predict(
    spark: SparkSession,
    model_dir: str,
    input_path: str,
    output_path: str,
    overwrite: bool = False,
    target_files: int | None = None,
) -> str | None:
    """Load → transform → write → (if labeled) evaluate. Scoring never
    requires the target column (SURVEY §8.10); metrics come from the
    written output read back, so nothing recomputes (§4.3.1)."""
    from pyspark.ml import PipelineModel

    model = PipelineModel.load(model_dir)
    test = spark.read.parquet(input_path)
    scored = model.transform(test)
    out = scored.drop(FEATURES_COL, "rawPrediction", "probability")
    if target_files is not None:
        out = out.coalesce(target_files)
    out.write.mode(make_save_mode(overwrite)).parquet(output_path)

    if IRIS_TARGET in test.columns:
        written = spark.read.parquet(output_path)
        indexer_model = model.stages[0]
        labeled = indexer_model.transform(written.drop(LABEL_COL))
        return str(ModelFitMetrics.calculate(labeled))
    return None


def cross_validate(
    spark: SparkSession,
    train_path: str,
    model_dir: str,
    overwrite: bool = False,
    num_folds: int = 3,
    parallelism: int = 4,
    full_grid: bool = False,
) -> str:
    """Reference ``cross_validation/ModelFit.scala:85-113``: param grid ×
    3 folds, accuracy metric, parallelism 4; saves the FITTED model
    (fixing defect §8.5). Default grid 2×2 (the reference's 36-combo
    sweep is an iris-scale extravagance, not a semantic);
    ``full_grid=True`` reproduces the reference's literal
    maxDepth×maxBins×numTrees = 4×3×3 grid (ModelFit.scala:85-89) for
    exact parity runs."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    train = spark.read.parquet(train_path)
    pipeline = build_pipeline(train)
    clf: RandomForestClassifier = pipeline.getStages()[2]
    if full_grid:  # reference cross_validation/ModelFit.scala:85-89
        grid = (
            ParamGridBuilder()
            .addGrid(clf.maxDepth, [3, 4, 5, 6])
            .addGrid(clf.maxBins, [16, 32, 64])
            .addGrid(clf.numTrees, [32, 64, 128])
            .build()
        )
    else:
        grid = (
            ParamGridBuilder()
            .addGrid(clf.numTrees, [16, 64])
            .addGrid(clf.maxDepth, [3, 4])
            .build()
        )
    evaluator = MulticlassClassificationEvaluator(
        labelCol=LABEL_COL, predictionCol=PREDICTION_COL, metricName="accuracy"
    )
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        parallelism=parallelism,
        seed=42,
    )
    cv_model = cv.fit(train)
    writer = cv_model.write().overwrite() if overwrite else cv_model.write()
    writer.save(model_dir)
    best = max(cv_model.avgMetrics)
    return f"bestAvgAccuracy : {best:.6f}\nnumParamMaps : {len(grid)}\nnumFolds : {num_folds}"


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="spark_ml_pipelines_example_spark.ml")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("split")
    p.add_argument("--input", required=True)
    p.add_argument("--train", required=True)
    p.add_argument("--test", required=True)
    p.add_argument("--train-percent", type=float, default=0.7)
    p.add_argument("--overwrite", action="store_true")

    p = sub.add_parser("fit")
    p.add_argument("--train", required=True)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--classifier", choices=["rf", "gbt", "xgb"], default="rf")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument(
        "--per-stage",
        action="store_true",
        help="persist each stage individually (reference no_pipeline flavor)",
    )

    p = sub.add_parser("predict")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--target-files", type=int, default=None)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument(
        "--per-stage",
        action="store_true",
        help="load the four individually-persisted stages (no_pipeline flavor)",
    )

    p = sub.add_parser("cross-validate")
    p.add_argument("--train", required=True)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument(
        "--full-grid",
        action="store_true",
        help="reference-parity 4x3x3 maxDepth/maxBins/numTrees sweep "
        "(cross_validation/ModelFit.scala:85-89) instead of the 2x2 default",
    )

    args = ap.parse_args(argv)
    spark = get_spark(app_name=f"ml-{args.cmd}")
    if args.cmd == "split":
        n_tr, n_te = train_test_split(
            spark, args.input, args.train, args.test, args.train_percent, args.overwrite
        )
        print(f"train rows : {n_tr}\ntest rows : {n_te}")
    elif args.cmd == "fit":
        if args.per_stage:
            print(fit_no_pipeline(spark, args.train, args.model_dir, args.overwrite))
        else:
            print(fit(spark, args.train, args.model_dir, args.overwrite, args.classifier))
    elif args.cmd == "predict":
        if args.per_stage:
            report = predict_no_pipeline(
                spark, args.model_dir, args.input, args.output, args.overwrite
            )
        else:
            report = predict(
                spark, args.model_dir, args.input, args.output, args.overwrite, args.target_files
            )
        print(report or "scored (no labels present; metrics skipped)")
    elif args.cmd == "cross-validate":
        print(
            cross_validate(
                spark,
                args.train,
                args.model_dir,
                args.overwrite,
                full_grid=args.full_grid,
            )
        )


if __name__ == "__main__":
    main()
