"""Model-evaluation metrics (reference R13/R14, ``package.scala:46-79``).

The reference's ``ModelFitMetrics.calculate`` launches one
MulticlassClassificationEvaluator job per metric over an uncached scored
DataFrame — four full recomputations of the transform
(``package.scala:70-78``, SURVEY §4.3.1). Here all four metrics (accuracy,
weighted f1 / precision / recall) derive from ONE confusion-matrix
aggregation: groupBy(label, prediction).count() is a single distributed
job whose result (numClasses² rows) is trivially small on the driver.

``RandomForestMetricsReport`` mirrors the reference's report
(``package.scala:81-110``) with the corrected fields from the test-side
fix (``src/test/.../package.scala:38-78``): numClasses / numFeatures /
totalNumNodes instead of the thrice-pasted getNumTrees (SURVEY §8.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METRIC_NAMES = ("accuracy", "f1", "weightedPrecision", "weightedRecall")


@dataclass
class ModelFitMetrics:
    """Four-metric evaluation computed from one confusion-matrix job."""

    metrics: dict[str, float] = field(default_factory=dict)

    @classmethod
    def calculate(
        cls,
        scored: DataFrame,
        label_col: str = "label",
        prediction_col: str = "prediction",
    ) -> "ModelFitMetrics":
        cm = (
            scored.groupBy(
                F.col(label_col).alias("label"), F.col(prediction_col).alias("pred")
            )
            .agg(F.count("*").alias("n"))
            .collect()
        )
        total = sum(r.n for r in cm)
        labels = sorted({r.label for r in cm} | {r.pred for r in cm})
        label_n = {c: sum(r.n for r in cm if r.label == c) for c in labels}
        pred_n = {c: sum(r.n for r in cm if r.pred == c) for c in labels}
        diag = {c: sum(r.n for r in cm if r.label == c and r.pred == c) for c in labels}

        accuracy = sum(diag.values()) / total if total else 0.0
        w_prec = w_rec = w_f1 = 0.0
        for c in labels:
            prec = diag[c] / pred_n[c] if pred_n[c] else 0.0
            rec = diag[c] / label_n[c] if label_n[c] else 0.0
            f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
            weight = label_n[c] / total if total else 0.0
            w_prec += weight * prec
            w_rec += weight * rec
            w_f1 += weight * f1
        return cls(
            metrics={
                "accuracy": accuracy,
                "f1": w_f1,
                "weightedPrecision": w_prec,
                "weightedRecall": w_rec,
            }
        )

    def __str__(self) -> str:
        # padded report, reference package.scala:60-68
        width = max(len(k) for k in METRIC_NAMES)
        lines = [f"{k.ljust(width)} : {self.metrics[k]:.6f}" for k in METRIC_NAMES]
        return "\n".join(lines)


def random_forest_report(model) -> str:
    """Feature-importance + structure report for a fitted
    RandomForestClassificationModel — corrected fields (SURVEY §8.3)."""
    fi = model.featureImportances
    pairs = sorted(
        ((f"feature_{i}", fi[i]) for i in range(fi.size)),
        key=lambda kv: (-kv[1], kv[0]),
    )
    width = max(len(k) for k, _ in pairs) if pairs else 1
    lines = [
        f"Number of Classes     : {model.numClasses}",
        f"Number of Features    : {model.numFeatures}",
        f"Total Number of Nodes : {model.totalNumNodes}",
        f"Number of Trees       : {model.getNumTrees}",
        "Feature Importances (desc):",
    ]
    lines += [f"  {k.ljust(width)} : {v:.6f}" for k, v in pairs]
    return "\n".join(lines)
