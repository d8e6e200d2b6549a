#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/<dir>/.

    SPARK_GRAFT_SF_DIR=... python tools/dump_plans.py r11 before q_a,q_b

writes plans/r11/q_a_before.txt etc. (the optimization-round evidence
trail: the judge checks plan claims against these files)."""
from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    subdir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    out = ROOT / "plans" / subdir
    out.mkdir(parents=True, exist_ok=True)

    from spark_ml_pipelines_example_spark.operators._cache import release_tracked
    from spark_ml_pipelines_example_spark.plans.session import get_spark
    from spark_ml_pipelines_example_spark.queries.registry import load_all

    registry = load_all()
    spark = get_spark(app_name="dump_plans")
    for n in names:
        df = registry[n].fn(spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{n}_{tag}.txt").write_text(plan)
        print(f"wrote plans/{subdir}/{n}_{tag}.txt ({len(plan)} bytes)")
        release_tracked()


if __name__ == "__main__":
    main()
