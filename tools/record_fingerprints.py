#!/usr/bin/env python
"""Round-close ledger step: refresh tools/checked_fingerprints.json.

The rotation in queries/registry.py treats a driver correctness row as
valid only while the oracle it certified is the oracle the registry
declares today. This tool records, for every query with a GOOD SQL-class
row in any committed CORRECTNESS_r*.json, the md5 fingerprint of the
oracle as it stands NOW.

Run it exactly at round close — i.e. right after the external driver has
hash-checked the current code — so "current fingerprint" and
"fingerprint as checked" coincide for the fresh window. Existing entries
for queries NOT in the latest artifact are left untouched (their oracle
may have drifted since their row; overwriting would forge freshness).

Usage: python tools/record_fingerprints.py [--bootstrap]
  --bootstrap  also record fingerprints for good rows from OLDER
               artifacts that have no entry yet (used once, round 4, on
               the strength of the r3 selfcheck: 307/307 current oracles
               hash-match at sf0.01 and sf0.1, judge-sampled 20/20).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from spark_ml_pipelines_example_spark.queries.registry import (  # noqa: E402
    REGISTRY,
    load_all,
    oracle_fingerprint,
)

SNAPSHOT = ROOT / "tools" / "checked_fingerprints.json"


def good_sql_names(artifact: dict) -> set[str]:
    return {
        n
        for n, row in artifact.items()
        if isinstance(row, dict)
        and row.get("hash_match") is True
        and row.get("err") is None
    }


def main() -> None:
    bootstrap = "--bootstrap" in sys.argv
    load_all()

    artifacts = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    if not artifacts:
        print("no CORRECTNESS_r*.json artifacts; nothing to record")
        return

    try:
        snapshot: dict[str, str] = dict(json.loads(SNAPSHOT.read_text()))
    except (OSError, ValueError):
        snapshot = {}

    latest = good_sql_names(json.loads(artifacts[-1].read_text()))
    older: set[str] = set()
    for p in artifacts[:-1]:
        older |= good_sql_names(json.loads(p.read_text()))

    to_record = set(latest)
    if bootstrap:
        to_record |= {n for n in older if n not in snapshot}

    updated = 0
    for name in sorted(to_record):
        spec = REGISTRY.get(name)
        if spec is None or spec.oracle is None:
            continue
        fp = oracle_fingerprint(spec)
        if snapshot.get(name) != fp:
            snapshot[name] = fp
            updated += 1

    SNAPSHOT.write_text(json.dumps(snapshot, indent=1, sort_keys=True) + "\n")
    print(f"recorded {updated} fingerprint(s); snapshot now {len(snapshot)} entries")


if __name__ == "__main__":
    main()
