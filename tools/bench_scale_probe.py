"""Full-headline scale probe: stage a referentially consistent ~sf1
corpus (every fixture table, FULL schemas, 10× sf0.1 via key-shifted
replicas) and run the ENTIRE bench headline against it — per-query scale
factors for all headline queries at once, not just the operators with
bespoke probes.

Replication rules (replica r, r=0 = identity):
- region / nation: copied as-is — they are dimensions shared by every
  replica (nationkeys stay 0-24 so customer/supplier joins stay valid).
- customer:  c_custkey  + r·10_000_000
- supplier:  s_suppkey  + r·1_000_000
- part:      p_partkey  + r·10_000_000
- orders:    o_orderkey + r·100_000_000, o_custkey shifted like customer
- lineitem:  l_orderkey like orders, l_partkey like part, l_suppkey like
  supplier — foreign keys stay consistent, so every join produces 10
  isomorphic copies of the sf0.1 result structure.
- events:    event_id + r·100_000_000, user_id + r·10_000_000
  (timestamps repeat: the event-time spine is unchanged, volumes 10×).
- documents: replica tokens suffixed `_r{r}` (shingle/token sets
  disjoint across replicas — the same perturbation as
  tools/scale_probe_sf1.py, so dedup/text operators cannot cheat).
- embeddings: seeded signed permutation per replica (an isometry:
  within-replica cosines exact, cross-replica at background level).

Usage:
    python tools/bench_scale_probe.py stage   # build .scratch/bench_probe_r10/sf1
    SPARK_GRAFT_SF_DIR=/root/repo/.scratch/bench_probe_r10/sf1 python bench.py
    python tools/bench_scale_probe.py report  # sf0.1 vs sf1 table

`report` compares the probe run (BENCH_detail.json right after the probe
bench) against a committed sf0.1 detail (pass its path as argv[2],
default the git HEAD copy) and prints the markdown summary recorded in
BASELINE.md. Restore the committed BENCH_detail.json afterwards
(`git checkout BENCH_detail.json`).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

SF01 = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("SPARK_GRAFT_PROBE_REPLICAS", "10"))
# Key the probe dir by the replica count (like probe_window_skew's
# _r{N} suffix): the per-table exists-checks are a resume cache, and
# without the key a later run at a different factor would silently
# reuse tables staged at the old one. bench.py parses the SF from the
# trailing "sf<float>" path component, so the factor rides there.
PROBE = f"/root/repo/.scratch/bench_probe_r{REPLICAS}/sf{REPLICAS / 10:g}"

C_OFF, S_OFF, P_OFF, O_OFF, E_OFF, U_OFF = (
    10_000_000, 1_000_000, 10_000_000, 100_000_000, 100_000_000, 10_000_000
)


def _stage(con, table: str, replace: str | None) -> None:
    out = f"{PROBE}/{table}.parquet"
    if os.path.exists(out):
        return
    if replace is None:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF01}/{table}.parquet')) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        return
    parts = [
        f"SELECT * REPLACE ({replace.format(r=r)}) "
        f"FROM read_parquet('{SF01}/{table}.parquet')"
        for r in range(REPLICAS)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}' (FORMAT PARQUET)"
    )


def stage() -> None:
    os.makedirs(PROBE, exist_ok=True)
    con = duckdb.connect()
    _stage(con, "region", None)
    _stage(con, "nation", None)
    _stage(con, "customer", "c_custkey + {r}::BIGINT * %d AS c_custkey" % C_OFF)
    _stage(con, "supplier", "s_suppkey + {r}::BIGINT * %d AS s_suppkey" % S_OFF)
    _stage(con, "part", "p_partkey + {r}::BIGINT * %d AS p_partkey" % P_OFF)
    _stage(
        con,
        "orders",
        "o_orderkey + {r}::BIGINT * %d AS o_orderkey, o_custkey + {r}::BIGINT * %d AS o_custkey"
        % (O_OFF, C_OFF),
    )
    _stage(
        con,
        "lineitem",
        "l_orderkey + {r}::BIGINT * %d AS l_orderkey, l_partkey + {r}::BIGINT * %d AS l_partkey, "
        "l_suppkey + {r}::BIGINT * %d AS l_suppkey" % (O_OFF, P_OFF, S_OFF),
    )
    _stage(
        con,
        "events",
        "event_id + {r}::BIGINT * %d AS event_id, user_id + {r}::BIGINT * %d AS user_id"
        % (E_OFF, U_OFF),
    )
    # documents: token-suffix perturbation (cross-replica token sets
    # disjoint) — mirrors tools/scale_probe_sf1.py.
    out = f"{PROBE}/documents.parquet"
    if not os.path.exists(out):
        n_docs = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{SF01}/documents.parquet')"
        ).fetchone()[0]
        parts = []
        for r in range(REPLICAS):
            if r == 0:
                parts.append(
                    f"SELECT * FROM read_parquet('{SF01}/documents.parquet')"
                )
            else:
                parts.append(
                    f"SELECT doc_id + {r * n_docs} AS doc_id, "
                    f"array_to_string(list_transform(string_split(text, ' '), "
                    f"x -> x || '_r{r}'), ' ') AS text, lang, source, "
                    f"CAST(strlen(array_to_string(list_transform(string_split(text, ' '), "
                    f"x -> x || '_r{r}'), ' ')) AS BIGINT) AS n_chars "
                    f"FROM read_parquet('{SF01}/documents.parquet')"
                )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}' (FORMAT PARQUET)"
        )
    # embeddings: seeded signed permutation per replica (isometry).
    out = f"{PROBE}/embeddings.parquet"
    if not os.path.exists(out):
        emb = con.execute(
            f"SELECT vec_id, label, embedding FROM "
            f"read_parquet('{SF01}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
        import pyarrow as pa
        import pyarrow.parquet as pq

        n_vec = len(emb)
        base = np.array([row[2] for row in emb], dtype=np.float32)
        dim = base.shape[1]
        vec_ids, labels, vecs = [], [], []
        for r in range(REPLICAS):
            rng = np.random.RandomState(1000 + r)
            perm = np.arange(dim) if r == 0 else rng.permutation(dim)
            signs = (
                np.ones(dim, dtype=np.float32)
                if r == 0
                else rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            )
            for i, (vid, lab, _vec) in enumerate(emb):
                vec_ids.append(vid + r * n_vec)
                labels.append(lab)
                vecs.append(base[i, perm] * signs)
        tbl = pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        )
        pq.write_table(tbl, out)
    sizes = {
        t: con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{PROBE}/{t}.parquet')"
        ).fetchone()[0]
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings".split()
        )
    }
    print("staged", PROBE, sizes)


def report() -> None:
    import json

    probe = json.load(open("/root/repo/BENCH_detail.json"))
    base_path = sys.argv[2] if len(sys.argv) > 2 else None
    if base_path:
        base = json.load(open(base_path))
    else:
        import subprocess

        base = json.loads(
            subprocess.run(
                ["git", "-C", "/root/repo", "show", "HEAD:BENCH_detail.json"],
                capture_output=True,
                text=True,
            ).stdout
        )
    bq, pq_ = base["queries"], probe["queries"]
    common = sorted(set(bq) & set(pq_))
    tot_b = sum(bq[k] for k in common)
    tot_p = sum(pq_[k] for k in common)
    print(
        f"common {len(common)} queries: sf0.1 {tot_b:.1f}s -> sf1-probe "
        f"{tot_p:.1f}s, total ratio {tot_p / tot_b:.2f}x on {REPLICAS}x data"
    )
    worst = sorted(common, key=lambda k: -(pq_[k] / max(bq[k], 0.05)))[:12]
    print("| query | sf0.1 sec | sf1 sec | ratio |")
    print("|---|---|---|---|")
    for k in worst:
        print(f"| {k} | {bq[k]:.2f} | {pq_[k]:.2f} | {pq_[k] / max(bq[k], 0.05):.2f}x |")


if __name__ == "__main__":
    {"stage": stage, "report": report}[sys.argv[1] if len(sys.argv) > 1 else "stage"]()
