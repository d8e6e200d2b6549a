"""sf1 scale probe for the pair-generating dedup operators (VERDICT r2
"Next round" #10): confirm candidate counts and wall time grow ~linearly
with the corpus, not n².

No sf1 fixture exists, so the probe corpus is constructed from sf0.1 by
10× replication with structure-preserving, similarity-destroying
perturbation:

- documents: replica r ≥ 1 suffixes EVERY token with ``_r{r}`` — within a
  replica, token/shingle relationships (and therefore the near-dup pair
  structure) are byte-for-byte isomorphic to the original; across
  replicas, token sets are disjoint, so no cross-replica candidates are
  semantically possible. A linear-scaling candidate generator must
  therefore emit ~10× the sf0.1 pairs; any n²-floor bucketing (e.g. too
  few bands/buckets for the corpus) shows up as cross-replica bucket
  collisions and a super-linear pair count — which is exactly what this
  probe exists to catch.
- embeddings: replica r applies a seeded signed permutation of the 64
  dimensions (permute + random ±1 per dim) — an isometry, so
  within-replica pairwise cosines are EXACTLY the originals, while
  cross-replica cosines fall to the random background level. (A
  permutation WITHOUT sign flips was measured to leak cross-replica
  correlation ~0.4+ on this fixture — the vectors are not centered, so
  any permutation of v stays aligned with v's common component; the
  sign flips kill it.)

Usage: python tools/scale_probe_sf1.py   (writes .scratch/sf1_probe/*,
prints the markdown table recorded in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

SF01 = "/root/testdata/sf0.1"
# SPARK_GRAFT_PROBE_REPLICAS overrides the replication factor (probe dir
# gets a _r{N} suffix so factors don't clobber each other);
# SPARK_GRAFT_PROBE_TABLES limits which fixture tables are staged (comma
# list) — a 30x run that only mines lineitem shouldn't pay a 30x
# documents re-tokenization.
REPLICAS = int(os.environ.get("SPARK_GRAFT_PROBE_REPLICAS", "10"))
PROBE = "/root/repo/.scratch/sf1_probe" + (
    f"_r{REPLICAS}" if REPLICAS != 10 else ""
)
PROBE_TABLES = frozenset(
    os.environ.get(
        "SPARK_GRAFT_PROBE_TABLES", "documents,lineitem,events,embeddings"
    ).split(",")
)
QUERIES = [
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_prefix_filter",
    "q_dedup_embedding_cells",
    # round-4 documents-only operators ("pairs" = result rows): phash
    # clusters must grow ~10x (replica payloads are byte-distinct, so no
    # cross-replica signature collisions); DSIR (fixed top-100) and the
    # pipeline funnel (fixed 5 stages) have constant row counts - their
    # evidence is the TIME ratio (fixed-size models / one-pass flags +
    # the shingle semi-join staying linear)
    "q_multimodal_phash",
    "q_curate_dsir",
    "q_curate_pipeline_funnel",
    # BPE train: 6-row result is constant; the evidence is the TIME
    # ratio — the corpus stage is one combinable word-count aggregate
    # and the merge rounds scale with the DISTINCT word dict (10x here,
    # sublinear in a natural corpus where replicas share vocabulary)
    "q_text_bpe_train",
    # SemDeDup: result rows = corpus (10x trivially); the evidence is
    # the TIME ratio staying ~linear because k = ceil(n/250) scales with
    # the corpus (bounded clusters -> bounded per-cluster pairwise), the
    # same adaptive-k defense as the IVF cells. The signed-permutation
    # isometry preserves within-replica cosines exactly.
    "q_dedup_semantic",
    # round-5 additions (VERDICT r4 #3): the basket-graph operators.
    # The probe lineitem replicates baskets with DISJOINT order/part key
    # ranges per replica, so the co-purchase graph is 10 isomorphic
    # components — result rows must grow ~10x and time ~linearly:
    # - label propagation: per-round cost = |E| vote aggregate; expected
    #   complexity exponent 1 (rounds fixed at 3)
    # - fpgrowth: Σ|basket|² pair join + PFP mining, linear in orders
    #   for bounded baskets; expected exponent 1
    "q_graph_label_propagation",
    "q_ml_fpgrowth",
    # round-5 audited-HLL rollups: result rows constant (|groups|+ALL),
    # evidence = time ratio — the register build is one map-side
    # combinable MAX into |groups|x1024 cells, so 10x data should be
    # ~scan-bound (expected exponent 1 with small constants)
    "q_agg_hll_merge",
    "q_agg_sketch_rollup",
    # round-6 additions (VERDICT r5 task #4): the two >3s headliners
    # without a current probe row.
    # - drift monitor: wall time is micro-batch fixed overhead (one
    #   batch per event-time week), so 10x events should be ~flat in
    #   batch count and ~scan-bound in per-batch work
    # - minhash re-probe: post-r5 artifacts refresh (pairs ~10x, time
    #   ~linear, same as the r3 probe)
    "q_stream_drift_monitor",
    # round-7 addition (VERDICT r6 task #3): trailing-7-day distinct via
    # rolling HLL register merge. Result rows = |days| (constant-ish:
    # replicas reuse the original timestamps, so the day spine is
    # unchanged); evidence = the TIME ratio staying ~scan-bound — the
    # register frame is |days|x1024 REGARDLESS of volume, so the only
    # volume terms are the one fact scan into registers and the exact
    # audit column's pre-collapsed DISTINCT (day,user) fan-out (10x
    # distinct users here).
    "q_agg_hll_rolling",
    # round-7 batch-2 additions:
    # - heavy hitters: the probe's id-disjoint uniform replication is the
    #   certificate's WORST case by design (10x keys, per-key counts
    #   unchanged, so kth count stays flat while the error bound grows) —
    #   expect the exact-fallback path to engage at 10x; the evidence is
    #   that even the fallback stays ~scan-bound, and the test suite pins
    #   the certified path on Zipf data (natural corpora are Zipf).
    # - decay score: one combinable integer aggregate; expect ~scan-bound.
    # - asof topk: rows ~10x (replicas are disjoint users); three linear
    #   passes, expect ~linear time.
    "q_agg_heavy_hitters",
    "q_agg_decay_score",
    "q_join_asof_topk",
    # late-interaction retrieval: shuffle-free corpus scan, constant rows
    "q_sim_maxsim",
    # round-8 additions:
    # - bm25: constant rows (top-10); ONE fact pass (explode + literal
    #   term filter + two combinable aggregates), expect ~scan-bound.
    #   The suffix perturbation keeps df constant (query terms exist
    #   un-suffixed only in replica 0) while N and T grow 10x — the
    #   idf/length normalization shifts, the plan shape does not.
    # - keyness: constant rows (top-3 x |sources|); the count frame grows
    #   with the 10x vocab (20 sources x 10x terms) but stays KB-scale,
    #   expect ~scan-bound.
    # - nearest bucketed as-of: rows ~10x (disjoint users per replica);
    #   same linear passes as the top-1 bucketed plan plus the dual
    #   carry spine (|keys| x |buckets| rows).
    "q_text_bm25_topk",
    "q_text_keyness_loglik",
    "q_join_asof_nearest_bucketed",
    # - rrf fusion: constant rows (top-10); two retriever passes then
    #   <=100-row fuse work, expect ~the sum of the bm25 + cosine scans.
    "q_sim_rrf_fusion",
]

# Usage: python tools/scale_probe_sf1.py [q_name1,q_name2,...]
# (no args = the full QUERIES list)


def build_probe() -> None:
    os.makedirs(PROBE, exist_ok=True)
    con = duckdb.connect()
    if "documents" in PROBE_TABLES and not os.path.exists(f"{PROBE}/documents.parquet"):
        parts = []
        for r in range(REPLICAS):
            if r == 0:
                parts.append(
                    f"SELECT doc_id, text, lang, source, n_chars "
                    f"FROM read_parquet('{SF01}/documents.parquet')"
                )
            else:
                parts.append(
                    f"SELECT doc_id + {r * 5000} AS doc_id, "
                    f"array_to_string(list_transform(string_split(text, ' '), "
                    f"x -> x || '_r{r}'), ' ') AS text, lang, source, "
                    f"CAST(strlen(array_to_string(list_transform(string_split(text, ' '), "
                    f"x -> x || '_r{r}'), ' ')) AS BIGINT) AS n_chars "
                    f"FROM read_parquet('{SF01}/documents.parquet')"
                )
            # each replica keeps the original's pair structure; suffixed
            # tokens make cross-replica shingle sets disjoint
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{PROBE}/documents.parquet' (FORMAT PARQUET)"
        )
    if "lineitem" in PROBE_TABLES and not os.path.exists(f"{PROBE}/lineitem.parquet"):
        # basket probe: replica r shifts order AND part keys into a
        # disjoint range, so the co-purchase graph is 10 isomorphic
        # components — pair/community/itemset structure replicates
        # exactly and any cross-replica candidate is an n²-floor bug.
        # Only the two columns the basket operators read.
        parts = [
            f"SELECT l_orderkey + {r * 10_000_000} AS l_orderkey, "
            f"l_partkey + {r * 1_000_000} AS l_partkey "
            f"FROM read_parquet('{SF01}/lineitem.parquet')"
            for r in range(REPLICAS)
        ]
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{PROBE}/lineitem.parquet' (FORMAT PARQUET)"
        )
    if "events" in PROBE_TABLES and not os.path.exists(f"{PROBE}/events.parquet"):
        # sketch probe: replica r shifts user/event ids into a disjoint
        # range (timestamps repeat — irrelevant to the distinct sketch),
        # so the true distinct-user count grows exactly 10x and the
        # audited HLL register build must stay scan-bound.
        parts = [
            f"SELECT event_id + {r * 100_000_000} AS event_id, ts, "
            f"user_id + {r * 10_000_000} AS user_id, event_type, value, props "
            f"FROM read_parquet('{SF01}/events.parquet')"
            for r in range(REPLICAS)
        ]
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{PROBE}/events.parquet' (FORMAT PARQUET)"
        )
    if "embeddings" in PROBE_TABLES and not os.path.exists(f"{PROBE}/embeddings.parquet"):
        emb = con.execute(
            f"SELECT vec_id, label, embedding FROM read_parquet('{SF01}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
        import pyarrow as pa
        import pyarrow.parquet as pq

        vec_ids, labels, vecs = [], [], []
        base = np.array([row[2] for row in emb], dtype=np.float32)
        dim = base.shape[1]
        for r in range(REPLICAS):
            rng = np.random.RandomState(1000 + r)
            perm = np.arange(dim) if r == 0 else rng.permutation(dim)
            signs = (
                np.ones(dim)
                if r == 0
                else rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            )
            for i, (vid, lab, _vec) in enumerate(emb):
                vec_ids.append(vid + r * 2000)
                labels.append(lab)
                vecs.append(base[i, perm] * signs)
        tbl = pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "label": pa.array(labels),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        pq.write_table(tbl, f"{PROBE}/embeddings.parquet")


def main() -> None:
    queries = QUERIES
    if len(sys.argv) > 1 and sys.argv[1].startswith("q_"):
        queries = sys.argv[1].split(",")
    build_probe()
    from pyspark.sql import SparkSession

    from spark_ml_pipelines_example_spark.queries.registry import load_all

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale_probe_sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    print("| query | sf0.1 pairs | sf0.1 sec | sf1-probe pairs | sf1-probe sec | pair ratio | time ratio |")
    print("|---|---|---|---|---|---|---|")
    for name in queries:
        fn = reg[name].fn
        fn(spark, SF01).count()  # warm
        t0 = time.perf_counter()
        n_small = fn(spark, SF01).count()
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_big = fn(spark, PROBE).count()
        t_big = time.perf_counter() - t0
        print(
            f"| {name} | {n_small} | {t_small:.2f} | {n_big} | {t_big:.2f} "
            f"| {n_big / max(n_small, 1):.2f}x | {t_big / t_small:.2f}x |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
