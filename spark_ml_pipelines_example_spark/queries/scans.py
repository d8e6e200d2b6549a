"""Scans, sources, sinks (reference R1-R3, SURVEY §2.2 'Scans').

The reference's whole I/O surface is schema'd CSV reads
(``TrainTestSplit.scala:67``), parquet reads (``no_pipeline/ModelFit.scala:84``)
and save-mode parquet writes (``no_pipeline/Predict.scala:96``,
``package.scala:31-36``). Declared here in oracle-checkable form.

Scale posture: parquet scans keep projection/predicate in the plan so
Catalyst pushes them into the file source (verify with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``); CSV writes
go through the engine writer (no ``repartition(1)``).
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import functions as F

from ..sources.io import read_csv_with_schema, write_parquet
from ._util import dec, scratch_dir, t
from .registry import query


@query(
    "q_scan_parquet",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan",),
)
def q_scan_parquet(spark, sf_dir):
    """Full-table parquet scan (reference R2)."""
    return t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@query(
    "q_scan_csv_schema",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("scan", "csv"),
)
def q_scan_csv_schema(spark, sf_dir):
    """CSV scan with enforced StructType (reference R1,
    ``TrainTestSplit.scala:67``): the engine first writes ``region`` out as
    headerless CSV, then reads it back with the declared schema — no
    inference scan, exactly the reference's iris pattern."""
    path = scratch_dir("q_scan_csv_schema", sf_dir)
    t(spark, sf_dir, "region").write.mode("overwrite").csv(path)
    return read_csv_with_schema(spark, path, "region")


@query(
    "q_sink_parquet_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("scan", "sink"),
)
def q_sink_parquet_roundtrip(spark, sf_dir):
    """Parquet sink with overwrite save mode then read back (reference R3 +
    ``makeSaveMode``, ``package.scala:31-36``)."""
    path = scratch_dir("q_sink_parquet_roundtrip", sf_dir)
    src = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_custkey",
            F.to_date("o_orderdate").alias("o_date"),
            "o_totalprice",
        )
    )
    write_parquet(src, path, overwrite=True)
    return spark.read.parquet(path)


@query(
    "q_sink_json_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    """,
    tags=("scan", "sink", "json"),
)
def q_sink_json_roundtrip(spark, sf_dir):
    """JSON-lines sink then schema'd read-back. JSON carries no type
    metadata, so the read declares the schema explicitly (never inference
    at scale — that is a full extra pass); doubles are rounded on the way
    out because JSON decimal text → double re-parse is the lossy step."""
    path = scratch_dir("q_sink_json_roundtrip", sf_dir)
    src = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("acctbal")
    )
    src.write.mode("overwrite").json(path)
    return spark.read.schema(src.schema).json(path)


@query(
    "q_sink_orc_roundtrip",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice FROM part WHERE p_size <= 25
    """,
    tags=("scan", "sink", "orc"),
)
def q_sink_orc_roundtrip(spark, sf_dir):
    """ORC sink with overwrite then read back — the second columnar format
    (type-preserving, predicate-pushdown-capable) the engine supports
    beside parquet."""
    path = scratch_dir("q_sink_orc_roundtrip", sf_dir)
    src = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 25)
        .select("p_partkey", "p_name", "p_brand", "p_retailprice")
    )
    src.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "q_sink_xml_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
    tags=("scan", "sink", "xml"),
)
def q_sink_xml_roundtrip(spark, sf_dir):
    """Native XML FILE source round-trip (Spark 4 built-in `xml` format
    — previously the external spark-xml package): write a customer
    segment as `<customers><customer>...</customer>...</customers>`
    documents, read back with rowTag extraction and an explicit schema.
    Complements q_fn_xml (the `from_xml` column function): this is the
    file-level ingest path B2B/EDI feeds arrive on. Entity escaping
    (&, <, >) round-trips symmetrically, so the oracle is the plain
    base-table projection.

    Scale shape: the writer emits one XML document per partition
    (splittable on read by rowTag element boundaries); with an explicit
    schema the reader skips schema inference — at 100 TB, inference
    (a full extra pass) is the XML-specific trap this query pins off."""
    path = scratch_dir("q_sink_xml_roundtrip", sf_dir)
    src = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal"))
    )
    (
        src.write.mode("overwrite")
        .format("xml")
        .option("rowTag", "customer")
        .option("rootTag", "customers")
        .save(path)
    )
    return spark.read.format("xml").option("rowTag", "customer").schema(src.schema).load(path)


@query(
    "q_sink_partitioned_prune",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE lang IN ('de', 'fr')
    """,
    tags=("scan", "sink", "layout"),
)
def q_sink_partitioned_prune(spark, sf_dir):
    """Hive-partitioned write (sources/layout.py) then a selective
    read-back: the lang predicate becomes a partition prune — the scan
    touches 2 of 5 directories, zero data files from the other three
    (`PartitionFilters` in the plan, asserted in tests/test_layout.py).
    This is the declared-surface twin of the layout helper: at 100 TB,
    partition design IS the query plan."""
    from ..sources.layout import write_partitioned

    path = scratch_dir("q_sink_partitioned_prune", sf_dir)
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    write_partitioned(docs, path, ["lang"])
    return (
        spark.read.parquet(path)
        .filter(F.col("lang").isin("de", "fr"))
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "q_scan_column_prune",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity <= 3.0
    """,
    tags=("scan", "prune"),
)
def q_scan_column_prune(spark, sf_dir):
    """Projection + predicate pushdown: reads 3 of 11 lineitem columns with
    the filter pushed to the parquet scan (``PushedFilters: [LessThanOrEqual
    (l_quantity,3.0)]`` in the formatted plan)."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(F.col("l_quantity") <= 3.0)
    )


@query(
    "q_scan_json_corrupt",
    # Which lines are broken is a pure function of doc_id (every 7th), so
    # the oracle derives the expected good/corrupt partition straight from
    # the documents table without seeing the staged file.
    oracle="""
    SELECT COUNT(CASE WHEN doc_id % 7 <> 0 THEN 1 END) AS n_good,
           COUNT(CASE WHEN doc_id % 7 = 0 THEN 1 END) AS n_corrupt,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN doc_id END) AS BIGINT) AS id_sum_good,
           CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN n_chars END) AS BIGINT) AS chars_good
    FROM documents
    """,
    tags=("scan", "json", "corrupt-record"),
)
def q_scan_json_corrupt(spark, sf_dir):
    """Malformed-record handling on ingest: stage a JSONL file in which
    every 7th document's line is truncated mid-object, read it back in
    PERMISSIVE mode with an explicit ``_corrupt_record`` column, and
    report the good/quarantined split plus checksums over the rows that
    parsed. This is the production ingest contract at scale — one bad
    line must quarantine, not kill the job (FAILFAST) or silently vanish
    (DROPMALFORMED), and the corrupt raw text is retained for replay.
    The read declares the schema explicitly (no inference pass)."""
    path = scratch_dir("q_scan_json_corrupt", sf_dir)
    d = t(spark, sf_dir, "documents")
    line = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit('{"doc_id": '), F.col("doc_id").cast("string"), F.lit(', "lang": ')),
    ).otherwise(F.to_json(F.struct("doc_id", "lang", "n_chars")))
    d.select(line.alias("value")).write.mode("overwrite").text(path)

    parsed = (
        spark.read.schema("doc_id long, lang string, n_chars long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    good = F.col("_corrupt_record").isNull()
    return parsed.agg(
        F.count(F.when(good, 1)).alias("n_good"),
        F.count(F.when(~good, 1)).alias("n_corrupt"),
        F.sum(F.when(good, F.col("doc_id"))).cast("long").alias("id_sum_good"),
        F.sum(F.when(good, F.col("n_chars"))).cast("long").alias("chars_good"),
    )


@query(
    "q_layout_zorder",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk,
           MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 299 AND l_suppkey BETWEEN 10 AND 39
    """,
    tags=("scan", "layout", "zorder", "data-skipping"),
)
def q_layout_zorder(spark, sf_dir):
    """Z-order (Morton) clustering for two-dimensional data skipping:
    lineitem is staged sorted by the bit-interleaved (l_partkey,
    l_suppkey) key (sources/layout.py:zorder_key), then a 2-D range
    query runs against the staged layout. Because each output file holds
    a contiguous Morton range, its min/max footer stats are tight in
    BOTH dimensions and the scan skips most files/row-groups for any
    selective partkey AND/OR suppkey filter — a single-column sort only
    serves one of the two. tests/test_layout.py measures the stats
    tightness directly from the parquet footers. Results are
    layout-invariant (the oracle reads the unsorted table)."""
    path = scratch_dir("q_layout_zorder", sf_dir)
    from ..sources.layout import write_zordered

    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    write_zordered(li, path, "l_partkey", "l_suppkey", n_files=16)
    staged = spark.read.parquet(path)
    f = staged.filter(
        F.col("l_partkey").between(100, 299) & F.col("l_suppkey").between(10, 39)
    )
    from ._util import dec

    return f.agg(
        F.count("*").alias("n"),
        F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
        F.min("l_partkey").alias("min_pk"),
        F.max("l_partkey").alias("max_pk"),
        F.min("l_suppkey").alias("min_sk"),
        F.max("l_suppkey").alias("max_sk"),
    )


@query(
    "q_scan_text_log",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_id % 500 <> 0
    GROUP BY event_type
    """,
    tags=("scan", "text", "log-ingest"),
)
def q_scan_text_log(spark, sf_dir):
    """Raw text-line ingestion (the log-parsing shape): events rendered
    as pipe-delimited log lines — every 500th deliberately corrupted —
    written via the text sink, read back with ``spark.read.text``,
    regex-parsed, malformed lines dropped, then aggregated. The value
    field round-trips through Spark's shortest-repr double→string cast,
    so the re-parsed doubles are bit-identical to the originals and the
    decimal-summed aggregate matches the oracle computed on the parquet
    source directly.

    Scale shape: text scan splits by line ranges exactly like any
    production log read; the regex runs in codegen (no Python), the
    malformed filter is scan-side, and the only shuffle is the final
    event_type aggregate. Schema-on-read via regexp groups is the
    standard first hop of a 100 TB log pipeline (before converting to
    columnar — which q_sink_parquet_roundtrip covers).
    """
    path = scratch_dir("q_scan_text_log", sf_dir)
    ev = t(spark, sf_dir, "events")
    line = F.when(
        F.col("event_id") % 500 == 0,
        F.concat(F.lit("!!corrupt "), F.col("event_id").cast("string")),
    ).otherwise(
        F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.unix_timestamp("ts").cast("string"),
            "event_type",
            F.col("user_id").cast("string"),
            F.col("value").cast("string"),
        )
    )
    ev.select(line.alias("value")).write.mode("overwrite").text(path)

    raw = spark.read.text(path)
    pat = r"^(\d+)\|(-?\d+)\|(\w+)\|(\d+)\|(.+)$"
    parsed = raw.select(
        F.regexp_extract("value", pat, 1).alias("event_id_s"),
        F.regexp_extract("value", pat, 3).alias("event_type"),
        F.regexp_extract("value", pat, 4).alias("user_id_s"),
        F.regexp_extract("value", pat, 5).alias("value_s"),
    ).filter(F.col("event_id_s") != "")
    return (
        parsed.select(
            "event_type",
            F.col("user_id_s").cast("bigint").alias("user_id"),
            F.col("value_s").cast("double").alias("value"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


# Compaction target: rows per output file (stands in for the byte-size
# target a production compactor uses — e.g. 512 MB files).
COMPACT_ROWS_PER_FILE = 200


@query(
    "q_layout_compact",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           LEAST(64, COUNT(*)) AS n_files_before,
           CAST(CEIL(COUNT(*) / {COMPACT_ROWS_PER_FILE}.0) AS BIGINT) AS n_files_after,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    """,
    tags=("scan", "layout", "compaction", "maintenance"),
)
def q_layout_compact(spark, sf_dir):
    """Small-files compaction — the table-maintenance job every long-
    lived 100 TB dataset needs (streaming sinks and partitioned writes
    accrete KB-size files; each file costs a task + open + footer read,
    so a million tiny files poisons every downstream scan). The engine
    stages a deliberately fragmented copy (round-robin repartition(64)),
    then compacts to ⌈rows / {COMPACT_ROWS_PER_FILE}⌉ files via
    round-robin repartition — rewriting data files only; at production
    scale the same job runs per-partition with a byte target
    (maxRecordsPerFile / AQE coalescing are the built-in knobs this
    makes explicit). File counts are measured from the actual written
    directories and pinned in the result next to an id-sum content
    checksum, so the oracle verifies BOTH content preservation and the
    layout arithmetic."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    frag_path = scratch_dir("q_layout_compact_frag", sf_dir)
    d.repartition(64).write.mode("overwrite").parquet(frag_path)
    frag = spark.read.parquet(frag_path)
    n_before = len(frag.inputFiles())

    n_rows = frag.count()
    n_target = -(-n_rows // COMPACT_ROWS_PER_FILE)
    compact_path = scratch_dir("q_layout_compact_out", sf_dir)
    frag.repartition(n_target).write.mode("overwrite").parquet(compact_path)
    compacted = spark.read.parquet(compact_path)
    n_after = len(compacted.inputFiles())

    return compacted.agg(
        F.count("*").alias("n_rows"),
        F.lit(n_before).cast("bigint").alias("n_files_before"),
        F.lit(n_after).cast("bigint").alias("n_files_after"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
    )


@query(
    "q_scan_schema_evolution",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS n_legacy,
           COUNT(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS n_current,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
               AS new_col_chars
    FROM documents
    """,
    tags=("scan", "schema-evolution", "ingest"),
)
def q_scan_schema_evolution(spark, sf_dir):
    """Schema evolution on read (``mergeSchema``): a dataset whose early
    files were written before a column existed — the normal state of
    any long-lived ingest path. The engine stages a legacy batch
    (doc_id, lang) and a current batch (+ n_chars, source), reads BOTH
    through one merged-schema scan, and rows from legacy files surface
    the new columns as NULL — which the aggregate then quantifies
    (n_legacy vs n_current), turning schema drift into a monitored
    dimension instead of a crash.

    Scale note: mergeSchema reconciles footers at planning time — cost
    ∝ number of files, not data volume; production datasets pin the
    merged schema in a metastore/table format instead of re-deriving
    it per read (and THIS query's read could pass the union schema
    explicitly to skip footer reconciliation) — the read-side NULL-fill
    semantics are identical either way, which is what the oracle pins.
    """
    d = t(spark, sf_dir, "documents")
    base = scratch_dir("q_scan_schema_evolution", sf_dir)
    legacy = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    current = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars", "source"
    )
    legacy.write.mode("overwrite").parquet(f"{base}/batch=legacy")
    current.write.mode("overwrite").parquet(f"{base}/batch=current")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/batch=legacy", f"{base}/batch=current"
    )
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("n_chars").isNull(), 1)).alias("n_legacy"),
        F.count(F.when(F.col("n_chars").isNotNull(), 1)).alias("n_current"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum("n_chars").cast("bigint").alias("new_col_chars"),
    )


@query(
    "q_scan_file_provenance",
    oracle="""
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'batch_a' ELSE 'batch_b' END AS ingest_batch,
           COUNT(*) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    GROUP BY 1
    """,
    tags=("scan", "provenance", "lineage", "metadata"),
)
def q_scan_file_provenance(spark, sf_dir):
    """Row-level file provenance via the hidden ``_metadata`` column:
    every parquet row carries its source file path without any stored
    column — the lineage primitive that answers 'which ingest batch
    produced this row' and 'which files do I reprocess' (quarantine,
    backfill, audit). The engine stages two ingest batches into
    separate directories, reads them through one scan, derives the
    batch id from ``_metadata.file_path`` in codegen, and aggregates
    per batch — zero storage overhead, constant metadata cost per row.
    """
    d = t(spark, sf_dir, "documents")
    base = scratch_dir("q_scan_file_provenance", sf_dir)
    d.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(f"{base}/batch_a")
    d.filter(F.col("doc_id") % 2 == 1).write.mode("overwrite").parquet(f"{base}/batch_b")
    merged = spark.read.parquet(f"{base}/batch_a", f"{base}/batch_b")
    return (
        merged.select(
            "doc_id",
            F.regexp_extract(
                F.col("_metadata.file_path"), r"/(batch_[ab])/", 1
            ).alias("ingest_batch"),
        )
        .groupBy("ingest_batch")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
    )


@query(
    "q_sink_csv_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("scan", "sink", "csv"),
)
def q_sink_csv_roundtrip(spark, sf_dir):
    """CSV sink (header, explicit quoting) then schema'd read-back —
    completes the sink matrix (parquet/json/orc/partitioned/csv). Like
    the JSON sink, CSV is typeless so the read declares the schema
    explicitly; all-integer/string columns make the round trip lossless.
    String columns may contain commas, so the writer's default quoting is
    load-bearing and the reader parses quotes, not naive splits."""
    path = scratch_dir("q_sink_csv_roundtrip", sf_dir)
    src = (
        t(spark, sf_dir, "nation")
        .join(
            F.broadcast(t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name", "n_regionkey", "r_name")
    )
    src.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(src.schema).option("header", "true").csv(path)


@query(
    "q_scan_csv_corrupt",
    # Corruption is a pure function of doc_id (every 11th line gets too
    # few columns), so the oracle derives the expected split from the
    # documents table without reading the staged file.
    oracle="""
    SELECT COUNT(CASE WHEN doc_id % 11 <> 0 THEN 1 END) AS n_good,
           COUNT(CASE WHEN doc_id % 11 = 0 THEN 1 END) AS n_malformed,
           CAST(SUM(CASE WHEN doc_id % 11 <> 0 THEN doc_id END) AS BIGINT)
               AS id_sum_good,
           CAST(SUM(CASE WHEN doc_id % 11 <> 0 THEN n_chars END) AS BIGINT)
               AS chars_good
    FROM documents
    """,
    tags=("scan", "csv", "corrupt-record"),
)
def q_scan_csv_corrupt(spark, sf_dir):
    """Malformed-record handling for CSV ingest — the delimited-file
    twin of q_scan_json_corrupt's contract: every 11th line is staged
    with a missing column, the read-back runs PERMISSIVE with an
    explicit ``_corrupt_record`` column (bad line quarantined with its
    raw text retained for replay — never FAILFAST's job kill or
    DROPMALFORMED's silent vanish), schema declared up front (no
    inference pass over the data). CSV's failure mode differs from
    JSON's: arity mismatch rather than parse error, which PERMISSIVE
    signals by nulling the missing trailing columns AND populating the
    corrupt column only when the row is unparseable — so the malformed
    check is a null in a declared non-trailing-safe column. Reported as
    the good/quarantined split plus checksums over parsed rows."""
    from ._util import scratch_dir

    path = scratch_dir("q_scan_csv_corrupt", sf_dir)
    d = t(spark, sf_dir, "documents")
    line = F.when(
        F.col("doc_id") % 11 == 0,
        F.col("doc_id").cast("string"),  # arity-1 line: lang+chars missing
    ).otherwise(
        F.concat_ws(
            ",",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("n_chars").cast("string"),
        )
    )
    d.select(line.alias("value")).write.mode("overwrite").text(path)

    parsed = (
        spark.read.schema(
            "doc_id long, lang string, n_chars long, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    # arity-short rows surface as nulls in the declared trailing columns
    good = F.col("lang").isNotNull() & F.col("n_chars").isNotNull()
    return parsed.agg(
        F.count(F.when(good, 1)).alias("n_good"),
        F.count(F.when(~good, 1)).alias("n_malformed"),
        F.sum(F.when(good, F.col("doc_id"))).cast("long").alias("id_sum_good"),
        F.sum(F.when(good, F.col("n_chars"))).cast("long").alias("chars_good"),
    )


@query(
    "q_scan_python_datasource",
    # The connector's rows are a closed form of the id, so DuckDB replays
    # the whole source from range(): per = ceil(20000/8) = 2500.
    oracle="""
    WITH src AS (
        SELECT i AS device_id, CAST(i // 2500 AS INT) AS part,
               (i * i + 17 * i) % 9973 AS reading
        FROM range(0, 20000) t(i)
    )
    SELECT part, CAST(COUNT(*) AS BIGINT) AS n_readings,
           CAST(SUM(reading) AS BIGINT) AS sum_reading,
           CAST(MIN(device_id) AS BIGINT) AS min_device,
           CAST(MAX(device_id) AS BIGINT) AS max_device,
           CAST(COUNT(DISTINCT reading) AS BIGINT) AS n_distinct_readings
    FROM src GROUP BY part
    """,
    tags=("scan", "python-datasource", "connector", "spark4"),
)
def q_scan_python_datasource(spark, sf_dir):
    """Custom connector through Spark 4's Python DataSource API
    (sources/pyds.py): ``spark.read.format("synthetic_telemetry")`` with
    REAL partition planning — the reader's ``partitions()`` returns 8
    contiguous id ranges and Spark schedules one task per range, so the
    source scan is parallel exactly like a JDBC/warehouse connector
    sharded by key range. Rows are a closed-form function of the id,
    which is what makes a connector hash-checkable: DuckDB replays the
    generator from range(). The aggregate checks per-partition counts,
    sums, id bounds (proving the range planning delivered each row to
    exactly one partition) and distinct readings.

    Scale shape: connector parallelism = len(partitions()); a production
    source maps each InputPartition to a shard/tablet of the external
    system, and the groupBy is one combinable shuffle on the partition
    id."""
    from ..sources.pyds import register

    register(spark)
    src = (
        spark.read.format("synthetic_telemetry")
        .option("n_rows", 20000)
        .option("n_parts", 8)
        .load()
    )
    return src.groupBy("part").agg(
        F.count("*").alias("n_readings"),
        F.sum("reading").alias("sum_reading"),
        F.min("device_id").alias("min_device"),
        F.max("device_id").alias("max_device"),
        F.count_distinct("reading").alias("n_distinct_readings"),
    )


@query(
    "q_sink_dynamic_partition_overwrite",
    # Final table state is deterministic: urgent-priority rows were
    # rewritten with doubled totals by the dynamic overwrite, every other
    # partition keeps its original rows.
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    * CASE WHEN o_orderpriority = '1-URGENT' THEN 2 ELSE 1 END)
                AS BIGINT) AS cents
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("sink", "partitioned", "dynamic-overwrite", "writer"),
)
def q_sink_dynamic_partition_overwrite(spark, sf_dir):
    """Dynamic partition overwrite — the writer mode every incremental
    batch pipeline depends on: ``INSERT OVERWRITE`` replaces ONLY the
    partitions present in the incoming frame, leaving the rest of the
    table untouched (static mode would truncate the whole table first).
    Exercise: write orders partitioned by priority, then overwrite just
    the '1-URGENT' partition with doubled totals via
    ``option("partitionOverwriteMode", "dynamic")``, read the table
    back, and aggregate — the other four partitions must still hold
    their ORIGINAL rows, which is exactly what the oracle states.

    Scale shape: the overwrite's write amplification is proportional to
    the touched partitions only (the point of dynamic mode at 100 TB —
    a daily restatement rewrites one day-partition, not the table);
    reads after the swap prune on the partition column as usual."""
    path = scratch_dir("q_sink_dynamic_partition_overwrite", sf_dir)
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    urgent2 = o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", (F.col("o_totalprice").cast("decimal(18,2)") * 2).cast(
            o.schema["o_totalprice"].dataType
        )
    )
    (
        urgent2.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("o_orderpriority")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100))
        .cast("long")
        .alias("cents"),
    )


@query(
    "q_scan_agg_pushdown",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
    tags=("scan", "pushdown", "aggregate", "statistics"),
)
def q_scan_agg_pushdown(spark, sf_dir):
    """Aggregate pushdown INTO the parquet scan (DataSource V2 +
    spark.sql.parquet.aggregatePushdown): COUNT/MIN/MAX are answered
    from footer statistics — the scan reads row-group metadata, not
    data pages, so the query touches ~KBs of a table that could be
    100 TB. The plan shows `PushedAggregation: [COUNT(*), MIN(...),
    MAX(...)]` with a statistics-only ReadSchema (pinned in
    tests/test_round4.py). The V2 source routing and the pushdown flag
    are scoped to this query and restored — the engine's default V1
    path keeps the broader source behavior the rest of the suite pins.
    This is the footer-statistics fast path every table format's
    `DESCRIBE DETAIL` / file-skipping machinery rides."""
    flags = [
        ("spark.sql.parquet.aggregatePushdown", "true"),
        ("spark.sql.sources.useV1SourceList", ""),
    ]
    prev = {}
    for k, v in flags:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        # fresh read, NOT the memoized load_table frame: the relation must
        # resolve while the V2-source + aggregatePushdown confs are active
        li = spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet")
        out = li.agg(
            F.count("*").alias("n_rows"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        # Force PHYSICAL planning under the scoped confs: the V2 pushdown
        # rule runs at plan time, which is lazy — without this the confs
        # would be restored before the optimizer ever saw them. The
        # QueryExecution caches the plan, so later actions reuse it.
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in flags:
            if prev[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev[k])


def _snapshot_demo_table(spark, sf_dir, qname):
    """Build the 4-version demo table on the file-manifest snapshot log —
    one commit per CRUD verb: v0 = ingest the 'F' orders segment, v1 =
    APPEND the sampled 'O' segment, v2 = manifest-level DELETE of the F
    segment, v3 = copy-on-write UPDATE (+500-cent credit to every 5th
    order: the current version is read, the segment rewritten as new
    files, and the manifest swaps old for new — the original files stay
    on disk untouched, which is what keeps v1/v2 readable). Shared by
    q_scan_time_travel (versioned reads) and q_scan_table_history
    (commit-log introspection).

    The build is IDEMPOTENT across invocations (the events weekly-
    staging marker pattern): a marker records the source parquet's
    (size, mtime); while it matches, re-invocations reuse the committed
    log instead of re-running the four write/commit jobs — the steady-
    state deployment shape, where history/time-travel queries READ an
    existing table's log rather than re-ingesting the table per query.
    Any fixture regeneration invalidates the marker and rebuilds."""
    import json as _json

    from ..sources.snapshots import (
        commit_snapshot,
        init_table,
        read_version,
        write_segment,
    )

    base = scratch_dir(qname, sf_dir)
    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    fingerprint = {"src": src, "size": st.st_size, "mtime": st.st_mtime, "v": 1}
    marker = os.path.join(base, "_build_marker.json")
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                rec = _json.load(fh)
        except (OSError, ValueError):
            rec = None
        if (
            rec
            and rec.get("fingerprint") == fingerprint
            and all(os.path.exists(f) for f in rec.get("all_files", ()))
        ):
            return (
                base,
                tuple(rec["versions"]),
                rec["f_files"],
                rec["o_files"],
            )
    init_table(base)
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        (dec("o_totalprice") * 100).cast("long").alias("cents"),
    )
    f_files = write_segment(
        orders.filter(F.col("o_orderstatus") == "F"), base, "seg-f"
    )
    v0 = commit_snapshot(base, f_files)
    o_files = write_segment(
        orders.filter(
            (F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 3 == 0)
        ),
        base,
        "seg-o",
    )
    v1 = commit_snapshot(base, f_files + o_files)
    v2 = commit_snapshot(base, o_files)  # delete the F segment by manifest
    upd = read_version(spark, base, v2).withColumn(
        "cents",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("cents") + 500
        ).otherwise(F.col("cents")),
    )
    u_files = write_segment(upd, base, "seg-o-upd")
    v3 = commit_snapshot(base, u_files)  # copy-on-write update
    with open(marker + ".tmp", "w") as fh:
        _json.dump(
            {
                "fingerprint": fingerprint,
                "versions": [v0, v1, v2, v3],
                "f_files": f_files,
                "o_files": o_files,
                "all_files": sorted(set(f_files + o_files + u_files)),
            },
            fh,
        )
    os.replace(marker + ".tmp", marker)
    return base, (v0, v1, v2, v3), f_files, o_files


@query(
    "q_scan_time_travel",
    oracle="""
    WITH fseg AS (
        SELECT COUNT(*) AS c,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS s
        FROM orders WHERE o_orderstatus = 'F'
    ), oseg AS (
        SELECT COUNT(*) AS c,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS s
        FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 3 = 0
    )
    , useg AS (
        SELECT COUNT(*) AS c FROM orders
        WHERE o_orderstatus = 'O' AND o_orderkey % 3 = 0 AND o_orderkey % 5 = 0
    )
    SELECT 0 AS version, fseg.c AS n_rows, fseg.s AS total_cents FROM fseg
    UNION ALL
    SELECT 1, fseg.c + oseg.c, fseg.s + oseg.s FROM fseg, oseg
    UNION ALL
    SELECT 2, oseg.c, oseg.s FROM oseg
    UNION ALL
    SELECT 3, oseg.c, oseg.s + 500 * useg.c FROM oseg, useg
    ORDER BY version
    """,
    tags=("scan", "time-travel", "snapshot", "table-format"),
)
def q_scan_time_travel(spark, sf_dir):
    """Table-format time travel over the minimal file-manifest snapshot
    log (sources/snapshots.py — the Delta/Iceberg read mechanics without
    the missing dependency; VERDICT r3 'What's missing' #4). Four
    commits against one table — one per CRUD verb: v0 ingests the 'F'
    orders segment, v1 APPENDS the sampled 'O' segment (new files, old
    untouched), v2 logically DELETES the F segment (manifest drops its
    files; no data file rewritten), v3 UPDATES every 5th order with a
    +500-cent credit copy-on-write (segment rewritten as NEW files, the
    manifest swaps them, originals stay for history). The query then
    time-travel-reads ALL FOUR versions and aggregates each — possible
    only because commits are copy-on-write over immutable files.

    Scale shape: the manifest is driver-side KB-sized JSON (exactly how
    Delta replays its log); each versioned read plans a plain multi-file
    parquet scan over the listed files, so pushdown/pruning/parallelism
    are unchanged, and the three version aggregates are combinable
    count/sum passes unioned into a 3-row result. Money goes through the
    decimal(18,2)→cents-BIGINT cast so every engine sums exact integers
    (SURVEY §2.4)."""
    from ..sources.snapshots import read_version

    base, versions, _, _ = _snapshot_demo_table(spark, sf_dir, "q_scan_time_travel")
    from ..sources.snapshots import manifest

    msets = [manifest(base, v)["files"] for v in versions]
    all_files = sorted(set().union(*map(set, msets)))
    if not all_files or len(all_files) > _SNAPSHOT_FILES_CAP:
        return _time_travel_distributed(spark, base, versions)
    # version file sets overlap (copy-on-write keeps old segments live
    # across commits), so scan each DISTINCT file once and aggregate
    # per-file partials; per-version totals combine the partials on the
    # driver — integer sums are order-free, so the totals are the exact
    # ints the per-version aggregates produced (guarded below against
    # the int64 wrap Spark's own sum would take). The partial frame is
    # one row per live data file, i.e. manifest-bounded.
    per_file = (
        spark.read.parquet(*all_files)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
        .collect()
    )
    stats: dict[str, tuple[int, int | None]] = {}
    for r in per_file:
        p = unquote(urlparse(r["f"]).path)
        stats[p] = (int(r["n"]), None if r["s"] is None else int(r["s"]))
    rows = []
    for v, files in zip(versions, msets):
        n_v, s_v, any_s = 0, 0, False
        for f in files:
            n_f, s_f = stats.get(f, (0, None))
            n_v += n_f
            if s_f is not None:
                s_v += s_f
                any_s = True
        if abs(s_v) > _I64_MAX_SNAP:  # Spark's long sum would wrap here
            return _time_travel_distributed(spark, base, versions)
        rows.append((v, n_v, s_v if any_s else None))
    return spark.createDataFrame(
        rows, "version int, n_rows long, total_cents long"
    ).orderBy("version")


_SNAPSHOT_FILES_CAP = 100_000  # manifests are KB-scale JSON by contract
_I64_MAX_SNAP = (1 << 63) - 1


def _time_travel_distributed(spark, base, versions):
    """The verbatim per-version union-of-aggregates form — the fallback
    when the manifest is not driver-sized or a sum leaves int64 range."""
    from ..sources.snapshots import read_version

    out = None
    for v in versions:
        agg = (
            read_version(spark, base, v)
            .agg(F.count("*").alias("n_rows"), F.sum("cents").alias("total_cents"))
            .select(F.lit(v).alias("version"), "n_rows", "total_cents")
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("version")


@query(
    "q_scan_table_history",
    oracle="""
    WITH fseg AS (
        SELECT COUNT(*) AS c FROM orders WHERE o_orderstatus = 'F'
    ), oseg AS (
        SELECT COUNT(*) AS c FROM orders
        WHERE o_orderstatus = 'O' AND o_orderkey % 3 = 0
    )
    SELECT 0 AS version, fseg.c AS n_rows, fseg.c AS rows_added,
           CAST(0 AS BIGINT) AS rows_removed FROM fseg
    UNION ALL
    SELECT 1, fseg.c + oseg.c, oseg.c, CAST(0 AS BIGINT) FROM fseg, oseg
    UNION ALL
    SELECT 2, oseg.c, CAST(0 AS BIGINT), fseg.c FROM fseg, oseg
    UNION ALL
    SELECT 3, oseg.c, oseg.c, oseg.c FROM oseg
    ORDER BY version
    """,
    tags=("scan", "time-travel", "snapshot", "history"),
)
def q_scan_table_history(spark, sf_dir):
    """DESCRIBE HISTORY over the file-manifest snapshot log — the
    commit-log introspection every lakehouse operator runs daily: for
    each version, the live row count plus the rows ADDED and REMOVED by
    that commit, derived purely from the manifest DIFF (added files =
    v's set minus v−1's, removed = the reverse) — commits never annotate
    themselves, the log is the source of truth, exactly how Delta's
    history computation replays its JSON actions. The v3 copy-on-write
    update shows up as added≈removed with net-unchanged rows — the
    characteristic rewrite signature an operator greps history for.

    Scale shape: manifests are driver-side KB JSON; each added/removed
    file-set count is a parquet footer-metadata count scan over just
    those files (no data pages), and the 3-version result is a union of
    1-row aggregates. The shared demo table (_snapshot_demo_table) is
    the same one q_scan_time_travel reads, so the two surfaces can't
    drift."""
    from ..sources.snapshots import manifest

    base, vs, _, _ = _snapshot_demo_table(spark, sf_dir, "q_scan_table_history")
    msets = [set(manifest(base, v)["files"]) for v in vs]
    all_files = sorted(set().union(*msets))
    if len(all_files) > _SNAPSHOT_FILES_CAP:
        return _table_history_distributed(spark, base, vs, msets)
    # row counts are parquet FOOTER metadata (exact by format contract:
    # the footer's num_rows IS count(*)), so the whole history derives
    # on the driver from manifest diffs + footer reads — no data pages,
    # no Spark job; the distributed count form below covers manifests
    # past the cap
    import pyarrow.parquet as pq

    nrows = {f: pq.ParquetFile(f).metadata.num_rows for f in all_files}
    rows, prev = [], set()
    for v, cur in zip(vs, msets):
        rows.append(
            (
                v,
                sum(nrows[f] for f in cur),
                sum(nrows[f] for f in cur - prev),
                sum(nrows[f] for f in prev - cur),
            )
        )
        prev = cur
    return spark.createDataFrame(
        rows, "version int, n_rows long, rows_added long, rows_removed long"
    ).orderBy("version")


def _table_history_distributed(spark, base, vs, msets):
    """The verbatim union-of-count-aggregates form — the fallback when
    the manifest is not driver-sized."""

    def count_frame(files, alias):
        if not files:
            return None
        return spark.read.parquet(*files).agg(F.count("*").alias(alias))

    out = None
    prev_files: set[str] = set()
    for v, cur_files in zip(vs, msets):
        added = sorted(cur_files - prev_files)
        removed = sorted(prev_files - cur_files)
        row = None
        for files, alias in ((sorted(cur_files), "n_rows"), (added, "rows_added"),
                             (removed, "rows_removed")):
            cf = count_frame(files, alias)
            if cf is None:
                cf = spark.range(1).select(F.lit(0).cast("long").alias(alias))
            row = cf if row is None else row.crossJoin(F.broadcast(cf))
        row = row.select(
            F.lit(v).alias("version"), "n_rows", "rows_added", "rows_removed"
        )
        out = row if out is None else out.unionByName(row)
        prev_files = cur_files
    return out.orderBy("version")
