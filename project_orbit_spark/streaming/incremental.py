"""Incremental change detection — SURVEY.md §2.9 ST1/ST2/ST5.

The reference's daily DAG loads the previous run's per-page sha256
hashes and reprocesses only changed pages
(dags/orbit_daily_update_dag.py:106-216). Re-expressed as a
hash-compare join between snapshots: new rows, changed rows,
unchanged rows (skipped downstream = ST2), deleted rows.

Scale notes: the compare is one shuffle join on the page key with
digests computed map-side; at 100 TB with a lake-table sink this is
the classic MERGE/anti-join incremental pattern, and file-level
skipping comes from partition pruning on run_date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load, read_events_stream
from project_orbit_spark.registry import register


def detect_changes(current: DataFrame, previous: DataFrame, key: str, content: str) -> DataFrame:
    """ST1 primitive: full outer hash-compare between two snapshots.
    Emits (key, status) with status ∈ {new, changed, unchanged, deleted}."""
    cur = current.select(F.col(key), F.md5(F.col(content)).alias("_cur_hash"))
    prev = previous.select(F.col(key), F.md5(F.col(content)).alias("_prev_hash"))
    joined = cur.join(prev, key, "full_outer")
    status = (
        F.when(F.col("_prev_hash").isNull(), "new")
        .when(F.col("_cur_hash").isNull(), "deleted")
        .when(F.col("_cur_hash") == F.col("_prev_hash"), "unchanged")
        .otherwise("changed")
    )
    return joined.select(F.col(key), status.alias("status"))


@register(
    "change_detection_hashes",
    tags=("incremental",),
    doc="ST1 change-data detection (ref "
    "dags/orbit_daily_update_dag.py:126-216): previous run = every "
    "even doc; current run = all docs with every 10th text mutated. "
    "Hash-compare join classifies new/changed/unchanged/deleted; "
    "downstream stages consume only new+changed (ST2 skip).",
    oracle="""
        WITH previous AS (
          SELECT doc_id, md5(text) AS prev_hash FROM documents WHERE doc_id % 2 = 0
        ),
        current_run AS (
          SELECT doc_id,
                 md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END)
                   AS cur_hash
          FROM documents
        )
        SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
               CASE WHEN p.prev_hash IS NULL THEN 'new'
                    WHEN c.cur_hash IS NULL THEN 'deleted'
                    WHEN c.cur_hash = p.prev_hash THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM current_run c FULL OUTER JOIN previous p USING (doc_id)
        ORDER BY doc_id
    """,
)
def change_detection_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    previous = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    current = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return detect_changes(current, previous, "doc_id", "text").orderBy("doc_id")


@register(
    "changed_docs_reprocess_set",
    tags=("incremental",),
    doc="ST2 skip-if-unchanged: the downstream work list — only "
    "new/changed docs joined back to their content, counted per "
    "lang (what the chunk/extract stages would actually reprocess).",
    oracle="""
        WITH previous AS (
          SELECT doc_id, md5(text) AS prev_hash FROM documents WHERE doc_id % 2 = 0
        ),
        current_run AS (
          SELECT doc_id, lang,
                 md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END)
                   AS cur_hash
          FROM documents
        )
        SELECT c.lang,
               count(*) AS n_reprocess,
               CAST(sum(CASE WHEN p.prev_hash IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_new,
               CAST(sum(CASE WHEN p.prev_hash IS NOT NULL
                             AND c.cur_hash != p.prev_hash THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_changed
        FROM current_run c LEFT JOIN previous p USING (doc_id)
        WHERE p.prev_hash IS NULL OR c.cur_hash != p.prev_hash
        GROUP BY c.lang
        ORDER BY c.lang
    """,
)
def changed_docs_reprocess_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    previous = d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.md5("text").alias("prev_hash")
    )
    current = d.select(
        "doc_id",
        "lang",
        F.md5(
            F.when(F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" v2"))).otherwise(
                F.col("text")
            )
        ).alias("cur_hash"),
    )
    joined = current.join(previous, "doc_id", "left").filter(
        F.col("prev_hash").isNull() | (F.col("cur_hash") != F.col("prev_hash"))
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_reprocess"),
            F.sum(F.when(F.col("prev_hash").isNull(), 1).otherwise(0)).alias("n_new"),
            F.sum(
                F.when(
                    F.col("prev_hash").isNotNull()
                    & (F.col("cur_hash") != F.col("prev_hash")),
                    1,
                ).otherwise(0)
            ).alias("n_changed"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# At-least-once replay dedup (streaming dropDuplicatesWithinWatermark)

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def replay_corpus(events: DataFrame) -> DataFrame:
    """events ∪ an exact re-emission of every 11th event — the
    duplicate profile of at-least-once delivery (a replayed Kafka
    offset range / retried producer batch)."""
    return events.unionByName(events.filter(F.col("event_id") % 11 == 0))


def dedup_replayed(ev: DataFrame, streaming: bool = False, watermark: str = "1 hour") -> DataFrame:
    """One row per event_id from a replayed feed.

    Batch face: plain dropDuplicates (replays are exact copies, so
    the kept row is unique regardless of which copy wins). Stream
    face: dropDuplicatesWithinWatermark — Spark keeps per-key state
    only for the watermark horizon, so state is bounded by (arrival
    rate × horizon), not by stream lifetime; an unbounded-key
    dropDuplicates would OOM a 100 TB/day feed.
    """
    dd = (
        ev.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
        if streaming
        else ev.dropDuplicates(["event_id"])
    )
    return dd.select(
        "event_id",
        F.date_format("ts", TS_FMT).alias("ts_s"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
    )


def stream_dedup_replayed(spark: SparkSession, sf_dir: str, watermark: str = "1 hour") -> DataFrame:
    """Streaming face: readStream over the events parquet, self-union
    as the replay, watermarked dedup. Run with availableNow for the
    incremental-batch execution mode."""
    def one_stream() -> DataFrame:
        return read_events_stream(spark, sf_dir)

    replayed = one_stream().unionByName(
        one_stream().filter(F.col("event_id") % 11 == 0)
    )
    return dedup_replayed(replayed, streaming=True, watermark=watermark)


@register(
    "replay_dedup_events",
    tags=("streaming", "dedup", "incremental"),
    doc="At-least-once replay dedup: events with every 11th event "
    "re-emitted, collapsed back to one row per event_id. Batch face "
    "of the streaming dropDuplicatesWithinWatermark operator "
    "(stream face: stream_dedup_replayed, state bounded by the "
    "1-hour watermark; AvailableNow parity test in "
    "tests/test_streaming.py).",
    oracle="""
        WITH corpus AS (
          SELECT * FROM events
          UNION ALL
          SELECT * FROM events WHERE event_id % 11 = 0
        )
        SELECT DISTINCT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               user_id, event_type,
               round(value, 2) AS value
        FROM corpus
        ORDER BY event_id
    """,
)
def replay_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return dedup_replayed(replay_corpus(ev)).orderBy("event_id")


# ---------------------------------------------------------------------------
# SCD2 dimension history — the MERGE-into-history face of ST1.


def scd2_history(
    snapshots: DataFrame, key: str, attrs: list[str], run_col: str = "run_date"
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from stacked
    snapshots: keep only rows whose tracked attributes differ from the
    key's previous snapshot (change detection via lag), then derive
    [valid_from, valid_to) from the surviving rows' run dates; the
    open row is current. One window shuffle on the key — the batch
    equivalent of a MERGE ... WHEN MATCHED AND attrs-changed pattern
    at 100 TB (partition-prune snapshots on run_date, shuffle once)."""
    fingerprint = F.md5(F.concat_ws("\x1f", *[F.col(a).cast("string") for a in attrs]))
    w_seq = Window.partitionBy(key).orderBy(run_col)
    changed = (
        snapshots.withColumn("_fp", fingerprint)
        .withColumn("_prev_fp", F.lag("_fp").over(w_seq))
        .filter(F.col("_prev_fp").isNull() | (F.col("_fp") != F.col("_prev_fp")))
    )
    w_ver = Window.partitionBy(key).orderBy(run_col)
    return changed.select(
        key,
        *attrs,
        F.col(run_col).alias("valid_from"),
        F.lead(run_col).over(w_ver).alias("valid_to"),
        F.lead(run_col).over(w_ver).isNull().cast("long").alias("is_current"),
    )


@register(
    "scd2_customer_history",
    tags=("incremental", "window"),
    doc="ST1 depth: type-2 slowly-changing-dimension merge over two "
    "customer snapshots (second run flips every 10th customer's "
    "segment and account balance; every 7th re-emits unchanged and "
    "must NOT open a new version — 7 is coprime with 10, so the "
    "unchanged-re-emit cohort is non-empty and genuinely exercises "
    "the lag-fingerprint suppression): change detection "
    "-> valid_from / valid_to / is_current via lead. The 'latest "
    "prior run' semantics of the reference's daily DAG "
    "(dags/orbit_daily_update_dag.py:126-216) generalized to full "
    "dimension history.",
    oracle="""
        WITH snaps AS (
          SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal,
                 '2024-01-01' AS run_date
          FROM customer
          UNION ALL
          SELECT c_custkey,
                 CASE WHEN c_custkey % 10 = 0 THEN 'CHANGED'
                      ELSE c_mktsegment END,
                 round(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100
                            ELSE c_acctbal END, 2),
                 '2024-02-01'
          FROM customer WHERE c_custkey % 10 = 0 OR c_custkey % 7 = 0
        ),
        seq AS (
          SELECT *, md5(c_mktsegment || chr(31) || CAST(acctbal AS VARCHAR)) AS fp,
                 lag(md5(c_mktsegment || chr(31) || CAST(acctbal AS VARCHAR))) OVER (
                   PARTITION BY c_custkey ORDER BY run_date) AS prev_fp
          FROM snaps
        ),
        hist AS (
          SELECT c_custkey, c_mktsegment, acctbal, run_date AS valid_from,
                 lead(run_date) OVER (PARTITION BY c_custkey ORDER BY run_date)
                   AS valid_to
          FROM seq
          WHERE prev_fp IS NULL OR fp != prev_fp
        )
        SELECT c_custkey, c_mktsegment, acctbal, valid_from, valid_to,
               CAST(valid_to IS NULL AS BIGINT) AS is_current
        FROM hist
        ORDER BY c_custkey, valid_from
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    snap1 = c.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("2024-01-01").alias("run_date"),
    )
    snap2 = (
        c.filter((F.col("c_custkey") % 10 == 0) | (F.col("c_custkey") % 7 == 0))
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 10 == 0, F.lit("CHANGED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            F.round(
                F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100).otherwise(
                    F.col("c_acctbal")
                ),
                2,
            ).alias("acctbal"),
            F.lit("2024-02-01").alias("run_date"),
        )
    )
    hist = scd2_history(
        snap1.unionByName(snap2), key="c_custkey", attrs=["c_mktsegment", "acctbal"]
    )
    return hist.orderBy("c_custkey", "valid_from")


# ---------------------------------------------------------------------------
# Lake-format MERGE gate


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    key: str,
) -> str:
    """CDC upsert with an explicit lake-format gate.

    When the ``delta`` package is importable (delta-spark + its JVM
    jars), the upsert is a real ``MERGE INTO`` on a Delta table —
    transactional, file-level data skipping on the key's stats, no
    table rewrite, and safe under concurrent writers; with partition
    or ZORDER clustering on the key the touched-file set is O(batch),
    which is the 100 TB contract. This substrate does not ship the
    delta package (mirroring the transformWithStateInPandas/protobuf
    gate in streaming/stateful.py), so the fallback is the parquet
    read → anti-join → union → staged-rewrite upsert
    (sources/connectors.py::upsert_parquet) — same final table
    contents, but a full-table rewrite per batch: correct and
    idempotent, acceptable at fixture scale, NOT the 100 TB plan.
    For a PARTITIONED target the stronger delta-less form is
    connectors.merge_upsert_partitioned (driver-checked as
    merge_upsert_documents): dynamic partition overwrite rewrites
    only the partitions the batch touches — O(touched partitions)
    per batch, with only row-level file skipping WITHIN a partition
    left on the delta side of the gate. docs/SCALE.md records the
    upgrade path.

    Returns which path executed: ``"delta_merge"`` or
    ``"parquet_rewrite"`` — callers and tests assert on it so the
    gate is visible, never silent.
    """
    try:
        from delta.tables import DeltaTable  # noqa: PLC0415
    except ImportError:
        from project_orbit_spark.sources.connectors import upsert_parquet

        upsert_parquet(spark, target_path, batch, key)
        return "parquet_rewrite"

    if DeltaTable.isDeltaTable(spark, target_path):
        (
            DeltaTable.forPath(spark, target_path)
            .alias("t")
            .merge(batch.alias("s"), f"t.{key} = s.{key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
    else:
        batch.write.format("delta").mode("overwrite").save(target_path)
    return "delta_merge"
