"""Multi-table CDC replay queries: the reference's table-DAG ingest
(refs → empresas → estabelecimentos → socios, ``src/downloader.py:85-160``)
re-expressed as a 3-table catalog derived deterministically from the shared
``events`` table — a keyed parent (``convs``), a keyed child
(``turns`` = the transcript envelope), and a KEYLESS append-only log
(``labels``, the no-PK ``socios`` path, src/database/postgres.py:213-214).

Both queries run the REAL engine (one :class:`MultiTableIngestJob` replay per
sf_dir, cached — the second query reads the already-committed lake tables)
and are gated against pure-SQL DuckDB folds of the same derived envelopes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cnpj_data_pipeline_spark.config import EngineConfig
from cnpj_data_pipeline_spark.lake.format import LakeTable
from cnpj_data_pipeline_spark.plans.catalog import (
    MultiTableIngestJob,
    TableCatalog,
    TableSpec,
)
from cnpj_data_pipeline_spark.queries.cdc import (
    CHANGES_CTE,
    N_EPOCHS,
    WINNERS_CTE,
    _events_max_id,
    _mk_scratch,
    changes_from_events,
)
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

CONV_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

LABEL_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CATALOG = TableCatalog(
    [
        TableSpec("convs", CONV_SCHEMA, key_cols=("conv_id",)),
        TableSpec(
            "turns",
            TRANSCRIPT_SCHEMA,
            key_cols=("conv_id", "turn_idx"),
            depends_on=("convs",),
            # FK-locality layout: all turns of a conversation in one bucket,
            # co-partitioned with convs — parent-change fan-outs and
            # conversation lookups prune to one bucket (plans/join.py)
            bucket_cols=("conv_id",),
        ),
        TableSpec("labels", LABEL_SCHEMA, key_cols=None, depends_on=("convs",)),
    ]
)


def conv_changes_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-table envelope: one conv-level op per event (LWW winner per
    conv = the highest-LSN event touching it)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    max_id = _events_max_id(sf_dir)
    return ev.select(
        F.concat(
            F.lit("c"), F.lpad((F.col("user_id") % 200).cast("string"), 8, "0")
        ).alias("conv_id"),
        F.concat(F.col("event_type"), F.lit(":"), F.col("event_id").cast("string")).alias(
            "title"
        ),
        F.col("ts"),
        F.when(F.col("event_type") == "purchase", "U").otherwise("I").alias("op"),
        F.col("event_id").cast("long").alias("lsn"),
        F.expr(f"CAST((event_id * {N_EPOCHS}) DIV {max_id + 1} AS INT)").alias("epoch"),
    )


def label_changes_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless append-only envelope: purchase events become label log rows
    (all inserts — the table has no key, so no LWW and no deletes)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    max_id = _events_max_id(sf_dir)
    return ev.filter(F.col("event_type") == "purchase").select(
        F.concat(
            F.lit("c"), F.lpad((F.col("user_id") % 200).cast("string"), 8, "0")
        ).alias("conv_id"),
        F.concat(F.lit("purchase:"), F.coalesce(F.col("props"), F.lit(""))).alias(
            "label"
        ),
        F.col("ts"),
        F.lit("I").alias("op"),
        F.col("event_id").cast("long").alias("lsn"),
        F.expr(f"CAST((event_id * {N_EPOCHS}) DIV {max_id + 1} AS INT)").alias("epoch"),
    )


_REPLAY_CACHE: dict[str, str] = {}  # sf_dir -> MultiTableIngestJob root


def _multi_replay(spark: SparkSession, sf_dir: str) -> MultiTableIngestJob:
    """Stage the three derived WALs and replay them through the engine once
    per sf_dir; later queries read the committed lake tables."""
    root = _REPLAY_CACHE.get(sf_dir)
    cfg = EngineConfig(n_buckets=16, salt_factor=2)
    if root and os.path.isdir(root):
        return MultiTableIngestJob(os.path.join(root, "lakes"), CATALOG, cfg)
    root = _mk_scratch("cdc_multi_")
    wal_root = os.path.join(root, "wal")
    # stage each WAL BUCKET-ALIGNED with its table's layout (turns: the
    # conv_id prefix layout; convs: full key; labels: keyless/lsn) — the
    # catalog loop then takes the shuffle-free co-partitioned apply per
    # (table, epoch), the keyed-upstream deployment shape
    from cnpj_data_pipeline_spark.sources.change_stream import (
        write_epoch_bucketed,
    )

    for name, df, bcols in (
        ("convs", conv_changes_from_events(spark, sf_dir), ["conv_id"]),
        ("turns", changes_from_events(spark, sf_dir), ["conv_id"]),
        ("labels", label_changes_from_events(spark, sf_dir), None),
    ):
        df = df.persist()
        for e in range(N_EPOCHS):
            write_epoch_bucketed(
                df.filter(F.col("epoch") == e).drop("epoch"),
                os.path.join(wal_root, name),
                e,
                bcols,
                cfg.n_buckets,
            )
        df.unpersist()
    job = MultiTableIngestJob(os.path.join(root, "lakes"), CATALOG, cfg)
    metrics = job.run_stream(spark, wal_root)
    assert all(m.get("copartitioned") or m.get("skipped") for m in metrics), [
        (m["table"], m["epoch"]) for m in metrics if not m.get("copartitioned")
    ]
    _REPLAY_CACHE[sf_dir] = root
    return job


def q_multi_table_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (multi-table): replay a 3-table dependency DAG — keyed parent,
    keyed child, keyless log — through the catalog ingest job, then join the
    final states: per conversation, its LWW title, live turn count, and
    appended label count."""
    job = _multi_replay(spark, sf_dir)
    convs = job.read(spark, "convs")
    turns = job.read(spark, "turns")
    labels = job.read(spark, "labels")
    n_turns = turns.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    n_labels = labels.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_labels"))
    return (
        convs.select("conv_id", "title")
        .join(n_turns, "conv_id", "left")
        .join(n_labels, "conv_id", "left")
        .select(
            "conv_id",
            "title",
            F.coalesce(F.col("n_turns"), F.lit(0)).cast("long").alias("n_turns"),
            F.coalesce(F.col("n_labels"), F.lit(0)).cast("long").alias("n_labels"),
        )
    )


def q_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZED JOIN VIEW, incrementally maintained: turns LEFT-joined to
    their conversation's LWW title — built ONCE from both lake tables'
    change feeds by :class:`JoinSyncJob` (child typed window + parent
    fan-out, frontier-CAS exactly-once in table props), then read as a plain
    table. The reference re-joins Postgres per query; here readers pay a
    scan. Child fan-out lookups prune on the conv-bucketed layout
    (``bucket_cols=('conv_id',)``)."""
    from cnpj_data_pipeline_spark.plans.join import JoinSyncJob

    job = _multi_replay(spark, sf_dir)
    view = JoinSyncJob(
        job.table_path("turns"),
        job.table_path("convs"),
        os.path.join(_mk_scratch("cdc_join_"), "view"),
        cfg=EngineConfig(n_buckets=16, salt_factor=2),
        parent_cols=["title"],  # convs.ts collides with turns.ts (flat view)
    )
    view.run_once(spark)
    return view.read(spark).select(
        "conv_id", "turn_idx", "role", "text", "title"
    )


def q_ivm_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-REFRESH IVM (non-invertible aggregates): per-conversation MAX
    text length and DISTINCT role count, maintained by re-aggregating only
    the groups each change window touches — the fallback for aggregates
    delta-IVM cannot retract (deleting the extremum needs the runner-up).
    Refresh reads prune on the conv-bucketed ``turns`` layout."""
    from cnpj_data_pipeline_spark.plans.ivm import GroupRefreshSyncJob

    job = _multi_replay(spark, sf_dir)
    view = GroupRefreshSyncJob(
        job.table_path("turns"),
        os.path.join(_mk_scratch("cdc_minmax_"), "view"),
        ["conv_id"],
        {
            "max_chars": "max(coalesce(length(text), 0))",
            "n_roles": "count(distinct role)",
        },
        cfg=EngineConfig(n_buckets=16, salt_factor=2),
    )
    view.run_once(spark)
    return view.read(spark).select(
        "conv_id",
        F.col("max_chars").cast("long").alias("max_chars"),
        F.col("n_roles").cast("long").alias("n_roles"),
    )


def q_time_window_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST-STATS time-window scan of the keyless append-only label log:
    ``read_range`` skips every data file whose footer-harvested ts min/max
    misses the window BEFORE Spark plans the scan (file-level pruning above
    Parquet's own row-group pushdown) — the O(window)-IO read an event log
    needs at 10^10 rows. Window: the last 7 days of the log, bounds taken
    from the table's own max ts (deterministic from the data)."""
    import datetime as _dtm

    job = _multi_replay(spark, sf_dir)
    t = LakeTable.load(job.table_path("labels"))
    hi = t.read(spark).agg(F.max("ts")).collect()[0][0]
    lo = hi - _dtm.timedelta(days=7)
    return (
        t.read_range(spark, "ts", lo=lo)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_labels"),
            F.max("ts").alias("last_ts"),
        )
    )


def q_asof_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF (temporal) join: every turn change event is joined to the
    conversation title revision in force at its LSN (revisions = the 'U'
    conv-level ops). One shuffle, union+running-last composition — no range
    explosion; gated against DuckDB's native ASOF JOIN."""
    from cnpj_data_pipeline_spark.operators.asof import asof_join

    turns = changes_from_events(spark, sf_dir).select("conv_id", "turn_idx", "lsn")
    dims = (
        conv_changes_from_events(spark, sf_dir)
        .filter(F.col("op") == "U")
        .select("conv_id", "lsn", "title")
    )
    return asof_join(turns, dims, on=["conv_id"], order_col="lsn", payload_cols=["title"])


def q_append_only_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless append-only table read-back: every appended row is visible
    (no LWW, no tombstones), with the commit LSN exposed from the row's
    lineage meta column."""
    job = _multi_replay(spark, sf_dir)
    t = LakeTable.load(job.table_path("labels"))
    return t.read(spark, include_meta=True).select(
        "conv_id", "label", F.col("__lsn").alias("lsn"), "ts"
    )


def q_multi_table_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATOMIC MULTI-TABLE TRANSACTIONS (``lake/txn_catalog.py``): each
    epoch's convs + turns batches stage through ONE
    :class:`MultiTableTransaction` (full merge pipeline, nothing visible)
    and land in a single catalog CAS — readers resolving tables through the
    catalog never see a torn epoch. The last epoch deliberately stops at the
    2PC commit point (``prepare()`` — the prepared record is durable, the
    catalog vector untouched) and is completed by ``Catalog.recover()``, the
    restarted-coordinator path; final state is read THROUGH the catalog
    pins. Oracle: the same pure-SQL LWW folds as ``q_multi_table_replay``.
    The reference's loader commits per file with NO spanning transaction
    (src/database/postgres.py:183-196) — this closes that torn-read window.
    """
    from cnpj_data_pipeline_spark.lake.txn_catalog import Catalog

    root = _mk_scratch("cdc_txn_")
    cfg = EngineConfig(n_buckets=16, salt_factor=2)
    convs_t = LakeTable.create(
        os.path.join(root, "convs"), CONV_SCHEMA, ["conv_id"], cfg.n_buckets
    )
    turns_t = LakeTable.create(
        os.path.join(root, "turns"),
        TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"],
        cfg.n_buckets,
    )
    cat = Catalog.create(
        os.path.join(root, "cat"), {"convs": convs_t, "turns": turns_t}
    )
    conv_ch = conv_changes_from_events(spark, sf_dir).persist()
    turn_ch = changes_from_events(spark, sf_dir).persist()
    for e in range(N_EPOCHS):
        txn = cat.begin(cfg=cfg)
        txn.apply(
            spark, "convs", conv_ch.filter(F.col("epoch") == e).drop("epoch"),
            epoch=e,
        )
        txn.apply(
            spark, "turns", turn_ch.filter(F.col("epoch") == e).drop("epoch"),
            epoch=e,
        )
        if e < N_EPOCHS - 1:
            txn.commit()
        else:
            txn.prepare()  # durable 2PC record; "crash" before completion
            assert cat.current_version() == e, "torn visibility pre-recovery"
            recovered = Catalog.load(cat.root).recover()
            assert recovered == [e + 1], recovered
    conv_ch.unpersist()
    turn_ch.unpersist()
    n_turns = (
        cat.read(spark, "turns")
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    return (
        cat.read(spark, "convs")
        .select("conv_id", "title")
        .join(n_turns, "conv_id", "left")
        .select(
            "conv_id",
            "title",
            F.coalesce(F.col("n_turns"), F.lit(0)).cast("long").alias("n_turns"),
        )
    )


def q_multi_table_txn_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same atomic 2-table replay driven PURELY through the SQL script
    surface (``lake/ddl.py:run_sql_script``): each epoch is one
    ``BEGIN TRANSACTION; MERGE INTO convs …; MERGE INTO turns …; COMMIT;``
    block compiling to a :class:`MultiTableTransaction` — staged through
    write-audit-publish, visible in ONE catalog CAS. The last epoch
    "crashes" at the 2PC commit point (``prepare()``) and is completed by
    the NEXT script run's built-in recovery, whose own statements then
    skip under the epoch ledger (the resumable-script contract extended
    across transaction blocks). Oracle: same pure-SQL folds as
    ``q_multi_table_txn``. Postgres gives the reference BEGIN/COMMIT for
    free (its loader doesn't even use it, src/database/postgres.py:183-196);
    this is the lake engine's equivalent, exactly-once throughout."""
    from cnpj_data_pipeline_spark.lake.ddl import run_sql_script
    from cnpj_data_pipeline_spark.lake.txn_catalog import Catalog

    root = _mk_scratch("cdc_txn_sql_")
    cfg = EngineConfig(n_buckets=16, salt_factor=2)
    convs_t = LakeTable.create(
        os.path.join(root, "convs"), CONV_SCHEMA, ["conv_id"], cfg.n_buckets
    )
    turns_t = LakeTable.create(
        os.path.join(root, "turns"),
        TRANSCRIPT_SCHEMA,
        ["conv_id", "turn_idx"],
        cfg.n_buckets,
    )
    cat = Catalog.create(
        os.path.join(root, "cat"), {"convs": convs_t, "turns": turns_t}
    )
    conv_ch = conv_changes_from_events(spark, sf_dir).persist()
    turn_ch = changes_from_events(spark, sf_dir).persist()
    script = """
    BEGIN TRANSACTION;
    MERGE INTO convs AS t USING __txn_sql_convs AS s
      ON t.conv_id = s.conv_id
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *;
    MERGE INTO turns AS t USING __txn_sql_turns AS s
      ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
      WHEN MATCHED AND s.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *;
    COMMIT;
    """
    stmts = [s.strip() for s in script.strip().split(";") if s.strip()][1:3]
    for e in range(N_EPOCHS):
        conv_ch.filter(F.col("epoch") == e).drop("epoch").createOrReplaceTempView(
            "__txn_sql_convs"
        )
        turn_ch.filter(F.col("epoch") == e).drop("epoch").createOrReplaceTempView(
            "__txn_sql_turns"
        )
        if e < N_EPOCHS - 1:
            run_sql_script(
                spark, script, epoch_base=2 * e, cfg=cfg, catalog=cat
            )
        else:
            # coordinator "crash" at the 2PC commit point ...
            txn = cat.begin(cfg=cfg)
            txn.sql(spark, stmts[0], epoch=2 * e)
            txn.sql(spark, stmts[1], epoch=2 * e + 1)
            txn.prepare()
            assert cat.current_version() == e, "torn visibility pre-recovery"
            # ... the restarted run recovers it, then skips its own block
            res = run_sql_script(
                spark, script, epoch_base=2 * e, cfg=cfg, catalog=cat
            )
            assert all(
                r["result"]["skipped"] for r in res if r["kind"] == "dml"
            )
            assert cat.current_version() == e + 1
    conv_ch.unpersist()
    turn_ch.unpersist()
    n_turns = (
        cat.read(spark, "turns")
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    return (
        cat.read(spark, "convs")
        .select("conv_id", "title")
        .join(n_turns, "conv_id", "left")
        .select(
            "conv_id",
            "title",
            F.coalesce(F.col("n_turns"), F.lit(0)).cast("long").alias("n_turns"),
        )
    )


CONV_CHANGES_CTE = """
conv_changes AS (
  SELECT 'c' || lpad(CAST(user_id % 200 AS VARCHAR), 8, '0') AS conv_id,
         event_type || ':' || CAST(event_id AS VARCHAR) AS title,
         ts,
         CASE WHEN event_type = 'purchase' THEN 'U' ELSE 'I' END AS op,
         CAST(event_id AS BIGINT) AS lsn
  FROM events
),
conv_winners AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id
        ORDER BY lsn DESC, ts DESC, op DESC, coalesce(title, '') DESC
    ) AS rn
    FROM conv_changes
  ) WHERE rn = 1
)
"""

LABELS_CTE = """
labels AS (
  SELECT 'c' || lpad(CAST(user_id % 200 AS VARCHAR), 8, '0') AS conv_id,
         'purchase:' || coalesce(props, '') AS label,
         ts,
         CAST(event_id AS BIGINT) AS lsn
  FROM events WHERE event_type = 'purchase'
)
"""

QUERIES = {
    "q_multi_table_replay": q_multi_table_replay,
    "q_multi_table_txn": q_multi_table_txn,
    "q_multi_table_txn_sql": q_multi_table_txn_sql,
    "q_append_only_log": q_append_only_log,
    "q_asof_titles": q_asof_titles,
    "q_join_view": q_join_view,
    "q_ivm_minmax": q_ivm_minmax,
    "q_time_window_scan": q_time_window_scan,
}

ORACLES = {
    "q_multi_table_replay": f"""
        WITH {CHANGES_CTE.strip()}, {WINNERS_CTE.strip()},
        {CONV_CHANGES_CTE.strip()}, {LABELS_CTE.strip()},
        alive_turns AS (
          SELECT conv_id, count(*) AS n FROM winners WHERE op <> 'D' GROUP BY conv_id
        ),
        label_counts AS (
          SELECT conv_id, count(*) AS n FROM labels GROUP BY conv_id
        )
        SELECT c.conv_id, c.title,
               CAST(coalesce(t.n, 0) AS BIGINT) AS n_turns,
               CAST(coalesce(l.n, 0) AS BIGINT) AS n_labels
        FROM conv_winners c
        LEFT JOIN alive_turns t ON c.conv_id = t.conv_id
        LEFT JOIN label_counts l ON c.conv_id = l.conv_id
    """,
    "q_multi_table_txn": f"""
        WITH {CHANGES_CTE.strip()}, {WINNERS_CTE.strip()},
        {CONV_CHANGES_CTE.strip()},
        alive_turns AS (
          SELECT conv_id, count(*) AS n FROM winners WHERE op <> 'D' GROUP BY conv_id
        )
        SELECT c.conv_id, c.title,
               CAST(coalesce(t.n, 0) AS BIGINT) AS n_turns
        FROM conv_winners c
        LEFT JOIN alive_turns t ON c.conv_id = t.conv_id
    """,
    "q_multi_table_txn_sql": f"""
        WITH {CHANGES_CTE.strip()}, {WINNERS_CTE.strip()},
        {CONV_CHANGES_CTE.strip()},
        alive_turns AS (
          SELECT conv_id, count(*) AS n FROM winners WHERE op <> 'D' GROUP BY conv_id
        )
        SELECT c.conv_id, c.title,
               CAST(coalesce(t.n, 0) AS BIGINT) AS n_turns
        FROM conv_winners c
        LEFT JOIN alive_turns t ON c.conv_id = t.conv_id
    """,
    "q_append_only_log": f"""
        WITH {LABELS_CTE.strip()}
        SELECT conv_id, label, lsn, ts FROM labels
    """,
    "q_time_window_scan": f"""
        WITH {LABELS_CTE.strip()}
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_labels,
               max(ts) AS last_ts
        FROM labels
        WHERE ts >= (SELECT max(ts) FROM labels) - INTERVAL 7 DAY
        GROUP BY conv_id
    """,
    "q_join_view": f"""
        WITH {CHANGES_CTE.strip()}, {WINNERS_CTE.strip()},
        {CONV_CHANGES_CTE.strip()}
        SELECT w.conv_id, w.turn_idx, w.role, w.text, c.title
        FROM winners w
        LEFT JOIN conv_winners c ON w.conv_id = c.conv_id
        WHERE w.op <> 'D'
    """,
    "q_ivm_minmax": f"""
        WITH {CHANGES_CTE.strip()}, {WINNERS_CTE.strip()},
        live AS (SELECT * FROM winners WHERE op <> 'D')
        SELECT conv_id,
               CAST(max(coalesce(length(text), 0)) AS BIGINT) AS max_chars,
               CAST(count(DISTINCT role) AS BIGINT) AS n_roles
        FROM live GROUP BY conv_id
    """,
    "q_asof_titles": f"""
        WITH {CHANGES_CTE.strip()},
        dims AS (
          SELECT 'c' || lpad(CAST(user_id % 200 AS VARCHAR), 8, '0') AS conv_id,
                 CAST(event_id AS BIGINT) AS lsn,
                 event_type || ':' || CAST(event_id AS VARCHAR) AS title
          FROM events WHERE event_type = 'purchase'
        )
        SELECT t.conv_id, t.turn_idx, t.lsn, d.title AS title_asof
        FROM changes t
        ASOF LEFT JOIN dims d ON t.conv_id = d.conv_id AND t.lsn >= d.lsn
    """,
}
