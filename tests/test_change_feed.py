"""Change-data-feed reads (LakeTable.read_changes): the lake-side half of CDC.

The ingest tails an upstream WAL in; ``read_changes`` lets downstream
consumers tail this table OUT incrementally — O(changed data) IO via
snapshot-manifest file diffs, never a state re-scan. Semantics under test:

- the feed folded with the engine LWW order == the LWW fold over the raw
  window events (associativity of the max: per-epoch winners then
  max-over-epochs == max over the window);
- maintenance commits (compaction) inside the window are invisible;
- additive schema evolution inside the window pads old deltas with NULL;
- copy-on-write commits (file replacement = state, not changes) raise.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.gen import epoch_batches, gen_changes
from cnpj_data_pipeline_spark.lake.format import LSN_META_COL, OP_META_COL
from cnpj_data_pipeline_spark.operators.dedup import lww_winners_agg
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

KEY = ["conv_id", "turn_idx"]


def _window_winners(
    raw: pd.DataFrame, min_epoch: int, extra_cols: tuple[str, ...] = ()
) -> pd.DataFrame:
    """Pandas LWW fold (winners INCLUDING tombstones) over events with
    epoch >= min_epoch — the independent referee for the net change feed."""
    df = raw[raw["epoch"] >= min_epoch].copy()
    for c in ("text", "tool", "role"):
        df[f"_{c}"] = df[c].fillna("") if c in df else ""
    order = ["lsn", "ts", "op", "_text", "_tool", "_role"]
    df = df.sort_values(order, ascending=[False] * len(order), kind="mergesort")
    out = df.drop_duplicates(subset=KEY, keep="first")
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", *extra_cols, "op", "lsn"]
    return out[cols].sort_values(KEY, kind="mergesort").reset_index(drop=True)


def _net_feed(spark, table: LakeTable, from_sid: int) -> pd.DataFrame:
    feed = table.read_changes(spark, from_sid)
    net = lww_winners_agg(feed, KEY, lsn_col=LSN_META_COL, op_col=OP_META_COL)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if "tool_meta" in net.columns:
        cols.append("tool_meta")
    got = net.toPandas()
    got = got.rename(columns={LSN_META_COL: "lsn", OP_META_COL: "op"})
    return (
        got[cols + ["op", "lsn"]]
        .sort_values(KEY, kind="mergesort")
        .reset_index(drop=True)
    )


def _ingest(spark, root, ch, n_epochs, cfg, **batch_kw):
    table = LakeTable.create(root, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets)
    sids = []
    for e, batch in epoch_batches(ch, n_epochs, **batch_kw):
        m = apply_changes(spark, table, batch, epoch=e, cfg=cfg)
        sids.append(m["snapshot_id"])
    return table, sids


def test_change_feed_matches_raw_window_fold(spark, tmp_table):
    cfg = EngineConfig(n_buckets=8)
    ch = gen_changes(spark, n_events=3_000, n_convs=60, n_epochs=3)
    raw = ch.toPandas()
    table, sids = _ingest(spark, tmp_table, ch, 3, cfg)

    got = _net_feed(spark, table, sids[0])
    exp = _window_winners(raw, min_epoch=1)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # full-history window from the create snapshot: every key ever touched
    got_all = _net_feed(spark, table, 0)
    exp_all = _window_winners(raw, min_epoch=0)
    pd.testing.assert_frame_equal(got_all, exp_all, check_dtype=False)

    # empty window
    assert table.read_changes(spark, table.current_snapshot_id()).count() == 0


def test_change_feed_skips_compaction_rewrites(spark, tmp_table):
    # aggressive compaction: rewrites fire inside the window but are
    # metadata-skipped, and the original delta files remain readable
    cfg = EngineConfig(n_buckets=4, compact_threshold=2)
    ch = gen_changes(spark, n_events=3_000, n_convs=60, n_epochs=3)
    raw = ch.toPandas()
    table, sids = _ingest(spark, tmp_table, ch, 3, cfg)
    assert any(s["op"] == "compact" for s in table.snapshots())

    got = _net_feed(spark, table, sids[0])
    exp = _window_winners(raw, min_epoch=1)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_change_feed_pads_pre_evolution_deltas(spark, tmp_table):
    # schema grows at epoch 1 (inside the window): epoch-0 deltas lack
    # tool_meta and must read back as NULL under the evolved schema
    cfg = EngineConfig(n_buckets=4)
    ch = gen_changes(spark, n_events=2_000, n_convs=40, n_epochs=2, evolve_at_epoch=1)
    raw = ch.toPandas()
    table, _ = _ingest(spark, tmp_table, ch, 2, cfg, drop_evolved_before=1)

    feed = table.read_changes(spark, 0)
    assert "tool_meta" in feed.columns
    got = _net_feed(spark, table, 0)
    # referee carries the winner row's tool_meta through the fold; the sink
    # saw epoch-0 batches WITHOUT the column, so pre-evolution winners must
    # come back NULL — mask the raw column the same way
    raw.loc[raw["epoch"] < 1, "tool_meta"] = None
    exp = _window_winners(raw, min_epoch=0, extra_cols=("tool_meta",))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_derived_table_sync_resumes_exactly_once(spark, tmp_table, tmp_path):
    """The CDC-consumer loop (base feed → transform → derived merge) crashes
    after two epochs and is re-run from the top: already-applied epochs are
    idempotently skipped, the missing epoch applies, and the derived state
    equals the transform of the base's final state."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cnpj_data_pipeline_spark.oracle import final_state

    cfg = EngineConfig(n_buckets=8)
    ch = gen_changes(spark, n_events=3_000, n_convs=60, n_epochs=3)
    raw = ch.toPandas()
    base, _ = _ingest(spark, tmp_table, ch, 3, cfg)

    derived_schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
    ])
    derived = LakeTable.create(str(tmp_path / "derived"), derived_schema, KEY, 8)

    def sync(stop_after: int | None = None) -> None:
        applies = [
            s for s in base.snapshots()
            if s["op"] in ("append", "evolve") and s.get("epoch") is not None
        ]
        prev = 0
        for i, s in enumerate(applies):
            if stop_after is not None and i >= stop_after:
                return  # injected consumer crash mid-stream
            feed = base.read_changes(spark, prev, s["snapshot_id"])
            tr = feed.select(
                "conv_id", "turn_idx",
                F.length("text").cast("int").alias("n_chars"),
                F.col(LSN_META_COL).alias("lsn"),
                F.col(OP_META_COL).alias("op"),
                "ts",
            )
            apply_changes(spark, derived, tr, epoch=s["epoch"], cfg=cfg)
            prev = s["snapshot_id"]

    sync(stop_after=2)
    assert sorted(derived.applied_epochs()) == [0, 1]
    sync()  # full re-run: epochs 0-1 skip, epoch 2 applies
    assert sorted(derived.applied_epochs()) == [0, 1, 2]

    got = (
        derived.read(spark).toPandas()
        .sort_values(KEY, kind="mergesort").reset_index(drop=True)
    )
    exp = final_state(raw)[["conv_id", "turn_idx", "text"]].copy()
    exp["n_chars"] = exp.pop("text").str.len()
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "n_chars"]], exp, check_dtype=False
    )


def test_change_feed_rejects_copy_on_write_window(spark, tmp_table):
    cfg = EngineConfig(n_buckets=4, write_mode="cow")
    ch = gen_changes(spark, n_events=1_000, n_convs=30, n_epochs=2)
    table, _ = _ingest(spark, tmp_table, ch, 2, cfg)
    with pytest.raises(ValueError, match="copy-on-write"):
        table.read_changes(spark, 0)


_events = st.lists(
    st.tuples(
        st.integers(0, 5),            # conv
        st.integers(0, 3),            # turn
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 30),           # lsn (collisions likely)
        st.one_of(st.none(), st.text(alphabet="abç;", max_size=6)),
    ),
    min_size=1,
    max_size=36,
)


def _to_pdf(events):
    rows = []
    for i, (conv, turn, op, lsn, text) in enumerate(events):
        rows.append(
            {
                "conv_id": f"c{conv:08d}",
                "turn_idx": turn,
                "role": "user",
                "text": None if op == "D" else (text or f"t{i}"),
                "tool": None,
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=lsn),
                "op": op,
                "lsn": lsn,
            }
        )
    return pd.DataFrame(rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=_events,
    cut1=st.integers(0, 35),
    cut2=st.integers(0, 35),
    boundary=st.integers(0, 3),
)
def test_random_change_feed_windows_match_fold(
    spark, tmp_path_factory, events, cut1, cut2, boundary
):
    """For ANY random stream (duplicate LSNs, deletes, ties differing only in
    payload), ANY 3-way epoch slicing, and ANY window boundary, folding
    read_changes over the window equals the pandas LWW fold over exactly the
    window's raw events — the associativity claim, fuzzed."""
    pdf = _to_pdf(events)
    a, b = sorted((min(cut1, len(pdf)), min(cut2, len(pdf))))
    parts = [p for p in (pdf.iloc[:a], pdf.iloc[a:b], pdf.iloc[b:]) if len(p)]

    lake = str(tmp_path_factory.mktemp("cdf") / "lake")
    cfg = EngineConfig(n_buckets=4, salt_factor=2)
    table = LakeTable.create(lake, TRANSCRIPT_SCHEMA, KEY, 4)
    sids = []
    for e, part in enumerate(parts):
        m = apply_changes(spark, table, spark.createDataFrame(part), epoch=e, cfg=cfg)
        sids.append(m["snapshot_id"])

    bnd = min(boundary, len(parts))
    from_sid = 0 if bnd == 0 else sids[bnd - 1]
    got = _net_feed(spark, table, from_sid)

    window = pd.concat(parts[bnd:]) if parts[bnd:] else pdf.iloc[0:0]
    window = window.assign(epoch=0)
    exp = _window_winners(window, min_epoch=0)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_change_feed_unknown_snapshot_raises(spark, tmp_table):
    cfg = EngineConfig(n_buckets=4)
    ch = gen_changes(spark, n_events=500, n_convs=20, n_epochs=1)
    table, _ = _ingest(spark, tmp_table, ch, 1, cfg)
    with pytest.raises(ValueError, match="not in reachable history"):
        table.read_changes(spark, 99)


def test_mirror_replication_follows_base(spark, tmp_table, tmp_path):
    """FeedSyncJob with no transform is incremental lake->lake replication:
    after each sync the replica's visible state equals the base's, schema
    evolution flows through, and re-syncing is a metadata no-op."""
    from cnpj_data_pipeline_spark.plans.sync import FeedSyncJob

    cfg = EngineConfig(n_buckets=8)
    ch = gen_changes(spark, n_events=2_000, n_convs=40, n_epochs=2, evolve_at_epoch=1)
    batches = list(epoch_batches(ch, 2, drop_evolved_before=1))
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets)
    replica_root = str(tmp_path / "replica")
    job = FeedSyncJob(tmp_table, replica_root, cfg=cfg)

    def assert_replica_matches():
        b = base.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
        r = (
            LakeTable.load(replica_root).read(spark)
            .orderBy(*KEY).toPandas().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(r[b.columns], b, check_dtype=False)

    # epoch 0: pre-evolution
    apply_changes(spark, base, batches[0][1], epoch=0, cfg=cfg)
    m = job.run_once(spark)
    assert m["epochs_synced"] == [0] and m["epochs_behind"] == 0
    assert_replica_matches()

    # epoch 1: schema evolves mid-stream; the replica must pick up tool_meta
    apply_changes(spark, base, batches[1][1], epoch=1, cfg=cfg)
    m = job.run_once(spark)
    assert m["epochs_synced"] == [1]
    assert "tool_meta" in LakeTable.load(replica_root).schema().fieldNames()
    assert_replica_matches()

    # idempotent re-sync: nothing to do
    m = job.run_once(spark)
    assert m["epochs_synced"] == [] and m["rows_applied"] == 0


def test_follow_loop_and_expired_window(spark, tmp_table, tmp_path):
    """run_follow drains pending epochs across polls, and a feed window whose
    snapshots were GC'd by expire_snapshots fails loudly instead of silently
    dropping changes."""
    from cnpj_data_pipeline_spark.plans.sync import FeedSyncJob

    cfg = EngineConfig(n_buckets=4)
    ch = gen_changes(spark, n_events=1_200, n_convs=30, n_epochs=3)
    parts = list(epoch_batches(ch, 3))
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets)
    apply_changes(spark, base, parts[0][1], epoch=0, cfg=cfg)

    job = FeedSyncJob(tmp_table, str(tmp_path / "replica"), cfg=cfg)
    m = job.run_follow(spark, poll_seconds=0.0, max_polls=2)
    assert m["epochs_synced"] == [0] and m["polls"] == 2

    for e, batch in parts[1:]:
        apply_changes(spark, base, batch, epoch=e, cfg=cfg)
    m = job.run_follow(spark, poll_seconds=0.0, max_polls=1)
    assert m["epochs_synced"] == [1, 2]

    # expire history: a window reaching past the GC horizon must raise
    base.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError):
        base.read_changes(spark, 1)


def test_streaming_cdf_source_exactly_once(spark, tmp_table, tmp_path):
    """The lake_cdf Python Data Source: the change feed as a Structured
    Streaming source. A first availableNow drain emits epoch 0's feed; the
    query restarts from Spark's own offset log and emits ONLY epoch 1's
    window — and the streamed union equals the batch read_changes feed."""
    from cnpj_data_pipeline_spark.streaming.cdf_source import register_cdf_source

    cfg = EngineConfig(n_buckets=4)
    ch = gen_changes(spark, n_events=1_500, n_convs=30, n_epochs=2)
    parts = list(epoch_batches(ch, 2))
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets)
    apply_changes(spark, base, parts[0][1], epoch=0, cfg=cfg)

    register_cdf_source(spark)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("lake_cdf").load(tmp_table)
            .writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120)

    drain()
    n_first = spark.read.parquet(sink).count()
    assert n_first == base.read_changes(spark, 0).count()

    apply_changes(spark, base, parts[1][1], epoch=1, cfg=cfg)
    drain()  # restart: resumes from the committed snapshot offset
    streamed = spark.read.parquet(sink)
    batch = base.read_changes(spark, 0)
    assert streamed.count() == batch.count()  # no dup, no loss
    cols = [c for c in batch.columns]
    assert streamed.select(cols).exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed.select(cols)).count() == 0


def test_streaming_cdf_options(spark, tmp_table, tmp_path):
    """lake_cdf source options: fromSnapshot starts a late-joining consumer
    past bootstrapped history; maxSnapshotsPerBatch bounds each steady-state
    micro-batch of a live tail (the initial drain is unclamped by API
    constraint — latestOffset precedes initialOffset, and an offset below a
    restart's committed start would be an illegal regression)."""
    import glob as g
    import time as tm

    from cnpj_data_pipeline_spark.streaming.cdf_source import register_cdf_source

    cfg = EngineConfig(n_buckets=4)
    ch = gen_changes(spark, n_events=1_600, n_convs=30, n_epochs=4)
    parts = list(epoch_batches(ch, 4))
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets)
    sid0 = apply_changes(spark, base, parts[0][1], epoch=0, cfg=cfg)["snapshot_id"]
    register_cdf_source(spark)

    # live tail with per-batch cap: 3 epochs land while the query runs
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("lake_cdf")
        .option("maxSnapshotsPerBatch", 1).load(tmp_table)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds").start()
    )
    try:
        tm.sleep(3)
        for e, b in parts[1:]:
            apply_changes(spark, base, b, epoch=e, cfg=cfg)
        exp = base.read_changes(spark, 0).count()
        for _ in range(90):
            tm.sleep(1)
            try:
                if spark.read.parquet(sink).count() >= exp:
                    break
            except Exception:
                pass
    finally:
        q.stop()
    assert spark.read.parquet(sink).count() == exp
    assert len(g.glob(os.path.join(ckpt, "offsets", "*"))) >= 4  # bounded batches

    # fromSnapshot: skip epoch 0 entirely
    sink2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    q = (
        spark.readStream.format("lake_cdf")
        .option("fromSnapshot", sid0).load(tmp_table)
        .writeStream.format("parquet")
        .option("path", sink2).option("checkpointLocation", ckpt2)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    assert spark.read.parquet(sink2).count() == base.read_changes(spark, sid0).count()


def test_rebucket_grows_layout_invisibly(spark, tmp_table):
    """Bucket-count evolution: rewrite a 4-bucket table into 16 buckets
    mid-stream — state is bit-identical, ingest resumes exactly-once against
    the new layout, point lookups prune the new buckets, and the change feed
    skips the rewrite (full-history fold unchanged)."""
    from cnpj_data_pipeline_spark.oracle import final_state

    cfg = EngineConfig(n_buckets=4)
    ch = gen_changes(spark, n_events=3_000, n_convs=60, n_epochs=3)
    raw = ch.toPandas()
    parts = list(epoch_batches(ch, 3))
    table = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets)
    for e, b in parts[:2]:
        apply_changes(spark, table, b, epoch=e, cfg=cfg)
    before = table.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)

    table.rebucket(spark, 16)
    assert table.n_buckets() == 16
    after = table.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(after, before)

    # ingest continues against the new layout, exactly-once
    apply_changes(spark, table, parts[2][1], epoch=2, cfg=cfg)
    assert sorted(table.applied_epochs()) == [0, 1, 2]
    final = table.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(final, final_state(raw), check_dtype=False)

    # point lookup prunes the 16-bucket layout
    some = final.iloc[:5][KEY]
    keys = spark.createDataFrame(some)
    assert table.read_keys(spark, keys).count() == len(some)

    # the change feed never sees the rewrite
    got = _net_feed(spark, table, 0)
    exp = _window_winners(raw, min_epoch=0)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_streaming_cdf_rejects_midstream_evolve(spark, tmp_table, tmp_path):
    """Round-3 fix: a schema-widening (evolve) commit landing MID-STREAM must
    fail the lake_cdf query loudly — the stream's schema is fixed at query
    start, and the old behavior silently dropped the new column from the
    feed. After a restart (fresh query = fresh schema) the full evolved feed
    streams through with no column data lost."""
    from cnpj_data_pipeline_spark.streaming.cdf_source import register_cdf_source

    cfg = EngineConfig(n_buckets=4)
    ch = gen_changes(
        spark, n_events=1_200, n_convs=30, n_epochs=2, evolve_at_epoch=1
    )
    parts = list(epoch_batches(ch, 2, drop_evolved_before=1))
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets)
    apply_changes(spark, base, parts[0][1], epoch=0, cfg=cfg)

    register_cdf_source(spark)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("lake_cdf").load(tmp_table)
            .writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120)

    import time as tm

    from pyspark.errors.exceptions.captured import StreamingQueryException

    # LIVE query: its schema is fixed now, pre-evolution
    n0 = base.read_changes(spark, 0).count()
    q = (
        spark.readStream.format("lake_cdf").load(tmp_table)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds").start()
    )
    try:
        for _ in range(60):
            tm.sleep(1)
            try:
                if spark.read.parquet(sink).count() >= n0:
                    break
            except Exception:
                pass

        # the evolve epoch lands MID-STREAM; the live stale-schema query
        # must fail loudly instead of narrowing the feed
        m = apply_changes(spark, base, parts[1][1], epoch=1, cfg=cfg)
        assert m["schema_evolved"]
        with pytest.raises(StreamingQueryException, match="evolved mid-stream"):
            q.awaitTermination(90)
    finally:
        q.stop()

    # restart AFTER the failure: new query, evolved schema — the window
    # streams through and the evolved column's data is intact
    drain()
    streamed = spark.read.schema(
        base.read_changes(spark, 0).schema
    ).parquet(sink)
    batch = base.read_changes(spark, 0)
    assert "tool_meta" in streamed.columns
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    assert streamed.filter("tool_meta is not null").count() > 0


def test_mirror_backlog_folds_with_evolve_inside_window(spark, tmp_table, tmp_path):
    """A replica catching up on a 3-epoch backlog (with a schema evolution
    INSIDE the folded window) applies ONE merge: one apply commit on the
    replica, all epochs in its ledger, state and evolved schema equal to the
    base's."""
    from cnpj_data_pipeline_spark.plans.sync import FeedSyncJob

    cfg = EngineConfig(n_buckets=8)
    ch = gen_changes(spark, n_events=2_000, n_convs=40, n_epochs=3,
                     evolve_at_epoch=1, delete_ratio=0.1)
    base = LakeTable.create(tmp_table, TRANSCRIPT_SCHEMA, KEY, cfg.n_buckets)
    for e, batch in epoch_batches(ch, 3, drop_evolved_before=1):
        apply_changes(spark, base, batch, epoch=e, cfg=cfg)

    replica_root = str(tmp_path / "replica")
    job = FeedSyncJob(tmp_table, replica_root, cfg=cfg)
    m = job.run_once(spark)
    assert m["epochs_synced"] == [0, 1, 2]

    replica = LakeTable.load(replica_root)
    applies = [s for s in replica.snapshots() if s.get("epoch") is not None]
    assert len(applies) == 1
    assert sorted(replica.applied_epochs()) == [0, 1, 2]
    assert "tool_meta" in replica.schema().fieldNames()
    b = base.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    r = replica.read(spark).orderBy(*KEY).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(r[b.columns], b, check_dtype=False)
