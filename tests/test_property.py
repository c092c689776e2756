"""Property-based replay (SURVEY §5.6): random op sequences — I/U/D, duplicate
LSNs, late events, arbitrary epoch slicing — must always converge to the oracle."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cnpj_data_pipeline_spark import EngineConfig, LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes
from cnpj_data_pipeline_spark.oracle import final_state
from cnpj_data_pipeline_spark.schemas import TRANSCRIPT_SCHEMA

_events = st.lists(
    st.tuples(
        st.integers(0, 5),            # conv
        st.integers(0, 3),            # turn
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 30),           # lsn (collisions likely)
        st.one_of(st.none(), st.text(alphabet="abç;", max_size=6)),
    ),
    min_size=1,
    max_size=40,
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
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=_events,
    split=st.integers(0, 39),
    path=st.sampled_from([("mor", "native"), ("cow", "pandas"), ("cow", "native")]),
)
def test_random_streams_match_oracle(spark, tmp_path_factory, events, split, path):
    mode, strategy = path
    pdf = _to_pdf(events)
    golden = final_state(pdf, payload_cols=["conv_id", "turn_idx", "role", "text", "tool", "ts"])

    lake = str(tmp_path_factory.mktemp("prop") / "lake")
    cfg = EngineConfig(
        n_buckets=4, salt_factor=2, merge_strategy=strategy, write_mode=mode
    )
    table = LakeTable.create(lake, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], 4)

    cut = min(split, len(pdf))
    for e, part in enumerate((pdf.iloc[:cut], pdf.iloc[cut:])):
        if len(part) == 0:
            continue
        df = spark.createDataFrame(part)
        apply_changes(spark, table, df, epoch=e, cfg=cfg)

    got = (
        table.read(spark)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)


def test_role_only_collision_deterministic(spark, tmp_path_factory):
    """Two rows tying on (lsn, ts, op, text, tool) but differing ONLY in role
    must pick the same winner (max role) on every kernel/partitioning — the
    final tie-break closing the total order over the whole payload."""
    ts = pd.Timestamp("2026-01-01")
    rows = []
    for i, role in enumerate(["assistant", "user", "system", "tool"]):
        rows.append(
            {
                "conv_id": "c00000001",
                "turn_idx": 0,
                "role": role,
                "text": None,
                "tool": None,
                "ts": ts,
                "op": "U",
                "lsn": 7,
            }
        )
    pdf = pd.DataFrame(rows)
    golden = final_state(
        pdf, payload_cols=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    assert golden["role"].tolist() == ["user"]  # max() of the role strings

    for strategy in ("native", "pandas"):
        lake = str(tmp_path_factory.mktemp("rolecol") / f"lake_{strategy}")
        cfg = EngineConfig(n_buckets=4, salt_factor=2, merge_strategy=strategy)
        table = LakeTable.create(lake, TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"], 4)
        # two epochs with the colliding rows split across them, both orders
        apply_changes(spark, table, spark.createDataFrame(pdf.iloc[:2]), 0, cfg)
        apply_changes(spark, table, spark.createDataFrame(pdf.iloc[2:]), 1, cfg)
        got = table.read(spark).toPandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(got, golden, check_dtype=False)


# ---------------- rename-history mapping (retired names) ----------------

_ops = st.lists(
    st.tuples(
        st.sampled_from(["rename", "rename_back", "drop"]),
        st.integers(0, 2),            # which payload column
        st.integers(0, 999),          # fresh-name nonce
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops)
def test_rename_history_always_maps_every_historical_name(
    spark, tmp_path_factory, ops
):
    """Any sequence of renames / rename-backs / drops keeps EVERY name a
    producer ever legitimately used resolvable to its original physical
    column (or its tombstone), never to a different column and never to a
    silently-evolved new one — and no historical name is ever reusable
    for something else."""
    import pyspark.sql.types as T

    from cnpj_data_pipeline_spark.lake.format import batch_to_physical

    root = str(tmp_path_factory.mktemp("renprop") / "t")
    payload = ["p0", "p1", "p2"]
    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            *[T.StructField(p, T.StringType(), True) for p in payload],
        ]
    )
    t = LakeTable.create(root, schema, ["k"], 2)
    # model: physical -> (current logical name or None if dropped,
    #                     every name ever used for it)
    current = {p: p for p in payload}
    history = {p: {p} for p in payload}
    nonce = [0]
    for kind, which, n in ops:
        phys = payload[which]
        if current[phys] is None:
            continue  # dropped: no further evolution on it
        if kind == "rename":
            new = f"r{n}_{nonce[0]}"
            nonce[0] += 1
            t.rename_column(current[phys], new)
            current[phys] = new
            history[phys].add(new)
        elif kind == "rename_back":
            # renaming back to any of the column's OWN historical names
            # (including the physical) is always legal
            target = sorted(history[phys])[n % len(history[phys])]
            if target == current[phys]:
                continue
            t.rename_column(current[phys], target)
            current[phys] = target
        else:
            t.drop_column(current[phys])
            current[phys] = None

    snap = t.snapshot()
    live_phys = {f.name for f in t.schema().fields}
    for phys in payload:
        for name in history[phys]:
            df = spark.createDataFrame([("x", "v")], f"k string, `{name}` string")
            mapped = batch_to_physical(df, snap).columns
            assert mapped == ["k", phys], (name, mapped, phys)
            if current[phys] is None:
                # dropped: the mapped physical name is tombstoned (the
                # apply path ignores it), never re-enters the schema
                assert phys in snap["dropped_cols"]
                assert phys not in live_phys
            # a historical name that is not the CURRENT name can never be
            # claimed by a new column
            if name != current[phys]:
                with pytest.raises(ValueError):
                    t.add_column(name, T.StringType())
    # any two historical names of one column in a single batch: ambiguous
    for phys in payload:
        names = sorted(history[phys])
        if len(names) >= 2:
            df = spark.createDataFrame(
                [("x", "v", "w")],
                f"k string, `{names[0]}` string, `{names[1]}` string",
            )
            with pytest.raises(ValueError, match="ambiguous"):
                batch_to_physical(df, snap)
