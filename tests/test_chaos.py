"""Maintenance-chaos model test: seeded random interleavings of EVERY
mutating surface the table format exposes — ingest epochs, rename / widen /
add / drop column evolution, compaction, tombstone vacuum, snapshot expiry,
rollback, CHECK-constraint declare/drop (drop-mode, actively filtering) — checked against a plain-Python reference model after every single
operation. The targeted tests each pin one sequence; this one walks many, so
an interaction bug between any two surfaces (e.g. compact after rename, or
rollback across a widen) has no fixed-order blind spot to hide in.

Deterministic by seed (no Hypothesis shrinking needed at this op count);
lsns are strictly increasing so the model is a plain last-write dict.
"""

from __future__ import annotations

import copy
import random

import pyspark.sql.types as T
import pytest

from cnpj_data_pipeline_spark.lake.format import LakeTable
from cnpj_data_pipeline_spark.operators.merge import apply_changes

KEYS = list(range(24))


class Model:
    """Reference state: live rows + logical payload schema, snapshotted per
    commit so rollback restores both."""

    def __init__(self):
        self.rows: dict[int, dict] = {}
        self.cols: list[str] = ["a", "b"]  # payload (key col: id)
        self.cons_col: str | None = None  # active drop-mode CHECK target
        self.by_sid: dict[int, tuple[dict, list, str | None]] = {}

    def record(self, sid: int):
        self.by_sid[sid] = (
            copy.deepcopy(self.rows), list(self.cols), self.cons_col,
        )

    def restore(self, sid: int):
        rows, cols, cons_col = self.by_sid[sid]
        self.rows = copy.deepcopy(rows)
        self.cols = list(cols)
        self.cons_col = cons_col

    def state(self) -> set:
        return {
            (k, tuple(r.get(c) for c in self.cols))
            for k, r in self.rows.items()
        }


def _read_state(spark, t: LakeTable, model: Model) -> set:
    df = t.read(spark)
    assert set(df.columns) == {"id", *model.cols}, df.columns
    return {
        (r["id"], tuple(r[c] for c in model.cols)) for r in df.collect()
    }


@pytest.mark.parametrize("seed", [11, 23, 47, 61])
def test_random_maintenance_interleaving(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = LakeTable.create(
        str(tmp_path / "t"),
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("a", T.StringType()),
                T.StructField("b", T.IntegerType()),
            ]
        ),
        ["id"],
        4,
    )
    model = Model()
    model.record(t.current_snapshot_id())
    lsn = 0
    epoch = 0
    fresh = 0  # fresh-name counter: dropped names are tombstoned forever
    widened = False

    def do_apply():
        nonlocal lsn, epoch
        epoch += 1
        n = rng.randint(1, 8)
        rows, seen = [], set()
        sch = t.logical_schema()  # key + current payload, correct types
        for _ in range(n):
            k = rng.choice(KEYS)
            lsn += 1
            if rng.random() < 0.25 and k in model.rows:
                rows.append(
                    {"id": k, "op": "D", "lsn": lsn}
                    | {c: None for c in model.cols}
                )
                seen.add((k, "D", lsn))
            else:
                vals = {}
                for c in model.cols:
                    typ = sch[c].dataType
                    if isinstance(typ, T.StringType):
                        # some values trip the optional drop-mode CHECK
                        vals[c] = (
                            f"zz{lsn}" if rng.random() < 0.2 else f"v{lsn}"
                        )
                    else:
                        vals[c] = lsn % 1000
                rows.append({"id": k, "op": "U", "lsn": lsn} | vals)
                seen.add((k, "U", lsn, tuple(sorted(vals.items()))))
        batch_schema = T.StructType(
            [T.StructField("id", T.LongType())]
            + [T.StructField(c, sch[c].dataType) for c in model.cols]
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
            ]
        )
        df = spark.createDataFrame(
            [
                tuple(
                    r[c]
                    for c in ["id", *model.cols, "op", "lsn"]
                )
                for r in rows
            ],
            batch_schema,
        )
        apply_changes(spark, t, df, epoch=epoch)
        # model fold: lsns increase within the list, last write wins per
        # key; an active drop-mode CHECK filters violating EVENTS first
        # (the key's previous version survives), deletes exempt
        for r in rows:
            if r["op"] == "D":
                model.rows.pop(r["id"], None)
            elif not (
                model.cons_col
                and str(r.get(model.cons_col) or "").startswith("zz")
            ):
                model.rows[r["id"]] = {c: r[c] for c in model.cols}

    def _sort_cols() -> set:
        # declared sort order under LOGICAL names (stored physically)
        ren = t.renames()
        return {ren.get(c, c) for c in (t.sort_order() or [])}

    def do_rename():
        nonlocal fresh
        old = rng.choice(model.cols)
        if old == model.cons_col:  # guard: referenced by the CHECK
            with pytest.raises(ValueError, match="referenced by CHECK"):
                t.rename_column(old, "rguard")
            return
        fresh += 1
        new = f"r{fresh}"
        t.rename_column(old, new)
        model.cols[model.cols.index(old)] = new
        for r in model.rows.values():
            r[new] = r.pop(old, None)

    def do_add():
        nonlocal fresh
        fresh += 1
        name = f"n{fresh}"
        t.add_column(name, T.StringType())
        model.cols.append(name)
        # pre-existing rows read NULL for the new column
        for r in model.rows.values():
            r.setdefault(name, None)

    def do_drop():
        if len(model.cols) <= 1:
            return  # keep at least one payload column
        c = rng.choice(model.cols)
        if c == model.cons_col:  # guard: referenced by the CHECK
            with pytest.raises(ValueError, match="referenced by CHECK"):
                t.drop_column(c)
            return
        if c in _sort_cols():  # guard: member of the declared sort order
            with pytest.raises(ValueError, match="sort_order"):
                t.drop_column(c)
            return
        t.drop_column(c)
        model.cols.remove(c)
        for r in model.rows.values():
            r.pop(c, None)

    def do_widen():
        nonlocal widened
        # widen whichever integer-typed payload column still exists
        sch = t.logical_schema()
        for c in model.cols:
            if isinstance(sch[c].dataType, T.IntegerType):
                t.widen_column(c, T.LongType())
                widened = True
                return

    def do_compact():
        t.compact(spark)

    def do_sort_order():
        # declare / flip / clear the clustering — state-invariant layout op
        pick = rng.randrange(3)
        if pick == 0:
            t.set_sort_order(None)
        else:
            sch = t.logical_schema()
            atomic = [
                c
                for c in model.cols
                if not isinstance(
                    sch[c].dataType,
                    (T.MapType, T.ArrayType, T.StructType),
                )
            ]
            if not atomic:
                return
            t.set_sort_order([rng.choice(atomic)])

    def do_rebucket():
        t.rebucket(spark, rng.choice([2, 4, 8]))

    def do_vacuum():
        t.vacuum_tombstones(spark, lsn_horizon=lsn + 1)

    def do_expire():
        t.expire_snapshots(keep_last=3, sweep_orphans=True)
        reachable = {s["snapshot_id"] for s in t.snapshots()}
        for sid in list(model.by_sid):
            if sid not in reachable:
                del model.by_sid[sid]

    def do_rollback():
        targets = sorted(model.by_sid)
        if len(targets) < 2:
            return
        sid = rng.choice(targets[:-1])
        t.rollback(sid)
        model.restore(sid)

    def do_add_constraint():
        if model.cons_col:
            return
        sch = t.logical_schema()
        strings = [
            c
            for c in model.cols
            if isinstance(sch[c].dataType, T.StringType)
        ]
        if not strings:
            return
        c = rng.choice(strings)
        try:
            t.add_constraint(
                spark,
                "no_zz",
                f"{c} IS NULL OR {c} NOT LIKE 'zz%'",
                on_violation="drop",
            )
        except ValueError:
            return  # existing rows already violate -> declaration refused
        model.cons_col = c

    def do_drop_constraint():
        if not model.cons_col:
            return
        t.drop_constraint("no_zz")
        model.cons_col = None

    def do_analyze():
        # advisory sidecar only — must never perturb state, and must keep
        # working whatever rename/drop/rollback churn preceded it
        from cnpj_data_pipeline_spark.lake.stats import (
            analyze_table,
            refresh_stats,
        )

        if rng.random() < 0.5:
            analyze_table(spark, t)
        else:
            refresh_stats(spark, t)

    ops = [
        (do_apply, 8),
        (do_analyze, 1),
        (do_rename, 2),
        (do_add, 2),
        (do_drop, 1),
        (do_widen, 1),
        (do_compact, 2),
        (do_sort_order, 1),
        (do_rebucket, 1),
        (do_vacuum, 1),
        (do_expire, 1),
        (do_rollback, 2),
        (do_add_constraint, 2),
        (do_drop_constraint, 1),
    ]
    weighted = [f for f, w in ops for _ in range(w)]

    for step in range(16):
        op = rng.choice(weighted)
        op()
        model.record(t.current_snapshot_id())
        got = _read_state(spark, t, model)
        want = model.state()
        assert got == want, (
            f"seed {seed} step {step} after {op.__name__}: "
            f"engine!=model\n extra={got - want}\n missing={want - got}"
        )
