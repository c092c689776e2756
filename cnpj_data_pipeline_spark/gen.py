"""Deterministic synthetic change-stream generator (no external data).

Replaces the reference's downloader as the source of change batches: where the
reference tails a monthly directory of CSV parts (``src/downloader.py:27-83``,
each file = one change batch), we synthesize a seeded stream of I/U/D envelopes
over the transcript key space, entirely with ``spark.range`` + column expressions
(distributed, no driver-side materialization — generation itself scales with
executors).

Knobs (FIXTURES.md F2): update/delete ratios, duplicate-LSN collisions (exercises
LWW tie-breaks like the reference's ``ROW_NUMBER ... ORDER BY batch_row_num DESC``,
``src/database/postgres.py:478-501``), late events (appear in a later epoch with an
earlier LSN), Zipf-ish hot-conversation skew, and a mid-stream additive column
(FIXTURES.md F3).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH_SECONDS = 1767225600  # 2026-01-01T00:00:00Z

_TOOLS = ["search", "bash", "browser", "python", "editor"]
_ROLES = ["user", "assistant", "tool", "system"]
# Includes non-ASCII + separator/quote characters to stress parsing paths,
# mirroring the reference's ISO-8859-1 quirks (docs/sample-data/README.md:148-155).
_WORDS = [
    "alpha", "beta", "gamma", "coração", "ação", "café", "naïve",
    "x;y", 'q"q', "tab\tsep", "line\nbreak", "zçãé", "delta", "omega",
]


def gen_changes(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1_000,
    turns_per_conv: int = 10,
    n_epochs: int = 4,
    seed: int = 42,
    update_ratio: float = 0.30,
    delete_ratio: float = 0.05,
    dup_ratio: float = 0.02,
    late_ratio: float = 0.02,
    skew: float = 0.0,
    evolve_at_epoch: int | None = None,
) -> DataFrame:
    """Return a CHANGE-schema DataFrame of ``n_events`` seeded envelopes.

    ``lsn`` is globally monotone except for deliberate duplicates (same key, same
    lsn, different payload — tie-break fodder) and late events (an event whose
    epoch is bumped by +1 while keeping its earlier lsn). ``epoch`` partitions the
    stream into change batches, the analogue of the reference's per-file batches
    (``main.py:143-189``).
    """
    if n_epochs < 1:
        raise ValueError("n_epochs must be >= 1")
    events_per_epoch = math.ceil(n_events / n_epochs)

    df = spark.range(0, n_events, 1)

    def h(tag: int, col=None):
        c = F.col("id") if col is None else col
        return F.abs(F.xxhash64(c, F.lit(seed), F.lit(tag)))

    is_dup = F.pmod(h(1), F.lit(10_000)) < int(dup_ratio * 10_000)
    # A duplicate re-emits the key+lsn of a nearby earlier event with a different
    # payload: same (key, lsn), different text — the LWW tie-break case.
    base_id = F.when(
        is_dup, F.greatest(F.col("id") - (F.pmod(h(2), F.lit(64)) + 1), F.lit(0))
    ).otherwise(F.col("id"))

    # Zipf-ish skew: u^(1+skew) concentrates mass near conv 0.
    u = F.pmod(h(3, base_id), F.lit(1_000_000)) / F.lit(1_000_000.0)
    conv_n = F.least(
        F.floor(F.pow(u, F.lit(1.0 + skew)) * n_convs).cast("long"),
        F.lit(n_convs - 1),
    )
    conv_id = F.format_string("c%08d", conv_n)
    turn_idx = F.pmod(h(4, base_id), F.lit(turns_per_conv)).cast("int")

    r = F.pmod(h(5), F.lit(10_000))
    op = (
        F.when(r < int(delete_ratio * 10_000), F.lit("D"))
        .when(r < int((delete_ratio + update_ratio) * 10_000), F.lit("U"))
        .otherwise(F.lit("I"))
    )

    lsn = base_id.cast("long")
    is_late = F.pmod(h(6), F.lit(10_000)) < int(late_ratio * 10_000)
    epoch = F.floor(F.col("id") / events_per_epoch).cast("int")
    epoch = F.least(
        F.when(is_late, epoch + 1).otherwise(epoch), F.lit(n_epochs - 1)
    ).cast("int")

    ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH_SECONDS) + F.col("id") + F.pmod(h(7), F.lit(2))
    )

    words = F.array(*[F.lit(w) for w in _WORDS])
    text = F.when(
        op == "D", F.lit(None).cast("string")
    ).otherwise(
        F.concat_ws(
            " ",
            F.format_string("ev%012d", F.col("id")),
            F.element_at(words, (F.pmod(h(8), F.lit(len(_WORDS))) + 1).cast("int")),
            F.element_at(words, (F.pmod(h(9), F.lit(len(_WORDS))) + 1).cast("int")),
            F.repeat(F.lit("tok "), F.pmod(h(10), F.lit(40)).cast("int")),
        )
    )

    roles = F.array(*[F.lit(x) for x in _ROLES])
    role = F.element_at(roles, F.pmod(turn_idx.cast("long"), F.lit(4)).cast("int") + 1)

    tools = F.array(*[F.lit(x) for x in _TOOLS])
    tool = F.when(
        F.pmod(h(11), F.lit(10)) < 2,
        F.element_at(tools, (F.pmod(h(12), F.lit(len(_TOOLS))) + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))

    out = df.select(
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        op.alias("op"),
        lsn.alias("lsn"),
        epoch.alias("epoch"),
    )

    if evolve_at_epoch is not None:
        tool_meta = F.when(
            (F.col("epoch") >= evolve_at_epoch) & F.col("tool").isNotNull(),
            F.to_json(F.struct(F.col("tool").alias("name"), F.col("lsn").alias("call_id"))),
        ).otherwise(F.lit(None).cast("string"))
        out = out.withColumn("tool_meta", tool_meta)

    return out


def epoch_batches(changes: DataFrame, n_epochs: int, drop_evolved_before: int | None = None):
    """Yield (epoch_id, batch_df) in order — the engine's change-batch tail.

    When ``drop_evolved_before`` is set, batches before that epoch are emitted
    WITHOUT the ``tool_meta`` column, so the sink genuinely sees the schema grow
    mid-stream (FIXTURES.md F3)."""
    for e in range(n_epochs):
        b = changes.filter(F.col("epoch") == e)
        if drop_evolved_before is not None and e < drop_evolved_before and "tool_meta" in b.columns:
            b = b.drop("tool_meta")
        yield e, b


def gen_partial_changes(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1_000,
    turns_per_conv: int = 10,
    n_epochs: int = 4,
    seed: int = 42,
    update_ratio: float = 0.45,
    delete_ratio: float = 0.05,
    late_ratio: float = 0.05,
    skew: float = 0.0,
    keep_pct: int = 55,
) -> DataFrame:
    """A PARTIAL-update change stream: same envelope as :func:`gen_changes`
    but each non-delete event carries only a hash-selected SUBSET of the
    payload columns (the rest NULL) — the shape a Debezium source emits for
    a wide table patched a few fields at a time (unchanged-TOAST columns
    arrive as nulls). Feed to a ``merge_engine="partial"`` table; the golden
    fold is :func:`oracle.partial_final_state`.

    ``keep_pct``: per-column probability (percent) an event sets that
    column. Events with every column masked still count (an all-null patch
    keeps the key alive). ``dup_ratio`` is pinned to 0 so (key, lsn) is
    unique — value-level tie-breaks are covered by the explicit unit tests,
    keeping the pandas golden free of string-rendering coupling."""
    ch = gen_changes(
        spark,
        n_events,
        n_convs=n_convs,
        turns_per_conv=turns_per_conv,
        n_epochs=n_epochs,
        seed=seed,
        update_ratio=update_ratio,
        delete_ratio=delete_ratio,
        dup_ratio=0.0,
        late_ratio=late_ratio,
        skew=skew,
    )
    out = ch
    for i, c in enumerate(("role", "text", "tool", "ts")):
        keep = (
            F.pmod(
                F.abs(F.xxhash64(F.col("lsn"), F.lit(seed), F.lit(900 + i))),
                F.lit(100),
            )
            < keep_pct
        )
        out = out.withColumn(
            c,
            F.when((F.col("op") != "D") & keep, F.col(c)).otherwise(
                F.lit(None).cast(dict(zip(ch.columns, ch.schema))[c].dataType)
            ),
        )
    return out
