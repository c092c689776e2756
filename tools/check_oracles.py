"""Pre-flight for the driver's correctness gate: run every entry in
``__spark_entry__.queries()`` against its ``oracle_sql()`` twin on DuckDB and
compare row count, column names, and order-insensitive canonicalized values.

Usage: python tools/check_oracles.py [--session=vanilla|engine|both] [sf_dir] [query ...]

``--session`` picks the SparkSession conf world (default: vanilla — a plain
default-conf session, exactly what the driver's gate runs). Round 3 shipped a
bug only visible under default confs (INT96 parquet timestamps) because this
pre-flight built the engine's own pinned session and so structurally could
not see that class; the rehearsal must mirror the gate. ``both`` runs every
query under each world sequentially.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "∅"
        # DuckDB DATE surfaces as midnight datetime64 via pandas; Spark gives
        # datetime.date — canonicalize midnight timestamps to the date.
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(canon_cell(x) for x in seq) + "]"
    return str(v)


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def compare_query(name: str, spark, con, sf_dir: str, queries, oracles) -> tuple[bool, str]:
    sdf = queries[name](spark, sf_dir)
    spdf = sdf.toPandas()
    if name not in oracles:
        return True, f"rows-only ({len(spdf)} rows, no oracle)"
    odf = con.execute(oracles[name]).fetchdf()
    if len(spdf) != len(odf):
        return False, f"ROW COUNT spark={len(spdf)} oracle={len(odf)}"
    sc, oc = sorted(spdf.columns), sorted(odf.columns)
    if sc != oc:
        return False, f"COLUMNS spark={sc} oracle={oc}"
    a, b = canon_frame(spdf), canon_frame(odf)
    if a != b:
        bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y) if a and b else 0
        return False, f"VALUES differ at sorted row {bad}:\n  spark : {a[bad] if a else None}\n  oracle: {b[bad] if b else None}"
    return True, f"match ({len(spdf)} rows x {len(sc)} cols)"


def _vanilla_spark():
    """A DEFAULT-CONF session — the driver's world. No engine confs at all
    (no pinned timestamp type, no UTC session tz, no AQE tweaks)."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("check-oracles-vanilla")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    session_mode = "vanilla"
    for fl in flags:
        if fl.startswith("--session="):
            session_mode = fl.split("=", 1)[1]
    if session_mode not in ("vanilla", "engine", "both"):
        sys.exit(f"unknown --session={session_mode}")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1:]
    import __spark_entry__ as entry
    from cnpj_data_pipeline_spark.session import get_spark

    con = duck_con(sf_dir)
    queries, oracles = entry.queries(), entry.oracle_sql()
    queries.update(entry.extra_queries())
    oracles.update(entry.extra_oracle_sql())
    names = only or list(queries)
    failed = []
    worlds = ["vanilla", "engine"] if session_mode == "both" else [session_mode]
    for world in worlds:
        if world == "vanilla":
            spark = _vanilla_spark()
        else:
            spark = get_spark(
                app_name="check-oracles", master="local[8]",
                shuffle_partitions=8,
            )
        tag = f"[{world}] " if len(worlds) > 1 else ""
        for name in names:
            t0 = time.monotonic()
            try:
                ok, msg = compare_query(
                    name, spark, con, sf_dir, queries, oracles
                )
            except Exception as e:  # noqa: BLE001
                ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
            dt = time.monotonic() - t0
            print(
                f"{'PASS' if ok else 'FAIL'} {tag}{name}: {msg} [{dt:.2f}s]",
                flush=True,
            )
            if not ok:
                failed.append(f"{tag}{name}")
        spark.stop()
    total = len(names) * len(worlds)
    print(f"\n{total - len(failed)}/{total} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
