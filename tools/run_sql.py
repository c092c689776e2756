"""spark-submit entrypoint for the SQL surface: run one statement or a
whole ``;``-separated DDL/DML script against registered lake tables.

Cluster usage::

    spark-submit --py-files engine.zip tools/run_sql.py \\
        --table transcripts=s3://bucket/lake/transcripts \\
        --execute "ALTER TABLE transcripts ADD COLUMN IF NOT EXISTS lang STRING"

    spark-submit ... tools/run_sql.py \\
        --table transcripts=s3://bucket/lake/transcripts \\
        --script bootstrap.sql --epoch-base 100

``--script`` runs resumably (see ``lake/ddl.py:run_sql_script`` — DML
statement k carries ledger epoch ``epoch_base + k``; IF [NOT] EXISTS DDL
forms no-op on re-run), so re-submitting after a crash is safe. ``--view``
registers a parquet path or table as a temp view for MERGE sources.
With ``--catalog ROOT``, ``BEGIN TRANSACTION; …DML…; COMMIT;`` blocks
stage through one MultiTableTransaction and land in a single catalog CAS
(atomic multi-table visibility); a prepared transaction left by a crashed
run is recovered before the first statement.
``SELECT`` statements read the registered tables' state views (inside a
transaction block: the catalog's pre-block pins — snapshot isolation).
Prints one JSON line per statement; DESCRIBE/SHOW results print as text.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fmt(result):
    from pyspark.sql import DataFrame

    if isinstance(result, DataFrame):
        return [r.asDict() for r in result.collect()]
    if isinstance(result, (dict, int, str)):
        return result
    return getattr(result, "root", str(result))  # a created LakeTable


def main() -> None:
    ap = argparse.ArgumentParser(description="SQL DDL/DML over lake tables")
    ap.add_argument(
        "--table", action="append", default=[],
        metavar="NAME=ROOT", help="register a lake table (repeatable)",
    )
    ap.add_argument(
        "--view", action="append", default=[],
        metavar="NAME=PARQUET_PATH",
        help="register a parquet path as a temp view (MERGE source)",
    )
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--execute", help="one SQL statement")
    g.add_argument("--script", help="path to a ;-separated SQL script file")
    ap.add_argument(
        "--epoch-base", type=int, default=None,
        help="ledger epoch of the first DML statement (statement k gets "
        "epoch-base + k); pass the SAME base to make a re-submitted script "
        "skip already-applied writes exactly-once. Omitted: a fresh base "
        "one past every registered table's applied epochs is derived, so "
        "distinct ad-hoc statements never collide on the ledger — but a "
        "re-submit will then re-apply",
    )
    ap.add_argument("--salt-factor", type=int, default=4)
    ap.add_argument(
        "--catalog", default=None, metavar="ROOT",
        help="transactional catalog root — enables BEGIN TRANSACTION / "
        "COMMIT blocks (atomic multi-table visibility) and recovers any "
        "prepared transaction a crashed earlier run left behind",
    )
    ap.add_argument("--master", default=None,
                    help="only for local runs; omit under spark-submit")
    args = ap.parse_args()

    from cnpj_data_pipeline_spark import EngineConfig
    from cnpj_data_pipeline_spark.lake.ddl import run_sql_script
    from cnpj_data_pipeline_spark.session import get_spark

    spark = get_spark(master=args.master) if args.master else get_spark()
    tables: dict = {}
    for spec in args.table:
        name, root = spec.split("=", 1)
        tables[name] = root
    for spec in args.view:
        name, path = spec.split("=", 1)
        spark.read.parquet(path).createOrReplaceTempView(name)

    if args.script:
        with open(args.script, encoding="utf-8") as f:
            script = f.read()
    else:
        script = args.execute
    catalog = None
    if args.catalog:
        from cnpj_data_pipeline_spark.lake.txn_catalog import Catalog

        catalog = Catalog.load(args.catalog)
    epoch_base = args.epoch_base
    if epoch_base is None:
        # no explicit idempotency key: derive a base past every registered
        # table's ledger so two different ad-hoc statements never collide
        # (with a shared fixed default, the second statement would silently
        # no-op under the exactly-once ledger). Resumable re-runs still
        # require an explicit --epoch-base.
        import re as _re

        from cnpj_data_pipeline_spark import LakeTable

        roots = {str(getattr(t, "root", t)) for t in tables.values()}
        if catalog is not None:
            roots |= {p["root"] for p in catalog.pins().values()}
        # tables the script itself declares (CREATE TABLE IF NOT EXISTS
        # ... LOCATION '<path>') only enter the registry mid-script, after
        # this base is already fixed — scan the script's LOCATION paths so
        # a re-declared existing table's ledger also pushes the base up
        # (otherwise two different ad-hoc scripts against it would both
        # derive base 0 and the second's DML silently no-ops)
        roots |= set(
            _re.findall(r"\bLOCATION\s+'([^']+)'", script, _re.IGNORECASE)
        )
        hi = -1
        for root in roots:
            try:
                eps = LakeTable.load(root).applied_epochs()
            except (OSError, FileNotFoundError):
                continue
            hi = max(hi, max(eps, default=-1))
        epoch_base = hi + 1
        print(
            json.dumps({
                "derived_epoch_base": epoch_base,
                "note": "no --epoch-base given; fresh epochs derived — "
                "re-submitting this script will RE-APPLY its DML. Pass "
                "--epoch-base for crash-resumable scripts.",
            }),
            file=sys.stderr,
        )
    results = run_sql_script(
        spark, script, tables,
        epoch_base=epoch_base,
        cfg=EngineConfig(salt_factor=args.salt_factor),
        catalog=catalog,
    )
    for r in results:
        print(json.dumps(
            {"statement": r["statement"], "kind": r["kind"],
             "result": _fmt(r["result"])},
            default=str,
        ))


if __name__ == "__main__":
    main()
