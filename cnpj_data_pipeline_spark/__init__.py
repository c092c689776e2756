"""cnpj_data_pipeline_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capability set of the reference ``nxoti/cnpj-data-pipeline``
(a single-process polars+psycopg2 batch CDC loop, see ``/root/reference``) as an
idiomatic Spark engine:

* binlog/WAL-style change-event envelopes ``(op, lsn)`` over keyed transcript rows
  ``(conv_id, turn_idx, role, text, tool, ts)``;
* last-writer-wins dedup (reference: ``ROW_NUMBER() ... ORDER BY batch_row_num DESC``,
  ``src/database/postgres.py:478-501``) as a Spark window;
* keyed MERGE upserts (reference: ``INSERT ... ON CONFLICT DO UPDATE``,
  ``src/database/postgres.py:269-531``) as salted, bucket-partitioned
  ``groupBy().applyInPandas`` merges into a from-scratch Iceberg-semantics
  Parquet lake table with atomic snapshot commits;
* exactly-once, resumable ingest (reference: ``processed_files`` checkpoint table,
  ``src/database/postgres.py:122-196``, ``main.py:100-131``) via per-epoch lineage
  recorded atomically with each snapshot;
* additive schema evolution (reference: ``column_{i}`` fallback naming,
  ``src/processor.py:518``) via schema-union snapshots + null padding on read.

No code is copied from the reference; every operator is re-derived Spark-first.
"""

__version__ = "0.1.0"

from cnpj_data_pipeline_spark.config import EngineConfig  # noqa: F401
from cnpj_data_pipeline_spark.lake.format import LakeTable  # noqa: F401
from cnpj_data_pipeline_spark.operators.merge import apply_changes  # noqa: F401
from cnpj_data_pipeline_spark.plans.catalog import (  # noqa: F401
    MultiTableIngestJob,
    TableCatalog,
    TableSpec,
)
from cnpj_data_pipeline_spark.plans.pipeline import IngestJob  # noqa: F401
from cnpj_data_pipeline_spark.lake.sql import (  # noqa: F401
    consistent_frontier,
    register_catalog,
    register_changes_view,
    register_history_view,
    register_meta_views,
    register_view,
)
from cnpj_data_pipeline_spark.lake.dml import merge_into  # noqa: F401
from cnpj_data_pipeline_spark.lake.ddl import (  # noqa: F401
    execute_ddl,
    read_mview,
    run_sql_script,
    show_create_mview,
    show_create_table,
)
from cnpj_data_pipeline_spark.lake.txn_catalog import (  # noqa: F401
    Catalog,
    MultiTableTransaction,
)
from cnpj_data_pipeline_spark.plans.sync import (  # noqa: F401
    FeedSyncJob,
    text_stats_transform,
)
from cnpj_data_pipeline_spark.plans.decontam import (  # noqa: F401
    DecontamIndexJob,
    eval_gram_set,
)
from cnpj_data_pipeline_spark.plans.ivf import IVFIndexJob  # noqa: F401
from cnpj_data_pipeline_spark.plans.neardup import (  # noqa: F401
    NearDupIndexJob,
)
from cnpj_data_pipeline_spark.plans.projection import (  # noqa: F401
    ProjectionSyncJob,
)
from cnpj_data_pipeline_spark.plans.scd2 import SCD2SyncJob  # noqa: F401
from cnpj_data_pipeline_spark.lake.stats import (  # noqa: F401
    analyze_table,
    load_stats,
    refresh_stats,
)
