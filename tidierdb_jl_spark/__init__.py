"""tidierdb_jl_spark — a PySpark-native tidy analytics engine.

A from-scratch reimplementation of the query capabilities of
TidierOrg/TidierDB.jl (see SURVEY.md) where the lazy IR is the Spark
DataFrame itself: every tidy verb builds Catalyst logical-plan nodes and
Catalyst/Tungsten/AQE provide optimization and distributed execution.
Beyond the reference's surface it adds Structured-Streaming operators and
LLM-data-pipeline primitives (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.
"""

from .sqlbatch import install as _install_flat_select_expr
from .cache import release_caches
from .core import TidyFrame
from .functions.udf import add_agg_fn, add_window_fn, register_agg_udf, register_udf
from .session import connect, get_spark, register_testdata
from .sources.readers import copy_to, db_table, dt, show_tables
from .sources.statfiles import read_gsheet, read_stat
from .sources.writers import create_table, drop_view, write_file
from .sources.delta import read_delta
from .sources.delta_cdf import read_delta_cdf
from .sources.delta_writer import (
    checkpoint_delta, convert_to_delta, delete_delta, describe_detail,
    describe_history, merge_delta, optimize_delta, restore_delta,
    update_delta, vacuum_delta, write_delta,
)
from .sources.iceberg import read_iceberg
from .sources.iceberg_writer import (
    expire_snapshots_iceberg, snapshots_iceberg, write_iceberg,
)
from .sources.iceberg_ops import (
    convert_to_iceberg, delete_iceberg, drop_tag_iceberg,
    files_iceberg, manifests_iceberg, merge_iceberg,
    overwrite_partitions_iceberg, rewrite_data_files_iceberg,
    rollback_iceberg, tag_iceberg, update_iceberg,
)
from .plans.show import lint_plan, plan_summary, show_query

# One py4j round trip per selectExpr call instead of one per expression —
# see sqlbatch.py.  Result/plan identical; applies engine-wide.
_install_flat_select_expr()

__all__ = [
    "TidyFrame",
    "register_udf",
    "register_agg_udf",
    "add_agg_fn",
    "add_window_fn",
    "connect",
    "get_spark",
    "register_testdata",
    "db_table",
    "dt",
    "read_stat",
    "read_gsheet",
    "copy_to",
    "show_tables",
    "create_table",
    "drop_view",
    "write_file",
    # lakehouse layer (jar-free Delta + Iceberg, r9-r12)
    "read_delta",
    "read_delta_cdf",
    "write_delta",
    "delete_delta",
    "update_delta",
    "merge_delta",
    "optimize_delta",
    "vacuum_delta",
    "restore_delta",
    "checkpoint_delta",
    "describe_history",
    "describe_detail",
    "convert_to_delta",
    "read_iceberg",
    "write_iceberg",
    "snapshots_iceberg",
    "expire_snapshots_iceberg",
    "delete_iceberg",
    "update_iceberg",
    "overwrite_partitions_iceberg",
    "merge_iceberg",
    "rewrite_data_files_iceberg",
    "rollback_iceberg",
    "files_iceberg",
    "manifests_iceberg",
    "convert_to_iceberg",
    "tag_iceberg",
    "drop_tag_iceberg",
    "plan_summary",
    "show_query",
    "lint_plan",
    "release_caches",
]

__version__ = "0.1.0"
