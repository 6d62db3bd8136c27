"""CDC replay core: schema evolution, LWW apply, exactly-once sink, resume."""

from odibel_ray.cdc.schema import SchemaTimeline, extract_timeline
from odibel_ray.cdc.apply import (
    replay_dataset,
    replay_change_feed,
    prepare_events,
    compact_batch,
)
from odibel_ray.cdc.lww import change_feed
from odibel_ray.cdc.ddl import alter_published, materialize_ddl
from odibel_ray.cdc.derived import create_derived, read_derived, refresh_derived
from odibel_ray.cdc.dml import delete_published, merge_published, update_published
from odibel_ray.cdc.analyze import analyze_published, load_column_stats, refresh_column_stats
from odibel_ray.cdc.maintain import clone_table, maintain_table
from odibel_ray.cdc.joinview import create_join_view, read_join_view, refresh_join_view
from odibel_ray.cdc.pipeline import plan_pipeline, refresh_pipeline
from odibel_ray.cdc.quality import drop_expectations, get_expectations, set_expectations
from odibel_ray.cdc.savepoint import (
    create_savepoint,
    drop_savepoint,
    read_savepoint,
    restore_savepoint,
)
from odibel_ray.cdc.mview import aggregate_groups, create_view, read_view, refresh_view
from odibel_ray.cdc.sink import (
    ConcurrentWriterError,
    compact_published,
    count_published,
    enable_snapshots,
    expire_snapshots,
    fsck_table,
    incremental_apply,
    join_published,
    list_snapshots,
    lookup_key,
    publish_dataset,
    read_published,
    replay_publish,
    restore_snapshot,
    table_changes,
    table_lock,
    table_stats,
    upsert_published,
    vacuum,
    version_at,
)

__all__ = [
    "ConcurrentWriterError",
    "table_lock",
    "compact_published",
    "count_published",
    "enable_snapshots",
    "expire_snapshots",
    "list_snapshots",
    "SchemaTimeline",
    "extract_timeline",
    "replay_dataset",
    "replay_change_feed",
    "change_feed",
    "prepare_events",
    "compact_batch",
    "replay_publish",
    "incremental_apply",
    "read_published",
    "restore_snapshot",
    "table_changes",
    "upsert_published",
    "join_published",
    "create_view",
    "refresh_view",
    "read_view",
    "aggregate_groups",
    "create_derived",
    "refresh_derived",
    "read_derived",
    "create_savepoint",
    "read_savepoint",
    "drop_savepoint",
    "restore_savepoint",
    "analyze_published",
    "load_column_stats",
    "refresh_column_stats",
    "maintain_table",
    "clone_table",
    "delete_published",
    "merge_published",
    "update_published",
    "alter_published",
    "materialize_ddl",
    "create_join_view",
    "refresh_join_view",
    "read_join_view",
    "plan_pipeline",
    "refresh_pipeline",
    "set_expectations",
    "get_expectations",
    "drop_expectations",
    "fsck_table",
    "version_at",
    "lookup_key",
    "publish_dataset",
    "table_stats",
    "vacuum",
]
