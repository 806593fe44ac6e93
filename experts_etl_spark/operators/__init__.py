"""Pure DataFrame→DataFrame operators mirroring SURVEY.md §2.

Each function takes DataFrames (plus plain-Python parameters) and returns
a DataFrame; none of them collect, loop rows, or touch the driver — they
compose into a single Catalyst plan and scale with partitioning.
"""

from experts_etl_spark.operators.windows import (  # noqa: F401
    latest_per_key,
    run_groups,
    sessionize,
    split_stints,
    with_lead_end,
    reference_entry,
    elect_primary,
    dedupe_keep_best,
)
from experts_etl_spark.operators.snapshots import (  # noqa: F401
    snapshot_diff_keys,
    snapshot_diff_rows,
    history_append,
)
from experts_etl_spark.operators.joins import (  # noqa: F401
    dim_lookup,
    override_join,
    existence_gate,
)
from experts_etl_spark.operators.merge import (  # noqa: F401
    merge_upsert,
    delete_cascade,
    delete_merged_uuids,
    reconcile_sets,
    overwrite_children,
)
from experts_etl_spark.operators.cdc import (  # noqa: F401
    watermark,
    compact_changes,
    filter_new_versions,
    split_actions,
    archive_processed,
)
from experts_etl_spark.operators.errors import (  # noqa: F401
    with_error_id,
    upsert_error_counts,
)
from experts_etl_spark.operators.hierarchy import (  # noqa: F401
    tree_closure,
    prune_unreachable,
    nested_set_labels,
)
from experts_etl_spark.operators.skew import (  # noqa: F401
    with_salt,
    salted_join,
    two_stage_agg,
)
