"""Relational operators (SURVEY.md §2) as composable DataFrame transforms.

Every function is ``DataFrame -> DataFrame`` (or returns a pair for
side-output branches) so pipelines compose with ``df.transform(...)`` and
Catalyst sees one lazy plan end-to-end.
"""

from .aggregates import (  # noqa: F401
    completeness_count,
    debounce_events,
    group_count_having,
    islands,
    running_distinct,
    rolling_window_sum,
    rolling_window_sum_binned,
    with_distinct_list,
    with_group_sum,
)
from .dedup import (  # noqa: F401
    dedup_keep_best,
    dedup_keep_best_maxby,
    snapshot_diff,
    upsert_latest,
)
from .filters import blocklist_filter, segment_by_cutoff  # noqa: F401
from .funnel import funnel_stages  # noqa: F401
from .hierarchy import pointer_jump_roots  # noqa: F401
from .joins import (  # noqa: F401
    anti_join_not_in,
    anti_join_on_keys,
    band_join_self,
    enrich_with_ordered_list,
    join_delta,
)
from .linkage import deletion_variants, fuzzy_join_edit  # noqa: F401
from .ordering import (  # noqa: F401
    morton_key,
    rank_in_group,
    top_k_per_group,
    with_priority_level,
)
from .phones import spread_phone_columns  # noqa: F401
from .pivot import rank_pivot_wide  # noqa: F401
from .sets import union_all_by_name  # noqa: F401
