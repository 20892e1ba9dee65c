"""Relational operator library (generic, table-agnostic).

Each module re-expresses a family from SURVEY.md §2 as composable
DataFrame transformations; ``registry.py`` binds them to the synthetic
test tables for the driver's correctness gate.
"""

from .relational import (  # noqa: F401
    select_vars,
    filter_coord_range,
    filter_date_range,
    filter_horizon_relative,
    filter_null_guard,
)
from .joins import (  # noqa: F401
    asof_join,
    asof_join_chunked,
    asof_join_nearest,
    geocode_lookup,
    range_interval_join,
)
from .aggregates import categorical_mode, daily_summary  # noqa: F401
from .windows import lag_delta, moving_avg, rank_per_group, time_bucket  # noqa: F401
from .setops import union_prefer  # noqa: F401
from .sorts import topk  # noqa: F401
