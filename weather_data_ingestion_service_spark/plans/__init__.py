"""Plan inspection & optimization assertions (SURVEY.md §4)."""

from .inspect import (  # noqa: F401
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    simple_plan,
)
