"""Set operations (SURVEY.md §2.G).

``intersect``/``except`` need no wrapper.  ``union_prefer`` is the
history∪forecast merge: the reference serves the recent past from
*either* tool — archive observations or forecast-model re-analyses
(reference server.py:158-159, 236-249, 304) — so one logical series
must combine both with a stated preference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def union_prefer(
    preferred: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Union two row sets keeping, per key, the row from ``preferred``
    when both sides have one.

    Implements ``set_union_history_forecast`` (observation beats
    forecast for the same (location, ts)) and the batch analog of the
    streaming keep-latest revision upsert (reference server.py:304:
    re-fetches "might use more recent models").  One shuffle on the
    key; the window is per-key with ≤2 rows, so no skew risk.
    """
    tagged = preferred.withColumn("__prio", F.lit(0)).unionByName(
        other.withColumn("__prio", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__prio").asc())
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__prio", "__rn")
    )
