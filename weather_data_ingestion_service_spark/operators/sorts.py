"""Sorts / limits / top-k (SURVEY.md §2.F)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k.

    ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject: each task
    keeps a k-row heap and the driver merges — no global sort, no full
    shuffle, which is why this survives 100 TB while ``orderBy`` alone
    would not.  ``order_by`` must be a total order (tie-break on a
    unique key) for engine-stable results.
    """
    return df.orderBy(*order_by).limit(k)
