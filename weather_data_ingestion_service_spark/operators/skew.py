"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in ``session.RUNTIME_CONFS``)
handles most skew at runtime; explicit salting remains the tool when
one key dominates so badly that even split partitions overload (the
classic null-key / celebrity-user case), or when the build side must
replicate.

``salted_join``: the large (skewed) side gets a random-ish salt in
``[0, salt)`` derived from a hash of its whole row (deterministic, no
rand() — keeps plans replayable); the small side is exploded ``salt``
times so every (key, salt) bucket finds its match.  For inner/left
joins the result is row-identical to the unsalted join; the hot key's
rows now spread over ``salt`` reducers.  right/full are rejected: an
unmatched right row would surface once per salt replica, so those
sides must be salted the other way around (swap the inputs and use
``left``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted ``salt`` ways.

    ``small`` is replicated ``salt``× (explode) — use only when the
    non-skewed side is modest; for two huge skewed sides, split the
    hot keys out and union a broadcast join for just those.

    Only ``inner``/``left`` (and their semi/anti variants, which also
    preserve exactly the skewed side's rows) are row-identical to the
    unsalted join — an unmatched ``small`` row under right/full would
    be emitted once per salt replica, so those are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti joins "
            f"(got how={how!r}); for a right/full join salt the other "
            f"side (swap the inputs)"
        )
    left = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*skewed.columns)), F.lit(salt))
    )
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt - 1).cast("long")))
    )
    out = left.join(right, [on, "__salt"], how)
    return out.drop("__salt")
