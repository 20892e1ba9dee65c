"""Point-in-polygon containment as a zero-shuffle Spark operator.

Ray-casting with EXACT integer micro-degree arithmetic: every crossing
test is two int64 products compared (never a division), so the
inside/outside decision is bit-identical on any engine that evaluates
the same expression — the polygon edge set is compiled into ONE
generated SQL expression shared verbatim by the Spark plan and the
DuckDB oracle.

Scale shape: the polygon dimension is compiled into the projection as
literal CASE terms (a "broadcast-as-literal" — cheaper than a
broadcast join: no build side, no BroadcastExchange, pure
whole-stage-codegen integer arithmetic over the scan), so tagging
100 TB of points is a single narrow map stage with zero exchanges.
For polygon sets too large to inline (thousands of edges), the same
crossing expression runs as a broadcast nested-loop join against an
edges DataFrame followed by a partially-aggregated parity count.

Reference parity: the reference resolves coordinates only to a nearest
grid point (server.py geocode snap); region-membership tagging is the
natural extension a spatial rollup needs (which forecast region does
each observation fall in).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

Vertex = Tuple[int, int]


def crossing_case_sql(px: str, py: str, x1: int, y1: int, x2: int, y2: int) -> str:
    """One ray-casting crossing test (ray from the point toward +x) as
    a SQL CASE term valid in both Spark SQL and DuckDB.

    Half-open vertical span ``(y1 <= py) <> (y2 <= py)`` guarantees a
    shared vertex counts exactly once and skips horizontal edges; the
    intersection-abscissa comparison is cross-multiplied so it stays
    in int64 (|coord| <= 1.8e8 micro-degrees -> |product| < 1.3e17).
    """
    if y1 == y2:  # horizontal edge never crosses the half-open span
        return "0"
    # edge deltas are precomputed literals cast to BIGINT so the
    # products run in int64 even when an engine types small literals
    # as INT32 (DuckDB would otherwise overflow-check the 32-bit
    # multiply)
    lhs = f"({py} - {y1}) * CAST({x2 - x1} AS BIGINT)"
    rhs = f"({px} - {x1}) * CAST({y2 - y1} AS BIGINT)"
    cmp_ = f"{lhs} > {rhs}" if y2 > y1 else f"{lhs} < {rhs}"
    return (
        f"(CASE WHEN (({y1} <= {py}) <> ({y2} <= {py})) AND ({cmp_})"
        " THEN 1 ELSE 0 END)"
    )


def polygon_inside_sql(px: str, py: str, vertices: Sequence[Vertex]) -> str:
    """Boolean SQL expression: point (px, py) strictly ray-crosses the
    closed polygon an odd number of times.  Concave polygons are fine
    — parity is what ray casting buys over bounding boxes."""
    if len(vertices) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    terms = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        terms.append(crossing_case_sql(px, py, x1, y1, x2, y2))
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def tag_points_in_polygons(
    points: DataFrame,
    polygons: Dict[str, List[Vertex]],
    px: str = "px",
    py: str = "py",
) -> DataFrame:
    """Tag each point row with every polygon id containing it.

    One narrow projection: per-polygon inside flags are literal integer
    CASE expressions (no join, no exchange, no UDF), stacked into rows
    via a filtered struct-array explode.  A point inside k polygons
    yields k rows; points inside none are dropped.
    """
    structs = [
        F.struct(
            F.lit(pid).alias("poly_id"),
            F.expr(polygon_inside_sql(px, py, verts)).alias("inside"),
        )
        for pid, verts in sorted(polygons.items())
    ]
    # explode-then-filter (not a higher-order array filter): CreateArray,
    # Generate and the post-explode Filter all stay inside whole-stage
    # codegen, where a lambda filter would fall off it
    return (
        points.select("*", F.explode(F.array(*structs)).alias("_hit"))
        .filter(F.col("_hit.inside"))
        .withColumn("poly_id", F.col("_hit.poly_id"))
        .drop("_hit")
    )


def nearest_anchor_sql(
    px: str, py: str, anchors: Sequence[Tuple[int, int, int]]
) -> Tuple[str, str]:
    """Reverse geocoding as ONE pair of SQL expressions valid in both
    Spark SQL and DuckDB: ``(dist_expr, id_expr)`` giving the L∞
    (Chebyshev) micro-degree distance to the nearest anchor and that
    anchor's id.

    ``anchors`` is ``[(anchor_id, x_micro, y_micro), ...]``.  The
    distance to each anchor is a literal greatest/abs term; the
    minimum is one ``least(...)``; the winning id is a CASE chain in
    ascending anchor-id order, so DISTANCE TIES BREAK BY LOWEST ID —
    deterministic on any engine.  Like ``polygon_inside_sql`` this is
    broadcast-as-literal: resolving 100 TB of points against a
    bounded anchor dim is a single narrow codegen'd map stage with no
    join, no exchange, no UDF.  Exact: |coords| ≤ 1.8e8 micro-degrees
    keeps every abs/greatest in int64.

    CONTRACT: ``id_expr`` references a column literally named ``__nd``
    — the caller must alias ``dist_expr`` as ``__nd`` in an enclosing
    projection before evaluating ``id_expr`` (same staged-column
    pattern as ``_geohash5_parts``'s ``__bx/__by/__z``).
    """
    if not anchors:
        raise ValueError("nearest_anchor_sql needs at least one anchor")
    anchors = sorted(anchors)
    dists = [
        f"greatest(abs({px} - CAST({x} AS BIGINT)),"
        f" abs({py} - CAST({y} AS BIGINT)))"
        for _, x, y in anchors
    ]
    # Spark's least() requires >= 2 args (DuckDB accepts 1) — a lone
    # anchor's distance IS the minimum
    dist_expr = (
        dists[0] if len(dists) == 1 else "least(" + ", ".join(dists) + ")"
    )
    cases = " ".join(
        f"WHEN {d} = __nd THEN CAST({aid} AS BIGINT)"
        for (aid, _, _), d in zip(anchors, dists)
    )
    id_expr = f"CASE {cases} END"
    return dist_expr, id_expr
