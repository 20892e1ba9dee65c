"""Physical-plan assertions (SURVEY.md §4): the 100 TB posture is a
test target, not a hope.  Filters must reach the parquet scan, small
dims must broadcast, top-k must not global-sort, aggregates must not
shuffle more than once."""

from weather_data_ingestion_service_spark.io import load_table
from weather_data_ingestion_service_spark.plans import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
)
from weather_data_ingestion_service_spark.registry import queries

QS = queries()


def test_date_range_filter_pushed_to_scan(spark, sf_dir):
    df = QS["filter_date_range"](spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "o_orderdate" in pf, f"expected o_orderdate in PushedFilters, got: {pf}"


def test_projection_prunes_scan_columns(spark, sf_dir):
    df = QS["proj_select_vars"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "l_comment" not in plan
    # ReadSchema carries only the 3 projected columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) == 3, plan[:2000]


def test_geocode_lookup_broadcasts_dim(spark, sf_dir):
    df = QS["join_geocode_lookup"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_star_join_broadcasts_nation(spark, sf_dir):
    df = QS["join_equi_inner"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_topk_avoids_global_sort(spark, sf_dir):
    df = QS["sort_topk"](spark, sf_dir)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_daily_aggregate_single_shuffle(spark, sf_dir):
    df = QS["bucket_daily"](spark, sf_dir)
    # one Exchange for the groupBy — AQE may add nothing else
    assert count_exchanges(df) <= 1, formatted_plan(df)


def test_agg_multi_partial_aggregation(spark, sf_dir):
    plan = formatted_plan(QS["agg_multi"](spark, sf_dir))
    # partial + final hash aggregate pairs around a single exchange
    assert plan.count("HashAggregate") >= 2
    assert count_exchanges(QS["agg_multi"](spark, sf_dir)) == 1


def test_scan_stays_in_wholestage_codegen(spark, sf_dir):
    # '*(n)' markers = whole-stage-codegen stage ids; under AQE they
    # appear in the final executed plan, so run the query first
    df = QS["agg_multi"](spark, sf_dir)
    df.collect()
    assert "*(" in df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_single_shuffle_per_side(spark, sf_dir):
    """union + window as-of: the window shuffles once on the key; the
    pre-aggregation of the right side adds its own — total must stay
    small and fixed (no join explosion)."""
    df = QS["join_asof_nearest"](spark, sf_dir)
    assert count_exchanges(df) <= 3, formatted_plan(df)


def test_horizon_filter_prunes_with_literal_bounds(spark, sf_dir):
    df = QS["filter_horizon_relative"](spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "ts" in pf


def test_loader_normalizes_events_ts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_union_prefer_single_shuffle(spark, sf_dir):
    df = QS["set_union_history_forecast"](spark, sf_dir)
    assert count_exchanges(df) <= 1, formatted_plan(df)
