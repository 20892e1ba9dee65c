"""Round-14 (optimization round 1) registry bookkeeping.

No new query entries this round — round 14 is the first OPTIMIZATION
round: every declared query keeps bit-identical results while its
execution gets cheaper (OPTIMIZATION_r14.md has the measurements).

The block below is the CLAUDE.md re-certification protocol applied to
the optimization edits: each listed id is GREEN in a prior
CORRECTNESS_r*.json but its implementation (or a shared helper on its
compute path) was edited this round, so the driver window re-serves it
ahead of untouched greens.  Every edit is result-preserving by
construction (verified against the DuckDB oracle at sf0.01 before
landing); the markers exist so the DRIVER certifies that too.
Delete each marker once CORRECTNESS_r14.json (or later) shows the id
green again.
"""
from __future__ import annotations

from .registry import _register_changed_since_green

# --- io.local_frame conversion (single-batch Arrow literal frames):
# every id whose entry or helper built a driver-literal DataFrame that
# is written/broadcast/published (the pickled-rows → Arrow swap changes
# no value, only the execution path).
_register_changed_since_green(
    # trained/refined index family (_train_refined_codebooks codebook
    # frames + published gates + generation manifest appends)
    "ext_simsearch_ivfpq_refined",
    "ext_simsearch_index_refined_build",
    "ext_simsearch_index_refined_serve",
    "ext_eval_ivfpq_recall_trained",
    "ext_simsearch_index_refined_upsert",
    "ext_eval_index_drift",
    "ext_simsearch_index_retrain",
    "stream_refined_index",
    "ext_eval_matryoshka",
    "ext_simsearch_index_swap",
    "ext_simsearch_index_list_hole",
    "stream_drift_retrain",
    "ext_simsearch_index_rollback",
    "ext_simsearch_index_compact_delta",
    "stream_delta_compact",
    # md5-codebook lifecycle family (static codebook copies + seeds)
    "ext_simsearch_index_upsert",
    "ext_simsearch_index_compact",
    "stream_simsearch_index",
    "stream_dedup_minhash",
    # kmeans_fixedpoint_int / power-iteration publications
    "ext_embed_kmeans_exact",
    "ext_simsearch_ivf_kmeans",
    "ext_simsearch_pq_kmeans",
    "ext_embed_power_iteration",
    # broadcast literal dims / driver-path publications
    "ext_eval_ndcg",
    "ext_eval_mrr",
    "ext_tokenizer_bpe_exact",
    "ext_tokenizer_bpe_apply_exact",
    "ext_dedup_cluster",
    "ext_dedup_semantic",
    "ext_graph_pagerank",
    "ext_eval_dedup_md5",
    "ext_eval_ivfpq_recall",
    "join_idw_interpolation",
)

# --- overlap_jobs / build round-trip removal (r14 session 2): the md5
# index build now encodes against the collected Arrow codebook instead
# of reading the just-written parquet back (values bit-identical), and
# the independent lifecycle writes overlap from a driver thread pool
# (guide §2.6 — same jobs, same outputs, wall-clock only).  The
# upsert/compact/refined-build ids are already marked above; these two
# share ivfpq_build_index.
_register_changed_since_green(
    "ext_simsearch_index_build",
    "ext_simsearch_index_query",
)

# --- literal-expression de-storm (r14 session 3): the big literal
# tables now build as ONE parsed F.expr string instead of hundreds of
# F.lit py4j calls (io.lit_double_array / simsearch._lit_double_sql —
# repr round-trip + correctly-rounded parse ⇒ bit-identical literals,
# verified by a 500-value bitwise probe and the hostile-TZ oracle).
# The index query/upsert/compact/stream ids sharing ivfpq_query_index
# are already marked above; these three carry the r9 literal tables.
_register_changed_since_green(
    "f_feels_like",
    "f_dew_point",
    "f_wind_components",
)

# --- fixtures geo dims + ML-KMeans centroid table through
# io.local_frame (r14 session 3 sweep of the remaining
# createDataFrame literal frames; values bit-identical, transport
# only).  ext_simsearch_ivf (rows-only) shares the centroid change.
_register_changed_since_green(
    "wx_forecast_hourly",
    "wx_history_daily",
    "wx_pipeline_e2e",
    "wx_sunrise_sunset",
    "f_daylight_duration",
)
