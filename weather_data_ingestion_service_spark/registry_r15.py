"""Round-15 (optimization round 2) registry bookkeeping.

No new query entries this round — round 15 is the second OPTIMIZATION
round: every declared query keeps bit-identical results while its
execution gets cheaper (OPTIMIZATION_r15.md has the measurements).

The markers below are the CLAUDE.md re-certification protocol applied
to the optimization edits: each listed id is GREEN in a prior
CORRECTNESS_r*.json but its implementation (or a shared helper on its
compute path) was edited this round, so the driver window re-serves it
ahead of untouched greens.  Every edit is result-preserving by
construction (probed bit-identical against the old formulation on real
data AND verified against the DuckDB oracle before landing); the
markers exist so the DRIVER certifies that too.  Delete each marker
once CORRECTNESS_r15.json (or later) shows the id green again.
"""
from __future__ import annotations

from .registry import _register_changed_since_green

# --- ivfpq_encode_codes numpy mapInArrow kernel (guide §4.2): the
# md5-codebook encode every one of these ids runs (directly or via
# ivfpq_build_index / the upsert-compact epoch writes / the streaming
# foreachBatch handler) swapped its broadcast-cross-join +
# SortAggregate for a closure-codebook Arrow kernel — probed
# bit-identical on sf0.01 AND sf0.1 (sorted-tuple equality) and ~9×
# faster isolated (2.30 → 0.25 s noop at sf0.1).
_register_changed_since_green(
    "ext_simsearch_index_build",
    "ext_simsearch_index_query",
    "ext_simsearch_index_upsert",
    "ext_simsearch_index_compact",
    "stream_simsearch_index",
)

# --- ivfpq_refined_encode_epoch wide-record kernel (guide §2.4): the
# trained-index epoch encode emits the wide record in ONE Arrow pass
# (probed bit-identical on sf0.01 and sf0.1; 2.03 → 0.84 s noop at
# sf0.1), removing the long-form pivot (1 exchange + 2
# ObjectHashAggregates), the join back to q256, and a second full
# corpus scan.  These ids run it directly or via
# _ensure_refined_upserted; the same ids carry the ADVICE-r14 salt-
# knob sizing refactor in compact_epochs/compact_delta (knob-off path
# plan-identical, pytest-pinned).
_register_changed_since_green(
    "ext_simsearch_index_refined_upsert",
    "ext_eval_index_drift",
    "stream_refined_index",
    "ext_simsearch_index_list_hole",
    "stream_drift_retrain",
    "ext_simsearch_index_compact_delta",
    "stream_delta_compact",
)

# --- ngram_jaccard_pairs suffix filtering (Xiao et al. depth-1,
# guide §2.3/§3; VERDICT r14 #4): an exact-admissible overlap bound
# from half-sorted-array probes prunes candidates BEFORE the
# full-array verify attach — 140,916 → 2,492 at sf0.1/t=0.5 (truth
# 822; the candidate/verified ratio drops 171× → 3×).  Output pairs
# probed identical on sf0.01 and sf0.1 (sorted-tuple equality).
# Every id that runs the shared pair kernel:
_register_changed_since_green(
    "ext_dedup_ngram",
    "ext_dedup_cluster",
    "ext_dedup_keep",
    "ext_eval_dedup",
    "ext_graph_degree",
    "ext_graph_pagerank",
    "ext_eval_dedup_md5",
)
