"""Round-14 (optimization round 1) registry bookkeeping.

No new query entries this round — round 14 was the first OPTIMIZATION
round: every declared query kept bit-identical results while its
execution got cheaper (OPTIMIZATION_r14.md has the measurements).

The round-14 `_register_changed_since_green` markers (43 ids covering
the io.local_frame conversion, overlap_jobs, the literal-expression
de-storm and the fixtures sweep) were deleted at round-15 start per the
CLAUDE.md protocol: every one of the 43 ids is green in
CORRECTNESS_r14.json, so the markers would only have outranked
untouched greens in the driver's verification window.
"""
from __future__ import annotations
