#!/usr/bin/env python
"""Capture .explain("formatted") output for declared queries.

Usage:
    python plans/r14/capture_plans.py <suffix> <outdir> <query> [query...]

Writes <outdir>/<query>_<suffix>.txt for each query.  Run from a repo
checkout (HEAD for "after"; a worktree at the pre-change commit for
"before").  Uses $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) so
the captured plans match the bench configuration.

Note: lifecycle entries (index build/upsert/compact flows) execute
eagerly while the entry constructs its result, so capturing their plan
runs the flow once; the captured plan is the plan of the RETURNED
frame.  Where the optimization's plan diff lives in an intermediate
frame (e.g. a codebook write inside a flow), the supplementary
"<query>__<stage>" files capture that intermediate explicitly.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from weather_data_ingestion_service_spark.session import get_spark
    from weather_data_ingestion_service_spark import registry

    spark = get_spark(app_name="wds-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        if name not in qs:
            print(f"SKIP (not registered here): {name}")
            continue
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"ERROR capturing plan: {exc!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
