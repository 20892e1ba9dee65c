"""Ad-hoc: run the named new registry ids through the driver-style
compare at one or more SFs.  Usage: python tests/check_new.py id [id...]

SFs default to sf0.001 + sf0.01 (the driver's correctness SF);
override with WDS_CHECK_SFS=0.001,0.01,0.1.  Check recursive-CTE /
data-dependent oracles at sf0.1 too — the round-10 BPE dummy-row bug
was invisible at the small SFs and already live at sf0.1.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import compare_query, duckdb_connection
from weather_data_ingestion_service_spark import registry
from weather_data_ingestion_service_spark.session import get_spark

names = sys.argv[1:]
spark = get_spark()
Q, O = registry.queries(), registry.oracle_sql()
fail = 0
_sfs = [
    s.strip()
    for s in os.environ.get("WDS_CHECK_SFS", "0.001,0.01").split(",")
    if s.strip()
]
for sf_dir in [f"/root/testdata/sf{s}" for s in _sfs]:
    duck = duckdb_connection(sf_dir)
    for n in names:
        if n not in Q:
            print(f"{n}: NOT REGISTERED"); fail += 1; continue
        try:
            df = Q[n](spark, sf_dir)
            if n in O:
                ok, msg = compare_query(df, duck, O[n])
            else:
                cnt = df.count()
                ok, msg = cnt > 0, f"rows-only ({cnt} rows)"
        except Exception as ex:
            ok, msg = False, f"EXC {type(ex).__name__}: {ex}"
        print(f"{sf_dir.rsplit('/',1)[1]} {n}: {'OK' if ok else 'FAIL'} {msg}")
        fail += 0 if ok else 1
sys.exit(1 if fail else 0)
