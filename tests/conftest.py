import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("WDS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from weather_data_ingestion_service_spark.session import get_spark

    # small local session for test speed; prod sizing is in session.py
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.oracle_utils import duckdb_connection

    con = duckdb_connection(sf_dir)
    yield con
    con.close()
