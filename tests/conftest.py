from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # tiny fixture data: minimize per-job overhead (threads, shuffle
    # partitions, adaptive re-planning). Production sessions use the
    # defaults in geo_db_spark.session.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from geo_db_spark.session import get_spark

    s = get_spark("geo_db_spark_tests", shuffle_partitions=1)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    yield s
    s.stop()
