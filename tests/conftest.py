from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session("cdcagg-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
