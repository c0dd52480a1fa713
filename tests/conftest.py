from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from gsuites_gcp_graphdb_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
