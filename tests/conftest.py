from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_fraud_detection_rocks_db_app_spark.session import get_spark  # noqa: E402
from flink_fraud_detection_rocks_db_app_spark.testing import duck_con  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    return duck_con(SF_SMALL)


@pytest.fixture()
def scratch(request):
    # Fresh per run: stale checkpoints/sink dirs from a previous pytest
    # invocation would otherwise leak into restart-semantics tests.
    d = os.path.join(SCRATCH, request.node.name)
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d)
    return d
