import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Side plans (localCheckpoint inputs, index builds) are invisible to plan
# inspection on the returned frame; the library audits them at execution
# time (plans/inspect.py:audit_side_plan). Under pytest a violation is a
# hard failure, not a warning.
os.environ.setdefault("POPELINES_PLAN_AUDIT", "strict")


@pytest.fixture(scope="session")
def spark():
    from popelines_spark.session import get_spark

    s = get_spark(app_name="popelines_spark_tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


SF_DIR = "/root/testdata/sf0.001"
