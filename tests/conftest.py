import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FAKE_LIBS = os.path.join(_REPO, "tests", "fake_libs")
sys.path.insert(0, _REPO)
# deterministic h3 shim (tests/fake_libs/h3) so the real-H3 encoder path
# has executed coverage; exported to PYTHONPATH *before* the JVM starts
# so pyspark worker processes can import it inside pandas UDFs too
sys.path.insert(1, _FAKE_LIBS)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + _FAKE_LIBS + os.pathsep + os.environ.get("PYTHONPATH", "")
)

from hexspark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hexspark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
