import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from miaplpy_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="miaplpy_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
