import shutil

import pytest

from invertedindexbuilder_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="iib-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmp_out(tmp_path):
    out = str(tmp_path / "idx")
    yield out
    shutil.rmtree(out, ignore_errors=True)
