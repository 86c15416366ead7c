"""get_spark must export the repo root on PYTHONPATH so Spark's python
WORKERS can import the package regardless of the driver's cwd — the
driver's own sys.path mutations do not propagate to workers (local-mode
analog of `spark-submit --py-files engine.zip`).  Regression: running
`python /root/repo/bench.py` from a foreign cwd died in the first
pandas UDF with ModuleNotFoundError."""

import os

import invertedindexbuilder_spark


def test_get_spark_exports_repo_root_on_pythonpath(spark):
    # the shared session fixture already called get_spark()
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(invertedindexbuilder_spark.__file__))
    )
    assert repo_root in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def test_pythonpath_not_duplicated():
    from invertedindexbuilder_spark.session import get_spark

    get_spark(cores=2)  # getOrCreate: reuses the fixture session
    entries = os.environ["PYTHONPATH"].split(os.pathsep)
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(invertedindexbuilder_spark.__file__))
    )
    assert entries.count(repo_root) == 1
