import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")


@pytest.fixture(scope="session")
def spark():
    from information_retrieval_images_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="ir-tests")
    yield s
    s.stop()


@pytest.fixture()
def warehouse(spark):
    from information_retrieval_images_spark.catalog import Catalog

    d = tempfile.mkdtemp(prefix="ir_wh_")
    yield Catalog(spark, d)
    shutil.rmtree(d, ignore_errors=True)
