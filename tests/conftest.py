from __future__ import annotations

import shutil
import tempfile

import pytest

from easylink_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("easylink_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_ckpt():
    d = tempfile.mkdtemp(prefix="elspark_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
