import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nebula_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nebula-tests", parallelism=int(os.environ.get("TEST_CPUS", "4")))
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "table")
