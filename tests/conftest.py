import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chainweb_data_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("cds-tests", shuffle_partitions=8)
    yield s


SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir():
    return SF01
