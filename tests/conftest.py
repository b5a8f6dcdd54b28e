import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from time_series_spark_spark.session import get_spark

    spark = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    yield spark
