import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pubscience_spark.session import get_spark
    s = get_spark(app_name="pubscience-tests", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_path(tmp_path_factory):
    from pubscience_spark.datagen.pages import write_pages_parquet
    p = tmp_path_factory.mktemp("pages") / "pages.parquet"
    write_pages_parquet(str(p), 150)
    return str(p)
