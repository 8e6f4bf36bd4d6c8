import glob
import os

import duckdb
import pytest

from tidierdb_jl_spark import get_spark, register_testdata

SF_DIR = os.environ.get("TIDY_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tidierdb-tests", cpus=8, shuffle_partitions=8, driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    return register_testdata(spark, SF_DIR)


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()
