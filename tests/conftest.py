import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (SparkSession.builder
         .master("local[4]")
         .appName("peri-spark-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", os.environ.get("SPARK_TEST_DRIVER_MEM", "4g"))
         .getOrCreate())
    yield s
    s.stop()


def viol_set(result, *id_cols):
    """Violations as a set of (id..., path-tuple, key, message) tuples."""
    rows = result.violations(*id_cols).collect()
    return {tuple(r[c] for c in id_cols) + (tuple(r["path"]), r["key"], r["message"])
            for r in rows}
