import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from masd_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light
    spark = get_spark(
        app_name="masd-tests",
        driver_memory="8g",
        # static conf: bucketed-table tests need a writable warehouse
        extra_confs={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="masd_warehouse_")
        },
    )
    yield spark
    spark.stop()
