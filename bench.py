"""Per-round benchmark: runs the headline queries end-to-end at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <float>}.

Each query is forced end-to-end with the noop sink (full computation,
no driver collect). The first timed query pays JVM/codegen warm-up; a
separate warm-up action absorbs session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    from masd_spark.session import get_spark
    from masd_spark.queries import load_all

    spark = get_spark(app_name="masd-bench", driver_memory=os.getenv("MASD_DRIVER_MEMORY", "48g"))
    registry = load_all()
    headline = {n: s for n, s in registry.items() if s.headline}

    # warm-up: JVM, parquet footer reads, codegen
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, spec in headline.items():
        # build INSIDE the timed window: some operators eagerly materialize
        # shared intermediates (e.g. the shingle set) during construction.
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "sum of headline query wall-times (noop sink, warm JVM)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
