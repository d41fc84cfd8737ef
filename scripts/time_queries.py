"""Back-to-back A/B timing helper for optimization work (not the bench).

Usage: python scripts/time_queries.py <name> [name ...]

Times each named harness query exactly like bench.py (1 cold + 3 warm
toPandas drains, min-of-warm) and prints one JSON line with the JVM
canary so readings taken minutes apart can be epoch-normalized.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _canary, _StageMetrics  # noqa: E402
from super_store_datawarehouse_spark.session import (  # noqa: E402
    get_spark,
    release_scoped_caches,
)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "time-queries",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4051",
            "spark.ui.retainedStages": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    canary = _canary(spark)
    metrics = _StageMetrics(spark)

    from super_store_datawarehouse_spark.plans import HARNESS
    from super_store_datawarehouse_spark.plans import harness as _h  # noqa: F401
    from super_store_datawarehouse_spark.plans import extensions as _x  # noqa: F401

    out = {}
    for name in names:
        builder, _ = HARNESS[name]
        runs = []
        snap1 = None
        for _i in range(4):
            if _i == 1:
                snap1 = metrics.snap()
            t0 = time.perf_counter()
            builder(spark, sf_dir).toPandas()
            runs.append(round(time.perf_counter() - t0, 3))
        snap2 = metrics.snap()
        out[name] = {
            "min_warm": min(runs[1:]),
            "runs": runs,
            "run_sec": round((snap2[0] - snap1[0]) / 1000.0 / 3.0, 3),
            "cpu_sec": round((snap2[1] - snap1[1]) / 1e9 / 3.0, 3),
        }
        release_scoped_caches()
    print(json.dumps({"canary_sec": canary, "queries": out}))


if __name__ == "__main__":
    main()
