"""Dump .explain('formatted') for every headline query into plans/r12/.

Usage: python scripts/dump_plans_r12.py [suffix] [name ...]

Writes plans/r12/<query>_<suffix>.txt (suffix defaults to "before").
With explicit names, dumps only those; otherwise the full bench HEADLINE
list. Pure plan compilation — no query execution beyond what builders
do eagerly (q45 seeds/centroid collects, q26 localize, q20 index build).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from super_store_datawarehouse_spark.session import (  # noqa: E402
    get_spark,
    release_scoped_caches,
)


def main() -> None:
    args = sys.argv[1:]
    suffix = args[0] if args else "before"
    from bench import HEADLINE

    names = args[1:] if len(args) > 1 else HEADLINE

    from super_store_datawarehouse_spark.plans import HARNESS
    from super_store_datawarehouse_spark.plans import harness as _h  # noqa: F401
    from super_store_datawarehouse_spark.plans import extensions as _x  # noqa: F401

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans-r12")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        builder, _ = HARNESS[name]
        df = builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        release_scoped_caches()
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
