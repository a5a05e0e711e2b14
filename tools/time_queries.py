"""Time named registry queries with the noop sink (best-of-N).

Usage: python tools/time_queries.py <sf_dir> [--best-of N] [--split-mb M] name...

The per-query harness for optimization work: same session shape as
bench.py's scale sections (fresh session, memos primed first so one-time
index builds are not billed to the first query), per-query job
descriptions for UI attribution (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_fraud_detection_system_spark.operators import all_queries
from real_time_fraud_detection_system_spark.operators._memo import prime_memos
from real_time_fraud_detection_system_spark.session import cpu_count, get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--best-of", type=int, default=2)
    ap.add_argument("--split-mb", type=int, default=64)
    ap.add_argument("--no-memo", action="store_true")
    args = ap.parse_args()

    spark = get_spark(
        "time-queries",
        cpus=cpu_count(),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(
                args.split_mb * 1024 * 1024
            )
        },
    )
    qs = all_queries()
    if not args.no_memo:
        t0 = time.time()
        prime_memos(spark, args.sf_dir)
        print(f"memo prime: {time.time() - t0:.1f}s", flush=True)
    out = {}
    for name in args.names:
        best = float("inf")
        for i in range(args.best_of):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        spark.catalog.clearCache()
        out[name] = round(best, 2)
        print(f"{name} {best:.2f}", flush=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
