"""Full-registry scale sweep: time EVERY registered query at a replica
scale with the noop sink -- the discipline that caught ann_ivf_topk's
hidden 521 s assignment (the per-round bench measures only the
headline list; anything outside it can silently regress at 100x).

Usage:
    python tools/scale_sweep.py [sf_dir] [--best-of N]

Defaults to .scale/sf10 (build with tools/make_scale_data.py). Output:
one line per query as it finishes (resumable by re-running with the
same --out file), then a summary JSON line with the slowest queries.
Queries that raise (e.g. the BY-DESIGN quadratic guards at 100x)
record ERR:<type> instead of aborting the sweep.

Collect is deliberately NOT used: output-heavy queries (full signature
tables, per-doc frames) measure 3-7x slower under collect than under
the noop sink, which mis-ranks the stragglers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_fraud_detection_system_spark.operators import all_queries
from real_time_fraud_detection_system_spark.session import cpu_count, get_spark

# TEACHING variants swept on a capped corpus (round-6 verdict #7): both
# prove saturation/boundedness properties that hold at ANY scale, so
# running them over the full 100x corpus buys ~2 min of sweep time and
# no information. dedup_simhash16's 2^16 fingerprint space saturates
# around 50k documents BY CONSTRUCTION (near-cartesian pair output past
# that -- dedup.py module docstring); dedup_clusters exists to bound the
# driver-side union-find demo. Their oracle checks at sf0.01 are
# unaffected (the cap applies only here); capped rows are flagged in the
# per-query output as `<seconds> cap=<n_docs>`.
SWEEP_CAPS = {"dedup_simhash16": 50_000, "dedup_clusters": 50_000}


def _capped_dir(spark, sf_dir: str, n_docs: int, _cache: dict = {}) -> str:
    """A temp sf_dir whose documents table is the first n_docs rows by
    doc_id (deterministic); every other table symlinks the original."""
    import glob
    import tempfile

    key = (os.path.realpath(sf_dir), n_docs)
    if key not in _cache:
        d = tempfile.mkdtemp(prefix="sweepcap_")
        for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
            if os.path.basename(p) != "documents.parquet":
                os.symlink(
                    os.path.abspath(p), os.path.join(d, os.path.basename(p))
                )
        (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .orderBy("doc_id")
            .limit(n_docs)
            .write.parquet(os.path.join(d, "documents.parquet"))
        )
        _cache[key] = d
    return _cache[key]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=".scale/sf10")
    ap.add_argument("--best-of", type=int, default=1,
                    help="runs per query; 1 (default) for a survey "
                         "sweep, 2 to suppress cold-start noise")
    ap.add_argument("--slow-twice", type=float, default=10.0,
                    metavar="SECONDS",
                    help="re-run any query whose first pass took at "
                         "least SECONDS and record the min (the >30 s "
                         "graph/bootstrap class swings ~2x on a shared "
                         "host under single cold runs -- 78 s in-sweep "
                         "vs 56 s solo was round 8's recurring 'is "
                         "this a regression?' question; round 9's was "
                         "the 5-30 s class, q12 reading 21.5 s vs "
                         "2.6 s same round, hence the 10 s default -- "
                         "a genuine default, not a recorded protocol "
                         "flag, per ADVICE r9); cheap queries still "
                         "run once so the sweep stays a survey; pass "
                         "a huge value to disable")
    ap.add_argument("--out", default=None,
                    help="append per-query lines here and skip queries "
                         "already present (resumable)")
    ap.add_argument("--filter", nargs="*", default=None,
                    help="only sweep queries whose name contains one of "
                         "these substrings (default: all)")
    ap.add_argument("--split-mb", type=int, default=64,
                    help="spark.sql.files.maxPartitionBytes in MB "
                         "(default 64, matching bench.py's sf10 section: "
                         "the replica tables are ~16 x 75 MB files, and "
                         "the 128 MB default yields 16 input splits on "
                         "32 cores -- half the machine idle through every "
                         "scan; measured on q1 at sf10: 19.1 s at 128 MB "
                         "vs 3.2 s at 64 MB warm)")
    args = ap.parse_args()

    done: set[str] = set()
    sink = sys.stdout
    if args.out:
        if os.path.exists(args.out):
            with open(args.out) as fh:
                done = {ln.split()[0] for ln in fh if len(ln.split()) >= 2}
        sink = open(args.out, "a")  # noqa: SIM115 (long-lived handle)

    spark = get_spark(
        "scale-sweep",
        cpus=cpu_count(),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(
                args.split_mb * 1024 * 1024
            )
        },
    )
    # Pre-build the cross-query memo artifacts (the bench.py round-11
    # protocol): --slow-twice already suppresses one-time build spikes
    # via min-of-2, but priming keeps FIRST-run numbers honest too --
    # per-tag build cost goes on its own evidence line.
    from real_time_fraud_detection_system_spark.operators._memo import (
        prime_memos,
    )

    t0 = time.time()
    tags = prime_memos(spark, args.sf_dir)
    print(
        json.dumps({
            "memo_build_s": round(time.time() - t0, 3),
            "memo_build_tags": tags,
        }),
        file=sink, flush=True,
    )

    res: dict[str, object] = {}
    for name, fn in all_queries().items():
        if name in done:
            continue
        if args.filter and not any(s in name for s in args.filter):
            continue
        best = None
        v: object
        cap = SWEEP_CAPS.get(name)
        runs_done = 0
        try:
            run_dir = (
                _capped_dir(spark, args.sf_dir, cap) if cap else args.sf_dir
            )
            runs = args.best_of
            while runs_done < runs:
                t = time.time()
                fn(spark, run_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.time() - t, 2)
                best = dt if best is None else min(best, dt)
                runs_done += 1
                if (
                    args.slow_twice is not None
                    and dt >= args.slow_twice
                    and runs < 2
                ):
                    runs = 2
            v = best
        except Exception as exc:  # noqa: BLE001 -- survey must finish
            v = f"ERR:{type(exc).__name__}"
        spark.catalog.clearCache()
        res[name] = v
        line = (f"{name} {v}" + (f" cap={cap}" if cap else "")
                + (" runs=2" if runs_done == 2 and args.best_of < 2 else ""))
        print(line, file=sink, flush=True)
        if sink is not sys.stdout:
            print(line, flush=True)

    timed = {k: v for k, v in res.items() if isinstance(v, float)}
    summary = {
        "sf_dir": args.sf_dir,
        "n_run": len(res),
        "n_err": len(res) - len(timed),
        "total_s": round(sum(timed.values()), 1),
        "slowest": sorted(
            timed.items(), key=lambda kv: -kv[1]
        )[:10],
    }
    print(json.dumps(summary), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
