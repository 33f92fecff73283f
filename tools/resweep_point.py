"""Re-measure one ξ-sweep point with the current bench flow and merge it
into BENCH_DETAILS.json (same residual-gated flow as `bench.py --sweep`,
without re-running the headline).

    python tools/resweep_point.py --xi 0.55
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xi", type=float, required=True)
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    sys.path.insert(0, root)
    import bench
    from bench_nsweep import merge_row  # same dir

    rel = bench.sweep_residual(args.xi)
    r = bench.run_bench(xi=args.xi, n_steps=args.steps)
    r["rel_err"] = rel
    print(json.dumps(r), flush=True)
    merge_row(r, os.path.join(root, "BENCH_DETAILS.json"))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
