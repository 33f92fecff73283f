"""N-scaling points for BENCH_DETAILS (VERDICT r4 stretch 8): the headline
bench config at N=300k (and optionally 1M, memory permitting) so the
O(N log N) claim is a measured curve.

Run alone (one TPU process at a time):
    python tools/bench_nsweep.py [--ns 300000] [--steps 200]
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+", default=[300_000])
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=100)
    args = ap.parse_args()

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    )
    import bench

    rows = []
    for n in args.ns:
        r = bench.run_bench(n=n, has_forces=False, n_steps=args.steps,
                            chunk=args.chunk)
        r["n"] = n
        print(json.dumps(r), flush=True)
        rows.append(r)
    return rows


if __name__ == "__main__":
    main()
