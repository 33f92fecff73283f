"""Measure how per-column tile needs DRIFT over a bench-config run.

The occupancy-class capacities (banded_nearfield.make_band_classes) must
hold for a whole run between recompiles; the first two sizing models
(Poisson, measured + R/2 drift margin) both overflowed inside a 100-step
warmup chunk at bench scale.  Hypothesis: hydrodynamically-correlated
noise moves column occupancy COLLECTIVELY, far faster than
independent-particle exchange.  This tool runs the real brownian step on
the TPU in 25-step chunks and records, per chunk, the need histogram and
the would-be assignment margin against the configured classes — data to
size the margins from.

Usage: python tools/diag_classes.py [--steps 400] [--chunk 25]
"""

import argparse
import importlib.util
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--phi", type=float, default=0.45)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--chunk", type=int, default=25)
    args = ap.parse_args()

    import numpy as np

    spec = importlib.util.spec_from_file_location("benchmod", "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    import jax
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.ops import banded_nearfield as bdn
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pos, L = bench.make_positions(args.n, args.phi)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    config = integrator.make_config(
        params, args.n, thermal=True, seed=1, engine="banded",
        has_forces=False, positions=pos,
    )
    bs = config.band_spec
    print(f"classes: {bs.classes}", flush=True)
    segs = bdn.class_segments(bs)

    state = integrator.make_state(pos)
    T = jnp.float32(1.0)
    dt = jnp.float32(1e-3)
    zeros = jnp.zeros((args.n, 3), jnp.float32)

    @jax.jit
    def run_chunk(state):
        def body(s, _):
            s, _info = integrator.step(config, s, zeros, T, dt, 0.0)
            return s, None
        s, _ = jax.lax.scan(body, state, None, length=args.chunk)
        return s

    counts0 = bdn.measure_col_counts(bs, pos, params.L)
    for step in range(0, args.steps + 1, args.chunk):
        p = np.asarray(state.pos)
        counts = bdn.measure_col_counts(bs, p, params.L)
        needs = -(-np.maximum(counts, 1) // bs.rows)
        desc = np.sort(needs)[::-1]
        margins = []
        ok = True
        for (tk, ck, off) in segs:
            margin = tk - int(desc[off])
            margins.append(f"t{tk}:{margin:+d}")
            ok &= margin >= 0
        dmax = int(np.abs(counts - counts0).max())
        drms = float(np.sqrt(((counts - counts0) ** 2).mean()))
        print(
            f"step {step:5d}  ovf={int(state.nbr_overflow)} fits={ok} "
            f"margins[{' '.join(margins)}] "
            f"count-drift rms {drms:5.1f} max {dmax:3d} "
            f"need max {int(needs.max())}",
            flush=True,
        )
        if int(state.nbr_overflow):
            print("sticky overflow set on-device; stopping", flush=True)
            break
        if step < args.steps:
            state = run_chunk(state)
            np.asarray(state.pos)


if __name__ == "__main__":
    main()
