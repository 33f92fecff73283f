"""Micro-benchmark of the banded near-field kernels at bench scale (TPU).

Times build_banded_blocks and a chained lax.scan of matvec_banded (each
iteration feeds the previous result back in, so nothing is dead-code
eliminated and the timing matches the Lanczos access pattern).  Compiles in
a couple of minutes — the inner iteration loop for kernel work, much faster
than the ~15 min full-step compile.

Run alone (one TPU process at a time!): python tools/bench_matvec.py
"""

import argparse
import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--xi", type=float, default=0.5)
    ap.add_argument("--iters", type=int, default=100, help="matvecs per scan")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import bin_columns, vec_to_cells
    from pse_tpu.ops import banded_nearfield as bdn
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n, phi = args.n, 0.45
    L = (n * (4.0 / 3.0) * math.pi / phi) ** (1.0 / 3.0)
    rng = np.random.default_rng(0)
    n_side = int(math.ceil(n ** (1.0 / 3.0)))
    a = L / n_side
    g = (np.arange(n_side) + 0.5) * a - L / 2.0
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)
    keep = np.sort(rng.choice(pos.shape[0], size=n, replace=False))
    pos = (pos[keep] + rng.normal(scale=0.05 * a, size=(n, 3))).astype(
        np.float32
    )

    params = pse.make_params(xi=args.xi, error=1e-3, L=L)
    cfg = integrator.make_config(params, n, thermal=True, engine="banded")
    bs, cheb, p = cfg.band_spec, cfg.cheb, cfg.params
    assert bs is not None
    C = bs.bins.n_cells[0] * bs.bins.n_cells[1]
    S = bs.bins.cap
    W = bs.window
    a_bytes = C * 6 * S * bdn.N_HALF * W * jnp.dtype(bs.block_dtype).itemsize
    print(f"band: C={C} S={S} W={W} dtype={bs.block_dtype} "
          f"A={a_bytes/1e9:.3f} GB", flush=True)

    box = make_box(p.L, 0.0)
    bins = bin_columns(jnp.asarray(pos), box, bs.bins)
    j0, nv, ovf = bdn.compute_windows(bins, bs, box, p.ewald_cut)
    assert not bool(ovf), "band overflow at bench scale"
    f_cells = vec_to_cells(
        bins, bs.bins, jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    )

    t0 = time.perf_counter()
    blocks = bdn.build_banded_blocks(
        bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0, nv
    )
    np.asarray(jnp.sum(blocks.astype(jnp.float32)))
    print(f"build compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    @jax.jit
    def many_builds(bins_, j0_, nv_, tilt):
        def body(acc, _):
            b = bdn.build_banded_blocks(
                bins_, tilt + 0.0 * acc, bs, cheb, p.L, p.ewald_cut,
                p.ewald_dr, j0_, nv_,
            )
            return acc + b[0, 0, 0, 0, 0].astype(jnp.float32), None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), None, length=max(1, args.iters // 10)
        )
        return acc

    @jax.jit
    def many_matvecs(blocks_, j0_, nv_, fc):
        def body(v, _):
            u = bdn.matvec_banded(blocks_, j0_, nv_, bs, v, p.self_mobility)
            # keep values bounded so the chain never overflows
            return u * (1.0 / jnp.maximum(jnp.max(jnp.abs(u)), 1e-30)), None
        v, _ = jax.lax.scan(body, fc, None, length=args.iters)
        return v

    v = many_matvecs(blocks, j0, nv, f_cells)
    np.asarray(v)
    nb = max(1, args.iters // 10)
    np.asarray(many_builds(bins, j0, nv, jnp.float32(0.0)))
    for _ in range(args.reps):
        t0 = time.perf_counter()
        v = many_matvecs(blocks, j0, nv, v)
        np.asarray(v)
        dt_mv = (time.perf_counter() - t0) / args.iters
        t0 = time.perf_counter()
        np.asarray(many_builds(bins, j0, nv, jnp.float32(0.0)))
        dt_b = (time.perf_counter() - t0) / nb
        print(f"matvec: {dt_mv*1e3:.3f} ms  ({a_bytes/dt_mv/1e9:.0f} GB/s A-stream)"
              f"   build: {dt_b*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
