"""Micro-benchmark of the banded near-field kernels at bench scale (TPU).

Times build_banded_blocks and a chained lax.scan of matvec_banded (each
iteration feeds the previous result back in, so nothing is dead-code
eliminated and the timing matches the Lanczos access pattern).  Compiles in
a couple of minutes — the inner iteration loop for kernel work, much faster
than the ~15 min full-step compile.

The shared-tunnel chip shows intermittent ~40% slow phases, so A/B
comparisons are only valid when the variants run INTERLEAVED in one process
(pass comma lists, e.g. --parts both,none or --rows 16,24): each rep times
every variant back to back.

Run alone (one TPU process at a time!): python tools/bench_matvec.py
"""

import argparse
import math
import time

import numpy as np


def make_variant(args, pse, integrator, bdn, jnp, rows, window):
    n, phi = args.n, 0.45
    L = (n * (4.0 / 3.0) * math.pi / phi) ** (1.0 / 3.0)
    params = pse.make_params(xi=args.xi, error=1e-3, L=L)
    cfg = integrator.make_config(params, n, thermal=True, engine="banded")
    bs, cheb, p = cfg.band_spec, cfg.cheb, cfg.params
    assert bs is not None
    if rows != bs.rows:
        bs = bs._replace(rows=rows, bins=bs.bins._replace(
            cap=-(-bs.bins.cap // rows) * rows))
    if window is not None and window != bs.window:
        bs = bs._replace(window=window)
    return bs, cheb, p, L


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--xi", type=float, default=0.5)
    ap.add_argument("--iters", type=int, default=100, help="matvecs per scan")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--parts", default="both",
                    help="comma list of both|fwd|t|none (non-both = probe, "
                    "WRONG results)")
    ap.add_argument("--rows", default="16", help="comma list of tile heights")
    ap.add_argument("--cps", default="0",
                    help="comma list of cols-per-step (0 = auto)")
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--allow-overflow", action="store_true",
                    help="time despite band overflow (drops pairs: timing "
                    "probe only, WRONG results)")
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

    def parse_rows(tok):
        # "16" or "32:192" (rows:window) — per-variant window override
        if ":" in tok:
            r, w = tok.split(":")
            return int(r), int(w)
        return int(tok), args.window

    variants = [
        (parts, *parse_rows(rows), int(cps))
        for rows in args.rows.split(",")
        for cps in args.cps.split(",")
        for parts in args.parts.split(",")
    ]

    n = args.n
    rng = np.random.default_rng(0)
    _, _, p0, L = make_variant(args, pse, integrator, bdn, jnp, 16, None)
    n_side = int(math.ceil(n ** (1.0 / 3.0)))
    a = L / n_side
    g = (np.arange(n_side) + 0.5) * a - L / 2.0
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    pos = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)
    keep = np.sort(rng.choice(pos.shape[0], size=n, replace=False))
    pos = (pos[keep] + rng.normal(scale=0.05 * a, size=(n, 3))).astype(
        np.float32
    )
    forces = rng.normal(size=(n, 3)).astype(np.float32)

    # --- compile + stage every variant up front -------------------------
    staged = []
    for parts, rows, window, cps in variants:
        bs, cheb, p, _ = make_variant(args, pse, integrator, bdn, jnp,
                                      rows, window)
        C = bs.bins.n_cells[0] * bs.bins.n_cells[1]
        S = bs.bins.cap
        W = bs.window
        a_bytes = (C * 2 * S * bdn.N_HALF * W
                   * jnp.dtype(bs.block_dtype).itemsize)
        label = f"parts={parts} R={rows} W={W} S={S} cps={cps or 'auto'}"
        print(f"[{label}] C={C} A={a_bytes/1e9:.3f} GB", flush=True)

        box = make_box(p.L, 0.0)
        bins = bin_columns(jnp.asarray(pos), box, bs.bins)
        j0, nv, ovf, zsh = bdn.compute_windows(bins, bs, box, p.ewald_cut)
        if bool(ovf):
            assert args.allow_overflow, f"band overflow in {label}"
            print(f"  [{label}] band OVERFLOW tolerated (timing probe)",
                  flush=True)
        f_cells = vec_to_cells(bins, bs.bins, jnp.asarray(forces))

        t0 = time.perf_counter()
        blocks, pos_cyc = bdn.build_banded_blocks(
            bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0,
            nv, zsh,
        )
        own_pos = bdn.make_own_pos(bins, bs)
        np.asarray(jnp.sum(blocks.astype(jnp.float32)))
        print(f"  build compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)

        def make_many(bs=bs, p=p, parts=parts, cheb=cheb, cps=cps):
            @jax.jit
            def many_matvecs(blocks_, j0_, nv_, fc):
                def body(v, _):
                    u = bdn.matvec_banded(
                        blocks_, pos_cyc, own_pos, j0_, nv_, zsh, bs, v,
                        p.self_mobility, p.L, parts=parts,
                        cols_per_step=cps or None,
                    )
                    return u * (1.0 / jnp.maximum(jnp.max(jnp.abs(u)),
                                                  1e-30)), None
                v, _ = jax.lax.scan(body, fc, None, length=args.iters)
                return v

            @jax.jit
            def many_builds(bins_, j0_, nv_, tilt):
                def body(acc, _):
                    b, _pc = bdn.build_banded_blocks(
                        bins_, tilt + 0.0 * acc, bs, cheb, p.L, p.ewald_cut,
                        p.ewald_dr, j0_, nv_, zsh,
                    )
                    return acc + b[0, 0, 0, 0, 0].astype(jnp.float32), None
                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None,
                    length=max(1, args.iters // 10),
                )
                return acc
            return many_matvecs, many_builds

        many_matvecs, many_builds = make_many()
        v = many_matvecs(blocks, j0, nv, f_cells)   # warm compile
        np.asarray(v)
        if not args.skip_build:
            np.asarray(many_builds(bins, j0, nv, jnp.float32(0.0)))
        staged.append(dict(label=label, a_bytes=a_bytes, mv=many_matvecs,
                           bld=many_builds, blocks=blocks, j0=j0, nv=nv,
                           v=v, bins=bins))

    # --- interleaved timing --------------------------------------------
    nb = max(1, args.iters // 10)
    for _ in range(args.reps):
        for s in staged:
            t0 = time.perf_counter()
            s["v"] = s["mv"](s["blocks"], s["j0"], s["nv"], s["v"])
            np.asarray(s["v"])
            dt_mv = (time.perf_counter() - t0) / args.iters
            msg = (f"[{s['label']}] matvec: {dt_mv*1e3:.3f} ms "
                   f"({s['a_bytes']/dt_mv/1e9:.0f} GB/s A-stream)")
            if not args.skip_build:
                t0 = time.perf_counter()
                np.asarray(s["bld"](s["bins"], s["j0"], s["nv"],
                                    jnp.float32(0.0)))
                msg += f"   build: {(time.perf_counter()-t0)/nb*1e3:.3f} ms"
            print(msg, flush=True)


if __name__ == "__main__":
    main()
