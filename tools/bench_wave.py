"""Micro-benchmark of the wave-space pipeline pieces at bench scale (TPU).

Times, as separate scan-chunked jits: grid-noise generation, the MXU irfft,
contract, spread+rfft, and the whole brownian wave path — at the grids the
ξ sweep cares about.  Guides the ξ trade: the near field shrinks with ξ
while these pieces grow with the FFT grid.

Run alone (one TPU process at a time): python tools/bench_wave.py --xi 0.5,0.9
"""

import argparse
import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--xi", default="0.5,0.9")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import bin_particles, vec_to_cells
    from pse_tpu.ops import column_farfield as cff
    from pse_tpu.ops import farfield, mxu_fft, noise
    from pse_tpu.params import gridk_arrays
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n, phi = args.n, 0.45
    L = (n * (4.0 / 3.0) * math.pi / phi) ** (1.0 / 3.0)
    rng = np.random.default_rng(0)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    forces = rng.normal(size=(n, 3)).astype(np.float32)

    staged = []
    for xi in [float(x) for x in args.xi.split(",")]:
        p = pse.make_params(xi=xi, error=1e-3, L=L)
        spec = cff.make_col_spec(p, n)
        box = make_box(p.L, 0.0)
        bins = bin_particles(jnp.asarray(pos), box, spec.bins)
        f_cells = vec_to_cells(bins, spec.bins, jnp.asarray(forces))
        kvec, W = gridk_arrays(p, 0.0, half=True)
        key = jax.random.PRNGKey(0)
        T, dt = jnp.float32(1.0), jnp.float32(1e-3)
        nzh = p.Nz // 2 + 1
        label = f"xi={xi} grid={p.Nx} colff C={spec.bins.n_cells[:2]} cap={spec.bins.cap} s={spec.s}"
        print(f"[{label}]", flush=True)

        factors = cff.build_col_factors(bins, box, spec, p)
        # Everything device-resident rides as a jit ARGUMENT: a captured
        # device array becomes an MLIR constant, whose device->host fetch
        # the axon tunnel rejects (UNIMPLEMENTED) and then wedges the
        # backend for the rest of the process.
        aux = dict(bins=bins, box=box, f_cells=f_cells, kvec=kvec, W=W,
                   factors=factors)

        def chunked(fn, x0, iters=args.iters):
            @jax.jit
            def run(x, a):
                def body(v, _):
                    return fn(v, a), None
                v, _ = jax.lax.scan(body, x, None, length=iters)
                return v
            return (lambda x, run=run: run(x, aux)), x0

        def noise_step(s, a):
            k = jax.random.fold_in(jax.random.PRNGKey(0), s)
            nh = noise.wave_space_noise_hat_half(k, p, a["kvec"], a["W"], T, dt)
            return s + 1 + jnp.real(nh[0, 0, 0, 0]).astype(jnp.int32) * 0

        def irfft_step(g, a):
            gv = mxu_fft.irfft3_mxu(g.astype(jnp.complex64), (p.Nx, p.Ny, p.Nz))
            return (g + jnp.mean(gv).astype(jnp.complex64)).astype(jnp.complex64)

        def rfft_step(g, a):
            gh = mxu_fft.rfft3_mxu(g)
            return g + jnp.real(gh[..., 0, 0, 0])[..., None, None, None] * 1e-30

        def contract_step(g, a):
            u = cff.contract_col(a["bins"], g, a["box"], spec, p, a["factors"])
            return g * (1.0 + 1e-30 * jnp.mean(u))

        def spread_step(fc, a):
            g = cff.spread_col(a["bins"], fc, a["box"], spec, p, a["factors"])
            return fc * (1.0 + 1e-30 * jnp.mean(g))

        def factors_step(fc, a):
            fac = cff.build_col_factors(a["bins"], a["box"], spec, p)
            return fc * (1.0 + 1e-30 * jnp.mean(fac.wz))

        def wave_brownian(s, a):
            k = jax.random.fold_in(jax.random.PRNGKey(0), s)
            nh = noise.wave_space_noise_hat_half(k, p, a["kvec"], a["W"], T, dt)
            gv = mxu_fft.irfft3_mxu(nh, (p.Nx, p.Ny, p.Nz)).astype(jnp.float32)
            u = cff.contract_col(a["bins"], gv, a["box"], spec, p, a["factors"])
            return s + 1 + jnp.mean(u).astype(jnp.int32) * 0

        ghat0 = jnp.zeros((3, p.Nx, p.Ny, nzh), jnp.complex64)
        grid0 = jnp.zeros((3, p.Nx, p.Ny, p.Nz), jnp.float32)
        step0 = jnp.asarray(0, jnp.int32)
        cases = [
            ("noise_hat", *chunked(noise_step, step0)),
            ("irfft", *chunked(irfft_step, ghat0)),
            ("rfft", *chunked(rfft_step, grid0)),
            ("contract", *chunked(contract_step, grid0)),
            ("spread", *chunked(spread_step, f_cells)),
            ("col_factors", *chunked(factors_step, f_cells, max(10, args.iters // 5))),
            ("wave_brownian", *chunked(wave_brownian, step0)),
        ]
        ok_cases = []
        for name, fn, x0 in cases:
            t0 = time.perf_counter()
            try:
                jax.block_until_ready(fn(x0))
            except Exception as e:  # noqa: BLE001 — skip broken case, keep rest
                import traceback
                print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
                traceback.print_exc()
                continue
            print(f"  {name}: compile {time.perf_counter()-t0:.0f}s", flush=True)
            ok_cases.append((name, fn, x0))
        staged.append((label, ok_cases))

    for _ in range(args.reps):
        for label, cases in staged:
            msgs = []
            for name, fn, x0 in cases:
                iters = args.iters if name != "col_factors" else max(10, args.iters // 5)
                t0 = time.perf_counter()
                jax.block_until_ready(fn(x0))
                msgs.append(f"{name}={1e3*(time.perf_counter()-t0)/iters:.2f}ms")
            print(f"[{label}] " + " ".join(msgs), flush=True)


if __name__ == "__main__":
    main()
