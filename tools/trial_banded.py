"""TPU trial of the banded near-field engine (tools/, not shipped API).

Phase 1: small-N Mosaic compile + correctness vs the gather engine on TPU.
Phase 2: bench-scale (N=100k phi=0.45) step timing, banded vs blocked.

Run alone (one TPU process at a time!): python tools/trial_banded.py
"""

import argparse
import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-correctness", action="store_true")
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--xi", type=float, default=0.5)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--engine", default="banded")
    ap.add_argument("--forces", action="store_true")
    ap.add_argument("--trace-dir", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    if not args.skip_correctness:
        rng = np.random.default_rng(0)
        n, L = 1200, 26.0
        pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
        forces = rng.normal(size=(n, 3)).astype(np.float32)
        # error < 1e-3 selects full-precision far-field MXU passes on BOTH
        # engines — otherwise the two f32 far fields differ at the TPU's
        # default bf16-grade matmul precision (~1.5e-3) and mask real bugs.
        # (L grows with the error's larger rcut so columns stay >= 3 wide.)
        params = pse.make_params(xi=0.5, error=5e-4, L=L)
        cfg_b = integrator.make_config(
            params, n, thermal=False, engine="banded", block_dtype="float32"
        )
        cfg_d = integrator.make_config(
            params, n, thermal=False, engine="blocked", block_dtype="float32"
        )
        cfg_g = integrator.make_config(params, n, thermal=False, engine="gather")
        assert cfg_b.engine == "banded", cfg_b.engine
        t0 = time.perf_counter()
        ub, ob = integrator.mobility(cfg_b, pos, forces)
        ub = np.asarray(ub)
        print(f"banded mobility compiled+ran in {time.perf_counter()-t0:.1f}s",
              flush=True)
        # banded vs blocked shares the far field -> isolates the new
        # near-field kernels; vs gather includes the far-field formulation
        # difference + TPU matmul precision (~1e-3, at the error target).
        ud, _ = integrator.mobility(cfg_d, pos, forces)
        ug, _ = integrator.mobility(cfg_g, pos, forces)
        rel_d = np.linalg.norm(ub - np.asarray(ud)) / np.linalg.norm(ud)
        rel_g = np.linalg.norm(ub - np.asarray(ug)) / np.linalg.norm(ug)
        print(f"correctness: vs blocked rel={rel_d:.3e} "
              f"vs gather rel={rel_g:.3e} overflow={bool(ob)}", flush=True)
        assert rel_d < 1e-4, rel_d

    if not args.skip_timing:
        n = args.n
        phi = 0.45
        vol = n * (4.0 / 3.0) * math.pi / phi
        L = vol ** (1.0 / 3.0)
        n_side = int(math.ceil(n ** (1.0 / 3.0)))
        a = L / n_side
        grid = (np.arange(n_side) + 0.5) * a - L / 2.0
        x, y, z = np.meshgrid(grid, grid, grid, indexing="ij")
        pos = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)
        rng = np.random.default_rng(0)
        keep = rng.choice(pos.shape[0], size=n, replace=False)
        pos = pos[np.sort(keep)] + rng.normal(scale=0.05 * a, size=(n, 3))
        pos = pos.astype(np.float32)

        params = pse.make_params(xi=args.xi, error=1e-3, L=L)
        config = integrator.make_config(
            params, n, thermal=True, seed=1, engine=args.engine,
            has_forces=args.forces,
        )
        print(f"engine={config.engine} "
              f"band={config.band_spec and (config.band_spec.bins.n_cells, config.band_spec.bins.cap, config.band_spec.window)}",
              flush=True)
        state = integrator.make_state(pos)
        forces = (
            jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
            if args.forces else jnp.zeros((n, 3), jnp.float32)
        )
        T, dt, rate = jnp.float32(1.0), jnp.float32(1e-3), jnp.float32(0.0)

        t0 = time.perf_counter()
        for _ in range(3):
            state, info = integrator.step(config, state, forces, T, dt, rate)
        np.asarray(state.pos)
        print(f"warmup+compile {time.perf_counter()-t0:.1f}s "
              f"m={int(state.m_lanczos)} ovf={bool(state.nbr_overflow)}",
              flush=True)
        if bool(state.nbr_overflow):
            raise SystemExit("overflow at bench scale — spec sizing bug")

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, info = integrator.step(config, state, forces, T, dt, rate)
        np.asarray(state.pos)
        wall = (time.perf_counter() - t0) / args.steps
        print(f"step wall {wall*1e3:.1f} ms -> {n/wall:.3g} particle-steps/s "
              f"m={int(state.m_lanczos)}", flush=True)

        if args.trace_dir:
            import glob
            import json
            import os
            os.makedirs(args.trace_dir, exist_ok=True)
            jax.profiler.start_trace(args.trace_dir)
            for _ in range(3):
                state, info = integrator.step(config, state, forces, T, dt, rate)
            jax.block_until_ready(state.pos)
            jax.profiler.stop_trace()
            pbs = sorted(glob.glob(args.trace_dir + "/**/*.xplane.pb",
                                   recursive=True))
            from xprof.convert import raw_to_tool_data
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [pbs[-1]], "op_profile", {})
            prof = json.loads(data)

            def walk(node, depth, out):
                m = node.get("metrics", {})
                t = m.get("time", 0.0)
                if t and depth <= 2:
                    out.append((t, depth, node.get("name", "?")))
                for ch in node.get("children", []):
                    walk(ch, depth + 1, out)

            out = []
            walk(prof.get("byCategory", prof), 0, out)
            out.sort(reverse=True)
            print("\nop_profile byCategory (pct of device time):")
            for t, depth, name in out[:25]:
                print(f"  {'  '*depth}{t:6.2%}  {name}")


if __name__ == "__main__":
    main()
