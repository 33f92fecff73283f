"""Headline benchmark: particle-steps/sec, dense suspension, one TPU chip.

Config 4 of BASELINE.json: N=100k spheres at volume fraction φ=0.45, kT>0
(full Brownian step: neighbor rebuild + near field + FFT far field + Lanczos
noise + wave noise + Euler/shear update).  Prints ONE JSON line.

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is 1e7 particle-steps/sec, so vs_baseline = value / 1e7.
"""

import json
import math
import time

import numpy as np


def run_bench(n=100_000, phi=0.45, xi=0.5, n_warm=3, n_steps=20, seed=0):
    import jax
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    vol = n * (4.0 / 3.0) * math.pi / phi
    L = vol ** (1.0 / 3.0)

    rng = np.random.default_rng(seed)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)

    params = pse.make_params(xi=xi, error=1e-3, L=L)
    # Pure Brownian workload (no external forces): the deterministic M·F
    # branch compiles out (the reference computes M·0 every step).
    config = integrator.make_config(
        params, n, thermal=True, seed=1, engine="blocked", has_forces=False
    )
    state = integrator.make_state(pos)
    forces = jnp.zeros((n, 3), jnp.float32)

    T = jnp.float32(1.0)
    dt = jnp.float32(1e-3)
    rate = jnp.float32(0.0)

    # warmup / compile
    for _ in range(n_warm):
        state, info = integrator.step(config, state, forces, T, dt, rate)
    jax.block_until_ready(state.pos)
    if bool(state.nbr_overflow):
        raise RuntimeError("neighbor overflow in bench config; enlarge spec")

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, info = integrator.step(config, state, forces, T, dt, rate)
    jax.block_until_ready(state.pos)
    elapsed = time.perf_counter() - t0

    steps_per_sec = n_steps / elapsed
    return {
        "xi": xi,
        "grid": (params.Nx, params.Ny, params.Nz),
        "rcut": params.ewald_cut,
        "engine": config.engine,
        "nf_spec": config.nf_spec and (config.nf_spec.bins.n_cells, config.nf_spec.bins.cap),
        "ff_spec": config.ff_spec and (config.ff_spec.bins.n_cells, config.ff_spec.bins.cap),
        "steps_per_sec": steps_per_sec,
        "particle_steps_per_sec": steps_per_sec * n,
        "m_lanczos": int(state.m_lanczos),
    }


def main():
    best = None
    for xi in (0.5,):
        r = run_bench(xi=xi)
        if best is None or r["particle_steps_per_sec"] > best["particle_steps_per_sec"]:
            best = r
    print(
        json.dumps(
            {
                "metric": "particle-steps/sec @ N=100k phi=0.45 kT>0",
                "value": round(best["particle_steps_per_sec"]),
                "unit": "particle-steps/s",
                "vs_baseline": round(best["particle_steps_per_sec"] / 1e7, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
