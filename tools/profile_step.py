"""Device-side trace of the production step (bench config) on the real TPU.

Prints the op_profile breakdown (per-category device time) plus m_lanczos and
whole-step wall time.  Host-side fine timing over the axon tunnel lies (see
CLAUDE.md); only the xprof device trace and multi-second aggregates are
trusted.

Usage: python tools/profile_step.py [--forces] [--n 100000] [--steps 10]
"""

import argparse
import glob
import json
import math
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--phi", type=float, default=0.45)
    ap.add_argument("--xi", type=float, default=0.5)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--forces", action="store_true")
    ap.add_argument("--engine", default="banded")
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--trace-dir", default="/tmp/pse_trace")
    ap.add_argument("--lattice", action="store_true",
                    help="jittered lattice instead of uniform random positions")
    ap.add_argument("--dump-hlo", default=None,
                    help="write the optimized (post-layout) HLO to this path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    n = args.n
    vol = n * (4.0 / 3.0) * math.pi / args.phi
    L = vol ** (1.0 / 3.0)
    rng = np.random.default_rng(0)
    if args.lattice:
        n_side = round(n ** (1 / 3))
        pos = pse.create_lattice(n_side, L)[:n]
        pos = (pos + rng.normal(scale=0.1, size=pos.shape)).astype(np.float32)
        n = pos.shape[0]          # n_side^3 may fall short of the request
    else:
        pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)

    params = pse.make_params(xi=args.xi, error=1e-3, L=L)
    config = integrator.make_config(
        params, n, thermal=True, seed=1, engine=args.engine,
        has_forces=args.forces, positions=pos,
    )
    state = integrator.make_state(pos)
    forces = (
        jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        if args.forces
        else jnp.zeros((n, 3), jnp.float32)
    )
    T, dt, rate = jnp.float32(1.0), jnp.float32(1e-3), jnp.float32(0.0)

    print(f"config: n={n} L={L:.1f} grid={params.Nx} rcut={params.ewald_cut:.2f} "
          f"nf={config.nf_spec and (config.nf_spec.bins.n_cells, config.nf_spec.bins.cap)} "
          f"ff={config.ff_spec and (config.ff_spec.bins.n_cells, config.ff_spec.bins.cap)} "
          f"forces={args.forces}", flush=True)

    @jax.jit
    def run_chunk(state):
        def body(s, _):
            new_s, _info = integrator.step(config, s, forces, T, dt, rate)
            return new_s, None
        final, _ = jax.lax.scan(body, state, None, length=args.chunk)
        return final

    t0 = time.perf_counter()
    state = run_chunk(state)
    np.asarray(state.pos)
    print(f"warmup+compile: {time.perf_counter()-t0:.1f}s "
          f"m_lanczos={int(state.m_lanczos)} overflow={bool(state.nbr_overflow)}",
          flush=True)

    # trusted aggregate wall time: one scan chunk per dispatch, multi-second
    n_chunks = max(1, args.steps // args.chunk)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state = run_chunk(state)
    np.asarray(state.pos)
    wall = (time.perf_counter() - t0) / (n_chunks * args.chunk)
    print(f"step wall: {wall*1e3:.2f} ms  ({n/wall:.3g} particle-steps/s)  "
          f"m_lanczos={int(state.m_lanczos)}", flush=True)

    if args.dump_hlo:
        txt = run_chunk.lower(state).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"optimized HLO ({len(txt)/1e6:.1f} MB) -> {args.dump_hlo}",
              flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    state = run_chunk(state)
    np.asarray(state.pos)
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(args.trace_dir + "/**/*.xplane.pb", recursive=True))
    if not pbs:
        print("no xplane.pb found", file=sys.stderr)
        return
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([pbs[-1]], "op_profile", {})
    prof = json.loads(data)

    # byProgram -> by_program -> jit_run_chunk -> category children, each
    # with metrics.rawTime in picoseconds.
    root = prof.get("byProgram") or prof.get("byCategory") or {}
    progs = [c for c in root.get("children", [])
             if c.get("name", "").startswith("jit_")]
    node = progs[0] if progs else root
    total_ps = node.get("metrics", {}).get("rawTime", 0)
    n_steps = args.chunk
    print(f"\nop_profile {node.get('name', '?')} "
          f"({total_ps/1e12/n_steps*1e3:.2f} ms/step device):")
    cats = sorted(
        node.get("children", []),
        key=lambda c: -c.get("metrics", {}).get("rawTime", 0),
    )
    for c in cats[:15]:
        t = c.get("metrics", {}).get("rawTime", 0)
        occ = c.get("metrics", {}).get("occurrences", 0)
        print(f"  {t/1e12/n_steps*1e3:7.3f} ms/step  {occ/n_steps:7.1f}/step"
              f"  {c.get('name', '?')}")
        kids = sorted(
            c.get("children", []),
            key=lambda k: -k.get("metrics", {}).get("rawTime", 0),
        )
        for k in kids[:16]:
            kt = k.get("metrics", {}).get("rawTime", 0)
            kocc = k.get("metrics", {}).get("occurrences", 0)
            if kt / 1e12 / n_steps * 1e3 < 0.02:
                break
            print(f"      {kt/1e12/n_steps*1e3:7.3f} ms/step "
                  f"{kocc/n_steps:6.1f}/step  {k.get('name', '?')[:90]}")


if __name__ == "__main__":
    main()
