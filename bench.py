"""Headline benchmark: particle-steps/sec, dense suspension, one TPU chip.

Config 4 of BASELINE.json: N=100k spheres at volume fraction φ=0.45, kT>0,
positions drawn as a vacancy-diluted simple-cubic lattice (non-overlapping,
the physically meaningful φ=0.45 configuration).  Two workloads are measured:

  * brownian     — no external forces (the reference's canonical
                   examples/run.py workload; the M·0 deterministic path is
                   compiled out, exactly as a user would run it);
  * with-forces  — has_forces=True with a fixed random force array, which
                   exercises the full fused pipeline: spread + forward FFT +
                   near-field M·F on top of the Brownian machinery.

Steps run as device-side lax.scan chunks (launch overhead amortized, like
Simulation.run).  Chunk length 200 (run_bench default): each dispatch over
the axon tunnel costs ~50-80 ms of host-side gap regardless of chunk size
(measured: wall-vs-xprof device time at chunk 25/50/100), so short chunks
inflate the per-step wall — production runs scan longer, the bench should
too; see run_bench's docstring.  Prints ONE JSON line (the brownian headline, metric
continuity with round 1); the full breakdown, including the with-forces
number and an optional ξ sweep (--sweep; each ξ is a fresh ~10 min TPU
compile), goes to stderr and BENCH_DETAILS.json.

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is 1e7 particle-steps/sec, so vs_baseline = value / 1e7.
"""

import argparse
import json
import math
import sys
import time

import numpy as np


def make_positions(n, phi, seed=0):
    """Vacancy-diluted SC lattice at volume fraction φ (non-overlapping)."""
    vol = n * (4.0 / 3.0) * math.pi / phi
    L = vol ** (1.0 / 3.0)
    n_side = int(math.ceil(n ** (1.0 / 3.0)))
    a = L / n_side
    grid = (np.arange(n_side) + 0.5) * a - L / 2.0
    x, y, z = np.meshgrid(grid, grid, grid, indexing="ij")
    pos = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)
    rng = np.random.default_rng(seed)
    keep = rng.choice(pos.shape[0], size=n, replace=False)
    pos = pos[np.sort(keep)]
    pos += rng.normal(scale=0.05 * a, size=pos.shape)   # break lattice symmetry
    return pos.astype(np.float32), L


def run_bench(n=100_000, phi=0.45, xi=0.5, has_forces=False, n_warm=1,
              n_steps=400, chunk=200, seed=0, engine="banded"):
    """chunk=200: the axon tunnel costs ~50-80 ms idle per DISPATCH, so a
    100-step chunk leaves ~0.5-0.8 ms/step of wall-vs-device gap (measured:
    11.95 ms device vs 12.76 wall at chunk=100); 200 halves it."""
    import jax
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    pos, L = make_positions(n, phi, seed)
    params = pse.make_params(xi=xi, error=1e-3, L=L)
    config = integrator.make_config(
        params, n, thermal=True, seed=1, engine=engine,
        has_forces=has_forces,
    )
    state = integrator.make_state(pos)
    rng = np.random.default_rng(seed + 1)
    forces = (
        jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        if has_forces
        else jnp.zeros((n, 3), jnp.float32)
    )

    T = jnp.float32(1.0)
    dt = jnp.float32(1e-3)
    rate = jnp.float32(0.0)

    def make_chunk(cfg):
        @jax.jit
        def run_chunk(state):
            def body(s, _):
                new_s, _info = integrator.step(cfg, s, forces, T, dt, rate)
                return new_s, None
            final, _ = jax.lax.scan(body, state, None, length=chunk)
            return final
        return run_chunk

    if engine == "banded" and config.band_spec is not None:
        # The initial lattice MELTS toward uniform over the first few
        # hundred steps (tools/diag_classes.py: count-drift rms 26 after
        # 25 steps), so occupancy classes sized at t=0 overflow mid-run.
        # Deterministic compile flow instead of overflow-retry roulette:
        # relax on the (always-safe) single-class program first, then size
        # the classes from the RELAXED histogram and compile the packed
        # program that gets timed.  A relaxation overflow (denser lattices
        # at other N are far more column-commensurate than the N=100k one
        # — the first N=300k run hit mask 0x5) grows the spec and
        # RE-RELAXES on the grown single-class program, so the timed
        # program still gets occupancy classes instead of inheriting
        # grown single-class capacities (whose all-pad tail tiles are
        # exactly what class packing exists to skip).
        import dataclasses

        if config.band_spec.classes is not None:
            config = dataclasses.replace(
                config,
                band_spec=config.band_spec._replace(classes=None),
            )
        for _relax_try in range(3):
            run_chunk = make_chunk(config)
            state = run_chunk(state)
            relaxed = np.asarray(state.pos)
            if not bool(state.nbr_overflow):
                from pse_tpu.ops import banded_nearfield as bdn

                bs = config.band_spec
                counts = bdn.measure_col_counts(bs, relaxed, params.L)
                config = dataclasses.replace(
                    config,
                    band_spec=bdn.make_band_classes(bs, n, counts),
                )
                print(f"# occupancy classes (from {chunk}-step relaxed "
                      f"histogram): {config.band_spec.classes}",
                      file=sys.stderr)
                state = integrator.make_state(relaxed)
                break
            flags = int(state.nbr_overflow)
            config = integrator.grow_config(config, flags=flags)
            print(f"# relaxation overflow at xi={xi} (mask={flags:#x}): "
                  "grew spec, re-relaxing", file=sys.stderr)
            state = integrator.make_state(pos)

    run_chunk = make_chunk(config)
    n_chunks = max(1, n_steps // chunk)
    for grow in range(4):
        for _ in range(n_warm):
            state = run_chunk(state)
        np.asarray(state.pos)  # materialize (block_until_ready lies, CLAUDE.md)
        phase = "warmup"
        if not bool(state.nbr_overflow):
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                state = run_chunk(state)
            np.asarray(state.pos)
            elapsed = time.perf_counter() - t0
            # an overflow first hit DURING the timed steps means windows
            # clipped (dropped pairs) — the timing is of a wrong program;
            # regrow and re-time like a warmup overflow
            if not bool(state.nbr_overflow):
                break
            phase = "timed steps"
        # lattice commensuration or drift can exceed the capacity slack at
        # some xi; grow like Simulation.run (fresh compile per retry), only
        # the capacities the overflow mask names
        flags = int(state.nbr_overflow)
        melted = np.asarray(state.pos)
        config = integrator.grow_config(config, flags=flags)
        if (flags == integrator.OVF_CLASS and grow < 2
                and config.band_spec is not None):
            # Pure occupancy-class overflow: the density pattern RELAXED
            # away from the histogram the classes were sized on (the
            # lattice melts within ~50 steps, measured in
            # tools/diag_classes.py).  Re-measure from the relaxed
            # positions and CONTINUE from them — rewinding to the lattice
            # would just melt past the new classes again.  After 2 tries
            # grow_config's single-class fallback stands.
            import dataclasses

            from pse_tpu.ops import banded_nearfield as bdn

            bs = config.band_spec
            counts = bdn.measure_col_counts(bs, melted, params.L)
            config = dataclasses.replace(
                config,
                band_spec=bdn.make_band_classes(bs, n, counts),
            )
            pos = melted
        state = integrator.make_state(pos)
        run_chunk = make_chunk(config)
        print(f"# capacity overflow at xi={xi} in {phase} (mask={flags:#x}): "
              "grew spec, retrying", file=sys.stderr)
    else:
        raise RuntimeError("capacity overflow persists after growth")

    steps_per_sec = n_chunks * chunk / elapsed
    return {
        "workload": "with-forces" if has_forces else "brownian",
        "xi": xi,
        "grid": (params.Nx, params.Ny, params.Nz),
        "rcut": params.ewald_cut,
        "engine": config.engine,
        "nf_spec": config.nf_spec and (config.nf_spec.bins.n_cells, config.nf_spec.bins.cap),
        "steps_per_sec": steps_per_sec,
        "particle_steps_per_sec": steps_per_sec * n,
        "m_lanczos": int(state.m_lanczos),
    }


def tpu_correctness_check(rel_tol=2e-3):
    """Assert the production Mosaic kernels against the independent blocked
    engine ON THE REAL TPU before any timing — a kernel regression fails
    the bench, not a human reading tools/trial_banded.py output.

    Interpret-mode tests cannot certify Mosaic kernels (the negative-roll
    hazard, CLAUDE.md, was hardware-only), so the gate covers the
    config classes where hardware-only corruption has been observed or is
    plausible:

      * untilted + TILTED box (tilt is traced — same compiled program);
        uniform fill guarantees bands that wrap the z seam at the
        boundary tiles (cyclic prefold + aliased-j0 paths);
      * a W=192 window (the regrow path): its 384-wide window reads are
        the non-power-of-two roll width where dynamic negative rolls
        silently wrap on hardware (tools/diag_roll.py).  Uniform fill —
        a z-clustered "seam-heavy" fill overflows the BLOCKED reference's
        cell capacity (dropped pairs, 16% bogus disagreement, measured),
        and the boundary tiles of a uniform fill already wrap;
      * the 2-RHS fused matvec vs two single matvecs (the step's fuse2
        path) — same A stream, widened dots.

    Each config is N≈5k: compiles in minutes cold, seconds warm via the
    compilation cache.
    """
    import jax
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n, L = 5300, 40.0
    rng = np.random.default_rng(42)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    cfg_b = integrator.make_config(params, n, thermal=False, engine="banded",
                                   positions=pos)
    assert cfg_b.engine == "banded", "check config too small for banded"
    # the occupancy-class packed kernels (the production headline path)
    # must be what this gate certifies — fail loudly if the chooser ever
    # stops engaging them at gate geometry
    assert cfg_b.band_spec.classes is not None, (
        "gate config no longer exercises occupancy-class packing"
    )
    cfg_d = integrator.make_config(params, n, thermal=False, engine="blocked")

    def cross_check(name, cfg, p, f, tilt, tol=rel_tol):
        u_b, ov_b = integrator.mobility(cfg, p, f, tilt)
        u_d, ov_d = integrator.mobility(cfg_d, p, f, tilt)
        # an overflowed program dropped pairs — comparing it is meaningless
        assert not int(ov_b) and not int(ov_d), (
            f"gate config [{name}] overflowed (banded={int(ov_b):#x}, "
            f"blocked={int(ov_d):#x}) — fix the gate geometry"
        )
        err = float(jnp.max(jnp.abs(u_b - u_d)) / jnp.max(jnp.abs(u_d)))
        print(f"# tpu correctness [{name}]: banded vs blocked rel err "
              f"{err:.2e} (tol {tol:g})", file=sys.stderr)
        if not err < tol:
            raise AssertionError(
                f"banded kernels disagree with the blocked engine on TPU "
                f"[{name}]: rel err {err:.3e} > {tol:g}"
            )

    # (a) untilted + tilted: one compile, two tilt values
    cross_check("untilted", cfg_b, pos, forces, 0.0)
    cross_check("tilted", cfg_b, pos, forces, 0.3)

    # (b) regrown W=192 window (384-wide rolls)
    import dataclasses

    bs = cfg_b.band_spec
    assert bs.bins.cap >= 192, "W=192 gate config needs cap >= window"
    cfg_w = dataclasses.replace(cfg_b, band_spec=bs._replace(window=192))
    cross_check("W=192", cfg_w, pos, forces, 0.0)

    # (c) fused build+matvec with 2 RHS == two single streamed matvecs
    # (the fuse2 path): covers the in-register A application of
    # build_mv_banded against the stored-A read path on hardware;
    # identical math modulo dot tiling, so the tolerance is f32-noise level
    eng = integrator._engine(cfg_b)

    @jax.jit
    def fused_vs_single(p, fa, fb):
        box = integrator._box_of(cfg_b, 0.0)
        ctx, ovf = eng.prepare(cfg_b, p, box)
        ca = eng.f_slots_t(ctx, fa)
        cb = eng.f_slots_t(ctx, fb)
        ctx, u2 = eng.build_mv(ctx, jnp.concatenate([ca, cb], axis=0))
        ua = eng.mreal_t(ctx, ca)
        ub = eng.mreal_t(ctx, cb)
        return u2, ua, ub, ovf

    forces_b = rng.normal(size=(n, 3)).astype(np.float32)
    u2, ua, ub, ovf = fused_vs_single(
        jnp.asarray(pos), jnp.asarray(forces), jnp.asarray(forces_b)
    )
    u1 = jnp.concatenate([ua, ub], axis=0)
    err = float(jnp.max(jnp.abs(u2 - u1)) / jnp.max(jnp.abs(u1)))
    print(f"# tpu correctness [2-RHS fused]: fused vs singles rel err "
          f"{err:.2e} (tol 1e-4)", file=sys.stderr)
    if not err < 1e-4:
        raise AssertionError(
            f"fused 2-RHS matvec disagrees with two singles on TPU: "
            f"rel err {err:.3e} > 1e-4"
        )

    # (e) fused Pallas far-field contract vs the XLA einsum path — the
    # banded-vs-blocked checks above CANNOT catch a far-field kernel bug
    # (both engines share the far field), so the two contract
    # implementations are compared directly on hardware.  Both round H to
    # bf16 entering the z contraction; the residual is dot-tiling order.
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import bin_particles
    from pse_tpu.ops import column_farfield as cff

    spec_c = cfg_b.colff_spec
    assert spec_c is not None and jnp.dtype(spec_c.weight_dtype) == jnp.bfloat16
    box_c = make_box(params.L, 0.25)
    bins_c = bin_particles(jnp.asarray(pos), box_c, spec_c.bins)
    fac = cff.build_col_factors(bins_c, box_c, spec_c, params)
    gv = jnp.asarray(
        np.random.default_rng(3).normal(
            size=(3, params.Nx, params.Ny, params.Nz)
        ).astype(np.float32)
    )
    u_x = cff.contract_col(bins_c, gv, box_c, spec_c, params, fac)
    u_p = cff.contract_col_pallas(gv, spec_c, params, fac)
    err = float(jnp.max(jnp.abs(u_p - u_x)) / jnp.max(jnp.abs(u_x)))
    print(f"# tpu correctness [ff contract]: pallas vs xla rel err "
          f"{err:.2e} (tol 5e-3)", file=sys.stderr)
    if not err < 5e-3:
        raise AssertionError(
            f"Pallas far-field contract disagrees with the XLA path on "
            f"TPU: rel err {err:.3e} > 5e-3"
        )
    from pse_tpu.cellbins import vec_to_cells

    fc = vec_to_cells(bins_c, spec_c.bins, jnp.asarray(forces))
    g_x = cff.spread_col(bins_c, fc, box_c, spec_c, params, fac)
    g_p = cff.spread_col_pallas(fc, spec_c, params, fac)
    err = float(jnp.max(jnp.abs(g_p - g_x)) / jnp.max(jnp.abs(g_x)))
    print(f"# tpu correctness [ff spread]: pallas vs xla rel err "
          f"{err:.2e} (tol 5e-3)", file=sys.stderr)
    if not err < 5e-3:
        raise AssertionError(
            f"Pallas far-field spread disagrees with the XLA path on "
            f"TPU: rel err {err:.3e} > 5e-3"
        )

    # (g) END-TO-END accuracy vs the float64 direct-Ewald oracle — every
    # check above is engine-vs-engine (shared far field, shared table
    # fits); this one bounds the COMPOSED on-hardware error (bf16 A blocks
    # + bf16 ff weights + MXU matmul-DFTs) against the physics.  The
    # oracle (tests/oracles.py: exact untabulated pair functions + explicit
    # k-lattice sum, f64) is precomputed by tools/make_oracle_gate.py and
    # cached — the gate costs one small mobility call.
    import os

    opath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tests", "data", "oracle_gate.npz")
    if not os.path.exists(opath):
        print("# tpu correctness [f64 oracle]: SKIPPED — run "
              "tools/make_oracle_gate.py", file=sys.stderr)
        return
    data = np.load(opath)
    pos_o = np.asarray(data["pos"], np.float32)
    n_o = int(data["n"])
    params_o = pse.make_params(xi=float(data["xi"]), error=1e-3,
                               L=float(data["L"]))
    cfg_o = integrator.make_config(params_o, n_o, thermal=False,
                                   engine="banded", positions=pos_o)
    u_o, ov_o = integrator.mobility(cfg_o, pos_o,
                                    np.asarray(data["forces"], np.float32))
    assert not int(ov_o), "oracle gate config overflowed"
    u_ref = np.asarray(data["u_ref"])
    rel = float(np.linalg.norm(np.asarray(u_o) - u_ref)
                / np.linalg.norm(u_ref))
    print(f"# tpu correctness [f64 oracle]: composed end-to-end rel err "
          f"{rel:.2e} (tol 5e-3, engine={cfg_o.engine})", file=sys.stderr)
    if not rel < 5e-3:
        raise AssertionError(
            f"composed TPU mobility disagrees with the f64 direct-Ewald "
            f"oracle: rel err {rel:.3e} > 5e-3"
        )


def sweep_residual(xi, n=5000, phi=0.45, rel_tol=2e-3):
    """Small-N banded-vs-blocked residual at a sweep point's OWN ξ/geometry
    (the gate runs only ξ=0.5): a config-dependent kernel bug (the
    roll-hazard class) must fail the sweep point, not silently time a
    wrong program.  Returns the residual for BENCH_DETAILS.json."""
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator

    pos, L = make_positions(n, phi, seed=7)
    rng = np.random.default_rng(11)
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=xi, error=1e-3, L=L)
    cfg_b = integrator.make_config(params, n, thermal=False, engine="banded",
                                   positions=pos)
    if cfg_b.engine != "banded":
        return None                     # geometry too small to band at this ξ
    cfg_d = integrator.make_config(params, n, thermal=False, engine="blocked")
    u_b, _ = integrator.mobility(cfg_b, pos, forces)
    u_d, _ = integrator.mobility(cfg_d, pos, forces)
    err = float(jnp.max(jnp.abs(u_b - u_d)) / jnp.max(jnp.abs(u_d)))
    print(f"# sweep residual xi={xi}: banded vs blocked rel err {err:.2e}",
          file=sys.stderr)
    if not err < rel_tol:
        raise AssertionError(
            f"banded kernels disagree with blocked at xi={xi}: "
            f"rel err {err:.3e} > {rel_tol:g}"
        )
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="also sweep xi (each point is a fresh TPU compile)")
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the on-TPU kernel correctness assert")
    args = ap.parse_args()

    if not args.skip_check:
        tpu_correctness_check()

    import jax

    chip = jax.devices()[0].device_kind
    results = []
    for has_forces in (False, True):
        r = run_bench(has_forces=has_forces)
        results.append(r)
        print(f"# {r['workload']:12s} xi={r['xi']}: "
              f"{r['particle_steps_per_sec']:.3g} particle-steps/s "
              f"(m={r['m_lanczos']})", file=sys.stderr)
    if args.sweep:
        # 0.55-0.75 joined after the r4/r5 far-field + spread cuts moved
        # the balance (VERDICT r4 item 3); measured curve (2026-08-21,
        # re-relax flow so every point keeps class packing): 0.5: 7.45e6 /
        # 0.55: 4.93e6 (margin-17 window forces W=192) / 0.6: 7.26e6 /
        # 0.65: 7.34e6 / 0.7: 7.15e6 / 0.75: 7.18e6 — ξ=0.5 stays
        # optimal; the 0.6-0.75 plateau is within ~4%.
        for xi in (0.55, 0.6, 0.65, 0.7, 0.75):
            # a sweep-point failure must not lose the headline result
            try:
                rel = sweep_residual(xi)
                r = run_bench(xi=xi)
                r["rel_err"] = rel
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"# sweep xi={xi} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr)
                continue
            results.append(r)
            print(f"# {r['workload']:12s} xi={r['xi']}: "
                  f"{r['particle_steps_per_sec']:.3g} particle-steps/s",
                  file=sys.stderr)

    details = {
        # BASELINE.json's 1e7 north star names a v5p; record the chip this
        # run actually measured so cross-round comparisons stay honest
        # (all rounds so far: one v5e — a chip with ~2.4x less HBM
        # bandwidth and ~2.3x fewer FLOPs than a v5p core).
        "chip": chip,
        "north_star_chip": "v5p (BASELINE.json); bench chip above",
        "results": results,
    }
    # MERGE with the existing file: rows this run did not re-measure (xi
    # sweep points, tools/bench_nsweep N rows) and extra top-level sections
    # (step_split, nsweep) are measurement artifacts — a headline-only run
    # must not erase them.
    try:
        with open("BENCH_DETAILS.json") as f:
            prev = json.load(f)
    except (OSError, ValueError):
        prev = None
    if isinstance(prev, dict):
        def _key(r):
            return (r.get("workload"), r.get("xi"), r.get("n"))
        new_keys = {_key(r) for r in results}
        details["results"] = results + [
            r for r in prev.get("results", []) if _key(r) not in new_keys
        ]
        for k, v in prev.items():
            details.setdefault(k, v)
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=1)

    headline = results[0]
    print(
        json.dumps(
            {
                "metric": "particle-steps/sec @ N=100k phi=0.45 kT>0",
                "value": round(headline["particle_steps_per_sec"]),
                "unit": "particle-steps/s",
                "vs_baseline": round(headline["particle_steps_per_sec"] / 1e7, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
