"""Banded (z-sorted column) engine validation against the gather engine.

The banded engine (ops/banded_nearfield.py) is the round-2 TPU hot path:
same physics as the blocked engine, near-field stored as rank-band blocks.
Pallas kernels run in interpret mode on CPU (integrator._pallas_interpret).

The banded layout needs well-occupied columns (capacity >= window), so these
tests use denser systems than test_blocked.py: N ~ 1000-3000 in a ~24-box.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import pse_tpu as pse
from pse_tpu import integrator


def _setup(n, L, xi=0.5, tilt=0.0, seed=0, thermal=False, **kw):
    rng = np.random.default_rng(seed)
    params = pse.make_params(xi=xi, error=1e-3, L=L)
    box = pse.make_box(L, tilt)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    pos, _ = pse.box.wrap(box, jnp.asarray(pos), jnp.zeros((n, 3), jnp.int32))
    pos = np.asarray(pos)
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    cfg_g = integrator.make_config(params, n, thermal=thermal, engine="gather")
    cfg_b = integrator.make_config(
        params, n, thermal=thermal, engine="banded", **kw
    )
    return cfg_g, cfg_b, pos, forces


def _rel(a, b):
    return np.linalg.norm(np.asarray(a) - np.asarray(b)) / np.linalg.norm(
        np.asarray(b)
    )


def test_banded_engages_and_falls_back():
    _, cfg_b, _, _ = _setup(1080, 24.0)
    assert cfg_b.engine == "banded"
    assert cfg_b.band_spec is not None and cfg_b.ff_spec is not None
    # sparse columns: banded refuses, falls back to blocked
    _, cfg_small, _, _ = _setup(64, 24.0)
    assert cfg_small.engine == "blocked"


def test_banded_matches_blocked_float32():
    """Banding is exact: f32 banded == f32 blocked (same Chebyshev pair
    functions) to arithmetic-order noise.  The gather engine differs at
    ~1e-4 because it uses the reference's linear-interpolation table."""
    _, cfg_b, pos, forces = _setup(1080, 24.0, seed=1, block_dtype="float32")
    params = cfg_b.params
    cfg_d = integrator.make_config(params, pos.shape[0], thermal=False,
                                   engine="blocked", block_dtype="float32")
    ud, od = integrator.mobility(cfg_d, pos, forces)
    ub, ob = integrator.mobility(cfg_b, pos, forces)
    assert not bool(od) and not bool(ob)
    assert _rel(ub, ud) < 2e-5


def test_banded_matches_gather_bf16_tilted():
    tilt = 0.3
    cfg_g, cfg_b, pos, forces = _setup(1200, 24.0, tilt=tilt, seed=2)
    ug, _ = integrator.mobility(cfg_g, pos, forces, tilt_xy=tilt)
    ub, ob = integrator.mobility(cfg_b, pos, forces, tilt_xy=tilt)
    assert not bool(ob)
    assert _rel(ub, ug) < 1e-3


def test_banded_seam_band_wrap():
    """Density step across the periodic z seam: many wrapped bands with
    unequal rank offsets between neighboring columns."""
    rng = np.random.default_rng(5)
    n, L = 2400, 24.0
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    # 2/3 of particles in the top half: the z-rank <-> z map differs
    # strongly between columns AND bands cross the +/-L/2 seam
    top = rng.random(n) < 0.55
    pos[:, 2] = np.where(top, np.abs(pos[:, 2]) / 2.0 + L / 4.0,
                         pos[:, 2] / 2.0).astype(np.float32)
    pos[:, 2] -= (pos[:, 2] >= L / 2) * L
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    # gather reference with enlarged neighbor capacity: the density skew
    # overflows the blocked engine's Poisson-sized cells (expected), while
    # banded columns absorb it (their capacity covers the whole column)
    cfg_g = integrator.make_config(params, n, thermal=False, engine="gather",
                                   max_neighbors=256)
    cfg_b = integrator.make_config(params, n, thermal=False, engine="banded",
                                   block_dtype="float32")
    assert cfg_b.engine == "banded"
    ug, og = integrator.mobility(cfg_g, pos, forces)
    ub, ob = integrator.mobility(cfg_b, pos, forces)
    if bool(ob):
        # the optimistic rows=32 chooser may flag a band overflow on this
        # deliberately density-skewed box; follow the production regrow
        # (Simulation.run) — doubling as an end-to-end test of the
        # widen-window-first OVF_BAND fallback
        cfg_b = integrator.grow_config(cfg_b, flags=int(ob))
        ub, ob = integrator.mobility(cfg_b, pos, forces)
    assert not bool(ob) and not bool(og)
    # tolerance: gather's table interpolation (~1e-4); a dropped wrapped
    # band would show at ~1e-2
    assert _rel(ub, ug) < 5e-4


def test_banded_band_overflow_flags():
    """All particles in one thin z slab: every band exceeds the window."""
    rng = np.random.default_rng(6)
    n, L = 4000, 24.0
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    pos[:, 2] = (pos[:, 2] * 0.02).astype(np.float32)      # z in ~[-0.24, 0.24]
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    cfg_b = integrator.make_config(params, n, thermal=False, engine="banded")
    assert cfg_b.engine == "banded"
    _, overflow = integrator.mobility(cfg_b, pos, forces)
    assert bool(overflow)


def test_banded_kernels_match_reference_interpret():
    """The Pallas build+matvec kernels (interpret mode) agree with the
    pure-XLA reference path that CPU runs use.  One small config — interpret
    tracing costs ~2 min; the kernels' hardware behavior is exercised by
    tools/trial_banded.py on the TPU."""
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import bin_columns, vec_to_cells
    from pse_tpu.ops import banded_nearfield as bdn

    rng = np.random.default_rng(9)
    n, L = 1080, 24.0
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    cfg = integrator.make_config(params, n, thermal=False, engine="banded",
                                 block_dtype="float32")
    bs, cheb, p = cfg.band_spec, cfg.cheb, cfg.params
    box = make_box(p.L, 0.07)
    bins = bin_columns(jnp.asarray(pos), box, bs.bins)
    j0, nv, ovf, zsh = bdn.compute_windows(bins, bs, box, p.ewald_cut)
    assert not bool(ovf)
    f_cells = vec_to_cells(bins, bs.bins, jnp.asarray(forces))

    blocks, pos_cyc = bdn.build_banded_blocks(
        bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0, nv,
        zsh, interpret=True,
    )
    u_kernel = bdn.matvec_banded(
        blocks, pos_cyc, bdn.make_own_pos(bins, bs), j0, nv, zsh, bs,
        f_cells, p.self_mobility, p.L, interpret=True,
    )
    u_ref = bdn.matvec_banded_reference(
        bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0, nv,
        f_cells, p.self_mobility,
    )
    assert _rel(u_kernel, u_ref) < 2e-6


def test_banded_w64_window_interpret():
    """64-lane window geometry (tall box -> narrow band): the kernels'
    window reads/rolls/slices are exercised at W=64, where every W-offset
    lane slice is 128-misaligned.  Interpret mode; the TPU behavior is
    covered by the bench gate at xi where W=64 engages."""
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import bin_columns, vec_to_cells
    from pse_tpu.ops import banded_nearfield as bdn
    from pse_tpu.ops.chebyshev import fit_pair_functions

    rng = np.random.default_rng(12)
    n, L = 1300, (24.0, 24.0, 96.0)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    # rows=16 keeps the window need under 64 lanes for this geometry (the
    # production default of 32 rows exercises W=128 everywhere else).
    # make_band_spec's safety margin now rounds this geometry up to 128, so
    # pin W=64 directly — the kernels' W=64 read/roll/slice paths are the
    # unit under test, not the chooser (compute_windows' no-overflow assert
    # below still proves W=64 is geometrically sufficient here).
    bs = bdn.make_band_spec(n, L, params.ewald_cut, block_dtype="float32",
                            rows=16)
    assert bs is not None and bs.rows == 16, bs
    bs = bs._replace(window=64)
    cheb = fit_pair_functions(0.5, params.ewald_dr, params.ewald_cut,
                              tol=1e-6)
    pos = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32) * np.array(
        L, np.float32
    )
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    box = make_box(L, 0.05)
    bins = bin_columns(jnp.asarray(pos), box, bs.bins)
    j0, nv, ovf, zsh = bdn.compute_windows(bins, bs, box, params.ewald_cut)
    assert not bool(ovf)
    f_cells = vec_to_cells(bins, bs.bins, jnp.asarray(forces))

    blocks, pos_cyc = bdn.build_banded_blocks(
        bins, box.tilt_xy, bs, cheb, params.L, params.ewald_cut,
        params.ewald_dr, j0, nv, zsh, interpret=True,
    )
    u_kernel = bdn.matvec_banded(
        blocks, pos_cyc, bdn.make_own_pos(bins, bs), j0, nv, zsh, bs,
        f_cells, params.self_mobility, params.L, interpret=True,
    )
    u_ref = bdn.matvec_banded_reference(
        bins, box.tilt_xy, bs, cheb, params.L, params.ewald_cut,
        params.ewald_dr, j0, nv, f_cells, params.self_mobility,
    )
    assert _rel(u_kernel, u_ref) < 2e-6


def test_banded_2rhs_matvec_interpret():
    """nrhs=2 (stacked right-hand sides sharing one A stream, the fused
    M·F + first-Lanczos-matvec path) must equal two single matvecs."""
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import bin_columns, vec_to_cells
    from pse_tpu.ops import banded_nearfield as bdn

    rng = np.random.default_rng(21)
    n, L = 1080, 24.0
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    f1 = rng.normal(size=(n, 3)).astype(np.float32)
    f2 = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    cfg = integrator.make_config(params, n, thermal=False, engine="banded",
                                 block_dtype="float32")
    bs, cheb, p = cfg.band_spec, cfg.cheb, cfg.params
    box = make_box(p.L, 0.05)
    bins = bin_columns(jnp.asarray(pos), box, bs.bins)
    j0, nv, ovf, zsh = bdn.compute_windows(bins, bs, box, p.ewald_cut)
    assert not bool(ovf)
    c1 = vec_to_cells(bins, bs.bins, jnp.asarray(f1))
    c2 = vec_to_cells(bins, bs.bins, jnp.asarray(f2))

    blocks, pos_cyc = bdn.build_banded_blocks(
        bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0, nv,
        zsh, interpret=True,
    )
    own_pos = bdn.make_own_pos(bins, bs)
    u2 = bdn.matvec_banded(
        blocks, pos_cyc, own_pos, j0, nv, zsh, bs,
        jnp.concatenate([c1, c2], axis=0), p.self_mobility, p.L,
        interpret=True,
    )
    ua = bdn.matvec_banded(
        blocks, pos_cyc, own_pos, j0, nv, zsh, bs, c1, p.self_mobility,
        p.L, interpret=True,
    )
    ub = bdn.matvec_banded(
        blocks, pos_cyc, own_pos, j0, nv, zsh, bs, c2, p.self_mobility,
        p.L, interpret=True,
    )
    assert _rel(u2[0:3], ua) < 1e-6
    assert _rel(u2[3:6], ub) < 1e-6


def test_banded_build_mv_fused_interpret():
    """The fused build+matvec kernel (bdn.build_mv_banded — the step's
    first near-field matvec, which never re-reads the A stream) must
    produce the SAME A / pos_cyc as build_banded_blocks and the same u as
    matvec_banded, for nrhs=2 (the fuse2 path) — the rounded in-register
    coefficients it applies are exactly the stored ones."""
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import bin_columns, vec_to_cells
    from pse_tpu.ops import banded_nearfield as bdn

    rng = np.random.default_rng(23)
    n, L = 1080, 24.0
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    f1 = rng.normal(size=(n, 3)).astype(np.float32)
    f2 = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    cfg = integrator.make_config(params, n, thermal=False, engine="banded",
                                 block_dtype="float32")
    bs, cheb, p = cfg.band_spec, cfg.cheb, cfg.params
    box = make_box(p.L, 0.07)
    bins = bin_columns(jnp.asarray(pos), box, bs.bins)
    j0, nv, ovf, zsh = bdn.compute_windows(bins, bs, box, p.ewald_cut)
    assert not bool(ovf)
    ft = jnp.concatenate([
        vec_to_cells(bins, bs.bins, jnp.asarray(f1)),
        vec_to_cells(bins, bs.bins, jnp.asarray(f2)),
    ], axis=0)
    own_pos = bdn.make_own_pos(bins, bs)

    blocks_f, pcyc_f, u_f = bdn.build_mv_banded(
        bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0, nv,
        zsh, own_pos, ft, p.self_mobility, interpret=True,
    )
    blocks, pos_cyc = bdn.build_banded_blocks(
        bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0, nv,
        zsh, interpret=True,
    )
    u = bdn.matvec_banded(
        blocks, pos_cyc, own_pos, j0, nv, zsh, bs, ft, p.self_mobility,
        p.L, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(blocks_f), np.asarray(blocks))
    np.testing.assert_array_equal(np.asarray(pcyc_f), np.asarray(pos_cyc))
    assert _rel(u_f, u) < 1e-6


def test_banded_class_packed_interpret():
    """Occupancy-class packed kernels (spec.classes) give the same result
    as the reference path: the packed build_mv / matvec launch one kernel
    per class over need-sorted columns with the all-pad tail tiles
    dropped, which must be EXACT (those tiles hold identically-zero A)."""
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import bin_columns, vec_to_cells
    from pse_tpu.ops import banded_nearfield as bdn

    rng = np.random.default_rng(31)
    n, L = 1080, 24.0
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    cfg = integrator.make_config(params, n, thermal=False, engine="banded",
                                 block_dtype="float32")
    bs0 = cfg.band_spec
    t_cap = bs0.bins.cap // bs0.rows
    C = bs0.bins.n_cells[0] * bs0.bins.n_cells[1]
    # manual 2-class split (the chooser wants larger C): most columns one
    # tile short of the cap — exercises packing, tail-zeroing, and the
    # packed->actual permutation on a column set with varying need
    bs = bs0._replace(classes=((t_cap - 1, C - 2), (t_cap, 2)))
    cheb, p = cfg.cheb, cfg.params
    box = make_box(p.L, 0.07)
    bins = bin_columns(jnp.asarray(pos), box, bs.bins)
    j0, nv, ovf, zsh = bdn.compute_windows(bins, bs, box, p.ewald_cut)
    assert not bool(ovf)
    perm, inv, c_ovf = bdn.class_assignment(bs, nv)
    assert not bool(c_ovf)
    own_full = bdn.make_own_pos(bins, bs)
    own_pos = tuple(
        jnp.take(own_full, perm[off:off + ck], axis=0)
        for (tk, ck, off) in bdn.class_segments(bs)
    )
    f_cells = vec_to_cells(bins, bs.bins, jnp.asarray(forces))

    u_ref = bdn.matvec_banded_reference(
        bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0, nv,
        f_cells, p.self_mobility,
    )
    blocks, pos_cyc, u_bmv = bdn.build_mv_banded(
        bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0, nv,
        zsh, own_pos, f_cells, p.self_mobility, interpret=True,
        pack=(perm, inv),
    )
    assert isinstance(blocks, tuple) and len(blocks) == 2
    assert _rel(u_bmv, u_ref) < 2e-6
    u_mv = bdn.matvec_banded(
        blocks, pos_cyc, own_pos, j0, nv, zsh, bs, f_cells,
        p.self_mobility, p.L, interpret=True, pack=(perm, inv),
    )
    assert _rel(u_mv, u_ref) < 2e-6


def test_banded_class_assignment_overflow():
    """Class-capacity overflow must flag (sticky -> grow_config drops to a
    single class) when more columns need the top tile count than it holds."""
    from pse_tpu.ops import banded_nearfield as bdn
    from pse_tpu.cellbins import BinSpec

    spec = bdn.BandSpec(
        bins=BinSpec(n_cells=(4, 4, 1), cap=128), offsets=bdn.full_xy_offsets(),
        window=64, rows=32, classes=((1, 15), (4, 1)),
    )
    nv = jnp.full((16,), 100, jnp.int32)      # every column needs 4 tiles
    _, _, ovf = bdn.class_assignment(spec, nv)
    assert bool(ovf)
    nv = nv.at[1:].set(20)                    # one heavy column fits class 2
    perm, inv, ovf = bdn.class_assignment(spec, nv)
    assert not bool(ovf)
    assert int(perm[0]) == 0                  # heaviest column packs first
    assert bool((perm[inv] == jnp.arange(16)).all())
    cfg_like = integrator.grow_config(
        integrator.make_config(pse.make_params(xi=0.5, error=1e-3, L=24.0),
                               1080, thermal=False, engine="banded"),
        flags=integrator.OVF_CLASS,
    )
    assert (cfg_like.band_spec is None
            or cfg_like.band_spec.classes is None)


def test_banded_fused_forces_step_linearity():
    """The fused thermal+forces step (M·F riding the first Lanczos matvec)
    must contribute exactly U = M·F on top of the zero-forces step: same
    seed -> identical noise, so the velocity difference is the
    deterministic mobility."""
    _, cfg_b, pos, forces = _setup(1080, 24.0, seed=13, thermal=True)
    state = integrator.make_state(pos)
    _, info_f = integrator.step(cfg_b, state, jnp.asarray(forces),
                                1.0, 1e-3, 0.0)
    _, info_0 = integrator.step(cfg_b, state,
                                jnp.zeros_like(jnp.asarray(forces)),
                                1.0, 1e-3, 0.0)
    u_mob, ovf = integrator.mobility(cfg_b, pos, forces)
    assert not bool(ovf)
    du = np.asarray(info_f["velocities"]) - np.asarray(info_0["velocities"])
    assert _rel(du, np.asarray(u_mob)) < 1e-4


def test_banded_step_deterministic_and_thermal():
    cfg_g, cfg_b, pos, forces = _setup(1080, 24.0, seed=3, thermal=True)
    state = integrator.make_state(pos)
    s1, info1 = integrator.step(cfg_b, state, jnp.asarray(forces),
                                1.0, 1e-3, 0.1, new_tilt=0.01)
    s2, _ = integrator.step(cfg_b, state, jnp.asarray(forces),
                            1.0, 1e-3, 0.1, new_tilt=0.01)
    assert bool(jnp.all(s1.pos == s2.pos))
    assert not bool(s1.nbr_overflow)
    assert bool(jnp.all(jnp.isfinite(s1.pos)))
    assert int(s1.m_lanczos) >= 2


def test_banded_brownian_covariance():
    """<u u^T> -> (2T/dt) M for the banded engine's full Brownian split.

    Direct covariance evidence for the banded thermal path (the analog of
    the blocked-engine test VERDICT round 1 asked for)."""
    rng = np.random.default_rng(7)
    n, L = 1080, 24.0
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    cfg = integrator.make_config(params, n, thermal=True, seed=11,
                                 engine="banded")
    assert cfg.engine == "banded"
    T, dt = 1.0, 1.0
    n_samples = 24
    # variance of the projected displacement along random fixed vectors
    # equals (2T/dt) v^T M v; estimate with a handful of probes
    probes = rng.normal(size=(3, n, 3)).astype(np.float32)
    probes /= np.linalg.norm(probes, axis=(1, 2), keepdims=True)
    acc = np.zeros(3)
    for s in range(n_samples):
        u, m_used, ov = integrator.brownian_displacement(
            cfg, pos, 0.0, s, 8, T, dt
        )
        assert not bool(ov)
        u = np.asarray(u)
        acc += np.einsum("pij,ij->p", probes, u) ** 2
    var = acc / n_samples

    expect = np.zeros(3)
    for pidx in range(3):
        mv, _ = integrator.mobility(cfg, pos, probes[pidx])
        expect[pidx] = 2.0 * T / dt * float(np.einsum("ij,ij->", probes[pidx], mv))
    # MC error ~ sqrt(2/n_samples) ~ 29%
    assert np.all(np.abs(var - expect) < 0.75 * np.abs(expect))
