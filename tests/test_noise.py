"""Stochastic-path validation (SURVEY §4.3, §4.6): SPD square roots and
covariances, plus the counter-based determinism contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pse_tpu as pse
from pse_tpu import integrator
from pse_tpu import neighbors as nb
from pse_tpu.ops import farfield, lanczos, nearfield, noise
from pse_tpu.params import gridk_arrays


def _small_system(n=16, L=12.0, xi=0.5, seed=0):
    rng = np.random.default_rng(seed)
    params = pse.make_params(xi=xi, error=1e-3, L=L)
    box = pse.make_box(L)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    spec = nb.make_spec(n, params.L, params.ewald_cut)
    config = integrator.StepConfig(params=params, nbr_spec=spec, thermal=True)
    return config, box, jnp.asarray(pos)


def _mreal_dense(config, box, pos):
    """Dense M_real matrix via repeated matvecs of the jax operator."""
    n = pos.shape[0]
    p = config.params
    nlist = nb.build_neighbor_list(pos, box, config.nbr_spec)
    coeffs = nearfield.precompute_pair_coeffs(
        pos, nlist.idx, box, jnp.asarray(p.ewald_table),
        p.ewald_cut, p.ewald_dr, p.ewald_n,
    )
    cols = []
    for j in range(n):
        for c in range(3):
            e = np.zeros((n, 3), np.float32)
            e[j, c] = 1.0
            u = nearfield.mreal_matvec(coeffs, jnp.asarray(e), p.self_mobility)
            cols.append(np.asarray(u).reshape(-1))
    return np.stack(cols, axis=1), coeffs


def test_lanczos_sqrt_matches_dense():
    config, box, pos = _small_system()
    p = config.params
    M, coeffs = _mreal_dense(config, box, pos)
    lam, Q = np.linalg.eigh(0.5 * (M + M.T))
    assert lam.min() > 0  # positively split: real part SPD on its own
    sqrtM = Q @ np.diag(np.sqrt(lam)) @ Q.T

    matvec = lambda vt: nearfield.mreal_matvec_t(coeffs, vt, p.self_mobility)
    rng = np.random.default_rng(1)
    for trial in range(3):
        psi = rng.normal(size=pos.shape).astype(np.float32)
        u_t, m_used, hit_cap = lanczos.sqrt_mreal(
            matvec, jnp.asarray(psi.T), p.error, m_start=2, m_max=60
        )
        assert not bool(hit_cap)
        u_ref = (sqrtM @ psi.reshape(-1)).reshape(pos.shape)
        rel = np.linalg.norm(np.asarray(u_t).T - u_ref) / np.linalg.norm(u_ref)
        assert rel < 5e-3, f"trial {trial}: rel={rel}, m={int(m_used)}"
        assert int(m_used) >= 3


def test_wave_noise_covariance():
    """⟨u_wave u_waveᵀ⟩ = (2T/dt)·M_wave: validates Hermitian construction,
    Nyquist handling, projection, and every scaling factor at once."""
    config, box, pos = _small_system(n=4, L=10.0, seed=2)
    p = config.params
    T, dt = 1.3, 0.7
    kvec, W = gridk_arrays(p, 0.0)
    taps = farfield.compute_taps(pos, box, p)

    # Dense M_wave via the deterministic pipeline.
    n = pos.shape[0]
    cols = []
    for j in range(n):
        for c in range(3):
            e = np.zeros((n, 3), np.float32)
            e[j, c] = 1.0
            u = farfield.wave_space_velocity(pos, jnp.asarray(e), box, p, kvec, W)
            cols.append(np.asarray(u).reshape(-1))
    Mw = np.stack(cols, axis=1)

    kvec_h, W_h = gridk_arrays(p, 0.0, half=True)

    @jax.jit
    def sample(key):
        # the production (rfft half-spectrum) noise path
        nh = noise.wave_space_noise_hat_half(key, p, kvec_h, W_h, T, dt)
        gv = jnp.fft.irfftn(nh, s=(p.Nx, p.Ny, p.Nz), axes=(1, 2, 3)).astype(
            jnp.float32
        )
        return farfield.contract(taps, gv, p)

    nsamp = 6000
    keys = jax.random.split(jax.random.PRNGKey(0), nsamp)
    us = np.asarray(jax.vmap(sample)(keys)).reshape(nsamp, -1)
    cov = us.T @ us / nsamp

    target = 2.0 * T / dt * Mw
    scale = np.abs(np.diag(target)).max()
    err = np.abs(cov - target).max() / scale
    assert err < 0.1, f"max covariance error {err}"


def test_half_spectrum_noise_is_hermitian_on_planes():
    """rfft noise: the kz=0 plane must satisfy H(-i,-j) = conj(H(i,j)) so
    irfftn yields a correctly-distributed real field.

    Exception (shared with the reference): at Nyquist rows/columns the
    wrapped wavevector does not flip sign under conjugation (k' != -k), so
    the transverse projector differs between partners and breaks exact
    symmetry there.  Those modes carry Green weight ~ `error` by the grid
    sizing, so we only require their asymmetry to be small relative to the
    global noise scale."""
    for L in (10.0, 15.0):  # grids 10 (even) and 15 (odd)
        p = pse.make_params(xi=0.5, error=1e-3, L=L)
        kvec, W = gridk_arrays(p, 0.0, half=True)
        nh = np.asarray(
            noise.wave_space_noise_hat_half(
                jax.random.PRNGKey(0), p, kvec, W, 1.0, 1e-3
            )
        )
        scale = np.abs(nh).max()
        plane = nh[:, :, :, 0]                   # (3, Nx, Ny)
        flipped = plane[:, (-np.arange(p.Nx)) % p.Nx][
            :, :, (-np.arange(p.Ny)) % p.Ny
        ]
        dev = np.abs(flipped - np.conj(plane))
        # Exact (to f32) away from Nyquist rows/columns
        mask = np.ones((p.Nx, p.Ny), bool)
        if p.Nx % 2 == 0:
            mask[p.Nx // 2, :] = False
        if p.Ny % 2 == 0:
            mask[:, p.Ny // 2] = False
        assert dev[:, mask].max() < 1e-3 * scale, f"L={L}"
        # Bounded at the suppressed-mode scale on Nyquist lines
        assert dev.max() < 0.02 * scale, f"L={L} nyquist"


def test_half_spectrum_nyquist_origin_mode_not_zeroed():
    """The (0,0,Nz/2) self-conjugate mode must carry a √2 real draw like the
    full-grid construction (Brownian.cu Nyquist branch), not the k=0 zeroing.
    Regression: the 2-D origin mask used to zero it on both hermitized
    planes."""
    p = pse.make_params(xi=0.5, error=1e-3, L=10.0)   # even grid
    assert p.Nz % 2 == 0
    kvec, W = gridk_arrays(p, 0.0, half=True)
    nzh = p.Nz // 2
    vals = []
    for s in range(8):
        nh = np.asarray(
            noise.wave_space_noise_hat_half(
                jax.random.PRNGKey(s), p, kvec, W, 1.0, 1e-3
            )
        )
        mode = nh[:, 0, 0, nzh]
        # k = (0,0,k_nyq): transverse projection kills z, keeps x/y; the
        # draw must be real (self-conjugate node).
        assert np.abs(mode.imag).max() == 0.0
        assert np.abs(mode[2]) <= 1e-6 * (np.abs(mode).max() + 1e-30)
        vals.append(mode.real[:2])
    assert np.abs(np.stack(vals)).max() > 0.0

    # k=0 stays excluded
    nh = np.asarray(
        noise.wave_space_noise_hat_half(jax.random.PRNGKey(0), p, kvec, W, 1.0, 1e-3)
    )
    assert np.abs(nh[:, 0, 0, 0]).max() == 0.0


def test_lanczos_breakdown_returns_partial_assembly():
    """Krylov breakdown before the warm-start count must still assemble from
    the partial basis (Brownian.cu:507-510 truncates m), not return zeros.
    M = c·I collapses the basis at j=0; with a high persisted warm start the
    old code exited before ever assembling."""
    c = 0.73
    n = 5
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(n, 3)).astype(np.float32)
    matvec = lambda vt: c * vt
    u, m_used, _hit = lanczos.sqrt_mreal(
        matvec, jnp.asarray(psi.T), 1e-3, m_start=10, m_max=20
    )
    np.testing.assert_allclose(
        np.asarray(u).T, np.sqrt(c) * psi, rtol=1e-5, atol=1e-6
    )


def test_lanczos_cap_hit_sets_flag_and_growth():
    """Unconverged at m_max must raise hit_cap (the step folds it into the
    sticky overflow flag -> Simulation.run regrows m_max), and grow_config
    must actually raise m_max."""
    # A stiff diagonal spectrum needs many iterations at a tight tolerance.
    n = 40
    rng = np.random.default_rng(3)
    d = jnp.asarray(
        np.geomspace(1e-2, 1.0, 3 * n).astype(np.float32).reshape(3, n)
    )
    psi = rng.normal(size=(n, 3)).astype(np.float32)
    matvec = lambda vt: d * vt
    u, m_used, hit = lanczos.sqrt_mreal(
        matvec, jnp.asarray(psi.T), 1e-9, m_start=2, m_max=4
    )
    assert bool(hit) and int(m_used) == 4
    # converges fine with room
    u2, m2, hit2 = lanczos.sqrt_mreal(
        matvec, jnp.asarray(psi.T), 1e-5, m_start=2, m_max=60
    )
    assert not bool(hit2) and int(m2) < 60
    ref = np.asarray(jnp.sqrt(d).T * psi)
    rel = np.linalg.norm(np.asarray(u2).T - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel

    import math

    import pse_tpu as pse
    from pse_tpu import integrator

    params = pse.make_params(xi=0.5, error=1e-3, L=30.0)
    cfg = integrator.make_config(params, 500, thermal=True)
    grown = integrator.grow_config(cfg)
    assert grown.m_max > cfg.m_max
    import dataclasses

    capped = dataclasses.replace(grown, m_max=100)
    assert integrator.grow_config(capped).m_max == 100


def test_brownian_displacement_covariance():
    """Full positively-split noise: ⟨uuᵀ⟩ = (2T/dt)·(M_wave + M_real)."""
    config, box, pos = _small_system(n=6, L=10.0, seed=3)
    p = config.params
    T, dt = 1.0, 1.0

    # Dense full mobility
    n = pos.shape[0]
    cols = []
    for j in range(n):
        for c in range(3):
            e = np.zeros((n, 3), np.float32)
            e[j, c] = 1.0
            u, _ = integrator.mobility(config, pos, jnp.asarray(e))
            cols.append(np.asarray(u).reshape(-1))
    M = np.stack(cols, axis=1)

    def sample(step):
        u, m_used, _ = integrator.brownian_displacement(
            config, pos, 0.0, step, 2, T, dt
        )
        return np.asarray(u).reshape(-1)

    nsamp = 4000
    us = np.stack([sample(s) for s in range(nsamp)])
    cov = us.T @ us / nsamp
    target = 2.0 * T / dt * M
    scale = np.abs(np.diag(target)).max()
    err = np.abs(cov - target).max() / scale
    assert err < 0.12, f"max covariance error {err}"


def test_determinism_contract():
    """Same (seed, step) => bitwise-identical draw, independent of history
    (Brownian.cu:117,176 semantics)."""
    config, box, pos = _small_system(n=8, L=10.0, seed=4)
    u1, m1, _ = integrator.brownian_displacement(config, pos, 0.0, 7, 2, 1.0, 0.1)
    u2, m2, _ = integrator.brownian_displacement(config, pos, 0.0, 7, 5, 1.0, 0.1)
    u3, _, _ = integrator.brownian_displacement(config, pos, 0.0, 8, 2, 1.0, 0.1)
    u1b, _, _ = integrator.brownian_displacement(config, pos, 0.0, 7, 2, 1.0, 0.1)
    # identical everything: bitwise identical
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u1b))
    # identical step: identical noise draw.  The warm start only changes how
    # many Lanczos iterations run, so results agree to the solver tolerance
    # (not bitwise) — same property as the reference's persisted m.
    scale = np.abs(np.asarray(u1)).max()
    assert np.abs(np.asarray(u1) - np.asarray(u2)).max() < 5e-3 * scale
    # different step: different noise
    assert np.abs(np.asarray(u1) - np.asarray(u3)).max() > 1e-3
