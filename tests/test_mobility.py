"""Deterministic mobility validation (BASELINE config 2 + SURVEY §4.1-4.2).

  * direct-sum oracle: U = M·F against the float64 direct Ewald sum
  * ξ-invariance: results independent of the splitting parameter
  * SPD: the assembled mobility matrix is symmetric positive definite
  * sheared box: oracle agreement with a tilted cell
"""

import numpy as np
import pytest

import pse_tpu as pse
from pse_tpu import integrator
from pse_tpu import neighbors as nb

import oracles


def _setup(n=32, L=14.0, xi=0.5, tilt=0.0, seed=0, error=1e-3):
    rng = np.random.default_rng(seed)
    params = pse.make_params(xi=xi, error=error, L=L, max_strain=0.5)
    box = pse.make_box(L, tilt)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    import jax.numpy as jnp
    pos, _ = pse.box.wrap(box, jnp.asarray(pos), jnp.zeros((n, 3), jnp.int32))
    pos = np.asarray(pos)
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    spec = nb.make_spec(n, params.L, params.ewald_cut)
    config = integrator.StepConfig(params=params, nbr_spec=spec, thermal=False)
    return config, pos, forces


def _rel_err(u, u_ref):
    return np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)


def test_mobility_vs_direct_ewald():
    config, pos, forces = _setup()
    u, overflow = integrator.mobility(config, pos, forces)
    assert not bool(overflow)
    u_ref = oracles.direct_ewald_velocity(pos, forces, config.params.L, config.params.xi)
    assert _rel_err(np.asarray(u), u_ref) < 5e-3


def test_mobility_xi_invariance():
    us = []
    for xi in (0.35, 0.5, 0.75):
        config, pos, forces = _setup(xi=xi)
        u, overflow = integrator.mobility(config, pos, forces)
        assert not bool(overflow)
        us.append(np.asarray(u))
    assert _rel_err(us[0], us[1]) < 4e-3
    assert _rel_err(us[2], us[1]) < 4e-3


def test_mobility_vs_direct_ewald_sheared():
    tilt = 0.3
    config, pos, forces = _setup(L=16.0, tilt=tilt, seed=3)
    u, overflow = integrator.mobility(config, pos, forces, tilt_xy=tilt)
    assert not bool(overflow)
    u_ref = oracles.direct_ewald_velocity(
        pos, forces, config.params.L, config.params.xi, tilt_xy=tilt
    )
    assert _rel_err(np.asarray(u), u_ref) < 5e-3


def test_mobility_matrix_spd():
    n = 10
    config, pos, _ = _setup(n=n, L=12.0, seed=1)
    cols = []
    for j in range(n):
        for c in range(3):
            f = np.zeros((n, 3), np.float32)
            f[j, c] = 1.0
            u, _ = integrator.mobility(config, pos, f)
            cols.append(np.asarray(u).reshape(-1))
    M = np.stack(cols, axis=1)
    np.testing.assert_allclose(M, M.T, atol=2e-5)
    eig = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert eig.min() > 0, f"min eigenvalue {eig.min()}"


def test_mreal_alone_vs_direct_pair_sum():
    """Near-field only: tabulated+interpolated matvec vs exact f64 pair sum."""
    import jax.numpy as jnp
    from pse_tpu.ops import nearfield
    from pse_tpu import tables

    config, pos, forces = _setup(n=24, L=16.0, seed=2)
    p = config.params
    box = pse.make_box(p.L[0])
    nlist, spec = nb.build_neighbor_list_auto(
        jnp.asarray(pos), box, config.nbr_spec
    )
    u = nearfield.mreal_apply(
        jnp.asarray(pos), jnp.asarray(forces), nlist.idx, box,
        jnp.asarray(p.ewald_table), p.ewald_cut, p.ewald_dr, p.ewald_n,
        p.self_mobility,
    )

    # f64 oracle: nearest image only (rcut < L/2), exact functions, cutoff'd
    posd = pos.astype(np.float64)
    F = forces.astype(np.float64)
    U = tables.self_mobility(p.xi) * F.copy()
    for i in range(24):
        rij = posd[i] - posd
        rij -= p.L[0] * np.round(rij / p.L[0])
        d = np.linalg.norm(rij, axis=1)
        mask = (d >= p.ewald_dr) & (d < p.ewald_cut) & (np.arange(24) != i)
        uf1, uf2 = tables.real_space_pair_functions(np.where(mask, d, 1.0), p.xi)
        rhat = rij / np.where(mask, d, 1.0)[:, None]
        rdotf = np.einsum("jx,jx->j", rhat, F)
        U[i] += np.einsum("j,jx->x", np.where(mask, uf1, 0.0), F)
        U[i] += np.einsum("j,j,jx->x", np.where(mask, uf2 - uf1, 0.0), rdotf, rhat)

    assert _rel_err(np.asarray(u), U) < 2e-4
