import numpy as np
import pytest

from pse_tpu import params as plib


def test_grid_candidates():
    cands = plib._grid_size_candidates()
    assert cands[0] == 8 and cands[-1] == 4096
    for c in cands:
        n = c
        for p in (2, 3, 5):
            while n % p == 0:
                n //= p
        assert n == 1
    assert plib.round_up_grid_size(62) == 64
    assert plib.round_up_grid_size(65) == 72
    with pytest.raises(ValueError):
        plib.round_up_grid_size(5000)


def test_reference_example_config():
    # examples/run.py: L=64, xi=0.5, error=1e-3 -> 64^3 grid (Stokes.cc:138-199)
    p = plib.make_params(xi=0.5, error=1e-3, L=64.0)
    assert (p.Nx, p.Ny, p.Nz) == (64, 64, 64)
    np.testing.assert_allclose(p.ewald_cut, np.sqrt(-np.log(1e-3)) / 0.5, rtol=1e-12)
    assert p.ewald_n == int(p.ewald_cut / p.ewald_dr - 1)
    assert p.ewald_table.shape == (p.ewald_n + 1, 4)
    assert 0.0 < p.eta < 1.0 + 1e-6
    assert p.gauss_P >= 1
    # gauss_m solves erfc(m / sqrt(2 lambda)) <= error
    gamma = p.max_strain
    lam = 1 + gamma ** 2 / 2 + gamma * np.sqrt(1 + gamma ** 2 / 4)
    from scipy.special import erfc

    assert erfc(p.gauss_m / np.sqrt(2 * lam)) <= p.error
    assert erfc((p.gauss_m - 0.01) / np.sqrt(2 * lam)) > p.error
    assert p.summary()  # smoke


def test_grid_total_guard():
    with pytest.raises(ValueError, match="Reduce xi"):
        plib.make_params(xi=0.5, error=1e-3, L=64.0, max_grid_total=1000)


def test_gridk_unsheared():
    import jax.numpy as jnp

    p = plib.make_params(xi=0.5, error=1e-3, L=(10.0, 12.0, 14.0))
    kvec, W = plib.gridk_arrays(p, 0.0)
    kvec, W = np.asarray(kvec), np.asarray(W)
    Nx, Ny, Nz = p.Nx, p.Ny, p.Nz
    assert kvec.shape == (Nx, Ny, Nz, 3)
    # spot check a few wavevectors
    np.testing.assert_allclose(kvec[0, 0, 0], 0.0, atol=0)
    np.testing.assert_allclose(kvec[1, 0, 0, 0], 2 * np.pi / 10.0, rtol=1e-6)
    np.testing.assert_allclose(kvec[Nx - 1, 0, 0, 0], -2 * np.pi / 10.0, rtol=1e-6)
    np.testing.assert_allclose(kvec[0, 2, 0, 1], 2 * np.pi * 2 / 12.0, rtol=1e-6)
    assert W[0, 0, 0] == 0.0
    # W formula at a sample node (correct pi, no FFT-normalization division)
    i, j, k = 3, 1, 2
    kk = kvec[i, j, k]
    k2 = (kk ** 2).sum()
    xisq = p.xi ** 2
    expected = 6 * np.pi * (1 + k2 / 4 / xisq) * np.exp(-(1 - p.eta) * k2 / 4 / xisq) / k2
    np.testing.assert_allclose(W[i, j, k], expected, rtol=1e-5)


def test_gridk_sheared():
    p = plib.make_params(xi=0.5, error=1e-3, L=16.0)
    tilt = 0.3
    kvec, _ = plib.gridk_arrays(p, tilt)
    kvec = np.asarray(kvec)
    # Sheared k_y = 2pi (j' - xy * i' * Ly/Lx) / Ly (Helper.cu:308-311)
    i, j, k = 2, 3, 0
    L = 16.0
    wi, wj = i, j  # below N/2 so unwrapped
    expected_ky = 2 * np.pi * (wj - tilt * wi * (L / L)) / L
    np.testing.assert_allclose(kvec[i, j, k, 1], expected_ky, rtol=1e-5)
    # k_x unchanged by tilt
    np.testing.assert_allclose(kvec[i, j, k, 0], 2 * np.pi * wi / L, rtol=1e-5)


def test_hermitian_maps():
    for dims in [(8, 8, 8), (6, 4, 8), (5, 4, 3)]:
        Nx, Ny, Nz = dims
        conj_idx, gen, self_conj, origin = plib.hermitian_noise_maps(Nx, Ny, Nz)
        flat_conj = conj_idx.reshape(-1)
        # conjugation is an involution
        np.testing.assert_array_equal(flat_conj[flat_conj], np.arange(Nx * Ny * Nz))
        # each non-self-conjugate, non-origin node: exactly one of (node, conj) is generator
        gen_f = gen.reshape(-1)
        sc_f = self_conj.reshape(-1)
        or_f = origin.reshape(-1)
        pair_nodes = ~sc_f & ~or_f
        assert (gen_f[pair_nodes] ^ gen_f[flat_conj[pair_nodes]]).all()
        # self-conjugate nodes are generators (they carry their own draw)
        assert gen_f[sc_f].all()
        assert not gen_f[or_f].any()
