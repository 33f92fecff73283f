"""Oracle tests for the real-space Ewald-split RPY pair functions.

Physics invariants used as oracles (the reference ships no tests, SURVEY.md §4):
  * ξ→0 limit: the screened functions reduce to the plain RPY tensor in all
    three branches (far / touching / overlapping).
  * large-r screening: functions decay to ~0 well inside the Ewald cutoff.
  * continuity across the r=2a branch boundaries.
  * self-mobility ξ→0 limit is 1/a.
"""

import numpy as np

from pse_tpu import tables

# For ξ→0 the real-space (screened) functions approach the plain RPY tensor
# minus the k→0 lobe of the wave-space integral, which is the r-independent
# isotropic constant 3ξ/√π + O(ξ²·(ξr)²) (it cancels identically against the
# wave-space sum).  The same constant appears in the self mobility:
# m_self(ξ) = 1/a − 3ξ/√π + O(ξ²).
def _offset(xi):
    return 3.0 * xi / np.sqrt(np.pi)


def test_xi_to_zero_reduces_to_rpy_far():
    r = np.linspace(2.2, 6.0, 50)
    xi = 0.01
    uf1, uf2 = tables.real_space_pair_functions(r, xi)
    ref1, ref2 = tables.rpy_pair_functions(r)
    np.testing.assert_allclose(uf1, ref1 - _offset(xi), rtol=0, atol=5e-5)
    np.testing.assert_allclose(uf2, ref2 - _offset(xi), rtol=0, atol=5e-5)


def test_xi_to_zero_reduces_to_rpy_overlap():
    r = np.linspace(0.05, 1.95, 50)
    xi = 0.01
    uf1, uf2 = tables.real_space_pair_functions(r, xi)
    ref1, ref2 = tables.rpy_pair_functions(r)
    np.testing.assert_allclose(uf1, ref1 - _offset(xi), rtol=0, atol=5e-5)
    np.testing.assert_allclose(uf2, ref2 - _offset(xi), rtol=0, atol=5e-5)


def test_xi_to_zero_touching_branch():
    xi = 0.01
    uf1, uf2 = tables.real_space_pair_functions(np.array([2.0]), xi)
    ref1, ref2 = tables.rpy_pair_functions(np.array([2.0]))
    np.testing.assert_allclose(uf1, ref1 - _offset(xi), atol=5e-5)
    np.testing.assert_allclose(uf2, ref2 - _offset(xi), atol=5e-5)


def test_branch_continuity_at_touching():
    for xi in (0.25, 0.5, 1.0):
        eps = 1e-7
        below = tables.real_space_pair_functions(np.array([2.0 - eps]), xi)
        at = tables.real_space_pair_functions(np.array([2.0]), xi)
        above = tables.real_space_pair_functions(np.array([2.0 + eps]), xi)
        for lo, mid, hi in zip(below, at, above):
            assert abs(lo[0] - mid[0]) < 1e-5
            assert abs(hi[0] - mid[0]) < 1e-5


def test_screening_decay():
    xi = 0.5
    rcut = np.sqrt(-np.log(1e-3)) / xi
    uf1, uf2 = tables.real_space_pair_functions(np.array([rcut]), xi)
    # At the cutoff the screened interaction is at the error-tolerance scale.
    assert abs(uf1[0]) < 5e-3
    assert abs(uf2[0]) < 5e-3
    # Far beyond the cutoff it is essentially zero.
    uf1, uf2 = tables.real_space_pair_functions(np.array([3.0 * rcut]), xi)
    assert abs(uf1[0]) < 1e-12
    assert abs(uf2[0]) < 1e-12


def test_self_mobility_limits():
    # m_self(ξ) = 1/a − 3ξ/√π + O(ξ²)
    xi = 1e-3
    assert abs(tables.self_mobility(xi) - (1.0 - _offset(xi))) < 1e-5
    # Monotone decreasing in xi, positive.
    vals = [tables.self_mobility(x) for x in (0.1, 0.3, 0.5, 1.0)]
    assert all(v > 0 for v in vals)
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_table_layout_and_interpolation():
    xi, err = 0.5, 1e-3
    rcut = np.sqrt(-np.log(err)) / xi
    table, ewald_n = tables.build_ewald_table(xi, rcut)
    assert table.shape == (ewald_n + 1, 4)
    # Packed forward values equal the next row's base values.
    np.testing.assert_array_equal(table[:-1, 2], table[1:, 0])
    np.testing.assert_array_equal(table[:-1, 3], table[1:, 1])

    # Reference interpolation scheme (Mobility.cu:661-670) reproduces the
    # exact float64 function to ~table resolution at random distances.
    rng = np.random.default_rng(2)
    dr = 1e-3
    dist = rng.uniform(0.1, rcut * 0.999, size=200)
    r_ind = np.floor(ewald_n * (dist - dr) / (rcut - dr)).astype(int)
    fac = dist / dr - r_ind - 1.0
    row = table[r_ind]
    imrr = row[:, 0] + (row[:, 2] - row[:, 0]) * fac
    rr = row[:, 1] + (row[:, 3] - row[:, 1]) * fac
    exact1, exact2 = tables.real_space_pair_functions(dist, xi)
    np.testing.assert_allclose(imrr, exact1, atol=5e-5)
    np.testing.assert_allclose(rr, exact2, atol=5e-5)
