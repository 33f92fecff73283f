"""Float64 direct Ewald-sum oracle for the RPY mobility (numpy, host).

Independent of the JAX pipeline: explicit nearest/next-image real-space pair
sums with exact (untabulated) pair functions, and an explicit reciprocal-
lattice wave sum with the full Gaussian screen e^{-k²/4ξ²} (no grid, no
spreading — the quadrature the FFT pipeline approximates).  Supports the
xy-tilted box via its lattice/reciprocal vectors.
"""

import numpy as np

from pse_tpu import tables


def lattice_vectors(L, tilt_xy=0.0):
    a1 = np.array([L[0], 0.0, 0.0])
    a2 = np.array([tilt_xy * L[1], L[1], 0.0])
    a3 = np.array([0.0, 0.0, L[2]])
    return a1, a2, a3


def reciprocal_vectors(L, tilt_xy=0.0):
    # Matches gridk (Helper.cu:305-311, corrected π): k = i b1 + j b2 + k b3
    b1 = 2 * np.pi * np.array([1.0 / L[0], -tilt_xy / L[0], 0.0])
    b2 = 2 * np.pi * np.array([0.0, 1.0 / L[1], 0.0])
    b3 = 2 * np.pi * np.array([0.0, 0.0, 1.0 / L[2]])
    return b1, b2, b3


def direct_ewald_velocity(pos, forces, L, xi, tilt_xy=0.0, a=1.0, kcut_sigmas=30.0):
    """U = M·F by direct Ewald summation in float64."""
    pos = np.asarray(pos, np.float64)
    F = np.asarray(forces, np.float64)
    n = pos.shape[0]
    L = np.asarray(L, np.float64)
    vol = L[0] * L[1] * L[2]

    U = tables.self_mobility(xi, a) * F.copy()

    # --- real space: pairs over image shifts in {-1,0,1}³ ------------------
    a1, a2, a3 = lattice_vectors(L, tilt_xy)
    for si in (-1, 0, 1):
        for sj in (-1, 0, 1):
            for sk in (-1, 0, 1):
                shift = si * a1 + sj * a2 + sk * a3
                rij = pos[:, None, :] - pos[None, :, :] + shift  # (N,N,3)
                d = np.linalg.norm(rij, axis=-1)
                mask = d > 1e-12
                d_safe = np.where(mask, d, 1.0)
                uf1, uf2 = tables.real_space_pair_functions(d_safe, xi, a)
                uf1 = np.where(mask, uf1, 0.0)
                uf2 = np.where(mask, uf2, 0.0)
                rhat = rij / d_safe[..., None]
                rdotf = np.einsum("ijx,jx->ij", rhat, F)
                U += np.einsum("ij,jx->ix", uf1, F)
                U += np.einsum("ij,ij,ijx->ix", uf2 - uf1, rdotf, rhat)

    # --- wave space: explicit k-lattice sum --------------------------------
    b1, b2, b3 = reciprocal_vectors(L, tilt_xy)
    kcut = 2.0 * xi * np.sqrt(kcut_sigmas)
    bmin = min(np.linalg.norm(b) for b in (b1, b2, b3))
    nmax = int(np.ceil(kcut / bmin)) + 1
    rng = np.arange(-nmax, nmax + 1)
    I, J, K = np.meshgrid(rng, rng, rng, indexing="ij")
    kvecs = (
        I[..., None] * b1 + J[..., None] * b2 + K[..., None] * b3
    ).reshape(-1, 3)
    k2 = np.einsum("kx,kx->k", kvecs, kvecs)
    sel = (k2 > 1e-12) & (k2 < kcut * kcut)
    kvecs, k2 = kvecs[sel], k2[sel]
    kmag = np.sqrt(k2)

    xisq = xi * xi
    W = 6 * np.pi * (1 + k2 / (4 * xisq)) * np.exp(-k2 / (4 * xisq)) / k2
    sinc = np.sin(kmag * a) / (kmag * a)
    amp = W * sinc * sinc / vol

    phase = np.exp(-1j * kvecs @ pos.T)              # (Nk, N): e^{-ik·x_j}
    S = phase @ F                                     # (Nk, 3)
    khat = kvecs / kmag[:, None]
    S_perp = S - khat * np.einsum("kx,kx->k", khat, S)[:, None]
    contrib = amp[:, None] * S_perp                   # (Nk, 3)
    U += np.real(np.conj(phase).T @ contrib)          # e^{+ik·x_i}
    return U
