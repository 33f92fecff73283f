"""3-D real FFTs as MXU matmul contractions (DFT-by-matmul).

XLA's TPU FFT lowering runs the 96³×3 rfft+irfft pair of the PSE step in
~13 ms — ~40× off the HBM streaming bound for the ~20 MB of grid data it
touches.  The grids here are small (Nx,Ny,Nz ≤ a few hundred, products of
2/3/5 — Stokes.cc:147-199 semantics live in params.py), so a dense DFT
matrix per axis is tiny (N² ≤ ~200 KB) and the whole transform maps onto
the MXU as three batched matmuls per direction:

    forward:  real z-axis r2c (N → N/2+1), then full c2c along y and x
    inverse:  c2c along x and y, then c2r z-axis back to real

Total matmul work at 96³×3 both directions is ~12 GFLOP — sub-millisecond
on the MXU even at float32 (HIGHEST) precision, leaving the pass traffic
(~0.3 GB) as the cost.  DFT matrices are built on the host in float64 at
trace time (shapes are static) and baked in as f32 constants; a matmul DFT
at f32 carries ~N·eps ≈ 1e-5 relative error, well under the method's
`error` floor.

The interface mirrors the jnp.fft calls it replaces in integrator.step
(rfftn/irfftn over axes (1,2,3)); the integrator selects this path on TPU
and keeps jnp.fft elsewhere (CPU FFTs are fine, and the suite's oracles
then exercise an independent implementation).

Reference semantics: the 3×cufftExecC2C FORWARD/INVERSE pairs of
Brownian.cu:844-869 (the reference transforms full complex grids; the
half-spectrum optimization is ours, matching the existing rfft pipeline).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _r2c_mats(n: int):
    """(n, n//2+1) cos/-sin matrices for the real→half-complex axis."""
    k = np.arange(n // 2 + 1)
    t = -2.0 * np.pi * np.outer(np.arange(n), k) / n
    return np.cos(t).astype(np.float32), np.sin(t).astype(np.float32)


@lru_cache(maxsize=None)
def _c2r_mats(n: int):
    """(n//2+1, n) inverse matrices folding Hermitian symmetry + 1/n.

    x_n = Σ_k w_k/n · [Re X_k cos(2πkn/n) − Im X_k sin(2πkn/n)],
    w_k = 1 at k=0 and the Nyquist plane (even n), else 2.
    """
    nh = n // 2 + 1
    k = np.arange(nh)
    w = np.full(nh, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    t = 2.0 * np.pi * np.outer(k, np.arange(n)) / n
    return (
        ((w[:, None] / n) * np.cos(t)).astype(np.float32),
        (-(w[:, None] / n) * np.sin(t)).astype(np.float32),
    )


@lru_cache(maxsize=None)
def _c2c_mats(n: int, inverse: bool):
    """(n, n) complex DFT matrix as (cos, sin) parts; inverse folds 1/n."""
    sign = 1.0 if inverse else -1.0
    t = sign * 2.0 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    scale = (1.0 / n) if inverse else 1.0
    return (
        (scale * np.cos(t)).astype(np.float32),
        (scale * np.sin(t)).astype(np.float32),
    )


def _cmul_axis(re, im, spec, eq):
    """Complex contraction (re + i·im) along one axis with the (cre, cim)
    matrix pair ``spec`` using einsum equation ``eq`` (4 real matmuls)."""
    cre, cim = spec
    out_re = (
        jnp.einsum(eq, re, cre, precision=_HI)
        - jnp.einsum(eq, im, cim, precision=_HI)
    )
    out_im = (
        jnp.einsum(eq, re, cim, precision=_HI)
        + jnp.einsum(eq, im, cre, precision=_HI)
    )
    return out_re, out_im


def rfft3_mxu(grid: jax.Array) -> jax.Array:
    """rfftn over the last three axes of a real (..., Nx, Ny, Nz) array.

    Matches jnp.fft.rfftn(grid, axes=(-3, -2, -1)) to ~1e-5 relative.
    """
    nx, ny, nz = grid.shape[-3:]
    zre, zim = _r2c_mats(nz)
    re = jnp.einsum("...xyn,nk->...xyk", grid, zre, precision=_HI)
    im = jnp.einsum("...xyn,nk->...xyk", grid, zim, precision=_HI)
    re, im = _cmul_axis(re, im, _c2c_mats(ny, False), "...xnk,ny->...xyk")
    # einsum output must keep axis order (x, y, k): contract x, emit at front
    re, im = _cmul_axis(re, im, _c2c_mats(nx, False), "...nyk,nx->...xyk")
    return jax.lax.complex(re, im)


def irfft3_mxu(ghat: jax.Array, s: tuple) -> jax.Array:
    """irfftn over the last three axes of a (..., Nx, Ny, Nz//2+1) complex
    array back to a real (..., *s) grid.

    Matches jnp.fft.irfftn(ghat, s=s, axes=(-3, -2, -1)).
    """
    nx, ny, nz = s
    re = jnp.real(ghat)
    im = jnp.imag(ghat)
    re, im = _cmul_axis(re, im, _c2c_mats(nx, True), "...nyk,nx->...xyk")
    re, im = _cmul_axis(re, im, _c2c_mats(ny, True), "...xnk,ny->...xyk")
    zre, zim = _c2r_mats(nz)
    # zim already carries the −sin of Re(X e^{iθ}) = ReX·cosθ − ImX·sinθ
    return (
        jnp.einsum("...xyk,kn->...xyn", re, zre, precision=_HI)
        + jnp.einsum("...xyk,kn->...xyn", im, zim, precision=_HI)
    )
