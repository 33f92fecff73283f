"""MXU matmul-DFT vs jnp.fft — the TPU step's FFT path (ops/mxu_fft.py).

The integrator uses rfft3_mxu/irfft3_mxu on TPU and jnp.fft off-TPU, so the
CPU suite must pin the two implementations against each other (they never
co-run on one backend otherwise).  Covers the 2^a·3^b·5^c grid sizes params
chooses (Stokes.cc:147-199 semantics) including odd z (irfft length
recovery) and non-cubic boxes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pse_tpu.ops.mxu_fft import irfft3_mxu, rfft3_mxu

DIMS = [(96, 96, 96), (32, 48, 60), (8, 9, 10), (12, 12, 15), (25, 27, 16)]


@pytest.mark.parametrize("dims", DIMS)
def test_rfft3_matches_jnp(dims):
    rng = np.random.default_rng(hash(dims) % 2**31)
    g = jnp.asarray(rng.normal(size=(3,) + dims).astype(np.float32))
    ref = jnp.fft.rfftn(g, axes=(1, 2, 3))
    got = rfft3_mxu(g)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5 * scale
    )


@pytest.mark.parametrize("dims", DIMS)
def test_irfft3_matches_jnp(dims):
    rng = np.random.default_rng(hash(dims) % 2**31 + 1)
    nh = dims[2] // 2 + 1
    gh = jnp.asarray(
        (rng.normal(size=(3,) + dims[:2] + (nh,))
         + 1j * rng.normal(size=(3,) + dims[:2] + (nh,))).astype(np.complex64)
    )
    ref = jnp.fft.irfftn(gh, s=dims, axes=(1, 2, 3))
    got = irfft3_mxu(gh, dims)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5 * scale
    )


def test_roundtrip_identity():
    rng = np.random.default_rng(7)
    dims = (24, 30, 32)
    g = jnp.asarray(rng.normal(size=(3,) + dims).astype(np.float32))
    back = irfft3_mxu(rfft3_mxu(g), dims)
    np.testing.assert_allclose(np.asarray(back), np.asarray(g), atol=1e-5)


def test_jit_and_grad_safe():
    """The transforms must trace cleanly inside jit (used in the step)."""
    dims = (12, 12, 12)
    g = jnp.ones((3,) + dims, jnp.float32)

    @jax.jit
    def f(g):
        return jnp.sum(jnp.abs(rfft3_mxu(g)) ** 2)

    assert np.isfinite(float(f(g)))
