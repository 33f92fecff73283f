import numpy as np
import jax.numpy as jnp

from pse_tpu import box as boxlib


def test_min_image_orthorhombic():
    b = boxlib.make_box((10.0, 8.0, 6.0))
    dr = jnp.array([[6.0, -5.0, 3.5], [0.1, 0.2, -0.3]])
    out = np.asarray(boxlib.min_image(b, dr))
    np.testing.assert_allclose(out[0], [-4.0, 3.0, -2.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.1, 0.2, -0.3], atol=1e-6)


def test_min_image_tilted_recovers_short_displacements():
    """Short displacements (the only ones physics reads through min_image,
    pair distances < rcut < L/2) are recovered exactly after adding arbitrary
    lattice translations of the tilted cell."""
    rng = np.random.default_rng(0)
    L = np.array([17.0, 19.0, 21.0])
    tilt = 0.37
    b = boxlib.make_box(L, tilt)

    a1 = np.array([L[0], 0, 0])
    a2 = np.array([tilt * L[1], L[1], 0])
    a3 = np.array([0, 0, L[2]])
    short = rng.uniform(-1, 1, size=(256, 3)) * 2.5  # |dr| < 0.26*Lmin
    ijk = rng.integers(-2, 3, size=(256, 3))
    shifted = short + ijk[:, :1] * a1 + ijk[:, 1:2] * a2 + ijk[:, 2:3] * a3
    out = np.asarray(boxlib.min_image(b, jnp.asarray(shifted.astype(np.float32))))
    np.testing.assert_allclose(out, short, atol=5e-5)


def test_min_image_is_lattice_translate():
    rng = np.random.default_rng(3)
    L = np.array([7.0, 9.0, 11.0])
    tilt = 0.37
    b = boxlib.make_box(L, tilt)
    dr = rng.uniform(-20, 20, size=(128, 3)).astype(np.float32)
    out = np.asarray(boxlib.min_image(b, jnp.asarray(dr)))
    for n in range(dr.shape[0]):
        diff = dr[n] - out[n]
        coeff_j = diff[1] / L[1]
        coeff_k = diff[2] / L[2]
        coeff_i = (diff[0] - round(coeff_j) * tilt * L[1]) / L[0]
        for c in (coeff_i, coeff_j, coeff_k):
            assert abs(c - round(c)) < 1e-4


def test_wrap_tracks_images_and_inverts():
    rng = np.random.default_rng(1)
    L = np.array([5.0, 6.0, 7.0])
    tilt = -0.25
    b = boxlib.make_box(L, tilt)
    pos = rng.uniform(-30, 30, size=(128, 3)).astype(np.float32)
    img0 = np.zeros((128, 3), dtype=np.int32)
    wpos, img = boxlib.wrap(b, jnp.asarray(pos), jnp.asarray(img0))
    wpos, img = np.asarray(wpos), np.asarray(img)

    # wrapped positions are inside the box (fractional coords in [0,1))
    frac = np.asarray(boxlib.make_fraction(b, jnp.asarray(wpos)))
    assert (frac >= -1e-5).all() and (frac < 1.0 + 1e-5).all()

    # unwrap restores the original coordinates
    unwrapped = np.asarray(boxlib.unwrap(b, jnp.asarray(wpos), jnp.asarray(img)))
    np.testing.assert_allclose(unwrapped, pos, atol=2e-4)


def test_wrap_noop_inside_box():
    b = boxlib.make_box(10.0)
    pos = jnp.array([[1.0, -2.0, 3.0]])
    img = jnp.zeros((1, 3), jnp.int32)
    wpos, wimg = boxlib.wrap(b, pos, img)
    np.testing.assert_allclose(np.asarray(wpos), np.asarray(pos), atol=1e-6)
    assert (np.asarray(wimg) == 0).all()
