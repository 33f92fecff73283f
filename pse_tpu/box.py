"""Periodic (optionally xy-tilted / sheared) simulation box.

TPU-native replacement for HOOMD's ``BoxDim`` as used by the PSE plugin
(reference: Mobility.cu:230-237, Stokes.cu:185, Helper.cu:305-311).  Only the
features PSE needs are provided: a centered orthorhombic box with an ``xy``
tilt factor (linear shear with gradient along y, flow along x), fractional
coordinates, minimum image, and image-tracked wrapping.

All functions are pure and jit-friendly; ``Box`` is a pytree so it can be
passed through ``jax.jit`` with the tilt factor traced (it changes every step
under oscillatory shear).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Box(NamedTuple):
    """Centered triclinic box with xy tilt only.

    Attributes:
      L: (3,) box edge lengths (Lx, Ly, Lz).
      tilt_xy: scalar xy tilt factor (strain); x-shift per unit y is
        ``tilt_xy`` (HOOMD convention: shift = tilt_xy * Ly over the full box
        height).
    """

    L: jax.Array
    tilt_xy: jax.Array

    @property
    def lo(self) -> jax.Array:
        return -self.L / 2.0

    @property
    def hi(self) -> jax.Array:
        return self.L / 2.0

    @property
    def volume(self) -> jax.Array:
        return self.L[0] * self.L[1] * self.L[2]

    def with_tilt(self, tilt_xy) -> "Box":
        return Box(self.L, jnp.asarray(tilt_xy, dtype=self.L.dtype))


def make_box(L, tilt_xy=0.0, dtype=jnp.float32) -> Box:
    """Create a Box. ``L`` may be a scalar (cubic) or length-3 sequence."""
    L = jnp.asarray(L, dtype=dtype)
    if L.ndim == 0:
        L = jnp.full((3,), L, dtype=dtype)
    return Box(L, jnp.asarray(tilt_xy, dtype=dtype))


def make_fraction(box: Box, pos: jax.Array) -> jax.Array:
    """Fractional coordinates in [0,1) for in-box positions.

    Mirrors HOOMD BoxDim::makeFraction for an xy-tilted box:
      f_x = (x - lo_x - xy * y) / Lx,  f_y = (y - lo_y)/Ly,  f_z = (z - lo_z)/Lz
    """
    L = box.L
    lo = box.lo
    fx = (pos[..., 0] - lo[0] - box.tilt_xy * pos[..., 1]) / L[0]
    fy = (pos[..., 1] - lo[1]) / L[1]
    fz = (pos[..., 2] - lo[2]) / L[2]
    return jnp.stack([fx, fy, fz], axis=-1)


def min_image(box: Box, dr: jax.Array) -> jax.Array:
    """Minimum-image displacement vector(s) for an xy-tilted box.

    Mirrors HOOMD BoxDim::minImage (triclinic, with xz = yz = 0):
    wrap z, then wrap y (adjusting x by the tilt), then wrap x.
    """
    L = box.L
    x, y, z = dr[..., 0], dr[..., 1], dr[..., 2]
    img_z = jnp.round(z / L[2])
    z = z - L[2] * img_z
    img_y = jnp.round(y / L[1])
    y = y - L[1] * img_y
    x = x - box.tilt_xy * L[1] * img_y
    img_x = jnp.round(x / L[0])
    x = x - L[0] * img_x
    return jnp.stack([x, y, z], axis=-1)


def min_image_components(box: Box, dx, dy, dz):
    """Component-wise minimum image (same math as ``min_image``).

    TPU-layout-friendly: avoids materializing large (..., 3) arrays whose
    minor dimension would be tile-padded 3 -> 128 (a 42x memory blowup for
    neighbor-candidate-sized inputs).
    """
    L = box.L
    img_z = jnp.round(dz / L[2])
    dz = dz - L[2] * img_z
    img_y = jnp.round(dy / L[1])
    dy = dy - L[1] * img_y
    dx = dx - box.tilt_xy * L[1] * img_y
    img_x = jnp.round(dx / L[0])
    dx = dx - L[0] * img_x
    return dx, dy, dz


def wrap(box: Box, pos: jax.Array, images: jax.Array):
    """Wrap positions into the (possibly tilted) box, tracking image flags.

    Mirrors HOOMD BoxDim::wrap semantics (Stokes.cu:185) but handles
    arbitrarily large excursions via floor() instead of a single conditional
    shift.  Returns (wrapped_pos, updated_images).

    The x-fraction is invariant under the y-wrap (which shifts x by
    ``tilt_xy * Ly`` per image), so all shifts can be computed from the input
    position in one pass.
    """
    L = box.L
    lo = box.lo
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]

    sz = jnp.floor((z - lo[2]) / L[2]).astype(jnp.int32)
    z = z - L[2] * sz.astype(pos.dtype)

    sy = jnp.floor((y - lo[1]) / L[1]).astype(jnp.int32)
    y = y - L[1] * sy.astype(pos.dtype)
    x = x - box.tilt_xy * L[1] * sy.astype(pos.dtype)

    sx = jnp.floor((x - lo[0] - box.tilt_xy * y) / L[0]).astype(jnp.int32)
    x = x - L[0] * sx.astype(pos.dtype)

    new_pos = jnp.stack([x, y, z], axis=-1)
    new_images = images + jnp.stack([sx, sy, sz], axis=-1)
    return new_pos, new_images


def unwrap(box: Box, pos: jax.Array, images: jax.Array) -> jax.Array:
    """Reconstruct unwrapped trajectory coordinates from wrapped pos + images."""
    L = box.L
    img = images.astype(pos.dtype)
    x = pos[..., 0] + L[0] * img[..., 0] + box.tilt_xy * L[1] * img[..., 1]
    y = pos[..., 1] + L[1] * img[..., 1]
    z = pos[..., 2] + L[2] * img[..., 2]
    return jnp.stack([x, y, z], axis=-1)
