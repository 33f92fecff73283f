"""Separable-factor NUFFT spread/contract: one MXU matmul per cell.

Second-generation TPU far field, superseding the stored-W einsum of
ops/blocked_farfield.py on the hot path.  The stored-W formulation has two
measured problems at bench scale (N=100k, 96³ grid):

  * it materializes W = (27, C, cap, s³) ≈ GBs in HBM and streams it twice
    (spread + contract) — pure bandwidth;
  * its contractions are (s³, cap) @ (cap, 3) — N=3 GEMVs whose minor dim
    pads to the 128-lane tile, wasting ~40× MXU throughput.

Both vanish by never forming W: the Gaussian factorizes per axis
(W = wxy·wz — xy is kept joint because the box tilt mixes x into y), so we
store only the 1-D/2-D factors (~200× smaller) and contract them against
the forces in ONE well-shaped batched matmul per cell over an EXTENDED
3s-node window that covers the whole reach-1 stencil:

    out[c, (comp,kz_ext), (ij_ext)] = Σ_p  X[c,p,(comp,kz)] · wxy[c,p,(ij)]

with X = f ⊗ wz.  The (3sx,3sy,3sz) extended window means every (cell,
neighbor-block) pair of the 27-offset stencil is one (m, n) entry of a
single (M3 × cap)·(cap × N3) product — K=cap contraction, M3=3·3sz,
N3=9·sx·sy ≥ 128-ish lanes.  The extended per-cell outputs are then folded
onto the grid by three axis-at-a-time overlap-adds (jnp.roll on the block
axes); contraction is the exact transpose (overlap-gather + the mirrored
matmul).

Reference semantics: gpu_stokes_Spread_kernel / gpu_stokes_Contract_kernel
(Mobility.cu:114-252, 325-477) — same Gaussian, same prefac/quadW scaling,
with the same superset-support quadrature argument as blocked_farfield.py
(every node sums all particles of the stencil cells; extra taps decay below
``error``).  Geometry (cell = node block, s ≥ P/2+1) is shared with
FfSpec — both paths bin identically, so they cross-validate to round-off.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..box import Box
from ..cellbins import CellBins
from ..params import PSEParams
from .blocked_farfield import FfSpec, _particle_node_fractions


class SepFactors(NamedTuple):
    """Per-step separable Gaussian factors, shared by spread and contract."""

    wxy: jax.Array   # (C, cap, 3sx·3sy) joint xy factor (tilt-aware)
    wz: jax.Array    # (C, cap, 3sz) z factor, mask folded


def _cell_coords(spec: FfSpec):
    import numpy as np

    ncx, ncy, ncz = spec.bins.n_cells
    bx, by, bz = np.meshgrid(
        np.arange(ncx), np.arange(ncy), np.arange(ncz), indexing="ij"
    )
    return tuple(
        jnp.asarray(b.reshape(-1), jnp.int32) for b in (bx, by, bz)
    )


def build_factors(
    bins: CellBins, box: Box, spec: FfSpec, params: PSEParams
) -> SepFactors:
    """Extended-window Gaussian factors for every (cell, particle).

    The extended node axis of cell (bx, by, bz) covers the 3s nodes of
    blocks b-1, b, b+1 per axis: node_x = (bx-1)·sx + i_ext, i_ext ∈ [0,3sx)
    — minimum-image reduced, so periodic wrap needs no special casing.
    """
    sx, sy, sz = spec.s
    Nx, Ny, Nz = params.Nx, params.Ny, params.Nz
    L = params.L
    expfac = params.spread_expfac
    bx, by, bz = _cell_coords(spec)
    pfx, pfy, pfz = _particle_node_fractions(bins, box, params)

    def ext_frac_delta(b, s, pf, N):
        node = (b[:, None] - 1) * s + jnp.arange(3 * s, dtype=jnp.int32)
        fd = node[:, None, :].astype(pf.dtype) / N - (pf / N)[:, :, None]
        return fd - jnp.round(fd)                     # (C, cap, 3s)

    fdx = ext_frac_delta(bx, sx, pfx, Nx)
    fdy = ext_frac_delta(by, sy, pfy, Ny)
    fdz = ext_frac_delta(bz, sz, pfz, Nz)

    dyu = L[1] * fdy                                  # (C, cap, 3sy)
    dz = L[2] * fdz
    # Cartesian Δx mixes the x and y fractional separations under tilt —
    # the same formula as blocked_farfield._offset_weights.
    dx = (L[0] * fdx)[:, :, :, None] + box.tilt_xy * dyu[:, :, None, :]
    wxy = jnp.exp(-expfac * (dx * dx + (dyu * dyu)[:, :, None, :]))
    wz = jnp.exp(-expfac * dz * dz) * bins.mask[:, :, None]

    C = spec.bins.n_cells_total
    return SepFactors(
        wxy=wxy.reshape(C, spec.bins.cap, 9 * sx * sy),
        wz=wz,
    )


def _matmul_dtype(spec: FfSpec):
    if spec.full_precision:
        return jnp.float32, jax.lax.Precision.HIGHEST
    return jnp.dtype(spec.weight_dtype), None


def spread_sep(
    bins: CellBins,
    f_cells: jax.Array,          # (3, C, cap) — padded slots zero
    box: Box,
    spec: FfSpec,
    params: PSEParams,
    factors: SepFactors,
) -> jax.Array:
    """Force-moment grid (3, Nx, Ny, Nz): one matmul/cell + overlap-add."""
    sx, sy, sz = spec.s
    ncx, ncy, ncz = spec.bins.n_cells
    C = spec.bins.n_cells_total
    cap = spec.bins.cap
    dtype, precision = _matmul_dtype(spec)

    X = (
        f_cells.transpose(1, 2, 0)[:, :, :, None] * factors.wz[:, :, None, :]
    ).reshape(C, cap, 3 * 3 * sz)
    out = jnp.einsum(
        "cpm,cpn->cmn", X.astype(dtype), factors.wxy.astype(dtype),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                # (C, 3·3sz, 9·sx·sy)
    out = out * jnp.float32(params.spread_prefac)

    # (bx, by, bz, comp, oz, z, ox, x, oy, y) → overlap-add one axis at a
    # time: the (o-1)-offset sub-block of cell b lands on grid block b+o-1,
    # i.e. g[b] = Σ_o roll(out_o, o-1)[b].
    out = out.reshape(ncx, ncy, ncz, 3, 3, sz, 3, sx, 3, sy)

    def fold(a, o_axis, cell_axis):
        parts = [jax.lax.index_in_dim(a, o, axis=o_axis, keepdims=False)
                 for o in range(3)]
        return sum(
            jnp.roll(p, o - 1, axis=cell_axis) for o, p in enumerate(parts)
        )

    out = fold(out, 4, 2)        # z: (ncx, ncy, ncz, 3, sz, 3, sx, 3, sy)
    out = fold(out, 5, 0)        # x: (ncx, ncy, ncz, 3, sz, sx, 3, sy)
    out = fold(out, 6, 1)        # y: (ncx, ncy, ncz, 3, sz, sx, sy)

    grid = out.transpose(3, 0, 5, 1, 6, 2, 4)        # (3, ncx, sx, ncy, sy, ncz, sz)
    return grid.reshape(3, params.Nx, params.Ny, params.Nz)


def contract_sep(
    bins: CellBins,
    grid_real: jax.Array,        # (3, Nx, Ny, Nz)
    box: Box,
    spec: FfSpec,
    params: PSEParams,
    factors: SepFactors,
) -> jax.Array:
    """Particle velocities (3, C, cap): exact transpose of spread_sep."""
    sx, sy, sz = spec.s
    ncx, ncy, ncz = spec.bins.n_cells
    C = spec.bins.n_cells_total
    cap = spec.bins.cap
    dtype, precision = _matmul_dtype(spec)

    blocks = grid_real.reshape(3, ncx, sx, ncy, sy, ncz, sz)
    blocks = blocks.transpose(1, 3, 5, 0, 6, 2, 4)   # (ncx,ncy,ncz,3,sz,sx,sy)

    def extend(a, cell_axis, new_o_axis):
        # V[b, o] = blocks[b + o - 1]  (adjoint of spread's fold)
        parts = [jnp.roll(a, 1 - o, axis=cell_axis) for o in range(3)]
        return jnp.stack(parts, axis=new_o_axis)

    v = extend(blocks, 1, 6)     # y: (ncx,ncy,ncz,3,sz,sx,3oy,sy)
    v = extend(v, 0, 5)          # x: (ncx,ncy,ncz,3,sz,3ox,sx,3oy,sy)
    v = extend(v, 2, 4)          # z: (ncx,ncy,ncz,3,3oz,sz,3ox,sx,3oy,sy)
    v = v.reshape(C, 3 * 3 * sz, 9 * sx * sy)

    Z = jnp.einsum(
        "cpn,cmn->cpm", factors.wxy.astype(dtype), v.astype(dtype),
        preferred_element_type=jnp.float32, precision=precision,
    )                                                # (C, cap, 3·3sz)
    Z = Z.reshape(C, cap, 3, 3 * sz)
    u = jnp.sum(Z * factors.wz[:, :, None, :], axis=3)   # (C, cap, 3)
    scale = jnp.float32(params.quadW * params.spread_prefac)
    return scale * u.transpose(2, 0, 1)              # (3, C, cap)
