"""Cell-blocked NUFFT spread/contract: gather/scatter-free Gaussian spreading.

TPU re-design of gpu_stokes_Spread/Contract (Mobility.cu:114-477).  The CUDA
version scatter-adds P³ Gaussian taps per particle with atomics; XLA scatter
serializes on TPU.  Here the FFT grid is partitioned into node blocks of
(sx, sy, sz) nodes aligned with a particle cell grid of the same geometry,
and spreading is formulated as a GATHER over a regular stencil:

    grid[block b] = Σ_{offset o} W(b, o) · F[cell b+o]

where W(b, o) ∈ R^{s³ × cap} holds the Gaussian weights between the block's
nodes and the (padded) particles of the neighboring cell — a batched dense
matmul.  Contraction is the transpose sweep with the same weights.  No
scatters, no gathers; the weight build is separable (exp count ∝ s²·cap per
block, not s³·cap).

Because every node sums over ALL particles within the stencil reach (≥ the
P-point support half-width), the effective support is a superset of the
reference's P³ window — the extra far taps carry exp(-expfac r²) ≲ error and
only move the quadrature closer to the untruncated Gaussian.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..box import Box
from ..cellbins import BinSpec, CellBins, full_offsets, roll_cells
from ..params import PSEParams


class FfSpec(NamedTuple):
    """Static blocked-NUFFT configuration."""

    bins: BinSpec           # particle cells == node blocks
    s: tuple                # (sx, sy, sz) nodes per block per axis
    offsets: tuple          # full stencil (reach 1)


def _pick_block(n_grid: int, p: int) -> int:
    """Smallest divisor s of the grid dim with s >= P/2 + 1 (so a reach-1
    stencil covers the Gaussian support)."""
    need = p // 2 + 1
    for s in range(need, n_grid + 1):
        if n_grid % s == 0:
            return s
    return n_grid


def make_ff_spec(params: PSEParams, n_particles: int) -> FfSpec | None:
    """Returns None when the grid is too small to block (fallback: taps)."""
    s = tuple(_pick_block(ng, params.gauss_P) for ng in (params.Nx, params.Ny, params.Nz))
    nc = (params.Nx // s[0], params.Ny // s[1], params.Nz // s[2])
    if min(nc) < 3:
        return None
    mu = n_particles / (nc[0] * nc[1] * nc[2])
    cap = max(8, int(math.ceil((mu + 5.0 * math.sqrt(mu) + 4.0) / 8.0)) * 8)
    cap = min(cap, max(8, int(math.ceil(n_particles / 8.0)) * 8))
    return FfSpec(bins=BinSpec(n_cells=nc, cap=cap), s=s, offsets=full_offsets(1))


def _block_coords(spec: FfSpec):
    """Static (C,) arrays of block coordinates (z-fastest flat order)."""
    ncx, ncy, ncz = spec.bins.n_cells
    bx, by, bz = np.meshgrid(
        np.arange(ncx), np.arange(ncy), np.arange(ncz), indexing="ij"
    )
    return (
        jnp.asarray(bx.reshape(-1), jnp.int32),
        jnp.asarray(by.reshape(-1), jnp.int32),
        jnp.asarray(bz.reshape(-1), jnp.int32),
    )


def _particle_node_fractions(bins: CellBins, box: Box, params: PSEParams):
    """Node-space particle coordinates pf = frac * N_grid, per axis (C, cap)."""
    L = box.L
    lo = box.lo
    fx = (bins.px - lo[0] - box.tilt_xy * bins.py) / L[0]
    fy = (bins.py - lo[1]) / L[1]
    fz = (bins.pz - lo[2]) / L[2]
    fx = fx - jnp.floor(fx)
    fy = fy - jnp.floor(fy)
    fz = fz - jnp.floor(fz)
    return fx * params.Nx, fy * params.Ny, fz * params.Nz


def _offset_weights(
    spec: FfSpec,
    params: PSEParams,
    box: Box,
    pf,                      # (pfx, pfy, pfz) each (C, cap)
    mask_r,                  # (C, cap) — rolled mask
    o,
    bcoords,
):
    """W (C, s³, cap) for one stencil offset (weights already mask-folded)."""
    sx, sy, sz = spec.s
    Nx, Ny, Nz = params.Nx, params.Ny, params.Nz
    L = params.L
    expfac = params.spread_expfac
    bx, by, bz = bcoords
    pfx, pfy, pfz = pf

    node_x = (bx[:, None] * sx + jnp.arange(sx, dtype=jnp.int32)[None, :]).astype(
        pfx.dtype
    )                                                     # (C, sx)
    node_y = (by[:, None] * sy + jnp.arange(sy, dtype=jnp.int32)[None, :]).astype(
        pfx.dtype
    )
    node_z = (bz[:, None] * sz + jnp.arange(sz, dtype=jnp.int32)[None, :]).astype(
        pfx.dtype
    )

    def red(fd):
        return fd - jnp.round(fd)

    fdx = red((node_x[:, :, None] - pfx[:, None, :]) / Nx)   # (C, sx, cap)
    fdy = red((node_y[:, :, None] - pfy[:, None, :]) / Ny)   # (C, sy, cap)
    fdz = red((node_z[:, :, None] - pfz[:, None, :]) / Nz)   # (C, sz, cap)

    dyu = L[1] * fdy
    dz = L[2] * fdz
    dx = (L[0] * fdx)[:, :, None, :] + box.tilt_xy * dyu[:, None, :, :]  # (C,sx,sy,cap)

    w_xy = jnp.exp(-expfac * (dx * dx + (dyu * dyu)[:, None, :, :]))
    w_z = jnp.exp(-expfac * dz * dz) * mask_r[:, None, :]                # (C,sz,cap)
    W = w_xy[:, :, :, None, :] * w_z[:, None, None, :, :]
    return W.reshape(W.shape[0], sx * sy * sz, spec.bins.cap)


def _grid_to_blocks(grid: jax.Array, spec: FfSpec) -> jax.Array:
    """(3, Nx, Ny, Nz) -> (C, s³, 3)."""
    ncx, ncy, ncz = spec.bins.n_cells
    sx, sy, sz = spec.s
    g = grid.reshape(3, ncx, sx, ncy, sy, ncz, sz)
    g = g.transpose(1, 3, 5, 2, 4, 6, 0)
    return g.reshape(ncx * ncy * ncz, sx * sy * sz, 3)


def _blocks_to_grid(blocks: jax.Array, spec: FfSpec, params: PSEParams) -> jax.Array:
    """(C, s³, 3) -> (3, Nx, Ny, Nz)."""
    ncx, ncy, ncz = spec.bins.n_cells
    sx, sy, sz = spec.s
    g = blocks.reshape(ncx, ncy, ncz, sx, sy, sz, 3)
    g = g.transpose(6, 0, 3, 1, 4, 2, 5)
    return g.reshape(3, params.Nx, params.Ny, params.Nz)


def spread_blocked(
    bins: CellBins,
    f_cells: jax.Array,          # (3, C, cap) — padded slots zero
    box: Box,
    spec: FfSpec,
    params: PSEParams,
) -> jax.Array:
    """Force-moment grid (3, Nx, Ny, Nz) by per-node gathers (no scatter)."""
    bcoords = _block_coords(spec)
    pf = _particle_node_fractions(bins, box, params)
    c_total = spec.bins.n_cells_total
    s3 = spec.s[0] * spec.s[1] * spec.s[2]

    acc = jnp.zeros((c_total, s3, 3), f_cells.dtype)
    for o in spec.offsets:
        pfo = tuple(roll_cells(p, spec.bins, o) for p in pf)
        mo = roll_cells(bins.mask, spec.bins, o)
        W = _offset_weights(spec, params, box, pfo, mo, o, bcoords)
        fr = jnp.stack(
            [roll_cells(f_cells[c], spec.bins, o) for c in range(3)], axis=-1
        )                                                   # (C, cap, 3)
        acc = acc + jnp.einsum(
            "bnp,bpc->bnc", W, fr, preferred_element_type=jnp.float32
        ).astype(acc.dtype)

    acc = acc * jnp.asarray(params.spread_prefac, acc.dtype)
    return _blocks_to_grid(acc, spec, params)


def contract_blocked(
    bins: CellBins,
    grid_real: jax.Array,        # (3, Nx, Ny, Nz)
    box: Box,
    spec: FfSpec,
    params: PSEParams,
) -> jax.Array:
    """Particle velocities in cell layout (3, C, cap): transpose sweep."""
    bcoords = _block_coords(spec)
    pf = _particle_node_fractions(bins, box, params)
    v = _grid_to_blocks(grid_real, spec)                    # (C, s³, 3)
    c_total = spec.bins.n_cells_total
    cap = spec.bins.cap

    u = jnp.zeros((c_total, cap, 3), grid_real.dtype)
    for o in spec.offsets:
        pfo = tuple(roll_cells(p, spec.bins, o) for p in pf)
        mo = roll_cells(bins.mask, spec.bins, o)
        W = _offset_weights(spec, params, box, pfo, mo, o, bcoords)
        contrib = jnp.einsum(
            "bnp,bnc->bpc", W, v, preferred_element_type=jnp.float32
        ).astype(u.dtype)
        u = u + roll_cells(contrib, spec.bins, (-o[0], -o[1], -o[2]))

    scale = params.quadW * params.spread_prefac
    return (scale * u).transpose(2, 0, 1)                   # (3, C, cap)
