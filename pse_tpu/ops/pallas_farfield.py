"""Fused NUFFT spread/contract: Gaussian weights built in VMEM, never stored.

The blocked far field (ops/blocked_farfield.py) materializes the stencil
weights W (noff=27, C, cap, s³) in HBM — ~3.8 GB at bench scale, written at
build and read by both spread and contract.  These Pallas kernels rebuild
each (cell, offset) weight tile in VMEM right before its matmul, so the only
HBM traffic is forces/velocities in and grid blocks out (~tens of MB).

Orientation is chosen per kernel so no in-kernel transposes are needed
(Mosaic relayouts are the enemy — see ROADMAP "Mosaic lessons"):

  * spread (grid = (C, 27), offsets inner): weights W_T (s³ sublanes, cap
    lanes); neighbor-cell particle data streams in lane-major (1, 4|3, cap)
    blocks whose block index_map computes the 3-D neighbor cell; the MXU
    contracts over cap; the (3, s³, 1) accumulator flushes once per cell
    into a TRANSPOSED resident grid (3, s³, C) via an aligned lane rotate.
  * contract (grid = (C, 27), offsets inner): weights W (cap sublanes, s³
    lanes); the own cell's particle data streams once per cell as sublane
    vectors (C, 4, cap, 1); neighbor grid blocks stream lane-major
    (1, 3, s³); the MXU contracts over s³; the (3, cap, 1) accumulator
    flushes into the transposed (3, cap, C) output.

Physics identical to blocked_farfield._offset_weights (Mobility.cu:114-477
re-designed as gathers): W = exp(-expfac * (dx² + dy² + dz²)) with the
xy-tilted node-to-particle displacement, mask folded in.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..box import Box
from ..cellbins import CellBins
from ..params import PSEParams
from .blocked_farfield import FfSpec, _particle_node_fractions


def _node_index_maps(spec: FfSpec):
    """Static per-lane node coordinate offsets within a block: n -> (ix,iy,iz)."""
    sx, sy, sz = spec.s
    s3 = sx * sy * sz
    n = jax.lax.broadcasted_iota(jnp.int32, (1, s3), 1)
    ix = n // (sy * sz)
    iy = (n // sz) % sy
    iz = n % sz
    return ix, iy, iz


def _neighbor_cell(c, ox, oy, oz, nc):
    ncx, ncy, ncz = nc
    cz = jax.lax.rem(c, ncz)
    cy = jax.lax.rem(jax.lax.div(c, ncz), ncy)
    cx = jax.lax.div(c, ncy * ncz)
    nx = jax.lax.rem(cx + ox + ncx, ncx)
    ny = jax.lax.rem(cy + oy + ncy, ncy)
    nz = jax.lax.rem(cz + oz + ncz, ncz)
    return (nx * ncy + ny) * ncz + nz


def _weight_tile(
    pfx, pfy, pfz, mask,       # particle node-fraction coords; see callers
    cx, cy, cz,                # this block's cell coords (scalars)
    ox, oy, oz,                # stencil offset of the NODE block vs pf cell
    tilt,
    spec: FfSpec,
    params: PSEParams,
    node_on_lanes: bool,
):
    """exp(-expfac |r_node - r_particle|²) · mask.

    ``node_on_lanes``: nodes minor (contract result (cap, 1), used by
    contract); else particles minor (result (s³-sub, cap-lane), spread).
    pf arrays are (cap, 1)/(1, cap) matching the orientation.
    """
    sx, sy, sz = spec.s
    Nx, Ny, Nz = params.Nx, params.Ny, params.Nz
    L = params.L
    expfac = params.spread_expfac

    ix, iy, iz = _node_index_maps(spec)                    # (1, s³) lanes
    if not node_on_lanes:
        ix, iy, iz = (a.reshape(sx * sy * sz, 1) for a in (ix, iy, iz))
    nxf = ((cx + ox) * sx + ix).astype(jnp.float32)
    nyf = ((cy + oy) * sy + iy).astype(jnp.float32)
    nzf = ((cz + oz) * sz + iz).astype(jnp.float32)

    def red(fd):
        return fd - jnp.round(fd)

    fdx = red((nxf - pfx) / Nx)
    fdy = red((nyf - pfy) / Ny)
    fdz = red((nzf - pfz) / Nz)
    dyu = L[1] * fdy
    dx = L[0] * fdx + tilt * dyu
    dz = L[2] * fdz
    return jnp.exp(-expfac * (dx * dx + dyu * dyu + dz * dz)) * mask


def _spread_kernel(
    offs_ref, tilt_ref, pf_ref, f_ref, out_ref, acc_ref, *,
    spec: FfSpec, params: PSEParams, n_offsets: int,
):
    nc = spec.bins.n_cells
    cap = spec.bins.cap
    sx, sy, sz = spec.s
    s3 = sx * sy * sz

    c = pl.program_id(0)
    o_i = pl.program_id(1)

    @pl.when((o_i == 0) & (c == 0))
    def _zero_out():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(o_i == 0)
    def _zero_acc():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tilt = tilt_ref[0]
    ncx, ncy, ncz = spec.bins.n_cells
    cz = jax.lax.rem(c, ncz)
    cy = jax.lax.rem(jax.lax.div(c, ncz), ncy)
    cx = jax.lax.div(c, ncy * ncz)

    # pf/f blocks belong to cell c+o (the index_map fetched them): spreading
    # gathers particles of neighboring cells onto this block's nodes, i.e.
    # the particle cell sits at offset +o and the node block at 0 — pass the
    # node block offset as seen from the particle cell: -o... both views are
    # equivalent; we keep node block at (cx, cy, cz) and particles at c+o,
    # so the node offset relative to the pf cell is -(o) folded by using the
    # absolute node coords directly (ox=oy=oz=0 here) — the pf values are
    # absolute node fractions, not cell-relative.
    w_t = _weight_tile(
        pf_ref[0, 0].reshape(1, cap), pf_ref[0, 1].reshape(1, cap),
        pf_ref[0, 2].reshape(1, cap), pf_ref[0, 3].reshape(1, cap),
        cx, cy, cz, 0, 0, 0, tilt, spec, params, node_on_lanes=False,
    )                                                       # (s³, cap)

    precision = (
        jax.lax.Precision.HIGHEST if spec.full_precision else None
    )
    for k in range(3):
        fk = f_ref[0, k].reshape(1, cap)
        acc_ref[k] += jax.lax.dot_general(
            w_t, fk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                   # (s³, 1)

    @pl.when(o_i == n_offsets - 1)
    def _flush():
        a = pl.multiple_of(c // 128 * 128, 128)
        for k in range(3):
            placed = pltpu.roll(
                jnp.pad(acc_ref[k], ((0, 0), (0, 127))), c - a, 1
            )
            out_ref[k, :, pl.ds(a, 128)] += placed


def _contract_kernel(
    offs_ref, tilt_ref, pf_ref, v_ref, out_ref, acc_ref, *,
    spec: FfSpec, params: PSEParams, n_offsets: int,
):
    cap = spec.bins.cap
    sx, sy, sz = spec.s
    s3 = sx * sy * sz

    c = pl.program_id(0)
    o_i = pl.program_id(1)

    @pl.when((o_i == 0) & (c == 0))
    def _zero_out():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(o_i == 0)
    def _zero_acc():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tilt = tilt_ref[0]
    ncx, ncy, ncz = spec.bins.n_cells
    cz = jax.lax.rem(c, ncz)
    cy = jax.lax.rem(jax.lax.div(c, ncz), ncy)
    cx = jax.lax.div(c, ncy * ncz)
    ox = offs_ref[o_i, 0]
    oy = offs_ref[o_i, 1]
    oz = offs_ref[o_i, 2]

    # own cell's particles (sublane vectors), neighbor node block c+o
    w = _weight_tile(
        pf_ref[0, 0], pf_ref[0, 1], pf_ref[0, 2], pf_ref[0, 3],
        cx, cy, cz, ox, oy, oz, tilt, spec, params, node_on_lanes=True,
    )                                                       # (cap, s³)

    precision = (
        jax.lax.Precision.HIGHEST if spec.full_precision else None
    )
    for k in range(3):
        vk = v_ref[0, k].reshape(1, s3)
        acc_ref[k] += jax.lax.dot_general(
            w, vk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                                   # (cap, 1)

    @pl.when(o_i == n_offsets - 1)
    def _flush():
        a = pl.multiple_of(c // 128 * 128, 128)
        for k in range(3):
            placed = pltpu.roll(
                jnp.pad(acc_ref[k], ((0, 0), (0, 127))), c - a, 1
            )
            out_ref[k, :, pl.ds(a, 128)] += placed


def _prep(bins: CellBins, box: Box, spec: FfSpec, params: PSEParams):
    pfx, pfy, pfz = _particle_node_fractions(bins, box, params)
    pf = jnp.stack([pfx, pfy, pfz, bins.mask], axis=1)     # (C, 4, cap)
    offsets_arr = jnp.asarray(spec.offsets, jnp.int32)     # (27, 3)
    tilt = jnp.asarray(box.tilt_xy, jnp.float32).reshape(1)
    return pf, offsets_arr, tilt


def _nbr_index_map(spec: FfSpec, rank: int = 3):
    """Block index of cell c + offsets[o].

    Index maps must not capture traced arrays, so the offset components are
    derived arithmetically from o — valid because cellbins.full_offsets(1)
    enumerates (ox, oy, oz) with oz fastest over range(-1, 2).
    """
    from ..cellbins import full_offsets

    assert spec.offsets == full_offsets(1)
    nc = spec.bins.n_cells

    def index_map(c, o):
        ox = o // 9 - 1
        oy = (o // 3) % 3 - 1
        oz = o % 3 - 1
        nbr = _neighbor_cell(c, ox, oy, oz, nc)
        return (nbr,) + (0,) * (rank - 1)

    return index_map


@partial(jax.jit, static_argnames=("spec", "params", "interpret"))
def spread_fused(
    bins: CellBins,
    f_cells: jax.Array,          # (3, C, cap) — padded slots zero
    box: Box,
    spec: FfSpec,
    params: PSEParams,
    interpret: bool = False,
) -> jax.Array:
    """Force-moment grid (3, Nx, Ny, Nz); weights live only in VMEM."""
    from .blocked_farfield import _blocks_to_grid

    C = spec.bins.n_cells_total
    cap = spec.bins.cap
    s3 = spec.s[0] * spec.s[1] * spec.s[2]
    O = len(spec.offsets)
    c_pad = -(-C // 128) * 128

    pf, offsets_arr, tilt = _prep(bins, box, spec, params)
    f = f_cells.astype(jnp.float32).transpose(1, 0, 2)     # (C, 3, cap)

    kernel = partial(_spread_kernel, spec=spec, params=params, n_offsets=O)
    nbr_map = _nbr_index_map(spec)
    out_t = pl.pallas_call(
        kernel,
        grid=(C, O),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # offsets (27, 3)
            pl.BlockSpec(memory_space=pltpu.SMEM),         # tilt (1,)
            pl.BlockSpec((1, 4, cap), nbr_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, cap), nbr_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, s3, c_pad), lambda c, o: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, s3, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, s3, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(offsets_arr, tilt, pf, f)

    blocks = out_t[:, :, :C].transpose(2, 0, 1)            # (C, 3, s³)
    blocks = blocks * jnp.asarray(params.spread_prefac, blocks.dtype)
    return _blocks_to_grid(blocks, spec, params)


@partial(jax.jit, static_argnames=("spec", "params", "interpret"))
def contract_fused(
    bins: CellBins,
    grid_real: jax.Array,        # (3, Nx, Ny, Nz)
    box: Box,
    spec: FfSpec,
    params: PSEParams,
    interpret: bool = False,
) -> jax.Array:
    """Particle velocities in cell layout (3, C, cap); weights VMEM-only."""
    from .blocked_farfield import _grid_to_blocks

    C = spec.bins.n_cells_total
    cap = spec.bins.cap
    s3 = spec.s[0] * spec.s[1] * spec.s[2]
    O = len(spec.offsets)
    c_pad = -(-C // 128) * 128

    pf, offsets_arr, tilt = _prep(bins, box, spec, params)
    v = _grid_to_blocks(grid_real.astype(jnp.float32), spec)  # (C, 3, s³)

    kernel = partial(_contract_kernel, spec=spec, params=params, n_offsets=O)
    nbr_map = _nbr_index_map(spec)
    own_map = lambda c, o: (c, 0, 0, 0)
    u_t = pl.pallas_call(
        kernel,
        grid=(C, O),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # offsets (27, 3)
            pl.BlockSpec(memory_space=pltpu.SMEM),         # tilt (1,)
            pl.BlockSpec((1, 4, cap, 1), own_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, s3), nbr_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, cap, c_pad), lambda c, o: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, cap, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, cap, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(offsets_arr, tilt, pf[..., None], v)

    scale = params.quadW * params.spread_prefac
    return scale * u_t[:, :, :C].transpose(0, 2, 1)        # (3, C, cap)
