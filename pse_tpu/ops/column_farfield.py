"""Z-column NUFFT spread/contract: bilinear-form matmuls, no z windows.

Third-generation TPU far field (production path).  Lessons from the two
predecessors, both measured on v5e:

  * stored-W einsum (ops/blocked_farfield.py): W = (27, C, cap, s³) GBs of
    HBM traffic + N=3 GEMV contractions;
  * separable extended-window (ops/sep_farfield.py, removed — git history):
    right flop count, but
    its 3-D overlap-add/gather intermediates have tiny (4..12) minor dims
    that tile-pad 10-30×, and the measured contract was slower than the
    stored-W path it replaced.

This formulation keeps every array's minor dimension at ~Nz or wider.
Cells are full-height columns of (sx, sy, Nz) grid nodes.  For a particle
p in column c and its 3×3 xy-neighborhood window G (9·sx·sy xy-nodes ×
Nz z-nodes), the Gaussian quadrature is a bilinear form

    u[p, comp] = wxy[p, :] · G[:, :, comp] · wz[p, :]ᵀ

evaluated as two dense matmuls with the particle axis batched per column:
H = wxy @ G (MXU, K = 9·sx·sy), then a z-masked reduce against wz (VPU).
Contracting ALL Nz z-nodes instead of a ±rcut window trades ~5× MXU
overcompute (free — the far field is bandwidth-bound) for the entire
z-extension machinery; the z Gaussian decays below ``error`` inside the
column (same superset-support quadrature argument as blocked_farfield.py).
Spread is the exact transpose: out = wxyᵀ @ (f ⊗ wz), overlap-added onto
the grid along x and y only (3×3 rolls of arrays whose minor dim is Nz).

Reference semantics: gpu_stokes_Spread_kernel / gpu_stokes_Contract_kernel
(Mobility.cu:114-252, 325-477) — same Gaussian, same prefac/quadW scales,
same xy tilt handling (the xy factor is joint because tilt mixes x into y).
Cross-validated against the stored-W sweep in tests/test_farfield_paths.py.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..box import Box
from ..cellbins import BinSpec, CellBins
from ..params import PSEParams


class ColFfSpec(NamedTuple):
    """Static z-column far-field configuration (hashable)."""

    bins: BinSpec            # n_cells = (ncx, ncy, 1); cap per column
    s: tuple                 # (sx, sy) nodes per column per axis
    full_precision: bool = False
    weight_dtype: str = "float32"


class ColFactors(NamedTuple):
    """Per-step Gaussian factors shared by spread and contract.

    Both factors keep CAP as the minor dimension: cap is 8-rounded and
    ~128-248 at production scale, so lane padding is ~0-3%, while the
    node/z-minor orientation padded 144→256 / 96→128 lanes (the Pallas
    contract kernel and the XLA einsums both stream these every step)."""

    wxy: jax.Array   # (C, 9·sx·sy, cap) joint xy window factor (tilt-aware)
    wz: jax.Array    # (C, Nz, cap) full-column z factor, mask folded


def make_col_spec(
    params: PSEParams,
    n_particles: int,
    weight_dtype: str | None = None,
) -> ColFfSpec | None:
    """Choose (sx, sy) as grid divisors covering the Gaussian reach.

    Needs sx, sy ≥ P/2 + 1 so the 3×3 window is a superset of the P-point
    support, and ≥ 3 columns per axis so the periodic stencil has distinct
    neighbors.  Returns None when the grid is too small (fallback paths).
    """
    need = params.gauss_P // 2 + 1

    def best_axis(ng):
        cands = [s for s in range(need, ng // 3 + 1) if ng % s == 0]
        return min(cands) if cands else None

    sx = best_axis(params.Nx)
    sy = best_axis(params.Ny)
    if sx is None or sy is None:
        return None
    ncx, ncy = params.Nx // sx, params.Ny // sy

    mu = n_particles / (ncx * ncy)
    cap = int(math.ceil((mu + 5.0 * math.sqrt(mu) + 4.0) / 8.0)) * 8
    cap = min(cap, max(8, int(math.ceil(n_particles / 8.0)) * 8))

    full_precision = params.error < 1e-3
    if weight_dtype is None:
        from ..utils.backend import probable_backend

        weight_dtype = (
            "bfloat16"
            if (not full_precision and probable_backend() == "tpu")
            else "float32"
        )
    elif full_precision and weight_dtype == "bfloat16":
        raise ValueError(
            "bfloat16 far-field factors are incompatible with "
            f"error={params.error:g} < 1e-3 (full-precision passes)"
        )
    return ColFfSpec(
        bins=BinSpec(n_cells=(ncx, ncy, 1), cap=cap),
        s=(sx, sy),
        full_precision=full_precision,
        weight_dtype=weight_dtype,
    )


def _node_fractions_xy(bins: CellBins, box: Box, params: PSEParams):
    """Node-space particle coordinates per axis (C, cap), tilt-reduced x."""
    L = box.L
    lo = box.lo
    fx = (bins.px - lo[0] - box.tilt_xy * bins.py) / L[0]
    fy = (bins.py - lo[1]) / L[1]
    fz = (bins.pz - lo[2]) / L[2]
    fx = fx - jnp.floor(fx)
    fy = fy - jnp.floor(fy)
    fz = fz - jnp.floor(fz)
    return fx * params.Nx, fy * params.Ny, fz * params.Nz


def build_col_factors(
    bins: CellBins, box: Box, spec: ColFfSpec, params: PSEParams
) -> ColFactors:
    sx, sy = spec.s
    ncx, ncy, _ = spec.bins.n_cells
    C = ncx * ncy
    Nx, Ny, Nz = params.Nx, params.Ny, params.Nz
    L = params.L
    expfac = params.spread_expfac
    pfx, pfy, pfz = _node_fractions_xy(bins, box, params)

    import numpy as np

    bx, by = np.meshgrid(np.arange(ncx), np.arange(ncy), indexing="ij")
    bx = jnp.asarray(bx.reshape(-1), jnp.int32)
    by = jnp.asarray(by.reshape(-1), jnp.int32)

    def ext_frac_delta(b, s, pf, N):
        node = (b[:, None] - 1) * s + jnp.arange(3 * s, dtype=jnp.int32)
        fd = node[:, :, None].astype(pf.dtype) / N - (pf / N)[:, None, :]
        return fd - jnp.round(fd)                     # (C, 3s, cap)

    fdx = ext_frac_delta(bx, sx, pfx, Nx)
    fdy = ext_frac_delta(by, sy, pfy, Ny)
    # full z column: nodes 0..Nz-1, minimum-image reduced
    nodez = jnp.arange(Nz, dtype=pfz.dtype)
    fdz = nodez[None, :, None] / Nz - (pfz / Nz)[:, None, :]
    fdz = fdz - jnp.round(fdz)                        # (C, Nz, cap)

    dyu = L[1] * fdy                                  # (C, 3sy, cap)
    dz = L[2] * fdz
    # Node order within 9·sx·sy is OFFSET-MAJOR: (ox, oy, sx, sy).  The
    # spread fold (_windows_to_grid) then slices whole per-offset blocks
    # off the 96 MB kernel output and overlap-adds BEFORE the minor-dim
    # relayout — with offsets interleaved ((ox, sx, oy, sy)) the relayout
    # ran on the full 9x window array (measured 0.46 ms reshape +
    # 0.15 ms fold per with-forces step).
    dxo = (L[0] * fdx).reshape(C, 3, sx, spec.bins.cap)
    dyo = dyu.reshape(C, 3, sy, spec.bins.cap)
    dx = dxo[:, :, None, :, None, :] + box.tilt_xy * dyo[:, None, :, None]
    # Factors are STORED in the matmul dtype (bf16 on TPU at error >= 1e-3):
    # both consumers cast them at the einsum anyway, so storing f32 just
    # doubled the build write + contract/spread read (wxy is 82 MB f32 at
    # bench scale).  The cast is fused into the exp fusions.
    dtype, _ = _matmul_dtype(spec)
    wxy = jnp.exp(
        -expfac * (dx * dx + (dyo * dyo)[:, None, :, None])
    )                                # (C, 3ox, 3oy, sx, sy, cap)
    wz = jnp.exp(-expfac * dz * dz) * bins.mask[:, None, :]

    return ColFactors(
        wxy=wxy.reshape(C, 9 * sx * sy, spec.bins.cap).astype(dtype),
        wz=wz.astype(dtype),
    )


def _matmul_dtype(spec: ColFfSpec):
    if spec.full_precision:
        return jnp.float32, jax.lax.Precision.HIGHEST
    return jnp.dtype(spec.weight_dtype), None


def _grid_to_windows(grid: jax.Array, spec: ColFfSpec, params: PSEParams,
                     dtype=None):
    """(3, Nx, Ny, Nz) -> (C, 9·sx·sy, 3·Nz) xy-windows, minor dim Nz.

    ``dtype``: cast BEFORE the 9x window duplication so the materialized
    window array (95 MB f32 at bench scale) is built in the matmul dtype —
    casting after cost a separate 0.18 ms relayout copy per step."""
    sx, sy = spec.s
    ncx, ncy, _ = spec.bins.n_cells
    if dtype is not None:
        grid = grid.astype(dtype)
    g = grid.reshape(3, ncx, sx, ncy, sy, params.Nz)
    g = g.transpose(1, 2, 3, 4, 0, 5)            # (ncx, sx, ncy, sy, 3, Nz)
    # V[b, o] = blocks[b + o - 1] per axis (adjoint of the spread fold)
    gx = jnp.stack([jnp.roll(g, 1 - o, axis=0) for o in range(3)], axis=1)
    gxy = jnp.stack([jnp.roll(gx, 1 - o, axis=3) for o in range(3)], axis=4)
    # (ncx, 3ox, sx, ncy, 3oy, sy, 3, Nz) -> offset-major node order
    # (ox, oy, sx, sy), matching build_col_factors' wxy
    gxy = gxy.transpose(0, 3, 1, 4, 2, 5, 6, 7)
    return gxy.reshape(ncx * ncy, 9 * sx * sy, 3 * params.Nz)


def _windows_to_grid(out: jax.Array, spec: ColFfSpec, params: PSEParams):
    """(C, 9·sx·sy, 3·Nz) -> (3, Nx, Ny, Nz) overlap-add on x and y.

    The node order is offset-major (build_col_factors), so each of the 9
    offset contributions is a WHOLE sublane block of ``out`` — the fold
    runs on layout-preserving slices of the 9x window array and only the
    9x-smaller folded result pays the minor-dim relayout (splitting the
    3·Nz lane dim).  With the offsets interleaved this relayout ran on the
    full window array: 0.46 ms/step at bench scale."""
    sx, sy = spec.s
    ncx, ncy, _ = spec.bins.n_cells
    out = out.reshape(ncx, ncy, 9, sx * sy, 3 * params.Nz)
    acc = None
    for o in range(9):
        ox, oy = o // 3 - 1, o % 3 - 1
        t = jnp.roll(out[:, :, o], (ox, oy), axis=(0, 1))
        acc = t if acc is None else acc + t
    acc = acc.reshape(ncx, ncy, sx, sy, 3, params.Nz)
    grid = acc.transpose(4, 0, 2, 1, 3, 5)       # (3, ncx, sx, ncy, sy, Nz)
    return grid.reshape(3, params.Nx, params.Ny, params.Nz)


def spread_col(
    bins: CellBins,
    f_cells: jax.Array,          # (3, C, cap) — padded slots zero
    box: Box,
    spec: ColFfSpec,
    params: PSEParams,
    factors: ColFactors,
) -> jax.Array:
    """Force-moment grid: out = wxyᵀ @ (f ⊗ wz) per column + xy overlap-add."""
    sx, sy = spec.s
    C = spec.bins.n_cells_total
    cap = spec.bins.cap
    dtype, precision = _matmul_dtype(spec)

    # X is built directly in the matmul dtype (the cast fuses into the
    # outer-product fusion — materializing f32 and casting at the einsum
    # cost a second full-size pass over 95 MB at bench scale).
    # X[c, (k,z), p] = f[k,c,p]·wz[c,z,p] — cap-minor like the factors.
    # prefac rides the small force operand (NOT the 95 MB einsum output);
    # spread_col_pallas scales at the same point, keeping the two paths'
    # rounding identical (the on-TPU gate pins them bitwise).
    fp = f_cells * jnp.float32(params.spread_prefac)
    X = (
        fp.transpose(1, 0, 2)[:, :, None, :]
        * factors.wz[:, None, :, :]
    ).reshape(C, 3 * params.Nz, cap).astype(dtype)
    out = jnp.einsum(
        "cnp,cmp->cnm", factors.wxy.astype(dtype), X,
        preferred_element_type=jnp.float32, precision=precision,
    )                                            # (C, 9·sx·sy, 3·Nz)
    return _windows_to_grid(out, spec, params)


def contract_col(
    bins: CellBins,
    grid_real: jax.Array,        # (3, Nx, Ny, Nz)
    box: Box,
    spec: ColFfSpec,
    params: PSEParams,
    factors: ColFactors,
) -> jax.Array:
    """Particle velocities (3, C, cap): exact transpose of spread_col."""
    C = spec.bins.n_cells_total
    cap = spec.bins.cap
    dtype, precision = _matmul_dtype(spec)

    v = _grid_to_windows(grid_real, spec, params, dtype)  # (C, 9sxsy, 3Nz)
    H = jnp.einsum(
        "cnp,cnm->cmp", factors.wxy.astype(dtype), v,
        preferred_element_type=jnp.float32, precision=precision,
    )                                                # (C, 3·Nz, cap)
    # H is rounded to the matmul dtype before the z-contraction: its 164 MB
    # f32 write+read dominated the contract's HBM traffic, and the rounding
    # (~0.4% per element, averaged over the ~P significant z-terms) sits an
    # order below the bf16 matmul-input rounding already accepted at
    # error >= 1e-3 (pinned by test_farfield_paths).  Accumulation stays
    # f32 via preferred_element_type; full_precision keeps everything f32.
    H = H.reshape(C, 3, params.Nz, cap).astype(dtype)
    u = jnp.einsum(
        "ckzp,czp->kcp", H, factors.wz,
        preferred_element_type=jnp.float32, precision=precision,
    )                                                # (3, C, cap) directly
    scale = jnp.float32(params.quadW * params.spread_prefac)
    return scale * u


def _contract_kernel(gext_ref, wxy_ref, wz_ref, u_ref, scr_ref, *,
                     spec: ColFfSpec, nz: int, ncx: int, ncy: int, cb: int):
    """Grid (C // cb,): per column, assemble the 3x3 xy window from the
    compact node grid (9 static scratch copies — the XLA path materializes
    the 9x-duplicated window array instead), then ONE MXU dot against the
    node-major xy factor and a masked segment dot for the z contraction.
    Everything stays 2-D with cap on lanes; H never touches HBM."""
    sx, sy = spec.s
    n_nodes = 9 * sx * sy
    g = pl.program_id(0)
    # Segment-sum lhs: row k is 1 over lanes [k·nz, (k+1)·nz) — contracts
    # the z axis per component on the MXU (VPU lane reductions cost ~2x).
    seg = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * nz), 1) // nz
    krow = jax.lax.broadcasted_iota(jnp.int32, (3, 3 * nz), 0)
    ones_k = jnp.where(seg == krow, 1.0, 0.0).astype(jnp.float32)

    for ci in range(cb):
        c = g * cb + ci
        bx = jax.lax.div(c, ncy)
        by = jax.lax.rem(c, ncy)
        for dx in range(3):
            xb = jax.lax.rem(bx + (dx - 1) + ncx, ncx)
            for dy in range(3):
                yb = jax.lax.rem(by + (dy - 1) + ncy, ncy)
                blk = gext_ref[pl.ds(xb * ncy + yb, 1)].reshape(
                    sx * sy, 3 * nz
                )
                for ix in range(sx):
                    # window node (dx, dy, ix, iy) -> wxy's OFFSET-major
                    # flat order (build_col_factors); f32 scratch dodges the
                    # bf16 odd-offset partial-row store hazard (sy may be
                    # odd)
                    r0 = ((dx * 3 + dy) * sx + ix) * sy
                    scr_ref[r0:r0 + sy] = blk[
                        ix * sy:(ix + 1) * sy
                    ].astype(jnp.float32)
        ht = jax.lax.dot_general(
            scr_ref[:].astype(wxy_ref.dtype), wxy_ref[ci],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (3·nz, cap)
        wzc = wz_ref[ci].astype(jnp.float32)           # (nz, cap)
        e = ht * jnp.concatenate([wzc, wzc, wzc], axis=0)
        u_ref[ci] = jax.lax.dot_general(
            ones_k, e,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (3, cap)


@partial(jax.jit, static_argnames=("spec", "params", "interpret"))
def contract_col_pallas(
    grid_real: jax.Array,        # (3, Nx, Ny, Nz)
    spec: ColFfSpec,
    params: PSEParams,
    factors: ColFactors,
    interpret: bool = False,
) -> jax.Array:
    """TPU production contract: same quadrature as contract_col with the
    H intermediate kept in VMEM (its HBM write+read was ~40% of the XLA
    contract's traffic) and the 9x window duplication replaced by
    in-kernel scratch assembly from the COMPACT node grid (the XLA path's
    window build cost ~0.45 ms/step at bench scale).  Rounding points
    differ from the XLA path: the XLA contract rounds H to bf16 entering
    the z dot, while this kernel keeps ht/e and the z contraction in f32 —
    the kernel is the MORE accurate of the two, so the pallas-vs-XLA gate
    tolerance (5e-3) bounds their combined bf16-weight rounding, not a
    shared rounding point."""
    sx, sy = spec.s
    ncx, ncy, _ = spec.bins.n_cells
    C = ncx * ncy
    cap = spec.bins.cap
    Nz = params.Nz
    n_nodes = 9 * sx * sy
    dtype, _ = _matmul_dtype(spec)

    # Compact per-column node grid, window-node-major, (k, z) on lanes —
    # ONE relayout of the 10.6 MB grid instead of the 9x-duplicated
    # (C, 144, 3Nz) window array.
    gc = grid_real.astype(dtype).reshape(3, ncx, sx, ncy, sy, Nz)
    gext = gc.transpose(1, 3, 2, 4, 0, 5).reshape(C, sx * sy, 3 * Nz)

    cb = next((d for d in (8, 6, 4, 3, 2) if C % d == 0), 1)
    kernel = partial(_contract_kernel, spec=spec, nz=Nz, ncx=ncx, ncy=ncy,
                     cb=cb)
    u = pl.pallas_call(
        kernel,
        grid=(C // cb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # gext (whole, ~28 MB)
            pl.BlockSpec((cb, n_nodes, cap), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),    # wxy (node-major)
            pl.BlockSpec((cb, Nz, cap), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),    # wz
        ],
        out_specs=pl.BlockSpec((cb, 3, cap), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 3, cap), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_nodes, 3 * Nz), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(gext, factors.wxy, factors.wz)

    scale = jnp.float32(params.quadW * params.spread_prefac)
    return scale * u.transpose(1, 0, 2)               # (3, C, cap)


def _spread_kernel(f_ref, wxy_ref, wz_ref, out_ref, *, nz: int, cb: int):
    """Grid (C // cb,): out_c = wxy_c · (f_c ⊗ wz_c)ᵀ with the force-moment
    operand X built in VMEM (the XLA path materializes it to HBM)."""
    for ci in range(cb):
        # f32 product, rounded ONCE to the matmul dtype — the same
        # rounding point as the XLA path's X materialization
        wzc = wz_ref[ci].astype(jnp.float32)           # (nz, cap)
        segs = [wzc * f_ref[ci, k:k + 1] for k in range(3)]
        x = jnp.concatenate(segs, axis=0).astype(wxy_ref.dtype)
        out_ref[ci] = jax.lax.dot_general(
            wxy_ref[ci], x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (n_nodes, 3·nz)


@partial(jax.jit, static_argnames=("spec", "params", "interpret"))
def spread_col_pallas(
    f_cells: jax.Array,          # (3, C, cap) — padded slots zero
    spec: ColFfSpec,
    params: PSEParams,
    factors: ColFactors,
    interpret: bool = False,
) -> jax.Array:
    """TPU production spread: per-column window moments via one fused MXU
    dot (X = f ⊗ wz never touches HBM), then the XLA overlap-add fold
    (_windows_to_grid) unchanged.  Same quadrature and rounding points as
    spread_col at bf16."""
    sx, sy = spec.s
    ncx, ncy, _ = spec.bins.n_cells
    C = ncx * ncy
    cap = spec.bins.cap
    Nz = params.Nz
    n_nodes = 9 * sx * sy

    cb = next((d for d in (8, 6, 4, 3, 2) if C % d == 0), 1)
    kernel = partial(_spread_kernel, nz=Nz, cb=cb)
    out = pl.pallas_call(
        kernel,
        grid=(C // cb,),
        in_specs=[
            pl.BlockSpec((cb, 3, cap), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),    # forces (slot layout)
            pl.BlockSpec((cb, n_nodes, cap), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),    # wxy (node-major)
            pl.BlockSpec((cb, Nz, cap), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),    # wz
        ],
        out_specs=pl.BlockSpec((cb, n_nodes, 3 * Nz), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, n_nodes, 3 * Nz), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
        interpret=interpret,
    )(
        # prefac rides the (3, C, cap) forces (~1/40th the elements):
        # scaling the kernel OUTPUT cost a 0.40 ms full-pass multiply over
        # the 96 MB window array per with-forces step
        (f_cells * jnp.float32(params.spread_prefac))
        .transpose(1, 0, 2).astype(jnp.float32),
        factors.wxy,
        factors.wz,
    )

    return _windows_to_grid(out, spec, params)


def spread_col_auto(
    bins: CellBins,
    f_cells: jax.Array,
    box: Box,
    spec: ColFfSpec,
    params: PSEParams,
    factors: ColFactors,
) -> jax.Array:
    """Dispatch: fused Pallas spread on TPU at bf16, XLA path otherwise."""
    if (jax.default_backend() == "tpu" and not spec.full_precision
            and jnp.dtype(spec.weight_dtype) == jnp.bfloat16):
        return spread_col_pallas(f_cells, spec, params, factors)
    return spread_col(bins, f_cells, box, spec, params, factors)


def contract_col_auto(
    bins: CellBins,
    grid_real: jax.Array,
    box: Box,
    spec: ColFfSpec,
    params: PSEParams,
    factors: ColFactors,
) -> jax.Array:
    """Dispatch: fused Pallas contract on TPU at bf16 (production), the
    XLA einsum path otherwise (full_precision f32, CPU, fallbacks)."""
    if (jax.default_backend() == "tpu" and not spec.full_precision
            and jnp.dtype(spec.weight_dtype) == jnp.bfloat16):
        return contract_col_pallas(grid_real, spec, params, factors)
    return contract_col(bins, grid_real, box, spec, params, factors)
