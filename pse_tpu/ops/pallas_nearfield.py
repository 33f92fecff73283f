"""Pallas TPU kernel: fused near-field matvec over stored pair blocks.

The XLA formulation (blocked_nearfield.matvec_cells) reads every pair block
TWICE per matvec — once for the forward GEMV u(c) += A(o,c)·f(c+o) and once
for the transposed GEMV u(c+o) += A(o,c)ᵀ·f(c) — because XLA cannot fuse two
dot_generals sharing an operand.  The matvec is bandwidth-bound on the block
array, so this kernel halves its cost:

  * grid = (offset, cell-chunk); each step DMAs one chunk of blocks to VMEM
    and computes BOTH directions from the same tile (two MXU passes, zero
    extra HBM traffic);
  * forces and the output vector live wholly in VMEM across the entire grid
    (a few MB), so the transposed contributions accumulate into neighbor
    cells without any inter-step races — the TPU grid is sequential
    (dimension_semantics "arbitrary").

Semantics are identical to blocked_nearfield.matvec_cells (same blocks, same
mask handling); the test suite cross-checks them element-wise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cellbins import CellBins


def _pick_chunk(c_total: int, target: int = 8) -> int:
    """A divisor of C near ``target`` (BlockSpec needs exact tiling)."""
    best = 1
    for d in range(1, min(c_total, 4 * target) + 1):
        if c_total % d == 0 and abs(d - target) < abs(best - target):
            best = d
    return best


def _kernel(offs_ref, a_ref, f_ref, mask_ref, u_ref, *, spec, self_mobility, chunk):
    ncx, ncy, ncz = spec.bins.n_cells
    cap = spec.bins.cap

    o_i = pl.program_id(0)
    chunk_i = pl.program_id(1)

    @pl.when((o_i == 0) & (chunk_i == 0))
    def _init():
        u_ref[:] = self_mobility * f_ref[:] * mask_ref[:][None]

    ox = offs_ref[o_i, 0]
    oy = offs_ref[o_i, 1]
    oz = offs_ref[o_i, 2]
    base = chunk_i * chunk

    for i in range(chunk):
        c = base + i
        cz = jax.lax.rem(c, ncz)
        cy = jax.lax.rem(jax.lax.div(c, ncz), ncy)
        cx = jax.lax.div(c, ncz * ncy)
        nx = jax.lax.rem(cx + ox + ncx, ncx)
        ny = jax.lax.rem(cy + oy + ncy, ncy)
        nz = jax.lax.rem(cz + oz + ncz, ncz)
        nbr = (nx * ncy + ny) * ncz + nz

        a6 = a_ref[0, :, i]                              # (6, cap, cap)
        fj = f_ref[:, pl.ds(nbr, 1), :].reshape(3, cap)  # (3, cap)
        fj_m = fj.T.astype(a6.dtype)                     # (cap, 3)

        d = [
            jnp.dot(a6[k], fj_m, preferred_element_type=jnp.float32)
            for k in range(6)
        ]                                                # 6 x (cap, 3)
        ux = d[0][:, 0] + d[1][:, 1] + d[2][:, 2]
        uy = d[1][:, 0] + d[3][:, 1] + d[4][:, 2]
        uz = d[2][:, 0] + d[4][:, 1] + d[5][:, 2]
        add = jnp.stack([ux, uy, uz], axis=0)            # (3, cap)
        u_ref[:, pl.ds(c, 1), :] += add[:, None, :]

        @pl.when(o_i > 0)
        def _reverse():
            fi = f_ref[:, pl.ds(c, 1), :].reshape(3, cap)
            fi_m = fi.T.astype(a6.dtype)
            dt = [
                jax.lax.dot_general(
                    a6[k], fi_m,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for k in range(6)
            ]                                            # A^T @ F  (cap, 3)
            wx = dt[0][:, 0] + dt[1][:, 1] + dt[2][:, 2]
            wy = dt[1][:, 0] + dt[3][:, 1] + dt[4][:, 2]
            wz = dt[2][:, 0] + dt[4][:, 1] + dt[5][:, 2]
            w = jnp.stack([wx, wy, wz], axis=0)
            u_ref[:, pl.ds(nbr, 1), :] += w[:, None, :]


@partial(jax.jit, static_argnames=("spec", "self_mobility", "interpret"))
def matvec_cells_pallas(
    a: jax.Array,              # (noff, 6, C, cap, cap) stacked pair blocks
    spec,                      # NfSpec
    bins: CellBins,
    f_cells: jax.Array,        # (3, C, cap) f32, padded slots zero
    self_mobility: float,
    interpret: bool = False,
) -> jax.Array:
    noff = len(spec.offsets)
    c_total = spec.bins.n_cells_total
    cap = spec.bins.cap
    chunk = _pick_chunk(c_total)
    offsets_arr = jnp.asarray(spec.offsets, jnp.int32)

    kernel = partial(
        _kernel, spec=spec, self_mobility=float(self_mobility), chunk=chunk
    )
    return pl.pallas_call(
        kernel,
        grid=(noff, c_total // chunk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # offsets: whole (noff,3)
            pl.BlockSpec(
                (1, 6, chunk, cap, cap), lambda o, c: (o, 0, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # f: whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),      # mask: whole array
        ],
        out_specs=pl.BlockSpec(
            (3, c_total, cap), lambda o, c: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, c_total, cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(offsets_arr, a, f_cells, bins.mask)
