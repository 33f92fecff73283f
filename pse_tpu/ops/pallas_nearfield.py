"""Pallas TPU kernels: fused near-field matvec over stored pair blocks.

Two kernel generations, both computing forward u(c) += A(o,c)·f(c+o) AND
transposed u(c+o) += A(o,c)ᵀ·f(c) from a single streamed read of each block,
with f and u resident in VMEM for the whole sweep (the sequential TPU grid
makes the scattered transposed accumulation race-free):

  * matvec_cells_pallas   (v1): per-cell loop, (cap,cap)x(cap,3) MXU dots.
  * matvec_cells_pallas_rows (v2): whole z-rows per grid step, batched
    multiply+reduce (Mosaic rejects the batched-GEMV dot_general; the
    (ncz,cap,3) dot output would also tile-pad 3->128 and blow the 16 MB
    scoped VMEM budget — hence per-component products).

Status (measured v5e, N=100k): BOTH lose to the XLA formulation
(blocked_nearfield.matvec_cells) — v1 by ~2x (per-cell dynamic VMEM updates,
tiny dots), v2 by ~8% (f32 multiply-reduce compute cancels the read saving;
the device trace shows XLA already fuses the forward+transpose einsum pair
into a single read of A).  Kept as validated groundwork: both are exact vs
the XLA path (interpret-mode tests + on-device cross-checks), and the next
iteration (sublane-oriented bf16 accumulation with manual DMA pipelining)
can start from here.  Select with NfSpec.use_pallas / make_config(use_pallas=True).
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


# ---------------------------------------------------------------------------
# v2: row-batched kernel — grid (offset, z-row); each step processes a whole
# z-row of cells with BATCHED dots, computing the forward AND transposed
# products from one A tile; the output stays resident in VMEM for the whole
# sweep.  A is read exactly once per matvec.  The per-offset z-shift is a
# three-way lax.switch (static roll amounts), keeping everything one
# pallas_call so VMEM holds only {A tile, f, mask, u}.
# ---------------------------------------------------------------------------


def _row_kernel(
    offs_ref, a_ref, f_ref, mask_ref, u_ref, *, ncx, ncy, ncz, cap, self_mobility
):
    o_i = pl.program_id(0)
    row = pl.program_id(1)

    @pl.when((o_i == 0) & (row == 0))
    def _init():
        u_ref[:] = self_mobility * f_ref[:] * mask_ref[:][None]

    ox = offs_ref[o_i, 0]
    oy = offs_ref[o_i, 1]
    oz = offs_ref[o_i, 2]
    cx = jax.lax.div(row, ncy)
    cy = jax.lax.rem(row, ncy)
    nrow = jax.lax.rem(cx + ox + ncx, ncx) * ncy + jax.lax.rem(cy + oy + ncy, ncy)

    a6 = a_ref[0]                                     # (6, ncz, cap, cap)

    def shift(x, sign):
        # rolled[i] = x[i + sign*oz] for oz in {-1, 0, +1}; pltpu.roll needs
        # non-negative static shifts, so negatives wrap mod ncz.
        return jax.lax.switch(
            oz + 1,
            [
                lambda v: pltpu.roll(v, sign % ncz, axis=1),
                lambda v: v,
                lambda v: pltpu.roll(v, (-sign) % ncz, axis=1),
            ],
            x,
        )

    # (6 symmetric components) x (3 vector components) applied as batched
    # GEMVs with (ncz, cap) outputs — a (ncz, cap, 3) RHS would tile-pad
    # 3 -> 128 in VMEM and overflow the scoped budget.
    SYM = ((0, 1, 2), (1, 3, 4), (2, 4, 5))  # rows of the symmetric tensor

    def apply_blocks(fvec, transpose):
        # Batched GEMV as multiply+reduce (Mosaic rejects this dot_general
        # shape).  forward: out[b,i] = sum_j A[b,i,j] f[b,j] (lane reduce);
        # transpose: out[b,j] = sum_i A[b,i,j] f[b,i] (sublane reduce).
        fv = [fvec[c].astype(jnp.float32) for c in range(3)]
        out = []
        for r in range(3):
            acc = None
            for c in range(3):
                A = a6[SYM[r][c]].astype(jnp.float32)  # (ncz, cap, cap)
                if transpose:
                    prod = jnp.sum(A * fv[c][:, :, None], axis=1)
                else:
                    prod = jnp.sum(A * fv[c][:, None, :], axis=2)
                acc = prod if acc is None else acc + prod
            out.append(acc)
        return jnp.stack(out, axis=0)                  # (3, ncz, cap)

    # forward: u(row) += A · f(nrow, z+oz)
    fj = shift(f_ref[:, pl.ds(nrow * ncz, ncz), :], 1)    # (3, ncz, cap)
    u_ref[:, pl.ds(row * ncz, ncz), :] += apply_blocks(fj, transpose=False)

    @pl.when(o_i > 0)
    def _reverse():
        # u(nrow, z+oz) += A^T · f(row)
        fi = f_ref[:, pl.ds(row * ncz, ncz), :]
        w = shift(apply_blocks(fi, transpose=True), -1)
        u_ref[:, pl.ds(nrow * ncz, ncz), :] += w


@partial(jax.jit, static_argnames=("spec", "self_mobility", "interpret"))
def matvec_cells_pallas_rows(
    a: jax.Array,              # (noff, 6, C, cap, cap) stacked pair blocks
    spec,                      # NfSpec
    bins: CellBins,
    f_cells: jax.Array,        # (3, C, cap) f32, padded slots zero
    self_mobility: float,
    interpret: bool = False,
) -> jax.Array:
    noff = len(spec.offsets)
    ncx, ncy, ncz = spec.bins.n_cells
    cap = spec.bins.cap
    c_total = spec.bins.n_cells_total
    offsets_arr = jnp.asarray(spec.offsets, jnp.int32)

    kernel = partial(
        _row_kernel, ncx=ncx, ncy=ncy, ncz=ncz, cap=cap,
        self_mobility=float(self_mobility),
    )
    return pl.pallas_call(
        kernel,
        grid=(noff, ncx * ncy),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # offsets (noff, 3)
            pl.BlockSpec(
                (1, 6, ncz, cap, cap), lambda o, r: (o, 0, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # f
            pl.BlockSpec(memory_space=pltpu.VMEM),       # mask
        ],
        out_specs=pl.BlockSpec(
            (3, c_total, cap), lambda o, r: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, c_total, cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(offsets_arr, a, f_cells, bins.mask)


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
