"""Accuracy study: quantized A-block storage for the banded matvec.

ROADMAP item "fp8/int8 pair blocks": the matvec streams A = (imrr, bco/d²)
pairs; int8-with-scale or fp8 storage would halve the dominant HBM stream
again.  Before any kernel work, measure the pure quantization error end to
end: build f32 blocks, quantize/dequantize OUTSIDE the kernel, run the
(interpret-mode) matvec, and compare U = M·f against the f32-block result.

Scales are per (column, plane, row-tile) — exactly what the kernel could
keep in SMEM next to the jz table.

Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/study_int8.py
"""

import numpy as np


def quantize(blocks, rows, mode):
    """(1, C, 2, S, 5W) f32 -> dequantized copy via int8 or fp8 storage,
    scales per (C, 2, S // rows) tile."""
    import jax.numpy as jnp

    _, C, P, S, W5 = blocks.shape
    T = S // rows
    b = blocks.reshape(C, P, T, rows * W5)
    amax = jnp.max(jnp.abs(b), axis=-1, keepdims=True)
    if mode == "int8":
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(b / scale), -127, 127).astype(jnp.int8)
        deq = q.astype(jnp.float32) * scale
    elif mode == "fp8":
        # e4m3: ~2 decimal digits, max 448; scale into the top of the range
        scale = jnp.where(amax > 0, amax / 448.0, 1.0)
        q = (b / scale).astype(jnp.float8_e4m3fn)
        deq = q.astype(jnp.float32) * scale
    elif mode == "bf16":
        deq = b.astype(jnp.bfloat16).astype(jnp.float32)
    elif mode.startswith("mix_"):
        # (0,0) lanes stay bf16; the 4 non-self offsets' lanes quantize
        # with their own scales (distant pairs, smaller magnitudes) —
        # ROADMAP 2b's actual plan
        W = W5 // 5
        far = quantize(blocks[..., W:], rows, mode[4:])
        bf = blocks[..., :W].astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.concatenate([bf, far], axis=-1)
    else:
        raise ValueError(mode)
    return deq.reshape(1, C, P, S, W5)


def main():
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import bin_columns, vec_to_cells
    from pse_tpu.ops import banded_nearfield as bdn

    rng = np.random.default_rng(17)
    n, L = 2160, 24.0                      # phi ~ 0.65 of the bench density
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    cfg = integrator.make_config(params, n, thermal=False, engine="banded",
                                 block_dtype="float32")
    bs, cheb, p = cfg.band_spec, cfg.cheb, cfg.params
    assert bs is not None
    box = make_box(p.L, 0.0)
    bins = bin_columns(jnp.asarray(pos), box, bs.bins)
    j0, nv, ovf, zsh = bdn.compute_windows(bins, bs, box, p.ewald_cut)
    assert not bool(ovf)
    cells = vec_to_cells(bins, bs.bins, jnp.asarray(forces))

    blocks, pcyc = bdn.build_banded_blocks(
        bins, box.tilt_xy, bs, cheb, p.L, p.ewald_cut, p.ewald_dr, j0, nv,
        zsh, interpret=True,
    )
    ownp = bdn.make_own_pos(bins, bs)

    def run(blk):
        return bdn.matvec_banded(
            blk, pcyc, ownp, j0, nv, zsh, bs, cells, p.self_mobility, p.L,
            interpret=True,
        )

    u0 = run(blocks)
    scale_u = float(jnp.max(jnp.abs(u0)))
    print(f"n={n} C={bs.bins.n_cells} S={bs.bins.cap} W={bs.window} "
          f"R={bs.rows}; |u|max {scale_u:.3e}", flush=True)
    for mode in ("bf16", "fp8", "int8", "mix_fp8", "mix_int8"):
        uq = run(quantize(blocks, bs.rows, mode))
        rel = float(jnp.max(jnp.abs(uq - u0))) / scale_u
        rms = float(jnp.sqrt(jnp.mean((uq - u0) ** 2))) / scale_u
        print(f"  {mode}: rel max {rel:.3e}  rel rms {rms:.3e}", flush=True)


if __name__ == "__main__":
    main()
