"""Probe pltpu.roll with POSITIVE shifts >= 128 (the mod-W complement of the
negative shifts the kernels use)."""
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(sh_ref, x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], sh_ref[0], 1)

    for w in (384, 512, 640):
        x = np.arange(8 * w, dtype=np.float32).reshape(8, w)
        for sh in (w - 127, w - 64, w - 1, w, 128, 255, 256, 257):
            out = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, w), jnp.float32),
            )(jnp.asarray([sh], jnp.int32), jnp.asarray(x))
            exp = np.roll(x, sh, axis=1)
            bad = int((np.asarray(out) != exp).sum())
            got = np.asarray(out)[0]
            where = int(np.argwhere(got == x[0, 0])[0, 0]) if (got == x[0, 0]).any() else None
            print(f"W={w} shift={sh}: {'ok' if not bad else f'BAD {bad} (lane {where}, want {sh % w})'}", flush=True)

if __name__ == "__main__":
    main()
