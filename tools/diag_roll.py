"""Probe pltpu.roll correctness on hardware vs lane width and shift.

A (8, W) ramp is rolled by a dynamic (SMEM) shift inside a minimal kernel;
compared against np.roll.  Widths cover 2..6 vregs, shifts the (-128, 128)
range the production kernels use.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(sh_ref, x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], sh_ref[0], 1)

    for w in (256, 384, 512, 640, 768):
        x = np.arange(8 * w, dtype=np.float32).reshape(8, w)
        for sh in (-127, -64, -1, 0, 1, 64, 127):
            out = pl.pallas_call(
                kern,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, w), jnp.float32),
            )(jnp.asarray([sh], jnp.int32), jnp.asarray(x))
            exp = np.roll(x, sh, axis=1)
            bad = int((np.asarray(out) != exp).sum())
            if bad:
                # locate the offset pattern: where does row 0 land?
                got = np.asarray(out)[0]
                shift_seen = int(np.argwhere(got == x[0, 0])[0, 0]) if (
                    got == x[0, 0]).any() else None
                print(f"W={w} shift={sh}: BAD {bad} elems "
                      f"(x[0,0] found at lane {shift_seen}, expected "
                      f"{sh % w})", flush=True)
            else:
                print(f"W={w} shift={sh}: ok", flush=True)


if __name__ == "__main__":
    main()
