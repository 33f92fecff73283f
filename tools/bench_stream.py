"""A-stream DMA pattern probe: how fast can Pallas stream the banded A?

Compares, over the same (C, 6*S*5W)-shaped bf16 array (~0.93 GB at bench
scale):
  * xla      — jnp.sum reduction (the chip's practical read ceiling)
  * auto     — pallas auto-pipelined BlockSpec stream, block = cps columns
  * manual   — pallas manual double-buffered pltpu.make_async_copy from
               ANY/HBM into a VMEM scratch (one big DMA per block)

Each variant reads the array once per iteration inside a lax.scan chain.
Run alone (one TPU process at a time): python tools/bench_stream.py
"""

import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=216)
    ap.add_argument("--inner", type=int, default=6 * 560 * 640)
    ap.add_argument("--cps", type=int, default=2)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    C, INNER, cps = args.c, args.inner, args.cps
    assert C % cps == 0 and INNER % (8 * 128) == 0
    # (C, 8, INNER//8): per-column chunk contiguous, (8,128)-tileable.
    # Real (non-constant) data: jnp.ones/zeros are broadcast constants that
    # XLA can fold - a ones-array 'read' measured 1.5 TB/s (fake).
    x = jax.random.normal(jax.random.PRNGKey(0), (C, 8, INNER // 8),
                          jnp.bfloat16)
    nbytes = C * INNER * 2

    # --- xla ceiling -----------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def xla_read(n_it):
        def body(c, _):
            sl = jax.lax.dynamic_slice(
                x, (c.astype(jnp.int32) * 0, 0, 0), (C, 8, INNER // 8)
            )
            return c + jnp.sum(sl.astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_it)
        return c

    # --- pallas auto pipeline -------------------------------------------
    def auto_kernel(x_ref, o_ref, acc_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            acc_ref[:, :] = jnp.zeros((1, 1), jnp.float32)

        acc_ref[:, :] += jnp.sum(x_ref[:, :, :128].astype(jnp.float32))[None, None]

        @pl.when(g == C // cps - 1)
        def _():
            o_ref[:, :] = acc_ref[:, :]

    auto = pl.pallas_call(
        auto_kernel,
        grid=(C // cps,),
        in_specs=[pl.BlockSpec((cps, 8, INNER // 8), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
    )

    @partial(jax.jit, static_argnums=0)
    def auto_read(n_it):
        def body(c, _):
            return c + auto(x)[0, 0], None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_it)
        return c

    # --- pallas manual double-buffered DMA ------------------------------
    NSTEP = C // cps

    def manual_kernel(x_hbm, o_ref, buf, acc_ref, sem):
        g = pl.program_id(0)

        def copy(i, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * cps, cps)], buf.at[slot], sem.at[slot]
            )

        @pl.when(g == 0)
        def _():
            acc_ref[:, :] = jnp.zeros((1, 1), jnp.float32)
            copy(0, 0).start()

        @pl.when(g + 1 < NSTEP)
        def _():
            copy(g + 1, (g + 1) % 2).start()

        copy(g, g % 2).wait()
        acc_ref[:, :] += jnp.sum(buf[g % 2, :, :, :128].astype(jnp.float32))[None, None]

        @pl.when(g == NSTEP - 1)
        def _():
            o_ref[:, :] = acc_ref[:, :]

    manual = pl.pallas_call(
        manual_kernel,
        grid=(NSTEP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, cps, 8, INNER // 8), jnp.bfloat16),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
    )

    @partial(jax.jit, static_argnums=0)
    def manual_read(n_it):
        def body(c, _):
            return c + manual(x)[0, 0], None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_it)
        return c

    fns = {"xla": xla_read, "auto": auto_read, "manual": manual_read}
    for name, fn in fns.items():
        np.asarray(fn(2))  # compile
    for _ in range(args.reps):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(args.iters))
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:7s} {dt*1e3:7.3f} ms  {nbytes/dt/1e9:5.0f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
