"""Isolate the A-stream HBM->VMEM rate question (ROADMAP: matvec DMA).

The banded matvec's parts=none probe (stream A, almost no compute) runs well
below the ~560-620 GB/s a plain XLA reduction achieves over the same bytes.
This tool measures pure streaming kernels over an array shaped exactly like
the production A blocks, to find which mechanism recovers the XLA rate:

  xla        jnp.max of the array (the 560-620 GB/s reference)
  block      auto-pipelined BlockSpec stream, grid (C/cps,) - current pattern
  block2     same but A split into two arrays (imrr / bq) - 2 DMA queues
  manual<K>  A in ANY memory space; K-deep manual make_async_copy pipeline
  multi<K,F> manual K-deep pipeline where each block is fetched as F
             DISJOINT async copies (split on the column axis) with their
             own semaphores - probes whether parallel DMAs aggregate past
             the single-copy ~320 GB/s ceiling

Every kernel takes a (8, 128) carry that feeds the next call so XLA cannot
hoist the (otherwise loop-invariant) call out of the timing scan.

Run alone (one TPU process at a time): python tools/bench_dma.py
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=216, help="columns")
    ap.add_argument("--s", type=int, default=576, help="slots per column")
    ap.add_argument("--w5", type=int, default=640, help="5*W lane width")
    ap.add_argument("--cps", default="4,8", help="comma list")
    ap.add_argument("--depth", default="4", help="manual pipeline depths")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    C, S, W5 = args.c, args.s, args.w5
    shape = (1, C, 2, S, W5)
    nbytes = int(np.prod(shape)) * 2
    print(f"A shape {shape} bf16 = {nbytes/1e9:.3f} GB", flush=True)
    rng = np.random.default_rng(0)
    a_np = rng.normal(size=shape).astype(np.float32)
    a = jnp.asarray(a_np, jnp.bfloat16)
    carry0 = jnp.zeros((8, 128), jnp.float32)

    def timed(label, fn, *xs):
        out = fn(*xs)                      # compile
        jax.block_until_ready(out)
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*xs)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"  [{label}] {dt*1e3:.3f} ms  {nbytes/dt/1e9:.0f} GB/s",
                  flush=True)

    def chained(call):
        @jax.jit
        def many(a):
            def body(carry, _):
                return call(a, carry), None
            acc, _ = jax.lax.scan(body, carry0, None, length=args.iters)
            return acc
        return many

    # --- xla reference ---------------------------------------------------
    @jax.jit
    def xla_reduce(a):
        def body(carry, _):
            return carry * 0.5 + jnp.max(a.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, carry0, None, length=args.iters)
        return acc

    timed("xla", xla_reduce, a)

    # --- auto-pipelined BlockSpec stream ---------------------------------
    def block_kernel(a_ref, c_ref, o_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[:, :] = c_ref[:, :] * 0.5

        o_ref[:, :] += a_ref[0, 0, 0, 0:8, 0:128].astype(jnp.float32)

    def make_block(cps):
        call = pl.pallas_call(
            block_kernel,
            grid=(C // cps,),
            in_specs=[
                pl.BlockSpec((1, cps, 2, S, W5), lambda g: (0, g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2 ** 20,
            ),
        )
        return chained(call)

    # --- split into two arrays (two DMA queues) --------------------------
    def block2_kernel(a_ref, b_ref, c_ref, o_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[:, :] = c_ref[:, :] * 0.5

        o_ref[:, :] += (
            a_ref[0, 0, 0:8, 0:128].astype(jnp.float32)
            + b_ref[0, 0, 0:8, 0:128].astype(jnp.float32)
        )

    def make_block2(cps):
        spec = pl.BlockSpec((1, cps, S, W5), lambda g: (0, g, 0, 0),
                            memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            block2_kernel,
            grid=(C // cps,),
            in_specs=[spec, spec, pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 2 ** 20,
            ),
        )

        @jax.jit
        def many(a):
            a1 = a[:, :, 0]
            a2 = a[:, :, 1]
            def body(carry, _):
                return call(a1, a2, carry), None
            acc, _ = jax.lax.scan(body, carry0, None, length=args.iters)
            return acc
        return many

    # --- manual K-deep pipeline ------------------------------------------
    def manual_kernel(a_ref, c_ref, o_ref, buf_ref, sem_ref, *, cps, depth):
        nsteps = C // cps

        def fetch(step, slot):
            pltpu.make_async_copy(
                a_ref.at[0, pl.ds(step * cps, cps)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            ).start()

        for k in range(min(depth, nsteps)):    # prime the pipeline
            fetch(k, k)

        def body(step, acc):
            slot = jax.lax.rem(step, depth)
            pltpu.make_async_copy(
                a_ref.at[0, pl.ds(step * cps, cps)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            ).wait()
            acc = acc + buf_ref[slot, 0, 0, 0:8, 0:128].astype(jnp.float32)
            nxt = step + depth

            @pl.when(nxt < nsteps)
            def _():
                fetch(nxt, slot)
            return acc

        o_ref[:, :] = jax.lax.fori_loop(0, nsteps, body, c_ref[:, :] * 0.5)

    def make_manual(cps, depth):
        call = pl.pallas_call(
            functools.partial(manual_kernel, cps=cps, depth=depth),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((depth, cps, 2, S, W5), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 2 ** 20,
            ),
        )
        return chained(call)

    # --- manual pipeline, F parallel copies per block ---------------------
    def multi_kernel(a_ref, c_ref, o_ref, buf_ref, sem_ref, *,
                     cps, depth, fan):
        nsteps = C // cps
        sub = cps // fan

        def fetch(step, slot):
            for f in range(fan):
                pltpu.make_async_copy(
                    a_ref.at[0, pl.ds(step * cps + f * sub, sub)],
                    buf_ref.at[slot, pl.ds(f * sub, sub)],
                    sem_ref.at[slot, f],
                ).start()

        for k in range(min(depth, nsteps)):
            fetch(k, k)

        def body(step, acc):
            slot = jax.lax.rem(step, depth)
            for f in range(fan):
                pltpu.make_async_copy(
                    a_ref.at[0, pl.ds(step * cps + f * sub, sub)],
                    buf_ref.at[slot, pl.ds(f * sub, sub)],
                    sem_ref.at[slot, f],
                ).wait()
            acc = acc + buf_ref[slot, 0, 0, 0:8, 0:128].astype(jnp.float32)
            nxt = step + depth

            @pl.when(nxt < nsteps)
            def _():
                fetch(nxt, slot)
            return acc

        o_ref[:, :] = jax.lax.fori_loop(0, nsteps, body, c_ref[:, :] * 0.5)

    def make_multi(cps, depth, fan):
        call = pl.pallas_call(
            functools.partial(multi_kernel, cps=cps, depth=depth, fan=fan),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((depth, cps, 2, S, W5), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((depth, fan)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 2 ** 20,
            ),
        )
        return chained(call)

    for cps in (int(x) for x in args.cps.split(",")):
        timed(f"block cps={cps}", make_block(cps), a)
    for cps in (int(x) for x in args.cps.split(",")):
        timed(f"block2 cps={cps}", make_block2(cps), a)
    for cps in (int(x) for x in args.cps.split(",")):
        for depth in (int(x) for x in args.depth.split(",")):
            vmem = depth * cps * 2 * S * W5 * 2
            if vmem > 90 * 2 ** 20:
                print(f"  [manual cps={cps} d={depth}] skipped (vmem)",
                      flush=True)
                continue
            timed(f"manual cps={cps} d={depth}", make_manual(cps, depth), a)
    for cps in (int(x) for x in args.cps.split(",")):
        for depth in (int(x) for x in args.depth.split(",")):
            vmem = depth * cps * 2 * S * W5 * 2
            if vmem > 90 * 2 ** 20:
                continue
            for fan in (2, 4):
                if cps % fan:
                    continue
                timed(f"multi cps={cps} d={depth} f={fan}",
                      make_multi(cps, depth, fan), a)


if __name__ == "__main__":
    main()
