"""Validate the halo engine's PALLAS branch on real TPU hardware.

The CPU suite's test_halo pins the halo engine against the single-chip
engine only through the pure-XLA reference path (off-TPU the Pallas
kernels never run), and the driver's dryrun uses virtual CPU devices — so
the halo TPU branch (shard_map'd build_mv_banded + matvec_banded on the
extended slab) was never EXECUTED anywhere before this tool.

With one real chip we can still run it: a 1-device mesh makes every
ppermute a self-loop while exercising the full shard-local kernel path
(extended slab, seam shifts, halo slicing).  Equality vs the single-chip
banded engine is to f32 roundoff (same kernels, different column-grid
arrangement changes summation order only).

Run alone (one TPU process at a time): python tools/check_halo_tpu.py
"""

import math
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.parallel import halo
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "this check needs the real TPU"

    n, phi = 20_000, 0.45
    L = (n * (4.0 / 3.0) * math.pi / phi) ** (1.0 / 3.0)
    rng = np.random.default_rng(17)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    forces = rng.normal(size=(n, 3)).astype(np.float32)

    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    config = integrator.make_config(
        params, n, thermal=True, seed=1, engine="banded", has_forces=True,
        shard_slabs=1, positions=pos,
    )
    assert config.engine == "banded"
    print(f"slab classes: {config.band_spec.slab_classes}")

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("dp",))

    # deterministic mobility: halo vs single-chip
    with mesh:
        halo_mob = halo.make_halo_mobility(config, mesh)
        u_h, ovf_h = halo_mob(pos, forces)
    u_s, ovf_s = integrator.mobility(config, pos, forces)
    assert not int(ovf_h) and not int(ovf_s)
    rel = float(jnp.max(jnp.abs(u_h - u_s)) / jnp.max(jnp.abs(u_s)))
    print(f"halo(D=1, TPU) vs single-chip mobility rel err: {rel:.2e}")
    assert rel < 1e-5, rel

    if config.band_spec.slab_classes is not None:
        # Per-shard occupancy-class packing vs the single-class halo path:
        # identical pair coefficients in a different launch decomposition.
        import dataclasses

        cfg1 = dataclasses.replace(
            config,
            band_spec=config.band_spec._replace(slab_classes=None),
        )
        with mesh:
            u_1, ovf_1 = halo.make_halo_mobility(cfg1, mesh)(pos, forces)
        assert not int(ovf_1)
        relc = float(jnp.max(jnp.abs(u_h - u_1)) / jnp.max(jnp.abs(u_1)))
        print(f"halo classes vs single-class mobility rel err: {relc:.2e}")
        assert relc < 1e-5, relc

    # one full thermal step (fuse2 path: build + M·F + first Lanczos matvec
    # in ONE shard-local fused kernel call)
    state = integrator.make_state(pos)
    with mesh:
        halo_step = halo.make_halo_step(config, mesh)
        s_h, info_h = halo_step(state, jnp.asarray(forces), 1.0, 1e-3, 0.0)
    s_s, info_s = integrator.step(config, state, jnp.asarray(forces),
                                  1.0, 1e-3, 0.0)
    dv = float(jnp.max(jnp.abs(info_h["velocities"] - info_s["velocities"])))
    dref = float(jnp.max(jnp.abs(info_s["velocities"])))
    print(f"halo(D=1, TPU) vs single-chip step velocity rel err: "
          f"{dv / dref:.2e} (m_h={int(info_h['m_lanczos'])}, "
          f"m_s={int(info_s['m_lanczos'])})")
    assert dv / dref < 1e-4, dv / dref
    assert not int(s_h.nbr_overflow)
    print("OK")


if __name__ == "__main__":
    main()
