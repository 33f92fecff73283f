"""Isolate an on-TPU gate failure: which uncommitted piece disagrees?

Runs, in ONE TPU process at the bench gate's config (n=5300, L=40, xi=0.5):
  1. gather-engine mobility (pure XLA scatter/gather — the oracle),
  2. blocked-engine mobility (exercises the _fill_cells_pallas binning),
  3. banded-engine mobility (binning + build/matvec Mosaic kernels),
  4. the banded Pallas matvec vs the pure-XLA banded reference matvec on
     the SAME bins (isolates the kernels from the binning),
  5. _fill_cells_pallas vs _scatter_fields on the banded ff bins directly.
"""

import numpy as np


def rel(u, v):
    import jax.numpy as jnp

    return float(jnp.max(jnp.abs(u - v)) / jnp.max(jnp.abs(v)))


def main():
    import jax
    import jax.numpy as jnp
    import pse_tpu as pse
    from pse_tpu import integrator
    from pse_tpu.box import make_box
    from pse_tpu.cellbins import (
        _cell_starts_counts, _fill_cells_pallas, _scatter_fields,
        bin_columns, bin_particles,
    )
    from pse_tpu.ops import banded_nearfield as bdn
    from pse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n, L = 5300, 40.0
    rng = np.random.default_rng(42)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    forces = rng.normal(size=(n, 3)).astype(np.float32)
    params = pse.make_params(xi=0.5, error=1e-3, L=L)

    cfg_g = integrator.make_config(params, n, thermal=False, engine="gather")
    u_g, _ = integrator.mobility(cfg_g, pos, forces)
    u_g = np.asarray(u_g)
    print("gather done", flush=True)

    cfg_d = integrator.make_config(params, n, thermal=False, engine="blocked")
    u_d, _ = integrator.mobility(cfg_d, pos, forces)
    print(f"blocked vs gather rel err {rel(jnp.asarray(u_d), u_g):.3e}",
          flush=True)

    cfg_b = integrator.make_config(params, n, thermal=False, engine="banded")
    u_b, _ = integrator.mobility(cfg_b, pos, forces)
    print(f"banded  vs gather rel err {rel(jnp.asarray(u_b), u_g):.3e}",
          flush=True)

    # --- step 4: kernels vs XLA reference on identical bins -------------
    bs = cfg_b.band_spec
    box = make_box(params.L, 0.0)
    bins = bin_columns(jnp.asarray(pos), box, bs.bins)
    jz_full = bdn.compute_windows(bins, bs, box, params.ewald_cut)
    j0f, nvf, ovf, zshf = jz_full
    print(f"band overflow={bool(ovf)}", flush=True)
    cells = jnp.zeros((3, bs.bins.n_cells[0] * bs.bins.n_cells[1],
                       bs.bins.cap), jnp.float32)
    from pse_tpu.cellbins import vec_to_cells

    cells = vec_to_cells(bins, bs.bins, jnp.asarray(forces))
    u_ref = bdn.matvec_banded_reference(
        bins, jnp.asarray(0.0, jnp.float32), bs, cfg_b.cheb, params.L,
        params.ewald_cut, params.ewald_dr, j0f, nvf, cells,
        params.self_mobility,
    )
    blocks, pcyc = bdn.build_banded_blocks(
        bins, jnp.asarray(0.0, jnp.float32), bs, cfg_b.cheb, params.L,
        params.ewald_cut, params.ewald_dr, j0f, nvf, zshf,
    )
    ownp = bdn.make_own_pos(bins, bs)
    u_pal = bdn.matvec_banded(
        blocks, pcyc, ownp, j0f, nvf, zshf, bs, cells,
        params.self_mobility, params.L,
    )
    print(f"pallas matvec vs XLA reference rel err "
          f"{rel(u_pal, u_ref):.3e}", flush=True)
    # per-offset overflow attribution: which offsets' bands exceed W-8?
    import jax.numpy as _j
    W = bs.window
    for k_off, (ox, oy) in enumerate(bs.offsets):
        j0k, nvk, ovk, zshk = bdn.compute_windows(
            bins, bs, box, params.ewald_cut, offsets=((ox, oy),)
        )
        print(f"  offset {k_off} ({ox},{oy}): overflow={bool(ovk)}",
              flush=True)

    # --- step 5: the binning kernel vs the scatter fill ------------------
    spec = bs.bins
    from pse_tpu.box import make_fraction

    # reproduce bin_columns' sort inputs
    frac = make_fraction(box, jnp.asarray(pos))
    frac = frac - jnp.floor(frac)
    ncx, ncy, ncz = spec.n_cells
    nc = jnp.array([ncx, ncy], dtype=jnp.float32)
    cxy = jnp.clip(jnp.floor(frac[:, :2] * nc).astype(jnp.int32), 0,
                   jnp.array([ncx - 1, ncy - 1], jnp.int32))
    cid = cxy[:, 0] * ncy + cxy[:, 1]
    arange = jnp.arange(n, dtype=jnp.int32)
    z_c = jnp.asarray(pos)[:, 2]
    sorted_cid, sz, order, sx, sy = jax.lax.sort(
        (cid, z_c, arange, jnp.asarray(pos)[:, 0], jnp.asarray(pos)[:, 1]),
        num_keys=3,
    )
    c_total = ncx * ncy
    starts, counts, rank_sorted, ov = _cell_starts_counts(
        sorted_cid, c_total, spec.cap
    )
    k = _fill_cells_pallas(
        jnp.stack([sx, sy, sz], axis=0), order, starts, counts,
        c_total, spec.cap, n,
    )
    s = _scatter_fields(
        jnp.stack([sx, sy, sz], axis=1), order, sorted_cid,
        jnp.minimum(rank_sorted, spec.cap - 1), c_total, spec.cap,
    )
    names = ["px", "py", "pz", "mask", "pid"]
    for nm, ka, sa in zip(names, k, s):
        d = float(jnp.max(jnp.abs(ka.astype(jnp.float32)
                                  - sa.astype(jnp.float32))))
        print(f"fill {nm}: max abs diff {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
