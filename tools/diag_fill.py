"""Probe _fill_cells_pallas on REAL TPU across (c_total, cap) shapes vs the
XLA scatter fill.  Small compiles; one TPU process."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pse_tpu.cellbins import (
        _cell_starts_counts, _fill_cells_pallas, _scatter_fields,
    )

    rng = np.random.default_rng(7)
    for (c_total, cap, n) in [
        (35, 224, 5300),      # the broken bin_columns gate config
        (40, 224, 5300),      # cpg=8
        (35, 128, 5300),      # 128-multiple cap, cpg=1
        (36, 224, 5300),      # cpg=4
        (1000, 64, 50000),    # bin_particles-like
    ]:
        mu = n / c_total
        cid = np.sort(rng.integers(0, c_total, size=n)).astype(np.int32)
        pos_sorted = rng.normal(size=(3, n)).astype(np.float32)
        order = rng.permutation(n).astype(np.int32)
        sorted_cid = jnp.asarray(cid)
        starts, counts, rank_sorted, ov = _cell_starts_counts(
            sorted_cid, c_total, cap
        )
        k = _fill_cells_pallas(
            jnp.asarray(pos_sorted), jnp.asarray(order), starts, counts,
            c_total, cap, n,
        )
        s = _scatter_fields(
            jnp.asarray(pos_sorted.T), jnp.asarray(order), sorted_cid,
            jnp.minimum(rank_sorted, cap - 1), c_total, cap,
        )
        ds = []
        for ka, sa in zip(k, s):
            ds.append(float(jnp.max(jnp.abs(
                ka.astype(jnp.float32) - sa.astype(jnp.float32)))))
        print(f"C={c_total} cap={cap} n={n} overflow={bool(ov)}: "
              f"px {ds[0]:.2e} py {ds[1]:.2e} pz {ds[2]:.2e} "
              f"mask {ds[3]:.2e} pid {ds[4]:.2e}", flush=True)


if __name__ == "__main__":
    main()
