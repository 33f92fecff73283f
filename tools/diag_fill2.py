"""Structure of the _fill_cells_pallas hardware mismatch: ramp source data,
print which (cell, slot) entries disagree with the scatter fill."""

import numpy as np


def main():
    import jax.numpy as jnp
    from pse_tpu.cellbins import (
        _cell_starts_counts, _fill_cells_pallas, _scatter_fields,
    )

    rng = np.random.default_rng(3)
    c_total, cap, n = 16, 128, 1600
    cid = np.sort(rng.integers(0, c_total, size=n)).astype(np.int32)
    # ramp: row r of slot k holds 1000*r + source index
    pos_sorted = (np.arange(n)[None, :] + 1000.0 * np.arange(3)[:, None]
                  ).astype(np.float32)
    order = np.arange(n).astype(np.int32)
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
    print("overflow:", bool(ov), " starts:", np.asarray(starts)[:8],
          flush=True)
    kx, sx = np.asarray(k[0]), np.asarray(s[0])
    bad = np.argwhere(kx != sx)
    print(f"mismatching slots: {len(bad)} / {kx.size}", flush=True)
    for (c, j) in bad[:20]:
        print(f"  cell {c} slot {j} (start {int(np.asarray(starts)[c])}, "
              f"count {int(np.asarray(counts)[c])}): kernel {kx[c, j]:.0f} "
              f"expected {sx[c, j]:.0f}", flush=True)
    if len(bad):
        js = bad[:, 1]
        print("slot%128 histogram of mismatches:",
              np.bincount(js % 128, minlength=128).nonzero()[0][:32],
              flush=True)


if __name__ == "__main__":
    main()
