"""Mismatch structure of _fill_cells_pallas across the configs that failed
in diag_fill: ramp payloads, per-config mismatch slot listing."""

import numpy as np


def main():
    import jax.numpy as jnp
    from pse_tpu.cellbins import (
        _cell_starts_counts, _fill_cells_pallas, _scatter_fields,
    )

    rng = np.random.default_rng(7)
    for (c_total, cap, n) in [
        (35, 224, 5300),
        (35, 128, 5300),
        (16, 128, 5300),
        (16, 224, 1600),
        (1000, 64, 50000),
    ]:
        cid = np.sort(rng.integers(0, c_total, size=n)).astype(np.int32)
        pos_sorted = (np.arange(n)[None, :] + 1e6 * np.arange(3)[:, None]
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
        kx, sx = np.asarray(k[0]), np.asarray(s[0])
        bad = np.argwhere(kx != sx)
        st = np.asarray(starts)
        print(f"C={c_total} cap={cap} n={n} ovf={bool(ov)}: "
              f"bad {len(bad)}/{kx.size}", flush=True)
        for (c, j) in bad[:12]:
            print(f"  cell {c} slot {j} (s0 {int(st[c])} s0%128 "
                  f"{int(st[c]) % 128} cnt {int(np.asarray(counts)[c])}): "
                  f"kernel {kx[c, j]:.0f} expected {sx[c, j]:.0f}",
                  flush=True)
        if len(bad):
            cells_bad = np.unique(bad[:, 0])
            print(f"  cells with mismatch: {len(cells_bad)} "
                  f"{cells_bad[:16]}", flush=True)


if __name__ == "__main__":
    main()
