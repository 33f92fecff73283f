"""Generate tests/data/oracle_gate.npz — the float64 direct-Ewald reference
for bench.py's end-to-end on-TPU oracle gate (VERDICT r4 item 6).

The six engine-vs-engine gate checks bound kernel-vs-kernel agreement, but
the COMPOSED on-hardware error (bf16 A blocks + bf16 far-field weights +
MXU matmul-DFTs) vs the physics was only ever measured through the CPU
suite.  This file pins one direct measurement: U = M·F for a dense-ish
random config, summed in float64 with exact (untabulated) pair functions
and an explicit k-lattice wave sum (tests/oracles.py), cached so the gate
costs one mobility call, not an O(N²) host sum.

Run ONCE on CPU (takes a few minutes at n=2048):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_oracle_gate.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

N = 2048
PHI = 0.45
XI = 0.5
SEED = 13
PATH = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                    "oracle_gate.npz")


def main():
    from bench import make_positions
    import oracles

    pos, L = make_positions(N, PHI, seed=SEED)
    rng = np.random.default_rng(SEED + 1)
    forces = rng.normal(size=(N, 3)).astype(np.float32)

    t0 = time.time()
    u_ref = oracles.direct_ewald_velocity(
        pos.astype(np.float64), forces.astype(np.float64),
        (L, L, L), XI,
    )
    print(f"oracle sum: {time.time() - t0:.1f}s")

    os.makedirs(os.path.dirname(PATH), exist_ok=True)
    np.savez_compressed(
        PATH, pos=pos.astype(np.float32), forces=forces,
        u_ref=u_ref.astype(np.float64), L=np.float64(L), xi=np.float64(XI),
        n=np.int64(N), phi=np.float64(PHI),
    )
    print(f"wrote {PATH}: n={N} L={L} xi={XI} "
          f"|u|={np.linalg.norm(u_ref):.6e}")


if __name__ == "__main__":
    main()
