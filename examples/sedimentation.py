"""BASELINE config 2: deterministic mobility (kT=0) sedimentation.

N=10k particles under a uniform body force; the velocity field is U = M·F.
Validates the deterministic path at scale and demonstrates the public
mobility matvec (gpu_stokes_Mobility_wrap analogue).
"""

import numpy as np
import jax.numpy as jnp

import pse_tpu as pse
from pse_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, L, dt = 10_000, 64.0, 1e-3
rng = np.random.default_rng(0)
positions = rng.uniform(-L / 2, L / 2, size=(N, 3)).astype(np.float32)

gravity = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (N, 1))

sim = pse.Simulation(
    positions=positions, L=L, dt=dt, force_fn=lambda p, t: gravity,
    sync_every=20,
)
sim.set_integrator(pse.integrate.PSEv1(T=0.0, seed=0, xi=0.5, error=1e-3))

# One-shot mobility matvec: mean sedimentation velocity of the suspension
u = np.asarray(sim.mobility_matvec(gravity))
print(f"mean settling velocity: {u[:, 2].mean():.4f} (spread {u[:, 2].std():.4f})")

sim.run(100)
s = sim.snapshot()
print(f"ran to step {s['step']}; mean z-displacement "
      f"{(s['pos'][:, 2] - positions[:, 2]).mean():.4f}")
