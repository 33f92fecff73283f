"""End-to-end statistical physics validation (SURVEY §4.4).

These are the integration-level oracles the reference relied on its paper
for: the full thermal step must reproduce known equilibrium/transport
physics, not just operator identities.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import pse_tpu as pse
from pse_tpu import box as boxlib


@pytest.mark.parametrize("engine", ["gather", "blocked"])
def test_dilute_self_diffusion(engine):
    """Per-step displacement variance of a dilute thermal suspension matches
    2·D·dt with the periodic-corrected self-diffusion
    D = kT·(1 − 2.837297 a/L + ...) (Hasimoto correction; units 6πηa = a = 1).

    Per-step increments are independent (Euler-Maruyama is memoryless), so
    N·steps·3 ≈ 5e4 square samples give ~1% statistics; E[x²] is unbiased by
    inter-particle correlations.  Runs through BOTH engines so the production
    (blocked + thermal) configuration has end-to-end physics evidence.
    """
    N_side, L, dt, T = 3, 30.0, 5e-3, 1.0
    n = N_side ** 3
    n_steps = 600

    sim = pse.Simulation(
        positions=pse.create_lattice(N_side, L), L=L, dt=dt, sync_every=1
    )
    sim.set_integrator(
        pse.integrate.PSEv1(T=T, seed=7, xi=0.5, error=1e-3),
        verbose=False, engine=engine,
    )
    assert sim.config.engine == engine
    traj = [np.asarray(boxlib.unwrap(sim.box, sim.state.pos, sim.state.images))]

    def collect(s):
        traj.append(
            np.asarray(boxlib.unwrap(s.box, s.state.pos, s.state.images))
        )

    sim.run(n_steps, callback=collect)
    steps = np.diff(np.stack(traj), axis=0)        # (n_steps, n, 3)
    var = (steps ** 2).mean()
    d_meas = var / (2.0 * dt)

    d_expected = T * 1.0 * (1.0 - 2.837297 / L)
    rel = abs(d_meas - d_expected) / d_expected
    assert rel < 0.05, f"D={d_meas:.4f} vs {d_expected:.4f} (rel {rel:.3f})"


def test_harmonic_trap_equilibrium():
    """Particles in a harmonic trap equilibrate to Boltzmann variance kT/k
    (validates the fluctuation-dissipation balance of drift vs noise)."""
    n, L, dt, T, k_spring = 27, 25.0, 2e-3, 0.8, 2.0
    # relaxation time tau = 1/(k·M) ≈ 250 steps: burn 4 tau, sample 8 tau
    n_steps, burn = 2000, 1000

    # One trap per particle, centers 8.3a apart: hydrodynamic coupling is
    # weak, so every mode relaxes at ~tau.  (A tight overlapping cluster
    # would NOT equilibrate: RPY relative mobility vanishes at contact and
    # the relative modes freeze.)
    import jax.numpy as jnp
    centers = jnp.asarray(pse.create_lattice(3, L))
    force_fn = lambda p, t: -k_spring * (p - centers)

    sim = pse.Simulation(
        positions=np.asarray(centers), L=L, dt=dt,
        force_fn=force_fn, sync_every=100,
    )
    sim.set_integrator(
        pse.integrate.PSEv1(T=T, seed=11, xi=0.5, error=1e-3),
        verbose=False, engine="gather",
    )
    sim.run(burn)
    samples = []

    def collect(s):
        samples.append(np.asarray(s.state.pos).copy())

    sim.run(n_steps, callback=collect)
    centers_np = np.asarray(centers)
    pos = np.concatenate([s - centers_np for s in samples], axis=0)
    var = (pos ** 2).mean()

    # Euler-Maruyama with mobility M has stationary variance
    # kT/k · 1/(1 − k·M·dt/2) per component; the correction is tiny here.
    expected = T / k_spring
    rel = abs(var - expected) / expected
    assert rel < 0.15, f"var={var:.4f} vs {expected:.4f} (rel {rel:.3f})"


def test_custom_shear_function_subclass():
    """User-defined ShearFunction subclasses drive the integrator
    (ShearFunctionWrap trampoline parity, ShearFunctionWrap.h:21-38)."""

    class RampShear(pse.shear_function.ShearFunction):
        offset = 0

        def shear_rate(self, timestep):
            return 1e-3 * timestep

        def strain(self, timestep):
            return 0.5e-3 * timestep ** 2 * 1e-3

    sim = pse.Simulation(positions=pse.create_lattice(3, 20.0), L=20.0, dt=1e-3)
    sim.set_integrator(
        pse.integrate.PSEv1(T=0.0, seed=0, xi=0.5, error=1e-3,
                            function_form=RampShear()),
        verbose=False, engine="gather",
    )
    sim.run(5)
    assert int(sim.state.step) == 5


def test_temperature_variant_ramp():
    """T may be a function of the timestep (HOOMD Variant parity)."""
    T_fn = lambda t: 0.5 + 0.5 * jnp.minimum(t / 10.0, 1.0)
    sim = pse.Simulation(positions=pse.create_lattice(3, 20.0), L=20.0, dt=1e-3)
    sim.set_integrator(
        pse.integrate.PSEv1(T=T_fn, seed=2, xi=0.5, error=1e-3),
        verbose=False, engine="gather",
    )
    p0 = np.asarray(sim.state.pos).copy()
    sim.run(8)
    assert np.abs(np.asarray(sim.state.pos) - p0).max() > 1e-4
