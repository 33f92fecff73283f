"""Multi-device correctness: the GSPMD-sharded step/mobility must equal the
single-device results on the 8-virtual-CPU mesh (SURVEY §4.7).

The reference is single-GPU only (Stokes.cc:104-109); multi-chip execution is
new capability, so its oracle is the single-device program itself.  GSPMD only
changes reduction/collective order, so agreement is to float32 tolerance (the
thermal path additionally runs the Lanczos while_loop whose convergence points
can shift by a ULP-level stepnorm difference — still well inside tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pse_tpu as pse
from pse_tpu import integrator
from pse_tpu.parallel import sharding as sh


@pytest.fixture(scope="module", autouse=True)
def _fresh_caches():
    """The GSPMD step is the suite's biggest XLA:CPU compile; after ~100
    accumulated jit programs the compiler segfaulted here twice (full-suite
    runs only — isolation passes).  Dropping the caches bounds compiler RSS
    before these compiles."""
    jax.clear_caches()
    yield


def _problem(engine, thermal=True, n_side=8, L=24.0, tilt=0.03, seed=0):
    n = n_side ** 3
    rng = np.random.default_rng(seed)
    pos = pse.create_lattice(n_side, L)
    pos = (pos + rng.normal(scale=0.08, size=pos.shape)).astype(np.float32)
    forces = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    params = pse.make_params(xi=0.5, error=1e-3, L=L)
    config = integrator.make_config(
        params, n, thermal=thermal, seed=1, engine=engine
    )
    assert config.engine == engine, "fixture box must support both engines"
    state = integrator.make_state(pos, tilt_xy=tilt)
    return config, state, forces


def _mesh():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provision 8 virtual CPU devices"
    return sh.make_mesh(devices[:8])


@pytest.mark.parametrize("engine", ["blocked", "gather"])
@pytest.mark.parametrize("thermal", [True, False])
def test_sharded_step_matches_single_device(engine, thermal):
    config, state, forces = _problem(engine, thermal=thermal)
    T, dt, rate, new_tilt = 1.0, 1e-3, 0.2, 0.031

    ref_state, ref_info = integrator.step(
        config, state, forces, jnp.float32(T), jnp.float32(dt),
        jnp.float32(rate), jnp.float32(new_tilt),
    )

    mesh = _mesh()
    sstate = sh.shard_state(state, mesh)
    sforces = jax.device_put(forces, sh.particle_sharding(mesh))
    step_fn = sh.make_sharded_step(config, mesh)
    out_state, out_info = step_fn(sstate, sforces, T, dt, rate, new_tilt=new_tilt)

    assert not bool(out_state.nbr_overflow)
    assert int(out_state.step) == int(state.step) + 1
    np.testing.assert_allclose(
        np.asarray(out_state.pos), np.asarray(ref_state.pos), atol=2e-5
    )
    scale = np.abs(np.asarray(ref_info["velocities"])).max()
    np.testing.assert_allclose(
        np.asarray(out_info["velocities"]),
        np.asarray(ref_info["velocities"]),
        atol=5e-4 * scale,
    )


@pytest.mark.parametrize("engine", ["blocked", "gather"])
def test_sharded_mobility_matches_single_device(engine):
    config, state, forces = _problem(engine, thermal=False, tilt=0.05)

    u_ref, ov_ref = integrator.mobility(config, state.pos, forces, state.tilt_xy)
    assert not bool(ov_ref)

    mesh = _mesh()
    ps = sh.particle_sharding(mesh)
    pos_s = jax.device_put(state.pos, ps)
    forces_s = jax.device_put(forces, ps)
    mob = sh.make_sharded_mobility(config, mesh)
    u, ov = mob(pos_s, forces_s, float(state.tilt_xy))

    assert not bool(ov)
    scale = np.abs(np.asarray(u_ref)).max()
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(u_ref), atol=1e-5 * scale + 1e-7
    )
