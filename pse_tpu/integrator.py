"""The PSE Brownian-dynamics step: one jitted XLA program per timestep.

Fuses the full pipeline of the reference's hot path (SURVEY.md §3.2;
Stokes.cu:234-365 + Brownian.cu:772-923):

  neighbor rebuild → pair-coefficient precompute → [spread → FFT → Green
  (+ Hermitian wave noise) → IFFT → contract] + near-field matvec
  (+ Lanczos real-space noise) → Euler update with shear advection → PBC wrap

Design notes (TPU-first):
  * The deterministic and stochastic wave-space parts share the FFTs and the
    contraction, exactly like the fused CUDA wrapper (Brownian.cu:831-872).
  * The near-field pair coefficients are computed once and reused by the
    deterministic matvec and every Lanczos iteration.
  * Whether the thermal branch exists is a static (compile-time) choice;
    T itself stays a traced runtime value so temperature ramps don't
    recompile.
  * The Lanczos warm-start m and the RNG step counter live in the State
    pytree; randomness is keyed (seed, timestep) — bitwise reproducible per
    step regardless of history (Brownian.cu:117, 176).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .box import Box, wrap
from .neighbors import NeighborSpec, build_neighbor_list
from .params import PSEParams, gridk_arrays
from .ops import farfield, lanczos, nearfield, noise


class State(NamedTuple):
    """Integration state pytree (replaces HOOMD ParticleData for PSE needs)."""

    pos: jax.Array        # (N, 3) f32 — wrapped positions
    images: jax.Array     # (N, 3) i32 — PBC image flags
    step: jax.Array       # () i32 — timestep counter
    tilt_xy: jax.Array    # () f32 — current box xy tilt (strain)
    m_lanczos: jax.Array  # () i32 — Lanczos warm start (Stokes.h:157; init 2)
    nbr_overflow: jax.Array  # () bool — sticky neighbor-capacity overflow flag


def make_state(pos, step: int = 0, tilt_xy: float = 0.0) -> State:
    pos = jnp.asarray(pos, jnp.float32)
    return State(
        pos=pos,
        images=jnp.zeros(pos.shape, jnp.int32),
        step=jnp.asarray(step, jnp.int32),
        tilt_xy=jnp.asarray(tilt_xy, jnp.float32),
        m_lanczos=jnp.asarray(2, jnp.int32),
        nbr_overflow=jnp.asarray(False),
    )


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration baked into the compiled step."""

    params: PSEParams
    nbr_spec: NeighborSpec
    thermal: bool = True          # compile the Brownian branches (T > 0 path)
    m_max: int = 100              # Lanczos cap (Brownian.cu:397)
    seed: int = 0

    def __hash__(self):
        return hash((self.params, self.nbr_spec, self.thermal, self.m_max, self.seed))


def hash_seed(seed: int) -> int:
    """The reference's seed hash (Stokes.cc:102), for parity of spirit."""
    s = (seed * 0x12345677 + 0x12345) & 0xFFFFFFFF
    s ^= s >> 16
    s = (s * 0x45679) & 0xFFFFFFFF
    return s


def _box_of(config: StepConfig, tilt) -> Box:
    return Box(jnp.asarray(config.params.L, jnp.float32), jnp.asarray(tilt, jnp.float32))


def _pair_coeffs(config: StepConfig, pos, box):
    p = config.params
    nlist = build_neighbor_list(pos, box, config.nbr_spec)
    coeffs = nearfield.precompute_pair_coeffs(
        pos,
        nlist.idx,
        box,
        jnp.asarray(p.ewald_table),
        p.ewald_cut,
        p.ewald_dr,
        p.ewald_n,
    )
    return coeffs, nlist.overflow


@partial(jax.jit, static_argnames=("config",))
def mobility(config: StepConfig, pos, forces, tilt_xy=0.0):
    """Deterministic U = M·F — the public validation matvec
    (gpu_stokes_Mobility_wrap, Mobility.cu:729-782).

    Returns (velocities (N,3), neighbor_overflow bool).
    """
    p = config.params
    pos = jnp.asarray(pos, jnp.float32)
    forces = jnp.asarray(forces, jnp.float32)
    box = _box_of(config, tilt_xy)

    coeffs, overflow = _pair_coeffs(config, pos, box)
    u_real = nearfield.mreal_matvec(coeffs, forces, p.self_mobility)

    kvec, W = gridk_arrays(p, box.tilt_xy)
    u_wave = farfield.wave_space_velocity(pos, forces, box, p, kvec, W)
    return u_real + u_wave, overflow


@partial(jax.jit, static_argnames=("config",))
def brownian_displacement(config: StepConfig, pos, tilt_xy, step, m_start, T, dt):
    """sqrt(2T/dt)·M^{1/2}·ψ via the positive split: wave part through the
    shared FFT pipeline, real part through Lanczos.  Standalone helper for
    covariance tests; the fused step inlines the same pieces.
    """
    p = config.params
    box = _box_of(config, tilt_xy)
    key = jax.random.fold_in(
        jax.random.PRNGKey(hash_seed(config.seed)), jnp.asarray(step, jnp.int32)
    )
    k_psi, k_grid = jax.random.split(key)

    kvec, W = gridk_arrays(p, box.tilt_xy)
    noise_hat = noise.wave_space_noise_hat(k_grid, p, kvec, W, T, dt)
    taps = farfield.compute_taps(pos, box, p)
    grid_v = jnp.fft.ifftn(noise_hat, axes=(1, 2, 3)).real.astype(jnp.float32)
    u_wave = farfield.contract(taps, grid_v, p)

    coeffs, overflow = _pair_coeffs(config, pos, box)
    psi = noise.particle_noise(k_psi, pos.shape[0])
    u_sqrt, m_used = lanczos.sqrt_mreal(
        lambda vt: nearfield.mreal_matvec_t(coeffs, vt, p.self_mobility),
        psi, p.error, m_start, config.m_max,
    )
    u_real = jnp.sqrt(2.0 * T / dt) * u_sqrt
    return u_wave + u_real, m_used, overflow


@partial(jax.jit, static_argnames=("config",))
def step(
    config: StepConfig,
    state: State,
    forces: jax.Array,
    T,
    dt,
    shear_rate,
    new_tilt=None,
):
    """Advance one Euler-Maruyama step (Stokes.cu:137-192 update semantics).

    Args:
      forces: (N, 3) external/interparticle forces at the current positions.
      T: temperature (traced; the thermal *branch* is config.thermal).
      dt: timestep.
      shear_rate: current shear rate γ̇(t) — adds affine velocity γ̇·y x̂.
      new_tilt: next-step box tilt (wrapped strain); None keeps the current.

    Returns (new_state, info dict with velocities / overflow / m_lanczos).
    """
    p = config.params
    pos = state.pos
    box = _box_of(config, state.tilt_xy)
    n = pos.shape[0]
    T = jnp.asarray(T, jnp.float32)
    dt = jnp.asarray(dt, jnp.float32)

    key = jax.random.fold_in(
        jax.random.PRNGKey(hash_seed(config.seed)), state.step
    )
    k_psi, k_grid = jax.random.split(key)

    # --- neighbor structures + pair coefficients (shared by everything) ----
    coeffs, overflow = _pair_coeffs(config, pos, box)

    # --- wave space: spread -> FFT -> Green (+noise) -> IFFT -> contract ---
    kvec, W = gridk_arrays(p, box.tilt_xy)
    taps = farfield.compute_taps(pos, box, p)
    grid = farfield.spread(taps, forces, p)
    ghat = jnp.fft.fftn(grid.astype(jnp.complex64), axes=(1, 2, 3))
    ghat = farfield.apply_green(ghat, kvec, W)
    if config.thermal:
        ghat = ghat + noise.wave_space_noise_hat(k_grid, p, kvec, W, T, dt)
    grid_v = jnp.fft.ifftn(ghat, axes=(1, 2, 3)).real.astype(jnp.float32)
    u = farfield.contract(taps, grid_v, p)

    # --- real space: deterministic matvec (+ Lanczos noise) ---------------
    u = u + nearfield.mreal_matvec(coeffs, forces, p.self_mobility)

    m_used = state.m_lanczos
    if config.thermal:
        psi = noise.particle_noise(k_psi, n)
        u_sqrt, m_used = lanczos.sqrt_mreal(
            lambda vt: nearfield.mreal_matvec_t(coeffs, vt, p.self_mobility),
            psi,
            p.error,
            state.m_lanczos,
            config.m_max,
        )
        u = u + jnp.sqrt(2.0 * T / dt) * u_sqrt

    # --- Euler update with shear advection + PBC wrap ---------------------
    vel = u.at[:, 0].add(jnp.asarray(shear_rate, jnp.float32) * pos[:, 1])
    new_pos = pos + vel * dt

    tilt = state.tilt_xy if new_tilt is None else jnp.asarray(new_tilt, jnp.float32)
    new_box = _box_of(config, tilt)
    new_pos, new_images = wrap(new_box, new_pos, state.images)

    new_state = State(
        pos=new_pos,
        images=new_images,
        step=state.step + 1,
        tilt_xy=tilt,
        m_lanczos=jnp.asarray(m_used, jnp.int32),
        nbr_overflow=state.nbr_overflow | overflow,
    )
    info = {"velocities": vel, "nbr_overflow": overflow, "m_lanczos": m_used}
    return new_state, info
