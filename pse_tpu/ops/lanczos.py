"""Lanczos square root of the near-field mobility: u = M_real^{1/2} · ψ.

Chow & Saad Krylov sampling (SIAM J. Sci. Comput. 36(2), A588), re-designed
for XLA from the host-driven loop of gpu_stokes_BrealLanczos_wrap
(Brownian.cu:357-765):

  * the reference round-trips two scalars to the host and calls
    LAPACKE_spteqr per iteration; here the whole adaptive iteration is ONE
    on-device ``lax.while_loop`` with a jnp.linalg.eigh of the (zero-padded)
    tridiagonal each round — no host sync anywhere.
  * the zero-padding trick: the m_max×m_max tridiagonal with α, β beyond the
    active m left at zero is block-diagonal [T_m ⊕ 0]; its extra eigenpairs
    have zero first component, so W·Λ^{1/2}·Wᵀe₁ computed on the padded
    matrix equals the active-block result exactly — no dynamic shapes.
  * adaptive m with warm start (reference persists m across steps,
    Stokes.h:157): at least ``max(m_start-1,1)+1`` iterations run, then
    iterations continue until the relative step norm drops below ``error``
    (Brownian.cu:604-736) or m reaches m_max (=100, Brownian.cu:397) or the
    basis collapses (‖v‖ < 1e-8, Brownian.cu:507-510).

Returns M_real^{1/2}ψ (the caller applies the thermal scale √(2T/dt),
Brownian.cu:739 keeps it inside — split out here so covariance tests read
⟨uuᵀ⟩ = M_real directly) and the converged m for the next step's warm start.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class _LanczosState(NamedTuple):
    j: jax.Array            # iterations completed
    V: jax.Array            # (m_max, 3N) basis — flat vectors (no tile pad)
    alpha: jax.Array        # (m_max,)
    beta: jax.Array         # (m_max,)  beta[i] pairs V[i-1], V[i]
    vj: jax.Array           # (3N,)
    vjm1: jax.Array         # (3N,)
    tempbeta: jax.Array     # scalar: next beta to store
    vel: jax.Array          # (3N,) current T^{1/2}e1 image
    vel_old: jax.Array      # (3N,)
    stepnorm: jax.Array     # scalar
    breakdown: jax.Array    # bool


def _dot(a, b):
    return jnp.sum(a * b)


def _sqrt_tridiag_e1(alpha, beta, m_max):
    """f = T^{1/2} e₁ for the zero-padded symmetric tridiagonal (m_max,)."""
    T = (
        jnp.diag(alpha)
        + jnp.diag(beta[1:m_max], 1)
        + jnp.diag(beta[1:m_max], -1)
    )
    lam, Q = jnp.linalg.eigh(T)
    slam = jnp.sqrt(jnp.maximum(lam, 0.0))
    return Q @ (slam * Q[0, :])


def sqrt_mreal(
    matvec_t: Callable[[jax.Array], jax.Array],
    psi: jax.Array,
    error: float,
    m_start: jax.Array,
    m_max: int = 100,
):
    """Compute (M_real^{1/2} ψ, m_used).

    ``matvec_t`` applies M_real in transposed (3, N) layout; ``psi`` is
    (N, 3).  Internally vectors are flat (3N,) so the Krylov basis carries no
    TPU tile padding.
    """
    n = psi.shape[0]
    dtype = psi.dtype
    eps_breakdown = 1e-8

    def matvec(v_flat):
        return matvec_t(v_flat.reshape(3, n)).reshape(-1)

    psi_flat = psi.T.reshape(-1)
    vnorm = jnp.sqrt(_dot(psi_flat, psi_flat))
    psinorm = vnorm
    # ψ·Mψ/‖ψ‖² (the step-norm normalizer, Brownian.cu:452-457) equals α₀ of
    # the Lanczos recurrence (v₀·Mv₀ with v₀ = ψ/‖ψ‖), so unlike the
    # reference we don't spend an extra matvec on it — the convergence check
    # reads alpha[0] once the first iteration has stored it.

    v0 = psi_flat / vnorm
    warm = jnp.clip(jnp.asarray(m_start, jnp.int32) - 1, 1, m_max - 1)

    def lanczos_iter(state: _LanczosState) -> _LanczosState:
        j = state.j
        V = jax.lax.dynamic_update_index_in_dim(state.V, state.vj, j, axis=0)
        beta = state.beta.at[j].set(state.tempbeta)

        w = matvec(state.vj) - state.tempbeta * state.vjm1
        a = _dot(state.vj, w)
        alpha = state.alpha.at[j].set(a)
        w = w - a * state.vj
        nb = jnp.sqrt(_dot(w, w))
        breakdown = nb < eps_breakdown
        vnext = w / jnp.where(breakdown, 1.0, nb)

        # The T^{1/2}e1 assembly (eigh + basis contraction) runs EVERY
        # iteration, unconditionally.  It used to sit behind a lax.cond
        # (skip until the warm-started count, like Brownian.cu:463-523), but
        # the conditional captured the (m_max, 3N) basis as an operand and
        # XLA materialized copies: measured ~0.34 ms/iteration of pure cond
        # overhead plus a doubled dynamic-update-slice — far more than the
        # ~0.15 ms the small eigh + basis read cost.  The convergence TEST
        # still honors the warm start (cond() below), so the adaptive-m
        # semantics are unchanged, breakdown truncation included
        # (Brownian.cu:507-510).
        f = _sqrt_tridiag_e1(alpha, beta, state.V.shape[0])
        vel = jnp.einsum(
            "m,mf->f", f, V, preferred_element_type=jnp.float32
        ).astype(dtype)
        psi_m_psi = alpha[0]
        stepnorm = jnp.sqrt(
            _dot(vel - state.vel_old, vel - state.vel_old) / psi_m_psi
        )

        return _LanczosState(
            j=j + 1,
            V=V,
            alpha=alpha,
            beta=beta,
            vj=vnext,
            vjm1=state.vj,
            tempbeta=nb,
            vel=vel,
            vel_old=vel,
            stepnorm=stepnorm,
            breakdown=breakdown,
        )

    def cond(state: _LanczosState):
        need_more = (state.j < warm + 1) | (state.stepnorm > error)
        return (state.j < m_max) & ~state.breakdown & need_more

    init = _LanczosState(
        j=jnp.asarray(0, jnp.int32),
        V=jnp.zeros((m_max, 3 * n), dtype),
        alpha=jnp.zeros((m_max,), dtype),
        beta=jnp.zeros((m_max,), dtype),
        vj=v0,
        vjm1=jnp.zeros_like(v0),
        tempbeta=jnp.asarray(0.0, dtype),
        vel=jnp.zeros_like(v0),
        vel_old=jnp.zeros_like(v0),
        stepnorm=jnp.asarray(jnp.inf, dtype),
        breakdown=jnp.asarray(False),
    )

    final = jax.lax.while_loop(cond, lanczos_iter, init)
    u = (final.vel * psinorm).reshape(3, n).T
    return u, final.j
