"""Fixed- and adaptive-step batched ODE integrators.

The reference integrates its ODE models with MATLAB ode45 by *stacking*
all samples into one big state vector (PP_loglikelihood.m:7-9,
lorenz_ll.m:5) — adaptive stepping with data-dependent step counts.  On
TPU the shape-static formulation is either

* a fixed-step Runge-Kutta scan over a batched state (every sample
  advances in lockstep, XLA fuses each stage, the whole likelihood jits
  once; step counts chosen to match the reference's tolerances), or
* the adaptive Dormand-Prince 5(4) pair with a PI step controller in a
  bounded ``lax.while_loop`` (``integrate_adaptive``): each sample row
  carries its own (t, dt) and accepts/shrinks by the embedded error
  estimate against RelTol/AbsTol — the error-controlled semantics of
  ode45 (RelTol 1e-6, PP_loglikelihood.m:7-9) with static shapes.
  Per-row control is *stronger* than the reference's stacked-system
  control (one global dt driven by the worst row).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["rk4", "dopri5_step", "integrate_to", "integrate_observed",
           "integrate_adaptive", "integrate_observed_adaptive"]


def rk4(rhs: Callable, y, t, dt):
    """One classic RK4 step on a batched state y (M, n)."""
    k1 = rhs(t, y)
    k2 = rhs(t + 0.5 * dt, y + 0.5 * dt * k1)
    k3 = rhs(t + 0.5 * dt, y + 0.5 * dt * k2)
    k4 = rhs(t + dt, y + dt * k3)
    return y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


# Dormand-Prince 5(4) coefficients (the ode45 tableau), fixed-step use.
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
)
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0)
_DP_B = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84)


def dopri5_step(rhs: Callable, y, t, dt):
    """One fixed-size Dormand-Prince (ode45) step; 5th-order solution."""
    ks = []
    for i in range(6):
        yi = y
        for aij, kj in zip(_DP_A[i], ks):
            yi = yi + dt * aij * kj
        ks.append(rhs(t + _DP_C[i] * dt, yi))
    out = y
    for bi, ki in zip(_DP_B, ks):
        out = out + dt * bi * ki
    return out


def integrate_to(rhs: Callable, y0, t0: float, t1: float, steps: int,
                 method: str = "dopri5"):
    """Integrate a batched state from t0 to t1 with a fixed-step scan."""
    dt = (t1 - t0) / steps
    stepper = dopri5_step if method == "dopri5" else rk4

    def body(y, i):
        return stepper(rhs, y, t0 + i * dt, dt), None

    y, _ = jax.lax.scan(body, y0, jnp.arange(steps))
    return y


def integrate_observed(rhs: Callable, y0, obs_times, steps_per_interval: int,
                       method: str = "dopri5"):
    """Integrate through a sequence of observation times; returns the
    batched states at each time as (T, M, n).  obs_times must start at
    the initial time of y0."""
    obs_times = jnp.asarray(obs_times)
    stepper = dopri5_step if method == "dopri5" else rk4

    def interval(y, pair):
        t0, t1 = pair
        dt = (t1 - t0) / steps_per_interval

        def body(yy, i):
            return stepper(rhs, yy, t0 + i * dt, dt), None

        y, _ = jax.lax.scan(body, y, jnp.arange(steps_per_interval))
        return y, y

    pairs = jnp.stack([obs_times[:-1], obs_times[1:]], axis=1)
    _, states = jax.lax.scan(interval, y0, pairs)
    return jnp.concatenate([y0[None], states], axis=0)


# ---------------------------------------------------------------------------
# Adaptive Dormand-Prince 5(4) (ode45 semantics)
# ---------------------------------------------------------------------------

# 4th-order embedded weights (the ode45 error estimator row); the 7th
# stage is rhs at the 5th-order solution (FSAL stage).
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def _dp45_pair(rhs, y, t, dt):
    """One Dormand-Prince step: returns (y5, per-row error vector)."""
    ks = []
    for i in range(6):
        yi = y
        for aij, kj in zip(_DP_A[i], ks):
            yi = yi + dt * aij * kj
        ks.append(rhs(t + _DP_C[i] * dt, yi))
    y5 = y
    for bi, ki in zip(_DP_B, ks):
        y5 = y5 + dt * bi * ki
    ks.append(rhs(t + dt, y5))
    err = jnp.zeros_like(y)
    for bi, b4i, ki in zip(_DP_B + (0.0,), _DP_B4, ks):
        err = err + dt * (bi - b4i) * ki
    return y5, err


def integrate_adaptive(rhs: Callable, y0, t0: float, t1: float,
                       rtol: float = 1e-6, atol: float = 1e-8,
                       max_steps: int = 10_000, dt0: float | None = None,
                       return_stats: bool = False):
    """Error-controlled integration of a batched state (M, n) from t0 to
    t1 — the ode45-parity integrator (tolerance semantics of
    PP_loglikelihood.m:7-9 / lorenz_ll.m:5-12).

    Every sample row runs its own accept/shrink loop: ``dt`` is a per-row
    vector, the embedded 5(4) error is measured in the standard mixed
    norm ``rms(err / (atol + rtol * max(|y|, |ynew|)))``, and a PI
    controller (0.7/0.4 orders) rescales dt in [0.2, 5]x.  The loop is a
    bounded ``lax.while_loop``: one iteration advances every unfinished
    row, finished rows idle; shapes are static throughout.  Gradients:
    use the fixed-step scan integrators for reverse-mode (while_loop is
    not reverse-differentiable).
    """
    y0 = jnp.asarray(y0)
    dtype = y0.dtype
    span = t1 - t0
    if dt0 is None:
        dt0 = span / 100.0
    m = y0.shape[0]
    t = jnp.full((m,), t0, dtype)
    dt = jnp.full((m,), dt0, dtype)
    errold = jnp.ones((m,), dtype)
    nsteps = jnp.zeros((m,), jnp.int32)

    beta1, beta2 = 0.7 / 5.0, -0.4 / 5.0    # PI exponents (order 5)
    safety, dmin, dmax = 0.9, 0.2, 5.0
    tiny = jnp.asarray(1e-30, dtype)

    def cond(state):
        y, t, dt, errold, nsteps, it = state
        return jnp.logical_and(it < max_steps,
                               jnp.any(t < t1 - 1e-12 * abs(span)))

    def body(state):
        y, t, dt, errold, nsteps, it = state
        active = t < t1 - 1e-12 * abs(span)
        dtc = jnp.minimum(dt, t1 - t)            # clip to the endpoint
        dtc = jnp.where(active, dtc, tiny)       # idle rows: dummy step
        # per-row time/step columns: rhs sees t as (M, 1) — broadcasts
        # over the state for autonomous and time-dependent systems alike
        ynew, errv = _dp45_pair(rhs, y, t[:, None], dtc[:, None])
        sc = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(ynew))
        err = jnp.sqrt(jnp.mean((errv / sc) ** 2, axis=1))
        err = jnp.maximum(err, tiny)
        accept = jnp.logical_and(err <= 1.0, active)
        bad = ~jnp.isfinite(err)
        accept = jnp.logical_and(accept, ~bad)
        y = jnp.where(accept[:, None], ynew, y)
        t = jnp.where(accept, t + dtc, t)
        # PI controller on the accepted-error history
        fac = safety * err ** (-beta1) * errold ** (-beta2)
        fac = jnp.where(bad, dmin, jnp.clip(fac, dmin, dmax))
        dt = jnp.where(active, dtc * fac, dt)
        errold = jnp.where(accept, err, errold)
        nsteps = nsteps + active.astype(jnp.int32)
        return y, t, dt, errold, nsteps, it + 1

    y, t, dt, errold, nsteps, it = jax.lax.while_loop(
        cond, body, (y0, t, dt, errold, nsteps, jnp.zeros((), jnp.int32)))
    if return_stats:
        return y, {"nsteps": nsteps, "iters": it, "t": t}
    return y


def integrate_observed_adaptive(rhs: Callable, y0, obs_times,
                                rtol: float = 1e-6, atol: float = 1e-8,
                                max_steps: int = 10_000):
    """Adaptive integration through a sequence of observation times;
    returns batched states at each time as (T, M, n) — the adaptive
    sibling of ``integrate_observed``."""
    obs_times = [float(tv) for tv in jnp.asarray(obs_times)]
    states = [jnp.asarray(y0)]
    y = states[0]
    for ta, tb in zip(obs_times[:-1], obs_times[1:]):
        y = integrate_adaptive(rhs, y, ta, tb, rtol=rtol, atol=atol,
                               max_steps=max_steps)
        states.append(y)
    return jnp.stack(states, axis=0)
