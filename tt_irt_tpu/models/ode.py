"""Fixed-step batched ODE integrators.

The reference integrates its ODE models with MATLAB ode45 by *stacking*
all samples into one big state vector (PP_loglikelihood.m:7-9,
lorenz_ll.m:5) — adaptive stepping with data-dependent step counts.  On
TPU the shape-static formulation is a fixed-step Runge-Kutta scan over a
batched state: every sample advances in lockstep, XLA fuses each stage,
and the whole likelihood jits once.  Step counts are chosen to match the
reference's tolerances (RelTol 1e-6 for predator-prey, default for
Lorenz).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["rk4", "dopri5_step", "integrate_to", "integrate_observed"]


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
