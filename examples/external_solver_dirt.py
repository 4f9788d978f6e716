"""DIRT construction driven by an EXTERNAL (non-JAX) solver likelihood.

The reference accepts arbitrary user density functions — a MATLAB
handle wrapping any legacy FEM/ODE code — via its parfor wrapper
(tt_dirt_approx.m:483-499).  This example shows the two TPU-native
ways to plug an external solver into `tt_dirt_approx`:

1. ``vec='host'`` (or the default ``vec='auto'`` fallback): the DIRT
   pushes run jitted on device; the density is called on host with
   concrete numpy points.  Zero changes to the legacy code.
2. ``jax.pure_callback``: the host solver is wrapped into a traceable
   op, so the WHOLE ratio evaluation (push + density) stays one jitted
   program — and mesh-sharded construction (``mesh=``) works, with the
   callback fanning out per shard.

The "external solver" here is a deliberately numpy-only initial-value
problem: a fixed-step RK4 integration of a damped oscillator
x'' + c x' + k x = 0 whose parameters (c, k, x0) are inferred from
noisy observations — calling it under jit raises
TracerArrayConversionError, exactly like scipy/FEniCS/legacy-C code.

Usage: python examples/external_solver_dirt.py [--mode host|callback]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from tt_irt_tpu import essinv, tt_dirt_approx, tt_dirt_sample  # noqa: E402

# ---------------------------------------------------------------------------
# The legacy solver: numpy-only, cannot be traced by JAX
# ---------------------------------------------------------------------------

T_OBS = np.linspace(0.2, 2.0, 10)
TRUE = np.array([0.5, 4.0, 1.0])  # (c, k, x0)
SIGMA_N = 0.05


def rk4_oscillator(c, k, x0, dt=0.01, t_end=2.0):
    """Fixed-step RK4 for x'' + c x' + k x = 0, numpy scalars/arrays.

    Vectorized over a trailing sample axis, but strictly host code:
    np.asarray / float control flow make it untraceable."""
    c, k, x0 = np.broadcast_arrays(np.asarray(c), np.asarray(k),
                                   np.asarray(x0))
    y = np.stack([x0, np.zeros_like(x0)])  # (2, M)

    def rhs(y):
        return np.stack([y[1], -c * y[1] - k * y[0]])

    n = int(round(t_end / dt))
    out, t = [], 0.0
    idx, targets = 0, T_OBS
    for _ in range(n):
        k1 = rhs(y)
        k2 = rhs(y + 0.5 * dt * k1)
        k3 = rhs(y + 0.5 * dt * k2)
        k4 = rhs(y + dt * k3)
        y = y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        t += dt
        while idx < len(targets) and t >= targets[idx] - 1e-12:
            out.append(y[0].copy())
            idx += 1
    return np.stack(out)  # (len(T_OBS), M)


RNG = np.random.default_rng(0)
Y_OBS = rk4_oscillator(*TRUE) + SIGMA_N * RNG.standard_normal(len(T_OBS))


def loglik_host(theta):
    """Gaussian misfit of the external solve; theta (M, 3) numpy."""
    theta = np.asarray(theta)
    pred = rk4_oscillator(theta[:, 0], theta[:, 1], theta[:, 2])
    mis = pred - Y_OBS[:, None]
    return -0.5 * np.sum(mis * mis, axis=0) / SIGMA_N**2


def logratio_host(x, b0, b1):
    """Tempered log-ratio for the DIRT ladder (numpy in/out)."""
    x = np.asarray(x)
    prior = -0.5 * np.sum((x - TRUE[None, :]) ** 2 / 1.0**2, axis=1)
    return (b1 - b0) * (loglik_host(x) + prior)


# ---------------------------------------------------------------------------
# Route 2: pure_callback makes the host solver traceable
# ---------------------------------------------------------------------------

def logratio_callback(x, b0, b1):
    out_shape = jax.ShapeDtypeStruct((x.shape[0],), jnp.float64)
    ll = jax.pure_callback(
        lambda xx: np.asarray(logratio_host(xx, 0.0, 1.0),
                              dtype=np.float64),
        out_shape, x, vmap_method="broadcast_all")
    return (b1 - b0) * ll


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["host", "callback"],
                    default="host")
    ap.add_argument("--ntest", type=int, default=4096)
    args = ap.parse_args()

    grids = [np.linspace(lo, hi, 17) for lo, hi in
             [(0.0, 1.5), (2.5, 5.5), (0.3, 1.7)]]
    beta = [0.1, 0.4, 1.0]

    t0 = time.time()
    if args.mode == "host":
        # vec='host' (vec='auto' would auto-detect and warn)
        dirt = tt_dirt_approx(grids, logratio_host, beta, stoptol=0.15,
                              nswp=3, kickrank=2, testsamples=512,
                              seed=1, verb=1, vec="host")
    else:
        dirt = tt_dirt_approx(grids, logratio_callback, beta,
                              stoptol=0.15, nswp=3, kickrank=2,
                              testsamples=512, seed=1, verb=1)
    t_build = time.time() - t0

    q = jax.random.uniform(jax.random.PRNGKey(2), (args.ntest, 3),
                           dtype=jnp.float64)
    z, lfapp = tt_dirt_sample(dirt, q)
    lfex = jnp.asarray(logratio_host(np.asarray(z), 0.0, 1.0))
    tau = float(essinv(lfex, lfapp))
    zm = np.asarray(z).mean(axis=0)
    print(f"mode={args.mode}: build {t_build:.1f}s, "
          f"evals={np.asarray(dirt.evalcnt).sum()}, N/ESS={tau:.3f}")
    print(f"posterior mean (c,k,x0) = {zm.round(3)}  (truth {TRUE})")
    assert tau < 2.0, tau


if __name__ == "__main__":
    main()
