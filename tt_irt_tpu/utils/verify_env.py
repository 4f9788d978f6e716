"""Environment self-check (parity with the reference's bootstrap layer:
matlab/utils/check_*.m and python/verify.py — except nothing is
downloaded here; every capability is built in).

Run: python -m tt_irt_tpu.utils.verify_env
"""

from __future__ import annotations

import sys


def verify_env(verbose: bool = True) -> dict:
    out = {}

    def log(msg):
        if verbose:
            print(msg)

    import jax
    import jax.numpy as jnp

    out["jax"] = jax.__version__
    out["devices"] = [str(d) for d in jax.devices()]
    out["x64"] = bool(jax.config.jax_enable_x64)
    log(f"jax {out['jax']}  devices={out['devices']}  x64={out['x64']}")

    import tt_irt_tpu as ti

    out["tt_irt_tpu"] = ti.__version__
    # smoke: cross + IRT + diagnostics round trip (check_ttirt.m analog)
    import numpy as np

    grids = [np.linspace(-2, 2, 9)] * 3

    def fun(ind):
        ind = np.asarray(ind)
        x = np.stack([grids[k][ind[:, k]] for k in range(3)], axis=1)
        return np.exp(-0.5 * np.sum(x * x, axis=1))

    res = ti.amen_cross_s([9] * 3, fun, 1e-8, nswp=4, kickrank=2)
    q = jax.random.uniform(jax.random.PRNGKey(0), (256, 3),
                           dtype=jnp.float64)
    x, lf = ti.tt_irt_lin(grids, res.tt, q)
    tau = float(ti.essinv(-0.5 * jnp.sum(x * x, axis=1), lf))
    out["smoke_ness"] = tau
    assert tau < 1.5, f"smoke test N/ESS too large: {tau}"
    log(f"cross+IRT smoke test: N/ESS = {tau:.4f}  OK")

    from tt_irt_tpu.native import build_native, native_available

    out["native"] = bool(build_native() and native_available())
    log(f"native C++ kernel: {'available' if out['native'] else 'absent'}")

    try:
        from scipy.stats import qmc  # noqa: F401

        out["sobol"] = True
    except ImportError:
        out["sobol"] = False
    log(f"scipy Sobol QMC: {out['sobol']}")
    return out


if __name__ == "__main__":
    verify_env()
    sys.exit(0)
