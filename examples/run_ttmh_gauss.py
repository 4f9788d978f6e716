"""End-to-end drive on the real TPU: build a TT posterior surrogate via
amen_cross_s, sample 2^16 points at d=10 through tt_irt_sqr, debias with
MH, print diagnostics — all through the public package API."""
import time
import numpy as np
from tt_irt_tpu.utils import set_platform
set_platform()  # honor JAX_PLATFORMS even with eager TPU plugins
import jax, jax.numpy as jnp
import tt_irt_tpu as ti

print("devices:", jax.devices())

d, n = 10, 17
grids = [np.linspace(-4, 4, n) for _ in range(d)]

@jax.jit
def logpost(x):  # correlated Gaussian, banded
    quad = jnp.sum(x**2, axis=1) + 0.8 * jnp.sum(x[:, :-1] * x[:, 1:], axis=1)
    return -0.5 * quad

def fun(ind):
    ind = np.asarray(ind)
    x = jnp.stack([jnp.asarray(grids[k])[ind[:, k]] for k in range(d)], axis=1)
    return np.asarray(jnp.exp(0.5 * logpost(x)))  # sqrt(density)

t0 = time.time()
res = ti.amen_cross_s([n]*d, fun, 1e-6, tol_exit=1e-4, nswp=6, kickrank=4, verb=1)
print(f"cross: {time.time()-t0:.2f}s, ranks={res.tt.ranks}, evals={res.evalcnt}")

M = 1 << 16
q = jax.random.uniform(jax.random.PRNGKey(0), (M, d), dtype=jnp.float64)
t0 = time.time()
xq, lfapp = ti.tt_irt_sqr(grids, res.tt, q)
xq.block_until_ready()
t_first = time.time() - t0
t0 = time.time()
xq, lfapp = ti.tt_irt_sqr(grids, res.tt, q)
xq.block_until_ready()
t_steady = time.time() - t0
print(f"IRT 2^16 samples d={d}: first={t_first:.2f}s steady={t_steady:.4f}s "
      f"({M/t_steady:.3g} samples/s)")

lfex = logpost(xq)
tau = float(ti.essinv(lfex, lfapp))
hel = float(ti.hellinger(lfex, lfapp))
res_mh = ti.mcmc_prune(xq, lfex, lfapp, key=jax.random.PRNGKey(1))
rej = 100.0 * float(res_mh.num_rejects) / M
print(f"N/ESS={tau:.4f}  Hellinger={hel:.3e}  MH rejection={rej:.2f}%")

# sanity: sample covariance vs analytic
prec = np.eye(d) + 0.4*(np.eye(d, k=1)+np.eye(d, k=-1))
cov_true = np.linalg.inv(prec)
cov_emp = np.cov(np.asarray(res_mh.y).T)
err = np.abs(cov_emp - cov_true).max()
print(f"max |cov_emp - cov_true| = {err:.4f} (diag ~{cov_true[0,0]:.3f})")

# round trip
q2, _ = ti.tt_rt_sqr(grids, res.tt, xq)
print("roundtrip max |q2-q| =", float(jnp.max(jnp.abs(q2 - q))))
