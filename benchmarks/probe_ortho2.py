"""Apples-to-apples scan-only A/B: the real _step_factor_b (raw-factor
serveb body, needs bmat+cmat) vs the real _step_factor_ob (ortho body)
at the lz40n33 production shape, same harness, epilogue excluded."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from tt_irt_tpu.samplers import irt_scan as isc

    m, n, r, d = 2 ** 18, 33, 23, 40
    rng = np.random.default_rng(0)
    bmat = jnp.asarray(
        rng.standard_normal((d, r, n * r)).astype(np.float32) / np.sqrt(r))
    cmat = jnp.asarray(
        rng.standard_normal((d, n, r * r)).astype(np.float32) / np.sqrt(r))
    pw = isc._hi_pack()
    pk = (isc._pack9_rhs if pw == 9 else isc._pack6_rhs) if pw else None
    bmat_p = pk(bmat) if pw else bmat
    cmat_p = pk(cmat) if pw else cmat
    x = np.linspace(-3, 3, n)
    xs = jnp.asarray(np.tile(x, (d, 1)))
    hs = jnp.asarray(np.tile(np.concatenate([[0.0], np.diff(x)]), (d, 1)))
    q = jnp.asarray(rng.uniform(size=(m, d)))

    x32s = xs.astype(jnp.float32)
    xlos = (xs - x32s.astype(jnp.float64)).astype(jnp.float32)
    h32s = hs.astype(jnp.float32)
    q64 = q.astype(jnp.float64).T
    qp32 = q64.astype(jnp.float32)
    um32 = (1.0 - q64).astype(jnp.float32)
    psi0 = jnp.zeros((m, r), jnp.float32).at[:, 0].set(1.0)

    @partial(jax.jit, static_argnames=("which",))
    def run(which, qq32, uu32):
        if which == "factor":
            step = partial(isc._step_factor_b, "sqr", n, pw)
            _, outs9 = jax.lax.scan(
                step, psi0, (bmat_p, cmat_p, x32s, xlos, h32s,
                             qq32, uu32))
        else:
            step = partial(isc._step_factor_ob, "sqr", n, pw)
            _, outs9 = jax.lax.scan(
                step, psi0, (bmat_p, x32s, xlos, h32s, qq32, uu32))
        return outs9

    for which in sys.argv[1:] or ["factor", "ortho"]:
        t0 = time.time()
        o = run(which, qp32, um32)
        float(jnp.sum(o[:, :, 8]))
        tc = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            o = run(which, qp32, um32)
            float(jnp.sum(o[:, :, 8]))
            best = min(best, time.time() - t0)
        print(f"{which:7s}: best {best:.3f}s ({m / best / 1e3:.0f}k "
              f"rows/s, {best / d * 1e3:.2f} ms/dim)  compile {tc:.0f}s")


if __name__ == "__main__":
    main()
