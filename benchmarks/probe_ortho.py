"""One-off probe: attribute the ortho serveb scan body cost on-chip.

Variants of the 2-point prefix readout at the lz40n33 production shape
(d=40, n=33, r=23, 2^18 rows), timed as the full d-dim scan exactly
like irt_scan._fwd's ortho branch (same inputs, same epilogue skipped
— scan only):

  full     : the in-tree body (_step_factor_ob)
  slice0   : psi = v[:, 0, :]      (readout floor; WRONG results)
  nofk     : fk = v[:, :, 0]**2    (skip the segsum; WRONG results)
  selmm    : fk and readout as 0/1 structure matmuls on the FLAT
             (Mb, n*r) v (no (Mb,n,r) reshape in the graph)
  norows   : CDF rows replaced by a cheap stub  (WRONG results)
"""

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
    # orthonormal-ish random operands: scale is irrelevant to timing
    qmat = jnp.asarray(
        rng.standard_normal((d, r, n * r)).astype(np.float32) / np.sqrt(r))
    pw = isc._hi_pack()
    if pw:
        qmat = (isc._pack9_rhs if pw == 9 else isc._pack6_rhs)(qmat)
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

    iota = np.arange(n * r)
    seg = jnp.asarray((iota[:, None] // r ==
                       np.arange(n)[None, :]).astype(np.float32))
    sel = jnp.asarray((iota[:, None] % r ==
                       np.arange(r)[None, :]).astype(np.float32))
    rep = jnp.asarray((np.arange(n)[:, None] ==
                       iota[None, :] // r).astype(np.float32))

    def body(variant, carry, inp):
        psi = carry
        qm, x32, xlo, h32, qk32, uk32 = inp
        mb = psi.shape[0]
        if pw:
            plhs = isc._pack9_lhs if pw == 9 else isc._pack6_lhs
            v = jnp.dot(plhs(psi), qm,
                        preferred_element_type=jnp.float32)
        else:
            v = jnp.matmul(psi, qm, precision=isc._HI)
        if variant == "selmm":
            fk = jnp.matmul(v * v, seg, precision=isc._HI)
            out9, oh0, oh1, la, lb = isc._cdf_rows32(
                "sqr", n, fk, x32, xlo, h32, qk32, uk32)
            w = la[:, None] * oh0 + lb[:, None] * oh1
            wide = jnp.matmul(w, rep, precision=isc._HI)
            psi = jnp.matmul(v * wide, sel, precision=isc._HI)
        else:
            v3 = jnp.reshape(v, (mb, n, r))
            if variant == "nofk":
                fk = v3[:, :, 0] * v3[:, :, 0]
            else:
                fk = jnp.sum(v3 * v3, axis=2)
            if variant == "norows":
                tot = jnp.sum(fk, axis=1)
                out9 = jnp.stack([tot] * 9, axis=1)
                oh0 = jnp.zeros_like(fk).at[:, 0].set(1.0)
                oh1 = jnp.zeros_like(fk).at[:, 1].set(1.0)
                la = lb = tot
            else:
                out9, oh0, oh1, la, lb = isc._cdf_rows32(
                    "sqr", n, fk, x32, xlo, h32, qk32, uk32)
            if variant == "slice0":
                psi = v3[:, 0, :] + la[:, None]
            else:
                w = la[:, None] * oh0 + lb[:, None] * oh1
                psi = jnp.sum(w[:, :, None] * v3, axis=1)
        scale = jnp.maximum(
            jnp.max(jnp.abs(psi), axis=1, keepdims=True),
            jnp.asarray(1e-30, psi.dtype))
        return psi / scale, out9

    psi0 = jnp.zeros((m, r), jnp.float32).at[:, 0].set(1.0)

    @partial(jax.jit, static_argnames=("variant",))
    def run(variant, qq32, uu32):
        _, outs9 = jax.lax.scan(partial(body, variant), psi0,
                                (qmat, x32s, xlos, h32s, qq32, uu32))
        return outs9

    for variant in sys.argv[1:] or ["full", "slice0", "nofk",
                                    "selmm", "norows"]:
        t0 = time.time()
        o = run(variant, qp32, um32)
        float(jnp.sum(o[:, :, 8]))
        tc = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            o = run(variant, qp32, um32)
            float(jnp.sum(o[:, :, 8]))
            best = min(best, time.time() - t0)
        print(f"{variant:8s}: best {best:.3f}s "
              f"({m / best / 1e3:.0f}k rows/s, "
              f"{best / d * 1e3:.2f} ms/dim)  compile {tc:.0f}s")


if __name__ == "__main__":
    main()
