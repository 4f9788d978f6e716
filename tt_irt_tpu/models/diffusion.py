"""Inverse diffusion: Q1 FEM on the unit square with a cosine KLE
log-coefficient, windowed pressure observations and exit-flux QoI.

Reference: matlab/examples/diffusion/{build_grid_and_kle.m,
diffusion_assem_solve.m, diffusion_likelihood.m, test_diffusion_tt.m}.

TPU-first realization: the FEM operator has the separable structure
A[(i1,i2),(j1,j2)] = sum_{k1,k2} C[k1,k2] (Wg[i1,j1,k1] Wm[i2,j2,k2]
                                         + Wm[i1,j1,k1] Wg[i2,j2,k2])
with 1-D P1 factor tensors Wg (gradient x hat) and Wm (mass x hat) —
assembled densely from element integrals (NOT from the reference's
sparse index machinery) and contracted as batched einsums.  Solves are
batched dense solves vmapped over samples — viable at the benchmark
mesh levels (n = 2^(4+ml)+1 <= 65 -> <= 4225 dofs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fem1d_factors", "DiffusionProblem", "assemble_matrix", "lgwt",
]


def fem1d_factors(n: int, h: float):
    """Dense 1-D P1 factor tensors Wg[i,j,k] = int phi_k phi_i' phi_j'
    and Wm[i,j,k] = int phi_k phi_i phi_j on a uniform grid of n nodes.

    Derived from the element integrals (values match the stencils of
    build_grid_and_kle.m:27-156): Wg diag 1/h (boundary 0.5/h),
    wings +-0.5/h; Wm diag h/2 (boundary h/4), wings h/12."""
    wg = np.zeros((n, n, n))
    wm = np.zeros((n, n, n))
    i = np.arange(n)
    # diagonal i==j
    wg[i, i, i] = 1.0 / h
    wg[0, 0, 0] = wg[n - 1, n - 1, n - 1] = 0.5 / h
    wg[i[:-1], i[:-1], i[:-1] + 1] = 0.5 / h
    wg[i[1:], i[1:], i[1:] - 1] = 0.5 / h
    # off-diagonal |i-j|=1, k in {i, j}
    wg[i[1:], i[1:] - 1, i[1:] - 1] = -0.5 / h
    wg[i[1:], i[1:] - 1, i[1:]] = -0.5 / h
    wg[i[:-1], i[:-1] + 1, i[:-1]] = -0.5 / h
    wg[i[:-1], i[:-1] + 1, i[:-1] + 1] = -0.5 / h
    wm[i, i, i] = h / 2.0
    wm[0, 0, 0] = wm[n - 1, n - 1, n - 1] = h / 4.0
    wm[i[:-1], i[:-1], i[:-1] + 1] = h / 12.0
    wm[i[1:], i[1:], i[1:] - 1] = h / 12.0
    wm[i[1:], i[1:] - 1, i[1:] - 1] = h / 12.0
    wm[i[1:], i[1:] - 1, i[1:]] = h / 12.0
    wm[i[:-1], i[:-1] + 1, i[:-1]] = h / 12.0
    wm[i[:-1], i[:-1] + 1, i[:-1] + 1] = h / 12.0
    return wg, wm


def assemble_matrix(cmat, wg, wm):
    """Dense stiffness matrix for nodal coefficient field cmat (n, n):
    A[(i1,i2),(j1,j2)] = sum_k1k2 C[k1,k2] (Wg ox Wm + Wm ox Wg)."""
    n = cmat.shape[0]
    g2 = jnp.einsum("ijk,kl->ijl", wg, cmat)   # (n, n, n): i1,j1,k2
    m2 = jnp.einsum("ijk,kl->ijl", wm, cmat)
    a = jnp.einsum("ijl,pql->ipjq", g2, wm) + \
        jnp.einsum("ijl,pql->ipjq", m2, wg)
    return jnp.reshape(a, (n * n, n * n))


def _spd_solve(a, b):
    """Cholesky solve for the SPD reduced diffusion operator.  Besides
    being the right factorization for an elliptic operator, this avoids
    the batched-LU custom call that some remote TPU backends cannot
    compile (axon remote_compile HTTP 500 on jnp.linalg.solve)."""
    c = jnp.linalg.cholesky(a)
    return jax.scipy.linalg.cho_solve((c, True), b)


def lgwt(n: int, a: float, b: float):
    """Gauss-Legendre nodes/weights on [a, b] (replaces the downloaded
    lgwt.m, parse_diffusion_inputs.m:72-84).  Nodes descending to match
    the reference's ordering convention."""
    x, w = np.polynomial.legendre.leggauss(n)
    x = 0.5 * (b - a) * x + 0.5 * (b + a)
    w = 0.5 * (b - a) * w
    return x[::-1].copy(), w[::-1].copy()


@dataclass
class DiffusionProblem:
    """Grid + KLE + observation setup (test_diffusion_tt.m defaults:
    sigma=1, corr_length=1, nu=2, meshlevel default 2 in the reference, sigma_n=1e-2, m0=3,
    Dirichlet-Neumann BCs with u=1 on the left edge, u=0 on the right)."""

    meshlevel: int = 0
    nu: float = 2.0
    corr_length: float = 1.0
    sigma: float = 1.0
    sigma_n: float = 1e-2
    m0: int = 3
    tol_kle: float = 1e-2
    bc_type: str = "dn"

    def __post_init__(self):
        self.n = 2 ** (4 + self.meshlevel) + 1
        self.h = 2.0 ** (-4 - self.meshlevel)
        n = self.n
        p = np.linspace(0.0, 1.0, n)
        self.p1 = p
        wg, wm = fem1d_factors(n, self.h)
        self.wg = jnp.asarray(wg)
        self.wm = jnp.asarray(wm)
        # boundary nodes (x==0 left Dirichlet=1; x==1 right Dirichlet=0)
        xg, yg = np.meshgrid(p, p, indexing="ij")
        flat_left = np.nonzero(xg.ravel() == 0.0)[0]
        flat_right = np.nonzero(xg.ravel() == 1.0)[0]
        if self.bc_type.lower() == "dn":
            bound = np.concatenate([flat_left, flat_right])
        else:
            others = np.nonzero((yg.ravel() == 0.0) | (yg.ravel() == 1.0))[0]
            bound = np.unique(np.concatenate([flat_left, flat_right,
                                              others]))
        self.bound = bound
        self.bound_left = flat_left
        self.interior = np.setdiff1d(np.arange(n * n), bound)
        # KLE: cosine expansion with algebraic decay (reference :185-218)
        startpos = int(round(1.0 / self.corr_length)) - 1
        tol = self.tol_kle
        ell = int(np.ceil(np.exp(-np.log(tol * 0.1) / (self.nu + 1))))
        ell = min(ell, n * n)
        ind = np.arange(1, ell + 1)
        lam = np.concatenate([np.ones(startpos),
                              ind.astype(float) ** (-self.nu - 1)])
        lam = lam / lam.sum()
        cut = np.nonzero(lam < tol * lam[0])[0]
        ltrunc = int(cut[0]) if cut.size else lam.shape[0]
        lam = lam[:max(ltrunc, 1)]
        kk = np.arange(1, lam.shape[0] + 1)
        s = np.floor(-0.5 + np.sqrt(0.25 + 2 * kk))
        f1 = kk - s * (s + 1) * 0.5
        f2 = s - f1
        self.lam = lam
        # phi columns on the flattened (x-major) grid
        self.phi = (np.cos(2 * np.pi * np.outer(xg.ravel(), f1))
                    * np.cos(2 * np.pi * np.outer(yg.ravel(), f2)))
        self.phil = self.phi * np.sqrt(lam)[None, :]
        # windowed observation mass matrices (reference :223-250)
        self.mass1 = self._windowed_mass1()

    @property
    def kle_dim(self) -> int:
        return self.lam.shape[0]

    def _windowed_mass1(self):
        """1-D windowed mass factors: Mass1[i] = Wm contracted with the
        window indicator of cell i, (n, n) each."""
        n, m0 = self.n, self.m0
        out = []
        wm = np.asarray(self.wm)
        grid = self.p1
        for i in range(1, m0 + 1):
            ind = ((grid >= (i - 1) / (m0 + 1))
                   & (grid <= (i + 1) / (m0 + 1))).astype(float)
            ind = ind / (0.5 / (m0 + 1))
            m1 = np.einsum("ijk,k->ij", wm, ind)
            # boundary correction of partially covered cells (:228-239)
            nz = np.nonzero(ind)[0]
            if nz.size:
                il, ir = nz[0], nz[-1]
                if il > 0:
                    m1[il - 1, :] = 0.0
                    m1[:, il - 1] = 0.0
                    m1[il, il] = m1[il + 1, il + 1] * 0.5
                if ir < n - 1:
                    m1[ir + 1, :] = 0.0
                    m1[:, ir + 1] = 0.0
                    m1[ir, ir] = m1[ir - 1, ir - 1] * 0.5
            out.append(m1)
        return out

    # ------------------------------------------------------------------
    # Solvers
    # ------------------------------------------------------------------
    def _rhs_and_reduce(self, amat):
        """Dirichlet elimination: move the u=1 left-edge data to the RHS,
        restrict to interior dofs (diffusion_assem_solve.m:50-56)."""
        g = -jnp.sum(amat[:, self.bound_left], axis=1)
        g = g[self.interior]
        ared = amat[jnp.ix_(self.interior, self.interior)]
        return ared, g

    def solve_one(self, cnodal):
        """Solve for one nodal coefficient field (n*n,) -> full solution
        (n*n,) with boundary values filled in."""
        cmat = jnp.reshape(cnodal, (self.n, self.n))
        amat = assemble_matrix(cmat, self.wg, self.wm)
        ared, g = self._rhs_and_reduce(amat)
        u_in = _spd_solve(ared, g)
        u = jnp.zeros((self.n * self.n,))
        u = u.at[jnp.asarray(self.interior)].set(u_in)
        u = u.at[jnp.asarray(self.bound_left)].set(1.0)
        return u

    def assem_solve_fun(self, ygrids=None):
        """ALS-Cross spatial callback (diffusion_assem_solve.m API).

        Values mode: Ci (Mc, Nxc, r) coefficient snapshots.  Indices
        mode (als_cross_parametric.m:191-230): an (r, ell) integer
        matrix of 0-based parametric grid indices — the coefficient is
        reconstructed as exp(sqrt(sigma) * Phi_l y) from ``ygrids``
        (required for this mode).  Returns (U (Nxu, r), A list of
        (Na, Na), F (Na, r)) on the first call; U only afterwards.

        All r snapshots assemble and solve as ONE vmapped batch
        (chunked so the (n^2)^2 dense operators fit in memory) instead
        of a per-snapshot host loop."""
        first = {"done": False}
        # ~0.5 GB of f64 transient per chunk at the dense-operator size
        chunk = max(1, int(2 ** 26) // (self.n ** 4))

        @jax.jit
        def _kernel(cb):
            def one(c):
                amat = assemble_matrix(jnp.reshape(c, (self.n, self.n)),
                                       self.wg, self.wm)
                ared, g = self._rhs_and_reduce(amat)
                return ared, g, _spd_solve(ared, g)

            return jax.vmap(one)(cb)

        def fn(ci):
            ci = np.asarray(ci)
            if ci.ndim == 2 and np.issubdtype(ci.dtype, np.integer):
                if ygrids is None:
                    raise ValueError(
                        "indices-mode callback needs the parametric "
                        "grids: assem_solve_fun(ygrids=...)")
                yv = np.stack([np.asarray(ygrids[k])[ci[:, k]]
                               for k in range(ci.shape[1])], axis=1)
                coeff = np.exp(np.sqrt(self.sigma) * (yv @ self.phil.T))
            else:
                coeff = ci[0].T                          # (r, Nxc)
            coeff = np.clip(coeff, 1e-8, 1e9)  # clipping :17-24
            r = coeff.shape[0]
            areds, gs, uins = [], [], []
            for s in range(0, r, chunk):
                a_, g_, u_ = _kernel(jnp.asarray(coeff[s:s + chunk]))
                areds.append(np.asarray(a_))
                gs.append(np.asarray(g_))
                uins.append(np.asarray(u_))
            ared = np.concatenate(areds, axis=0)
            g = np.concatenate(gs, axis=0)
            u_in = np.concatenate(uins, axis=0)          # (r, ni)
            u = np.zeros((r, self.n * self.n))
            u[:, self.interior] = u_in
            u[:, self.bound_left] = 1.0
            u_out = u.T
            if not first["done"]:
                first["done"] = True
                return u_out, list(ared), g.T
            return u_out

        return fn

    def pua(self):
        """Projector full-dof solution -> interior dofs (the reference's
        Pua, build_grid_and_kle.m:179-181)."""
        n2 = self.n * self.n
        p = np.zeros((self.interior.shape[0], n2))
        p[np.arange(self.interior.shape[0]), self.interior] = 1.0
        return p

    def observe(self, u):
        """Windowed pressure observations: (..., n*n) -> (..., m0^2),
        Q[k + j*m0] = sum(Mass{k,j} u) (diffusion_likelihood.m:53-58)."""
        n, m0 = self.n, self.m0
        u2 = jnp.reshape(u, u.shape[:-1] + (n, n))
        q = []
        for j in range(m0):
            for k in range(m0):
                mk = jnp.asarray(self.mass1[k])
                mj = jnp.asarray(self.mass1[j])
                # kron(Mass1[j], Mass1[k]) contracted against u, summed
                q.append(jnp.einsum("ab,...ac,cd->...",
                                    mk, u2, mj.T))
        return jnp.stack(q, axis=-1)

    def exit_flux(self, cnodal, u):
        """Exit flux at the right edge (diffusion_likelihood.m:61-76)."""
        n = self.n
        cmat = jnp.reshape(cnodal, (n, n))
        # sum over the test index: Sum_i Wm[i,j,k] = 1-D mass matrix
        # (partition of unity; reference diffusion_likelihood.m:14-19)
        wg_sum = jnp.sum(self.wg, axis=0)   # (j, k)
        wm_sum = jnp.sum(self.wm, axis=0)
        # B[(i1), (j1 j2)] = Wg C Wm_sum' + Wm C Wg_sum' pattern:
        g2 = jnp.einsum("ijk,kl->ijl", self.wg, cmat)
        m2 = jnp.einsum("ijk,kl->ijl", self.wm, cmat)
        b = jnp.einsum("ijl,pl->ijp", g2, wm_sum) + \
            jnp.einsum("ijl,pl->ijp", m2, wg_sum)   # (i1, j1, i2->sum'd)
        u2 = jnp.reshape(u, (n, n))
        flux = jnp.einsum("ijp,jp->i", b, u2)
        return -flux[n - 1]

    def likelihood_fn(self, q_obs, block: int = 128):
        """Exact log-likelihood + QoI columns [logL, flux, indicator]
        (diffusion_likelihood.m).  Vectorized over samples with batched
        dense solves, processed in fixed blocks (lax.map) so the
        compiled graph stays small and reusable across sample counts."""
        phil = jnp.asarray(self.phil)
        sqrt_sigma = np.sqrt(self.sigma)
        q_obs = jnp.asarray(q_obs)

        def one(y):
            cnodal = jnp.exp(phil @ y * sqrt_sigma)
            u = self.solve_one(cnodal)
            q = self.observe(u)
            ll = -jnp.sum((q - q_obs) ** 2) / (2.0 * self.sigma_n)
            fl = self.exit_flux(cnodal, u)
            return jnp.stack([ll, fl, (fl > 1.5).astype(jnp.float64)])

        vone = jax.vmap(one)

        @jax.jit
        def batched(y):
            m = y.shape[0]
            nb = -(-m // block)
            pad = jnp.zeros((nb * block - m, y.shape[1]), y.dtype)
            yp = jnp.reshape(jnp.concatenate([y, pad]), (nb, block, -1))
            out = jax.lax.map(vone, yp)
            return jnp.reshape(out, (nb * block, -1))[:m]

        def fn(y):
            return batched(jnp.asarray(y))

        return fn
