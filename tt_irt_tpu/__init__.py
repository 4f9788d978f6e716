"""tt_irt_tpu — TPU-native tensor-train inverse-Rosenblatt transport framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of TT-IRT
(reference: huberbenno/TT-IRT): TT cross approximation of unnormalized
densities (AMEn-enriched maxvol cross), inverse Rosenblatt transforms
(linear-spline, squared/SIRT and Fourier bases), deep composition over
tempering ladders (DIRT), TT-MH / TT-qIW debiasing, QMC lattices and the
statistical diagnostics toolkit (ESS, Hellinger, IACT).

Everything is pure-functional and jit/vmap/shard_map friendly: a TT is a
pytree of (r_left, n, r_right) cores, samplers are `(tt, grid, seeds) ->
(samples, logdensity)` transforms built from batched contractions and
vectorized CDF inversion, and the sample axis is the data-parallel axis
that shards over a TPU mesh.
"""

import os

# The reference library (MATLAB/C, see /reference docstrings) is float64
# throughout; CDF inversion needs > f32 precision to reach 1e-6 sample
# agreement.  Enable x64 before any arrays are created.  Opt out with
# TTIRT_DISABLE_X64=1 for pure-f32 experimentation.
if not os.environ.get("TTIRT_DISABLE_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

# Escape hatch: force the CPU backend even when a TPU platform plugin is
# registered (plugins may ignore JAX_PLATFORMS; this does not).
if os.environ.get("TTIRT_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from .ops.tt import (  # noqa: E402
    TT,
    tt_add,
    tt_dot,
    tt_from_dense,
    tt_full,
    tt_mean_field,
    tt_meshgrid,
    tt_norm,
    tt_ones,
    tt_permute,
    tt_rand,
    tt_round,
    tt_scale,
    tt_sum_many,
    tt_sum_modes,
    tkron,
)
from .ops.interp import lagrange_matrix, tt_sample_lagrange  # noqa: E402
from .ops.maxvol import localcross, maxvol, maxvol_rect  # noqa: E402
from .samplers.irt import tt_irt_lin, tt_irt_sqr, tt_rt_sqr  # noqa: E402
from .samplers.fourier import tt_irt_fourier  # noqa: E402
from .samplers.chebyshev import tt_irt_cheb  # noqa: E402
from .samplers.dirt import (  # noqa: E402
    DIRT,
    dirt_permute,
    dirt_round,
    serve_precision,
    tt_dirt_inverse,
    tt_dirt_sample,
)
from .samplers.conditional import tt_dirt_cond_sample, tt_irt_cond  # noqa: E402
from .samplers.serve import DirtSampler, IrtSampler  # noqa: E402
from .samplers.debias import (  # noqa: E402
    iw_prune, mcmc_prune, rejection_histogram, tt_irt_debias,
)
from .samplers.reference import randref, reference_sigma  # noqa: E402
from .samplers.qmc import qmcnodes  # noqa: E402
from .samplers.diagnostics import (  # noqa: E402
    essinv, hellinger, iact, tt_marginals,
)
from .constructors.amen_cross import amen_cross_s  # noqa: E402
from .constructors.greedy_cross import greedy_cross  # noqa: E402
from .constructors.dirt_build import tt_dirt_approx  # noqa: E402
from .constructors.finetune import dirt_finetune  # noqa: E402
from .constructors.als_cross import als_cross_parametric  # noqa: E402
from .api import PosteriorResult, sample_posterior  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "TT",
    "tt_add",
    "tt_dot",
    "tt_from_dense",
    "tt_full",
    "tt_mean_field",
    "tt_meshgrid",
    "tt_norm",
    "tt_ones",
    "tt_permute",
    "tt_rand",
    "tt_round",
    "tt_scale",
    "tt_sum_modes",
    "tt_sum_many",
    "lagrange_matrix",
    "tt_sample_lagrange",
    "tkron",
    "localcross",
    "maxvol",
    "maxvol_rect",
    "tt_irt_lin",
    "tt_irt_sqr",
    "tt_rt_sqr",
    "tt_irt_fourier",
    "tt_irt_cheb",
    "DIRT",
    "tt_dirt_sample",
    "dirt_finetune",
    "sample_posterior",
    "PosteriorResult",
    "serve_precision",
    "dirt_round",
    "dirt_permute",
    "DirtSampler",
    "IrtSampler",
    "tt_dirt_inverse",
    "tt_irt_cond",
    "tt_dirt_cond_sample",
    "mcmc_prune",
    "iw_prune",
    "tt_irt_debias",
    "randref",
    "reference_sigma",
    "qmcnodes",
    "essinv",
    "hellinger",
    "iact",
    "tt_marginals",
    "rejection_histogram",
    "amen_cross_s",
    "greedy_cross",
    "tt_dirt_approx",
    "als_cross_parametric",
]
