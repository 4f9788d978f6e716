"""Single decision point for the opt-in Pallas kernel family.

One function — ``kernel_plan()`` — resolves every Pallas/basis knob
(TTIRT_FUSED_STEP, TTIRT_DIM_KERNEL, TTIRT_ODIM_KERNEL,
TTIRT_HI_ORTHO) so the serve path (samplers/irt_scan.py) consults ONE
place instead of four modules.  All kernels are OPT-IN because every
one measured slower than the XLA serveb path on v5e; this docstring is
the canonical A/B record (full evidence: BENCH_NOTES.md rounds 2-4).

## Measured verdicts (v5e, lz40n33 production shape: d=40, n=33,
## r=23, 2^18 rows, prep hoisted, forced host read)

| path                                   | ms/dim | verdict          |
|----------------------------------------|--------|------------------|
| XLA serveb 'hi' + hi-pack (DEFAULT)    | 5.4-5.8| ~roofline of its |
|                                        |        | ~3.5 GB/dim      |
| XLA serveb, emulated-f64 epilogue      | 5.6    | r4: ds epilogue  |
|                                        |        | replaces it      |
| XLA gram-serveb 'gs' (irt_scan)        | 8.07   | lane-padded      |
|                                        |        | (Mb,r,r) blowup  |
| ortho XLA scan (TTIRT_HI_ORTHO=1)      | 7.43   | v read twice     |
| merged dim kernel (TTIRT_DIM_KERNEL=1, | 13.3   | Mosaic ~2.5x     |
|   unpacked, tile 1024)                 |        | schedule gap     |
| dim kernel, placement-pack bf16        | 11.7   | same gap         |
|   (TTIRT_DIM_PACK=2)                   |        |                  |
| odim kernel (TTIRT_ODIM_KERNEL=1,      | 9.4    | same gap         |
|   fused post-vdot, ortho basis)        |        |                  |
| per-dim fused pair (TTIRT_FUSED_STEP)  | slower | retired to       |
|   ops/pallas_step.py                   |        | opt-in           |
| whole-transform kernel                 | slower | retired round 2  |
|   (ops/pallas_irt.py)                  |        |                  |

Why the kernels lose: VMEM residency removes the ~16.5 ns/row of HBM
traffic, but Mosaic's per-grid-step scheduling gives it back (3-7 us
per step at tiles 512-2048; larger tiles fail the remote compile
helper).  The XLA path's stage-sum equals its total and matches
traffic/820 GB/s — there is no fusion slack left to win back without
beating Mosaic's scheduler.  The remaining lever named in round 3 — a
partial post-vdot fusion on the ortho basis — is exactly the odim
kernel minus its in-kernel vdot: it keeps all the VPU row work and the
per-step overhead that produced the 2.5x gap, so it is bounded by the
same measurement and was not built.

Reference being accelerated: the tt_irt_sqr.m:96-207 forward loop.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

__all__ = ["KernelPlan", "kernel_plan"]


@dataclass(frozen=True)
class KernelPlan:
    """Resolved kernel selection for the scan-path forward."""

    fused: int          # 0 = XLA; 1/2 = ops/pallas_step per-dim kernels
    dim_kernel: bool    # merged whole-dim kernel (ops/pallas_dim)
    odim_kernel: bool   # fused ortho whole-dim kernel (ops/pallas_odim)
    ortho: bool         # orthonormal-core basis (XLA scan variant)


def kernel_plan() -> KernelPlan:
    from .pallas_dim import dim_kernel_enabled
    from .pallas_odim import odim_kernel_enabled
    from .pallas_step import fused_level

    odim = odim_kernel_enabled()
    return KernelPlan(
        fused=fused_level(),
        dim_kernel=dim_kernel_enabled(),
        odim_kernel=odim,
        ortho=os.environ.get("TTIRT_HI_ORTHO", "") in ("1", "true",
                                                       "on") or odim,
    )
