"""Checkpoint / resume for DIRT stacks.

The reference's checkpoint format is the plain IRTstruct of TT cores,
grids, the beta ladder and counters (constructors/README.md:13-27), with
append-level resume (tt_dirt_approx.m:154-173).  Here the DIRT is
already a pytree, so checkpointing is orbax (or npz fallback)
serialization of its leaves + a small static header; resume feeds the
restored stack back into tt_dirt_approx(irtstruct=...).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..ops.tt import TT
from ..samplers.dirt import DIRT

__all__ = ["save_dirt", "load_dirt"]


def save_dirt(path: str, dirt: DIRT) -> None:
    """Serialize a DIRT stack to ``path`` (.npz + .json header)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {}
    for i, c in enumerate(dirt.f0.cores):
        arrays[f"f0_{i}"] = np.asarray(c)
    for l, f in enumerate(dirt.fs):
        for i, c in enumerate(f.cores):
            arrays[f"lvl{l}_{i}"] = np.asarray(c)
    for i, g in enumerate(dirt.x0):
        arrays[f"x0_{i}"] = np.asarray(g)
    for i, g in enumerate(dirt.x):
        arrays[f"x_{i}"] = np.asarray(g)
    arrays["beta"] = np.asarray(dirt.beta)
    arrays["evalcnt"] = np.asarray(dirt.evalcnt)
    # fprev (the rank-limited warm start for the next level) must be
    # persisted: a resume without it silently falls back to a random
    # warm start, changing the quality of the appended levels (the
    # reference keeps Fprev in the IRTstruct, tt_dirt_approx.m:154-173).
    fprev_dims = 0
    if dirt.fprev is not None:
        fprev_dims = dirt.fprev.d
        for i, c in enumerate(dirt.fprev.cores):
            arrays[f"fprev_{i}"] = np.asarray(c)
    header = {
        "d": dirt.d,
        "nlevels": dirt.nlevels,
        "level_dims": [f.d for f in dirt.fs],
        "lfshift": float(np.asarray(dirt.lfshift)),
        "reference": str(dirt.reference),
        "interpolation": str(dirt.interpolation),
        "n_x": len(dirt.x),
        "fprev_dims": fprev_dims,
    }
    if getattr(dirt, "history", None):
        # the structured construction trace (DIRT.history) is plain
        # JSON-serializable dicts by construction (dirt_build._record)
        header["history"] = dirt.history
    np.savez_compressed(path + ".npz", **arrays)
    with open(path + ".json", "w") as fh:
        json.dump(header, fh)


def load_dirt(path: str) -> DIRT:
    """Restore a DIRT stack saved by save_dirt."""
    with open(path + ".json") as fh:
        header = json.load(fh)
    data = np.load(path + ".npz")
    d = header["d"]
    f0 = TT([jnp.asarray(data[f"f0_{i}"]) for i in range(d)])
    fs = []
    for l in range(header["nlevels"]):
        dl = header["level_dims"][l]
        fs.append(TT([jnp.asarray(data[f"lvl{l}_{i}"]) for i in range(dl)]))
    x0 = [jnp.asarray(data[f"x0_{i}"]) for i in range(d)]
    x = [jnp.asarray(data[f"x_{i}"]) for i in range(header["n_x"])]
    fprev = None
    if header.get("fprev_dims", 0):
        fprev = TT([jnp.asarray(data[f"fprev_{i}"])
                    for i in range(header["fprev_dims"])])
    return DIRT(f0, fs, x0, x, jnp.asarray(data["beta"]),
                header["lfshift"], reference=header["reference"],
                interpolation=header["interpolation"],
                evalcnt=np.asarray(data["evalcnt"]), fprev=fprev,
                history=header.get("history"))
