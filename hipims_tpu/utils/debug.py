"""Per-cell debug tracing.

The reference's debugging story is printf tracing of one chosen cell from
inside the kernels (DEBUG_OUTPUT/DEBUG_CELLX/DEBUG_CELLY constants,
src/Schemes/CSchemeGodunov.cpp:680-689, CLSchemeGodunov.clc:237-246).
Here the equivalent runs the simulation one step at a time and records the
chosen cell's full state trajectory — no recompilation, works with any
scheme/backend.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class CellTrace:
    t: list
    dt: list
    z: list
    zmax: list
    qx: list
    qy: list

    def as_arrays(self):
        return {k: np.asarray(getattr(self, k))
                for k in ("t", "dt", "z", "zmax", "qx", "qy")}


def trace_cell(sim, row: int, col: int, n_steps: int) -> CellTrace:
    """Advance ``n_steps`` single steps recording (t, dt, state) of one
    cell.  Temporarily forces batch size 1."""
    saved = sim._batch_size, sim.config.batch_auto
    sim._batch_size, sim.config.batch_auto = 1, False
    tr = CellTrace([], [], [], [], [], [])
    try:
        import jax.numpy as jnp
        sync = jnp.asarray(sim.config.duration, dtype=sim.dtype)
        for _ in range(n_steps):
            sim.state, sim.carry, sim.comp = sim._run_batch(
                sim.state, sim.carry, sim.static, sync, sim.comp,
                n_steps=1)
            tr.t.append(float(sim.carry.t))
            tr.dt.append(float(sim.carry.dt))
            tr.z.append(float(sim.state.z[row, col]))
            tr.zmax.append(float(sim.state.zmax[row, col]))
            tr.qx.append(float(sim.state.qx[row, col]))
            tr.qy.append(float(sim.state.qy[row, col]))
    finally:
        sim._batch_size, sim.config.batch_auto = saved
    return tr
