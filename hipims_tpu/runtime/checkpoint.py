"""Checkpoint / resume.

The reference has no simulation-clock resume (SURVEY.md section 5 — its
closest artifacts are the rollback host snapshot and re-feeding output
rasters as initial conditions).  Here a checkpoint captures the full
prognostic state plus the time controller, so a run resumes exactly:
same t, same dt, same hydrological accumulator, same batch counters.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..state import FlowState, StepCarry


CHECKPOINT_VERSION = 1


def save_checkpoint(path, sim, snapshot=None):
    """Write the simulation's resumable state to an .npz file.

    Multi-host safe: sharded arrays are allgathered on EVERY process
    (non-addressable shards cannot be np.asarray'd, and the gather is a
    collective that must run symmetrically), then only the coordinator
    writes the file — the reference's rank-0 output gating
    (src/main.cpp:561-578).  ``snapshot`` (an already-gathered
    _OutputSnapshot) avoids a second gather set when the caller just
    built one for the output writers."""
    import jax

    path = Path(path)
    if snapshot is not None and getattr(snapshot, "streaming", False):
        return _save_checkpoint_streamed(path, sim, snapshot)
    if snapshot is not None:
        state_full, comp_full = snapshot.state_full, snapshot.comp_full
    else:
        fetch = sim._fetch_global
        state_full = type(sim.state)(*(fetch(a) for a in sim.state))
        comp_full = (fetch(sim.comp)
                     if getattr(sim, "comp", None) is not None else None)
    meta = dict(
        version=CHECKPOINT_VERSION,
        scheme=sim.config.scheme,
        dtype=sim.config.dtype,
        rows=sim.domain.rows,
        cols=sim.domain.cols,
        logical_rows=sim.domain.logical_rows,
        logical_cols=sim.domain.logical_cols,
        duration=sim.config.duration,
        datum=getattr(sim.domain, "datum", 0.0),
    )
    arrays = dict(
        meta=json.dumps(meta),
        z=state_full.z,
        zmax=state_full.zmax,
        qx=state_full.qx,
        qy=state_full.qy,
        t=np.asarray(sim.carry.t),
        dt=np.asarray(sim.carry.dt),
        t_hydro=np.asarray(sim.carry.t_hydro),
        batch_dt_total=np.asarray(sim.carry.batch_dt_total),
        batch_successful=np.asarray(sim.carry.batch_successful),
        batch_skipped=np.asarray(sim.carry.batch_skipped),
    )
    if comp_full is not None:
        # Compensated-f32 residue plane — without it a resume would
        # restart the rounding error from zero (harmless but inexact).
        arrays["comp"] = comp_full
    if jax.process_index() == 0:
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(path, **arrays)
    if jax.process_count() > 1:
        # Barrier so a rank resuming right after the save (shared
        # filesystem) never reads a half-written file.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("hipims_checkpoint_save")


def _save_checkpoint_streamed(path, sim, snap):
    """Bounded-memory checkpoint: every plane streams chunk-by-chunk into
    one zip member (runtime/sharded_io.py), so no full plane is ever
    assembled on any host.  The container is np.savez_compressed-
    compatible — load_checkpoint reads both formats identically.  Chunk
    collectives run on EVERY rank; only rank 0 writes."""
    import json as _json

    import jax

    from .sharded_io import StreamingCheckpointWriter, stream_global_rows

    write = jax.process_index() == 0
    meta = dict(
        version=CHECKPOINT_VERSION,
        scheme=sim.config.scheme,
        dtype=sim.config.dtype,
        rows=sim.domain.rows,
        cols=sim.domain.cols,
        logical_rows=sim.domain.logical_rows,
        logical_cols=sim.domain.logical_cols,
        duration=sim.config.duration,
        datum=getattr(sim.domain, "datum", 0.0),
    )
    planes = [("z", sim.state.z), ("zmax", sim.state.zmax),
              ("qx", sim.state.qx), ("qy", sim.state.qy)]
    if getattr(sim, "comp", None) is not None:
        planes.append(("comp", sim.comp))
    zw = None
    if write:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        zw = StreamingCheckpointWriter(path)
        zw.add_array("meta", _json.dumps(meta))
        for key, val in (("t", sim.carry.t), ("dt", sim.carry.dt),
                         ("t_hydro", sim.carry.t_hydro),
                         ("batch_dt_total", sim.carry.batch_dt_total),
                         ("batch_successful", sim.carry.batch_successful),
                         ("batch_skipped", sim.carry.batch_skipped)):
            zw.add_array(key, np.asarray(val))
    for key, arr in planes:
        chunks = (c for _, c in stream_global_rows(arr, snap.chunk_rows))
        if write:
            zw.stream_array(key, arr.shape, np.dtype(arr.dtype), chunks)
        else:
            for _ in chunks:        # symmetric collectives, data dropped
                pass
    if write:
        zw.close()
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("hipims_checkpoint_save")


def load_checkpoint(path, sim):
    """Restore a checkpoint into an existing (compatible) Simulation."""
    import jax.numpy as jnp

    with np.load(Path(path), allow_pickle=False) as data:
        meta = json.loads(str(data["meta"]))
        if meta["version"] != CHECKPOINT_VERSION:
            raise ValueError(f"unsupported checkpoint version "
                             f"{meta['version']}")
        if (meta["rows"], meta["cols"]) != (sim.domain.rows,
                                            sim.domain.cols):
            raise ValueError(
                f"checkpoint grid {meta['rows']}x{meta['cols']} does not "
                f"match simulation {sim.domain.rows}x{sim.domain.cols}")
        if meta["scheme"] != sim.config.scheme:
            raise ValueError(f"checkpoint scheme '{meta['scheme']}' != "
                             f"'{sim.config.scheme}'")
        ck_datum = meta.get("datum", 0.0)
        if ck_datum != getattr(sim.domain, "datum", 0.0):
            raise ValueError(
                f"checkpoint datum {ck_datum} != simulation datum "
                f"{getattr(sim.domain, 'datum', 0.0)} (precision modes "
                "with different datum shifts cannot resume each other)")
        gs = None
        if sim.mesh is not None:
            from ..parallel.mesh import grid_sharding
            gs = grid_sharding(sim.mesh)

        def put(key):
            # One plane at a time: read -> cast -> place (sharded when a
            # mesh is active) -> free, so peak host memory is ONE plane,
            # not the whole state (matters at streamed-checkpoint scale).
            import jax
            arr = np.asarray(data[key], dtype=sim.dtype)
            return jax.device_put(arr, gs) if gs is not None \
                else jnp.asarray(arr)

        sim.state = FlowState(z=put("z"), zmax=put("zmax"),
                              qx=put("qx"), qy=put("qy"))
        if getattr(sim, "compensated", False):
            sim.comp = (put("comp") if "comp" in data
                        else jnp.zeros_like(sim.state.z))
        dt_arr = jnp.asarray
        sim.carry = StepCarry(
            t=dt_arr(data["t"], dtype=sim.dtype),
            dt=dt_arr(data["dt"], dtype=sim.dtype),
            t_hydro=dt_arr(data["t_hydro"], dtype=sim.dtype),
            batch_dt_total=dt_arr(data["batch_dt_total"], dtype=sim.dtype),
            batch_successful=jnp.asarray(data["batch_successful"]),
            batch_skipped=jnp.asarray(data["batch_skipped"]))
    return sim
