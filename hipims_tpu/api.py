"""Embedding API — the equivalent of the reference's DLL surface.

The reference exports a C API for a Windows GUI (reference: src/main.h:99-154
SimulationLoad/Launch/Close/Abort, GetDeviceName/Count/Current,
GetDomainInfo; src/main.cpp:161-371).  This module provides the same
lifecycle for embedding the simulator in other Python applications or
services: load a model, launch it (optionally in a background thread),
poll progress, fetch field snapshots, abort.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Optional

import numpy as np


@dataclasses.dataclass
class DomainInfo:
    """Mirror of the reference's structDomainInfo (src/main.h:60-78)."""

    rows: int
    cols: int
    resolution: float
    xll: float
    yll: float
    cell_count: int
    scheme: str
    precision: str


class SimulationHandle:
    """One loaded simulation with launch/abort lifecycle."""

    def __init__(self, model, mesh=None):
        self._model = model
        self._sim = model.simulation(mesh=mesh)
        self._thread: Optional[threading.Thread] = None
        self._abort = threading.Event()
        self._error: Optional[BaseException] = None
        self._progress_cbs = []
        self._output_cbs = []
        self._snapshot = None       # live only inside on_output callbacks

    # -- reference: SimulationLaunch (main.cpp:202-230) -----------------
    def launch(self, blocking=True):
        if blocking:
            self._sim.run(progress=self._progress_cb)
            return self
        self._thread = threading.Thread(target=self._run_bg, daemon=True)
        self._thread.start()
        return self

    def _run_bg(self):
        try:
            self._sim.run(progress=self._progress_cb)
        except _Aborted:
            pass
        except BaseException as e:      # surfaced via .error
            self._error = e

    def _progress_cb(self, sim, t_now, elapsed):
        if self._abort.is_set():
            raise _Aborted()
        for cb in self._progress_cbs:
            cb(self, t_now, elapsed)

    # -- push-style callbacks (the DLL's visualisation surface) ----------
    def on_progress(self, callback):
        """Register callback(handle, t_now, batch_elapsed), fired once per
        device batch (the reference GUI's progress stream)."""
        self._progress_cbs.append(callback)
        return self

    def on_output(self, callback):
        """Register callback(handle, t), fired at every output time with
        the state already gathered — use handle.field(...) inside it for
        visualisation frames (the reference DLL's cell-data callbacks,
        src/main.h:99-154).  Rides the simulation's writer chain so the
        timing matches file outputs exactly.

        The chain adopts whatever writer is installed at registration
        time as its ``inner``; code that wants to ADD a writer after
        registering callbacks should wrap ``handle.simulation
        .output_writer.inner`` (or simply register before other writer
        modifications) — replacing ``output_writer`` outright would
        disconnect the callbacks, so each registration re-adopts a
        foreign writer it finds installed."""
        self._output_cbs.append(callback)
        current = self._sim.output_writer
        if not (isinstance(current, _ChainedWriter)
                and current.handle is self):
            self._sim.output_writer = _ChainedWriter(self, current)
        return self

    # -- reference: SimulationAbort (main.cpp:246-258) ------------------
    def abort(self):
        self._abort.set()
        if self._thread is not None:
            self._thread.join()

    # -- reference: SimulationClose (main.cpp:232-244) ------------------
    def close(self):
        self.abort()
        self._sim = None

    # -- polling ---------------------------------------------------------
    @property
    def time(self) -> float:
        return self._sim.t

    @property
    def progress(self) -> float:
        return min(1.0, self._sim.t / self._sim.config.duration)

    @property
    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    @property
    def error(self):
        return self._error

    # -- reference: GetDomainInfo (main.cpp:330-367) ---------------------
    def domain_info(self) -> DomainInfo:
        d = self._sim.domain
        return DomainInfo(rows=d.logical_rows, cols=d.logical_cols,
                          resolution=d.dx, xll=d.xll, yll=d.yll,
                          cell_count=d.logical_rows * d.logical_cols,
                          scheme=self._sim.config.scheme,
                          precision=self._sim.config.dtype)

    # -- field access (the DLL's visualisation callbacks) ----------------
    def field(self, value: str) -> np.ndarray:
        from .runtime.output import derive_field
        view = self._snapshot if self._snapshot is not None else self._sim
        datum = getattr(self._sim.domain, "datum", 0.0)
        if getattr(view, "streaming", False):
            # Streamed snapshot (io_mode='stream'/auto on large grids):
            # assemble ONLY the requested derived field from bounded
            # chunks.  Single-process only — inside a rank-gated callback
            # the chunk collectives would run asymmetrically and deadlock
            # a cluster, so multi-host embedders must use io_mode=
            # 'gather' for field access.
            import jax
            if jax.process_count() > 1:
                raise RuntimeError(
                    "field() inside an on_output callback is not "
                    "available in multi-process streamed-IO runs; set "
                    "io_mode='gather' (or sample gauges instead)")
            rows = [derive_field(value, st, sc, self._sim.domain.dx,
                                 datum=datum)
                    for _r0, st, sc in view.stream_chunks()]
            return np.concatenate(rows)
        return derive_field(value, view.state_logical,
                            view.static_logical, self._sim.domain.dx,
                            datum=datum)

    @property
    def simulation(self):
        return self._sim


class _ChainedWriter:
    """The writer installed by SimulationHandle.on_output: runs the
    adopted ``inner`` writer first, then fires the handle's callbacks
    with the event snapshot exposed.  ``inner`` is a public attribute so
    later code can extend the chain instead of clobbering it."""

    def __init__(self, handle, inner):
        self.handle = handle
        self.inner = inner

    def __call__(self, sim_view, t):
        if self.inner is not None:
            self.inner(sim_view, t)
        # In streamed multi-host mode the writer runs on EVERY rank (its
        # chunk iteration is collective); user callbacks must still fire
        # once, on the writing rank only.
        if not getattr(sim_view, "write_files", True):
            return
        h = self.handle
        # Expose the event's snapshot so field() inside a callback costs
        # no extra gathers (gathered mode) / streams bounded chunks
        # (streamed mode).
        h._snapshot = sim_view
        try:
            for cb in h._output_cbs:
                cb(h, t)
        finally:
            h._snapshot = None


class _Aborted(Exception):
    pass


def simulation_load(config_file, mesh=None) -> SimulationHandle:
    """Load an XML model configuration (reference: SimulationLoad,
    src/main.cpp:180-200)."""
    from .io.xml_config import load_config
    return SimulationHandle(load_config(config_file), mesh=mesh)


def device_count() -> int:
    """Reference: GetDeviceCount (src/main.cpp:294-308)."""
    import jax
    return len(jax.devices())


def device_name(index: int = 0) -> str:
    """Reference: GetDeviceName (src/main.cpp:262-292)."""
    import jax
    d = jax.devices()[index]
    return f"{d.platform}:{d.device_kind}"
