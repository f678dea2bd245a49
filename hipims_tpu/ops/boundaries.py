"""Boundary-condition operators: uniform (atmospheric), per-cell timeseries,
and gridded (radar) sources.

Mirror the three device kernels bdy_Uniform / bdy_Cell / bdy_Gridded
(reference: src/Boundaries/CLBoundaries.clc:23-246) and their host-side
preparation (src/Boundaries/CBoundaryCell.cpp:298-460,
CBoundaryUniform.cpp, CBoundaryGridded.cpp).  Each boundary is a pytree
dataclass carrying its device-resident series arrays plus static metadata;
application happens at the top of every timestep on the current state, as in
the reference's scheduleIteration ordering
(src/Schemes/CSchemeGodunov.cpp:1617-1666).

Uniform and gridded sources are gated by the hydrological accumulator
(TIMESTEP_HYDROLOGICAL) and use nearest-record lookup; cell boundaries apply
every step with linear interpolation in time.

Every ``apply`` takes an optional ``origin=(row0, col0)``: the GLOBAL grid
index of the array's [0, 0] cell.  On a device mesh the halo-deep window
(parallel/halo_deep.py) hands each boundary its local halo-extended block,
so position-dependent forcing (gridded georeferencing, cell scatter
indices) must evaluate in global coordinates — the reference builds the
same per-domain transform in CBoundaryGridded
(src/Boundaries/CBoundaryGridded.cpp:116-153 via
CRasterDataset::createTransformationForDomain) and scatters cell
boundaries with domain-local indices (src/Boundaries/CBoundaryCell.cpp:
447-451).  ``origin=None`` (the default) means the array IS the global
grid.

``apply`` also takes ``mask``: a boolean array (broadcastable to the
state) that is True exactly where forcing is ALLOWED.  The runtime
passes the logical grid minus the scheme's static ring
(``interior_force_mask``), so every execution path — single device,
GSPMD mesh, halo-deep/Pallas mesh — forces exactly the same set of
cells: the scheme's never-updated ghost ring receives no forcing
anywhere.  ``mask=None`` falls back to excluding the array's outermost
ring (standalone use).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..state import DomainStatic, FlowState
from .compensated import comp_add
from .godunov import SchemeParams

MM_PER_HOUR_TO_M_PER_S = 1.0 / 3_600_000.0


def interior_force_mask(shape, logical_rows, logical_cols, ring,
                        origin=None):
    """True where boundary forcing is allowed: inside the logical grid,
    more than ``ring`` cells from its edge (the scheme's static ghost
    ring is never updated by the kernels, so forcing it would create
    path-dependent state — see module docstring).  Built from iota so it
    fuses under jit; ``origin`` shifts to global coordinates for a
    mesh-local block."""
    oy, ox = (0, 0) if origin is None else origin
    gy = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + oy
    gx = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + ox
    return ((gy >= ring) & (gy < logical_rows - ring)
            & (gx >= ring) & (gx < logical_cols - ring))


def _default_mask(shape):
    """Legacy standalone behaviour: exclude the array's outermost ring."""
    gy = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((gy >= 1) & (gy < shape[0] - 1)
            & (gx >= 1) & (gx < shape[1] - 1))

# Depth-definition modes (reference: src/Boundaries/CLBoundaries.clh:35-38).
DEPTH_IGNORE = 0
DEPTH_IS_FSL = 1
DEPTH_IS_DEPTH = 2
DEPTH_IS_CRITICAL = 3

# Discharge-definition modes (reference: CLBoundaries.clh:40-43).
DISCHARGE_IGNORE = 0
DISCHARGE_IS_DISCHARGE = 1
DISCHARGE_IS_VELOCITY = 2
DISCHARGE_IS_VOLUME = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class UniformBoundary:
    """Domain-wide rainfall or loss rate (mm/hr), nearest-record in time."""

    values: jax.Array                       # (T,) rates in mm/hr
    interval: float = dataclasses.field(metadata=dict(static=True))
    length: float = dataclasses.field(metadata=dict(static=True))
    is_loss: bool = dataclasses.field(metadata=dict(static=True))

    def apply(self, state: FlowState, static: DomainStatic, t, dt, t_hydro,
              params: SchemeParams, comp=None, origin=None, mask=None):
        # Series ride the state dtype — without the cast an x64-enabled
        # host would silently promote the f32 state update to f64.
        values = jnp.asarray(self.values, dtype=state.z.dtype)
        idx = jnp.clip((t / self.interval).astype(jnp.int32), 0,
                       values.shape[0] - 1)
        rate = values[idx] * MM_PER_HOUR_TO_M_PER_S * t_hydro

        live = ((t_hydro >= C.TIMESTEP_HYDROLOGICAL) & (dt > 0.0)
                & (t < self.length))
        if mask is None:
            mask = _default_mask(state.z.shape)
        zc = state.z
        enabled = state.zmax > C.NODATA
        apply_mask = live & enabled & mask
        if self.is_loss:
            # Loss clamps at the bed; as a signed increment so the
            # compensated path can accumulate it exactly.
            delta = jnp.maximum(static.zb - zc, -rate)
        else:
            delta = jnp.broadcast_to(rate, zc.shape)
        delta = jnp.where(apply_mask, delta, 0.0)
        if comp is None:
            return state._replace(z=zc + delta)
        # A sub-ulp rainfall increment vanishes in plain f32 (z + delta
        # == z); the compensation plane is what preserves it.  Unforced
        # cells must keep (z, comp) EXACTLY (comp_add with delta=0 would
        # still fold the residue into the visible z), hence the selects.
        z_new, comp_new = comp_add(zc, comp, delta)
        if self.is_loss:
            # comp_add can round the visible z one ulp below the bed,
            # where dry keep-masks would freeze the negative depth; clamp
            # the visible plane at the bed and fold the clamp residue into
            # comp so the tracked true surface is unchanged.
            z_clamped = jnp.maximum(static.zb, z_new)
            comp_new = comp_new - (z_clamped - z_new)
            z_new = z_clamped
        z_new = jnp.where(apply_mask, z_new, zc)
        comp_new = jnp.where(apply_mask, comp_new, comp)
        return state._replace(z=z_new), comp_new


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GriddedBoundary:
    """Spatially varying (radar) rainfall or mass flux on a coarser grid."""

    series: jax.Array                       # (T, grid_rows, grid_cols)
    interval: float = dataclasses.field(metadata=dict(static=True))
    resolution: float = dataclasses.field(metadata=dict(static=True))
    offset_x: float = dataclasses.field(metadata=dict(static=True))
    offset_y: float = dataclasses.field(metadata=dict(static=True))
    mass_flux: bool = dataclasses.field(metadata=dict(static=True))
    # End-of-series gate: past it the boundary applies nothing (the
    # reference instead clamps to an out-of-bounds frame index and rains
    # the last frame forever, src/Boundaries/CLBoundaries.clc:229-230).
    length: float = dataclasses.field(default=float("inf"),
                                      metadata=dict(static=True))

    def apply(self, state: FlowState, static: DomainStatic, t, dt, t_hydro,
              params: SchemeParams, comp=None, origin=None, mask=None):
        series = jnp.asarray(self.series, dtype=state.z.dtype)
        tcount, grows, gcols = series.shape
        ti = jnp.clip((t / self.interval).astype(jnp.int32), 0, tcount - 1)

        rows, cols = state.z.shape
        # Cell centre -> boundary-grid indices in GLOBAL grid coordinates
        # (clamped; the reference would read out of bounds for cells
        # outside the grid).  ``origin`` georeferences a mesh device's
        # local block; the reference builds the same per-domain transform
        # (src/Boundaries/CBoundaryGridded.cpp:116-153).
        oy, ox = (0, 0) if origin is None else origin
        xi = ((ox + jnp.arange(cols)) * params.dx
              - self.offset_x) / self.resolution
        yi = ((oy + jnp.arange(rows)) * params.dy
              - self.offset_y) / self.resolution
        ci = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, gcols - 1)
        ri = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, grows - 1)
        rate = series[ti][ri[:, None], ci[None, :]]
        if self.mass_flux:
            rate = rate / (params.dx * params.dy) * t_hydro
        else:
            rate = rate * MM_PER_HOUR_TO_M_PER_S * t_hydro

        live = ((t_hydro >= C.TIMESTEP_HYDROLOGICAL) & (dt > 0.0)
                & (t < self.length))
        if mask is None:
            mask = _default_mask(state.z.shape)
        zc = state.z
        enabled = (state.zmax > C.NODATA) & (zc != C.NODATA)
        delta = jnp.where(live & enabled & mask, rate, 0.0)
        if comp is None:
            return state._replace(z=zc + delta)
        # Select-guarded as in UniformBoundary: unforced cells keep
        # (z, comp) exactly.
        z_new, comp_new = comp_add(zc, comp, delta)
        forced = live & enabled & mask
        z_new = jnp.where(forced, z_new, zc)
        comp_new = jnp.where(forced, comp_new, comp)
        return state._replace(z=z_new), comp_new


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CellBoundary:
    """Per-cell timeseries boundary (depth / FSL / discharge / velocity /
    volume surge), linearly interpolated in time.

    ``series`` columns are (time, depth-or-level, discharge-x, discharge-y);
    total-discharge series are pre-divided by the relation count at
    construction, as the reference does host-side
    (src/Boundaries/CBoundaryCell.cpp:345-355).
    """

    rows: jax.Array                         # (K,) int cell row indices
    cols: jax.Array                         # (K,) int cell col indices
    series: jax.Array                       # (T, 4)
    interval: float = dataclasses.field(metadata=dict(static=True))
    length: float = dataclasses.field(metadata=dict(static=True))
    depth_mode: int = dataclasses.field(metadata=dict(static=True))
    discharge_mode: int = dataclasses.field(metadata=dict(static=True))

    def apply(self, state: FlowState, static: DomainStatic, t, dt, t_hydro,
              params: SchemeParams, comp=None, origin=None, mask=None):
        g = C.GRAVITY
        series = jnp.asarray(self.series, dtype=state.z.dtype)
        tcount = series.shape[0]
        base = jnp.clip((t / self.interval).astype(jnp.int32), 0, tcount - 1)
        nxt = jnp.clip(base + 1, 0, tcount - 1)
        frac = jnp.mod(t, self.interval) / self.interval
        ts = series[base] + (series[nxt] - series[base]) * frac
        ts_depth, ts_qx, ts_qy = ts[1], ts[2], ts[3]

        live = (dt > 0.0) & (t < self.length)

        if origin is None:
            rr, cc = jnp.asarray(self.rows), jnp.asarray(self.cols)
        else:
            # Mesh mode: map the GLOBAL cell indices onto this device's
            # local block; cells outside it get a POSITIVE out-of-bounds
            # sentinel (nr, nc), which the drop-mode scatters below
            # discard (a negative sentinel would NOT work: JAX normalises
            # negative indices before the mode applies, so -1 would write
            # the block's last cell).  The reference applies cell
            # boundaries with per-domain local indices
            # (src/Boundaries/CBoundaryCell.cpp:447-451).  Halo copies of
            # a forced cell land inside the extended block and receive
            # the same forcing their owner applies, keeping the halo-deep
            # window's shrinking-validity invariant.
            oy, ox = origin
            lr = jnp.asarray(self.rows, jnp.int32) - oy
            lc = jnp.asarray(self.cols, jnp.int32) - ox
            nr, nc = state.z.shape
            inside = (lr >= 0) & (lr < nr) & (lc >= 0) & (lc < nc)
            rr = jnp.where(inside, lr, nr)
            cc = jnp.where(inside, lc, nc)

        if mask is not None:
            # Forcing disallowed on masked-out cells (the static ghost
            # ring): redirect those scatters to the dropped sentinel so
            # every execution path forces the identical cell set.  The
            # gather clips at the edge for already-out-of-block entries,
            # whose scatters are dropped regardless of the mask value.
            nr_, nc_ = state.z.shape
            allowed = mask[jnp.clip(rr, 0, nr_ - 1),
                           jnp.clip(cc, 0, nc_ - 1)]
            rr = jnp.where(allowed, rr, nr_)
            cc = jnp.where(allowed, cc, nc_)

        zb_c = static.zb[rr, cc]
        z_c = state.z[rr, cc]

        if self.depth_mode == DEPTH_IS_DEPTH:
            z_new = zb_c + ts_depth
        elif self.depth_mode == DEPTH_IS_FSL:
            # Timeseries levels are absolute; device elevations may ride a
            # shifted datum (SchemeParams.datum).
            z_new = jnp.maximum(zb_c, ts_depth - params.datum)
        else:
            # Free surface: build up depth from the discharge being pushed in
            # (critical-depth floor), reference CLBoundaries.clc:69-101.
            if self.discharge_mode == DISCHARGE_IS_VOLUME:
                d_depth = jnp.abs(ts_qx) * dt / (params.dx * params.dy)
                d_crit = jnp.zeros_like(d_depth)
                inject = jnp.asarray(True)
            else:
                d_depth = (jnp.abs(ts_qx) * dt / params.dy
                           + jnp.abs(ts_qy) * dt / params.dx)
                d_crit = jnp.maximum(jnp.cbrt(ts_qx * ts_qx / g),
                                     jnp.cbrt(ts_qy * ts_qy / g))
                inject = (jnp.abs(ts_qx) > C.VERY_SMALL) \
                    | (jnp.abs(ts_qy) > C.VERY_SMALL)
            z_new = jnp.where(inject,
                              jnp.maximum(zb_c + d_crit, z_c + d_depth), z_c)

        if self.discharge_mode == DISCHARGE_IS_DISCHARGE:
            qx_new = jnp.broadcast_to(ts_qx, z_new.shape)
            qy_new = jnp.broadcast_to(ts_qy, z_new.shape)
        elif self.discharge_mode == DISCHARGE_IS_VELOCITY:
            qx_new = ts_qx * (z_new - zb_c)
            qy_new = ts_qy * (z_new - zb_c)
        else:
            qx_new = state.qx[rr, cc]
            qy_new = state.qy[rr, cc]

        z_new = jnp.where(live, z_new, z_c)
        qx_new = jnp.where(live, qx_new, state.qx[rr, cc])
        qy_new = jnp.where(live, qy_new, state.qy[rr, cc])

        # mode="drop" discards the (nr, nc) out-of-block entries under a
        # mesh origin; with origin=None every index is in bounds and drop
        # is a no-op.
        new = state._replace(
            z=state.z.at[rr, cc].set(z_new, mode="drop"),
            qx=state.qx.at[rr, cc].set(qx_new, mode="drop"),
            qy=state.qy.at[rr, cc].set(qy_new, mode="drop"),
        )
        if comp is None:
            return new
        # The boundary overwrites z outright, so the running-sum residue
        # at forced cells is reset while the forcing is live.
        comp_cells = jnp.where(live, 0.0, comp[rr, cc])
        return new, comp.at[rr, cc].set(comp_cells, mode="drop")


Boundaries = Tuple


def apply_boundaries(boundaries, state: FlowState, static: DomainStatic,
                     t, dt, t_hydro, params: SchemeParams, comp=None,
                     origin=None, mask=None):
    """Apply every configured boundary in order (reference fan-out:
    src/Boundaries/CBoundaryMap.cpp:76-91).  With ``comp`` (compensated-f32
    z accumulation) returns (state, comp).  ``origin`` georeferences a
    mesh-local block and ``mask`` bounds the forceable cells (see module
    docstring)."""
    if comp is None:
        for b in boundaries:
            state = b.apply(state, static, t, dt, t_hydro, params,
                            origin=origin, mask=mask)
        return state
    for b in boundaries:
        state, comp = b.apply(state, static, t, dt, t_hydro, params,
                              comp=comp, origin=origin, mask=mask)
    return state, comp
