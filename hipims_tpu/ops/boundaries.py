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
              params: SchemeParams, comp=None, origin=None):
        # Series ride the state dtype — without the cast an x64-enabled
        # host would silently promote the f32 state update to f64.
        values = jnp.asarray(self.values, dtype=state.z.dtype)
        idx = jnp.clip((t / self.interval).astype(jnp.int32), 0,
                       values.shape[0] - 1)
        rate = values[idx] * MM_PER_HOUR_TO_M_PER_S * t_hydro

        live = ((t_hydro >= C.TIMESTEP_HYDROLOGICAL) & (dt > 0.0)
                & (t < self.length))
        sl = (slice(1, -1), slice(1, -1))
        zc = state.z[sl]
        enabled = state.zmax[sl] > C.NODATA
        apply_mask = live & enabled
        if self.is_loss:
            # Loss clamps at the bed; as a signed increment so the
            # compensated path can accumulate it exactly.
            delta = jnp.maximum(static.zb[sl] - zc, -rate)
        else:
            delta = jnp.broadcast_to(rate, zc.shape)
        delta = jnp.where(apply_mask, delta, 0.0)
        if comp is None:
            new = state._replace(z=state.z.at[sl].set(zc + delta))
            return new
        # A sub-ulp rainfall increment vanishes in plain f32 (z + delta
        # == z); the compensation plane is what preserves it.
        z_new, comp_new = comp_add(zc, comp[sl], delta)
        if self.is_loss:
            # comp_add can round the visible z one ulp below the bed,
            # where dry keep-masks would freeze the negative depth; clamp
            # the visible plane at the bed and fold the clamp residue into
            # comp so the tracked true surface is unchanged.
            z_clamped = jnp.maximum(static.zb[sl], z_new)
            comp_new = comp_new - (z_clamped - z_new)
            z_new = z_clamped
        return (state._replace(z=state.z.at[sl].set(z_new)),
                comp.at[sl].set(comp_new))


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

    def apply(self, state: FlowState, static: DomainStatic, t, dt, t_hydro,
              params: SchemeParams, comp=None, origin=None):
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

        live = (t_hydro >= C.TIMESTEP_HYDROLOGICAL) & (dt > 0.0)
        sl = (slice(1, -1), slice(1, -1))
        zc = state.z[sl]
        enabled = (state.zmax[sl] > C.NODATA) & (zc != C.NODATA)
        delta = jnp.where(live & enabled, rate[sl], 0.0)
        if comp is None:
            return state._replace(z=state.z.at[sl].set(zc + delta))
        z_new, comp_new = comp_add(zc, comp[sl], delta)
        return (state._replace(z=state.z.at[sl].set(z_new)),
                comp.at[sl].set(comp_new))


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
              params: SchemeParams, comp=None, origin=None):
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
            rr, cc = self.rows, self.cols
        else:
            # Mesh mode: map the GLOBAL cell indices onto this device's
            # local block; cells outside it become (-1, -1), which the
            # drop-mode scatters below discard (the reference applies cell
            # boundaries with per-domain local indices,
            # src/Boundaries/CBoundaryCell.cpp:447-451).  Halo copies of a
            # forced cell land inside the extended block and receive the
            # same forcing their owner applies, keeping the halo-deep
            # window's shrinking-validity invariant.
            oy, ox = origin
            lr = jnp.asarray(self.rows, jnp.int32) - oy
            lc = jnp.asarray(self.cols, jnp.int32) - ox
            nr, nc = state.z.shape
            inside = (lr >= 0) & (lr < nr) & (lc >= 0) & (lc < nc)
            rr = jnp.where(inside, lr, -1)
            cc = jnp.where(inside, lc, -1)

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

        # mode="drop" discards the (-1, -1) out-of-block entries under a
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
                     origin=None):
    """Apply every configured boundary in order (reference fan-out:
    src/Boundaries/CBoundaryMap.cpp:76-91).  With ``comp`` (compensated-f32
    z accumulation) returns (state, comp).  ``origin`` georeferences a
    mesh-local block (see module docstring)."""
    if comp is None:
        for b in boundaries:
            state = b.apply(state, static, t, dt, t_hydro, params,
                            origin=origin)
        return state
    for b in boundaries:
        state, comp = b.apply(state, static, t, dt, t_hydro, params,
                              comp=comp, origin=origin)
    return state, comp
