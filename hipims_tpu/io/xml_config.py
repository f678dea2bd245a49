"""HiPIMS XML configuration loader.

Parses the reference's configuration schema (see
/root/reference/README.md:52-99 and src/Datasets/CXMLDataset.cpp:115-239;
scheme parameters src/Schemes/CSchemeGodunov.cpp:113-338; boundary
attributes src/Boundaries/CBoundaryCell.cpp:60-100,
CBoundaryUniform.cpp:59-62) into framework objects, so existing HiPIMS
model configurations run unmodified.

Unlike the reference, ``<domainEdge>`` is actually honoured (the reference
declares but never parses it — SURVEY.md "known quirks").
"""

from __future__ import annotations

import dataclasses
import datetime
import os
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..domain import Domain
from ..ops import boundaries as B
from ..runtime.output import RasterOutputWriter
from ..runtime.simulation import Simulation, SimulationConfig
from .csv_series import read_timeseries_csv, series_interval, series_length
from .raster import read_raster


@dataclasses.dataclass
class LoadedModel:
    name: str
    description: str
    domain: Domain
    config: SimulationConfig
    boundaries: list
    output_targets: list
    target_dir: str

    def simulation(self, mesh=None) -> Simulation:
        from ..runtime.output import (CompositeOutputWriter,
                                      GaugeOutputWriter, read_gauge_map)
        writers = []
        rasters = [t for t in self.output_targets
                   if t.get("kind", "raster") == "raster"]
        if rasters:
            writers.append(RasterOutputWriter(rasters, self.target_dir,
                                              self.domain))
        for t in self.output_targets:
            if t.get("kind") == "timeseries":
                gauges = read_gauge_map(t["source"])
                writers.append(GaugeOutputWriter(
                    t["value"], gauges,
                    Path(self.target_dir) / t["target"], self.domain))
        writer = None
        if writers:
            writer = (writers[0] if len(writers) == 1
                      else CompositeOutputWriter(writers))
        return Simulation(self.domain, self.config,
                          boundaries=self.boundaries,
                          output_writer=writer, mesh=mesh)


def _params_of(el) -> dict:
    out = {}
    for p in el.findall("parameter"):
        out[p.get("name", "").strip().lower()] = p.get("value", "").strip()
    return out


def load_config(path) -> LoadedModel:
    path = Path(path)
    base = path.parent
    tree = ET.parse(path)
    root = tree.getroot()

    meta = root.find("metadata")
    name = meta.findtext("name", "") if meta is not None else ""
    desc = meta.findtext("description", "") if meta is not None else ""

    sim_el = root.find("simulation")
    if sim_el is None:
        raise ValueError(f"{path}: missing <simulation>")
    sim_params = _params_of(sim_el)

    cfg = SimulationConfig()
    cfg.duration = float(sim_params.get("duration", 3600.0))
    cfg.output_frequency = float(sim_params.get("outputfrequency",
                                                cfg.duration))
    precision = sim_params.get("floatingpointprecision", "double").lower()
    cfg.dtype = "float64" if precision in ("double", "float64") else "float32"

    # Real-world start time (drives strftime masks for gridded boundaries;
    # reference: src/CModel.cpp:90-92 "realstart" + Util::fromTimestamp).
    real_start = None
    rs_el = None
    for pel in sim_el.findall("parameter"):
        if pel.get("name", "").strip().lower() == "realstart":
            rs_el = pel
    if rs_el is not None:
        fmt = rs_el.get("format", "%Y-%m-%d %H:%M:%S")
        real_start = datetime.datetime.strptime(rs_el.get("value"), fmt)

    domain_set = sim_el.find("domainSet")
    dom_els = domain_set.findall("domain") if domain_set is not None else []
    if not dom_els:
        raise ValueError(f"{path}: missing <domain>")
    dom_el = dom_els[0]
    # The reference's multi-domain decomposition splits one logical grid
    # into overlapping per-device rasters (tools/model-builder --decompose;
    # src/Domain/CDomainManager.cpp:170-241).  On TPU the devices share one
    # sharded grid, so multiple <domain> entries are stitched back into
    # their union extent; <domainSet syncMethod> selects the mesh sync
    # discipline (kSyncTimestep / kSyncForecast, src/Schemes/CScheme.h:57).
    sync_method = (domain_set.get("syncMethod", "forecast")
                   if domain_set is not None else "timestep").strip().lower()
    cfg.sync_method = ("forecast" if sync_method.startswith("forecast")
                       else "timestep")

    data_el = dom_el.find("data")
    source_dir = base / (data_el.get("sourceDir", "") if data_el is not None
                         else "")
    target_dir = base / (data_el.get("targetDir", "output")
                         if data_el is not None else "output")

    # ---- data sources ------------------------------------------------
    structure = None
    constants = {}
    rasters = {}
    targets = []
    if data_el is not None:
        for src in data_el.findall("dataSource"):
            values = [v.strip().lower()
                      for v in src.get("value", "").split(",")]
            kind = src.get("type", "raster").strip().lower()
            sval = src.get("source", "")
            for v in values:
                if kind == "constant":
                    constants[v] = float(sval)
                else:
                    rast = read_raster(source_dir / sval)
                    rasters[v] = rast
                    if v in ("structure", "dem"):
                        structure = rast
        for tgt in data_el.findall("dataTarget"):
            kind = tgt.get("type", "raster").strip().lower()
            entry = dict(
                kind=kind,
                value=tgt.get("value", "depth").strip().lower(),
                format=tgt.get("format", "GTiff").strip().lower(),
                target=tgt.get("target", "out_%t.tif"))
            if kind == "timeseries":
                # Point-gauge sampling (framework extension): source is a
                # gauge map CSV of (x, y[, name]) world coordinates.
                entry["source"] = str(base / tgt.get("source", ""))
            targets.append(entry)

    if structure is None:
        raise ValueError(f"{path}: no structure/dem raster source")

    if len(dom_els) > 1:
        structure = _stitch_domains(dom_els, base, structure)

    zb = structure.to_domain_array().astype(np.float64)
    nodata = structure.nodata if structure.nodata is not None else -9999.0
    active = ~np.isclose(zb, nodata)
    manning = constants.get("manningcoefficient", 0.0)
    if "manningcoefficient" in rasters:
        manning = rasters["manningcoefficient"].to_domain_array()

    domain = Domain(zb=zb, manning=manning,
                    dx=structure.cell_size, dy=structure.cell_size,
                    xll=structure.xll, yll=structure.yll, active=active)

    if "depth" in rasters:
        domain.set_initial_depth(rasters["depth"].to_domain_array())
    elif "depth" in constants:
        domain.set_initial_depth(constants["depth"])
    if "fsl" in rasters:
        domain.set_initial_fsl(rasters["fsl"].to_domain_array())
    elif "fsl" in constants:
        domain.set_initial_fsl(constants["fsl"])

    # Initial velocity -> discharge conversion (reference:
    # src/Domain/CDomain.cpp handleInputData velocity cases).
    depth0 = None
    if domain._depth is not None:
        depth0 = np.asarray(domain._depth)
    elif domain._fsl is not None:
        depth0 = np.maximum(np.asarray(domain._fsl) - zb, 0.0)
    for comp, setter in (("x", "qx"), ("y", "qy")):
        vel = constants.get(f"velocity{comp}")
        if f"velocity{comp}" in rasters:
            vel = rasters[f"velocity{comp}"].to_domain_array()
        if vel is not None and depth0 is not None:
            q = np.asarray(vel) * depth0
            domain.set_initial_discharge(**{setter: q})
        dis = constants.get(f"discharge{comp}")
        if f"discharge{comp}" in rasters:
            dis = rasters[f"discharge{comp}"].to_domain_array()
        if dis is not None:
            domain.set_initial_discharge(
                **{setter: np.broadcast_to(np.asarray(dis), zb.shape)})

    # ---- scheme ------------------------------------------------------
    scheme_el = dom_el.find("scheme")
    if scheme_el is not None:
        cfg.scheme = scheme_el.get("name", "godunov").strip().lower()
        if cfg.scheme == "muscl-hancock" or cfg.scheme == "musclhancock":
            cfg.scheme = "muscl-hancock"
        sp = _params_of(scheme_el)
        cfg.courant = float(sp.get("courantnumber", cfg.courant))
        if "drythreshold" in sp:
            cfg.dry_threshold = float(sp["drythreshold"])
        mode = sp.get("timestepmode", "cfl").lower()
        cfg.timestep_mode = "fixed" if mode == "fixed" else "cfl"
        if "timestepinitial" in sp:
            cfg.initial_timestep = float(sp["timestepinitial"])
        if "timestepfixed" in sp:
            cfg.fixed_timestep = float(sp["timestepfixed"])
            cfg.timestep_mode = "fixed"
        fric = sp.get("frictioneffects", "yes").lower()
        cfg.friction = fric not in ("no", "off", "false", "0")
        if "queuesize" in sp:
            cfg.batch_size = max(1, int(float(sp["queuesize"])))
            cfg.batch_auto = False
        if sp.get("queuemode", "").lower() == "fixed":
            cfg.batch_auto = False

    # ---- boundaries --------------------------------------------------
    bounds: List = []
    bc_el = dom_el.find("boundaryConditions")
    if bc_el is not None:
        bc_dir = base / bc_el.get("sourceDir", "")
        shared_map = bc_el.get("mapFile")
        for edge_el in bc_el.findall("domainEdge"):
            edge = edge_el.get("edge", "").strip().lower()
            treatment = edge_el.get("treatment", "closed").strip().lower()
            if edge in domain.edge_treatment:
                domain.edge_treatment[edge] = treatment
        for ts in bc_el.findall("timeseries"):
            bounds.append(_parse_timeseries(ts, bc_dir, shared_map, domain,
                                            cfg.duration, real_start))

    return LoadedModel(name=name, description=desc, domain=domain,
                       config=cfg, boundaries=[b for b in bounds if b],
                       output_targets=targets, target_dir=str(target_dir))


def _parse_timeseries(ts, bc_dir: Path, shared_map: Optional[str],
                      domain: Domain, duration: float = 0.0,
                      real_start=None):
    kind = (ts.get("type") or "").strip().lower()
    value = (ts.get("value") or "").strip().lower()
    source = ts.get("source") or ""
    name = ts.get("name") or source

    if kind in ("atmospheric", "uniform"):
        series = read_timeseries_csv(bc_dir / source, n_cols=2)
        return B.UniformBoundary(
            values=series[:, 1],
            interval=series_interval(series),
            length=series_length(series),
            is_loss=(value in ("loss-rate", "loss")))

    if kind in ("cell", "flow", "flowconditions"):
        series = read_timeseries_csv(bc_dir / source, n_cols=4)
        map_file = ts.get("mapFile") or shared_map
        if map_file is None:
            raise ValueError(f"cell boundary '{name}' needs a map file")
        cells = _read_cell_map(bc_dir / map_file, name)
        rows, cols = _world_to_cells(cells, domain)
        depth_val = (ts.get("depthValue") or "fsl").strip().lower()
        dis_val = (ts.get("dischargeValue") or "total").strip().lower()
        depth_mode = {"fsl": B.DEPTH_IS_FSL, "depth": B.DEPTH_IS_DEPTH,
                      "ignore": B.DEPTH_IGNORE, "disabled": B.DEPTH_IGNORE,
                      "critical": B.DEPTH_IS_CRITICAL}.get(depth_val,
                                                           B.DEPTH_IS_FSL)
        dmode = {"total": B.DISCHARGE_IS_DISCHARGE,
                 "cell": B.DISCHARGE_IS_DISCHARGE,
                 "velocity": B.DISCHARGE_IS_VELOCITY,
                 "ignore": B.DISCHARGE_IGNORE,
                 "disabled": B.DISCHARGE_IGNORE,
                 "volume": B.DISCHARGE_IS_VOLUME,
                 "surging": B.DISCHARGE_IS_VOLUME}.get(dis_val,
                                                       B.DISCHARGE_IS_DISCHARGE)
        series = series.copy()
        if dis_val == "total" and len(rows):
            series[:, 2] /= len(rows)   # host-side division, reference
            series[:, 3] /= len(rows)   # CBoundaryCell.cpp:345-355
        return B.CellBoundary(rows=np.asarray(rows, np.int32),
                              cols=np.asarray(cols, np.int32),
                              series=series,
                              interval=series_interval(series),
                              length=series_length(series),
                              depth_mode=depth_mode, discharge_mode=dmode)

    if kind in ("gridded", "spatially-varying"):
        return _parse_gridded(ts, bc_dir, domain, duration, real_start)

    raise ValueError(f"unknown timeseries type '{kind}'")


def _stitch_domains(dom_els, base: Path, first):
    """Composite multiple (overlapping) domain structure rasters into their
    union grid.  Later domains overwrite the overlap rows, mirroring how
    the reference's decomposed configs tile one logical model."""
    from .raster import Raster

    rasters = []
    for el in dom_els:
        data_el = el.find("data")
        sdir = base / data_el.get("sourceDir", "")
        for src in data_el.findall("dataSource"):
            values = [v.strip().lower()
                      for v in src.get("value", "").split(",")]
            if src.get("type", "raster").strip().lower() != "constant"                     and ("structure" in values or "dem" in values):
                rasters.append(read_raster(sdir / src.get("source")))
    cell = rasters[0].cell_size
    for r in rasters:
        if abs(r.cell_size - cell) > 1e-9:
            raise ValueError("multi-domain stitch requires equal resolution")
    xll = min(r.xll for r in rasters)
    yll = min(r.yll for r in rasters)
    x_hi = max(r.xll + r.cols * cell for r in rasters)
    y_hi = max(r.yll + r.rows * cell for r in rasters)
    cols = int(round((x_hi - xll) / cell))
    rows = int(round((y_hi - yll) / cell))
    union = np.full((rows, cols), rasters[0].nodata
                    if rasters[0].nodata is not None else -9999.0)
    for r in rasters:
        c0 = int(round((r.xll - xll) / cell))
        r0 = int(round((r.yll - yll) / cell))
        dom = r.to_domain_array()
        union[r0:r0 + r.rows, c0:c0 + r.cols] = dom
    return Raster.from_domain_array(union, xll=xll, yll=yll,
                                    cell_size=cell,
                                    nodata=rasters[0].nodata)


def _parse_gridded(ts, bc_dir: Path, domain: Domain, duration: float,
                   real_start):
    """Time-stamped raster series: filenames from a strftime mask evaluated
    at realStart + t (reference: src/Boundaries/CBoundaryGridded.cpp:116-153
    + Util::fromTimestamp).  Missing files truncate the series length, as in
    the reference."""
    import datetime

    value = (ts.get("value") or "rain-intensity").strip().lower()
    mask = ts.get("mask") or ts.get("source")
    interval = float(ts.get("interval", "3600"))
    if real_start is None:
        real_start = datetime.datetime(1970, 1, 1)

    frames = []
    first = None
    length = duration
    t = 0.0
    while t <= duration:
        name = (real_start
                + datetime.timedelta(seconds=t)).strftime(mask)
        path = bc_dir / name
        if not path.exists():
            length = min(length, t)
            t += interval
            continue
        rast = read_raster(path)
        if first is None:
            first = rast
        frames.append(rast.data[::-1, :])   # domain orientation (south-up)
        t += interval

    if first is None:
        raise ValueError(f"no gridded boundary rasters found for '{mask}'")

    series = np.stack(frames)
    return B.GriddedBoundary(
        series=series,
        interval=interval,
        resolution=first.cell_size,
        offset_x=first.xll - domain.xll,
        offset_y=first.yll - domain.yll,
        mass_flux=(value == "mass-flux"))


def _read_cell_map(path: Path, name: str):
    """(x, y[, name]) world-coordinate rows for one named boundary
    (reference: CBoundaryCell::importMap, CBoundaryCell.cpp:232-296)."""
    import csv
    cells = []
    with open(path, newline="") as f:
        for rec in csv.reader(f):
            rec = [c.strip() for c in rec if c.strip() != ""]
            if len(rec) < 2:
                continue
            try:
                x, y = float(rec[0]), float(rec[1])
            except ValueError:
                continue
            if len(rec) >= 3 and rec[2] != name:
                continue
            cells.append((x, y))
    return cells


def _world_to_cells(cells, domain: Domain):
    rows, cols = [], []
    for x, y in cells:
        ci = int((x - domain.xll) / domain.dx)
        ri = int((y - domain.yll) / domain.dy)
        if 0 <= ri < domain.rows and 0 <= ci < domain.cols:
            rows.append(ri)
            cols.append(ci)
    return rows, cols


def build_simulation(path, mesh=None) -> Simulation:
    return load_config(path).simulation(mesh=mesh)
