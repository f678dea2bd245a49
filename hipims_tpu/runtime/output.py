"""Raster output writing with derived fields and %t filename substitution.

Mirrors CRasterDataset::domainToRaster (reference:
src/Datasets/CRasterDataset.cpp:101-290): depth/maxdepth clamp + 1e-8
nodata floor, velocity = Q/h (nodata when dry), Froude = |v|/sqrt(gh),
discharge scaled by cell resolution, FSL/maxFSL masked on dry or walled
cells, -9999 nodata, bottom-up row order.
"""

from __future__ import annotations

import numpy as np

from .. import constants as C
from ..io.raster import Raster, write_raster

NODATA = -9999.0
_EPS = 1e-8

VALUE_NAMES = ("depth", "maxdepth", "fsl", "maxfsl", "velocityx",
               "velocityy", "dischargex", "dischargey", "froude", "dem",
               "manningcoefficient")


def derive_field(value: str, state, static, resolution: float) -> np.ndarray:
    """Compute one output field (domain orientation) with nodata masking."""
    value = value.strip().lower()
    z = np.asarray(state.z, dtype=np.float64)
    zmax = np.asarray(state.zmax, dtype=np.float64)
    qx = np.asarray(state.qx, dtype=np.float64)
    qy = np.asarray(state.qy, dtype=np.float64)
    zb = np.asarray(static.zb, dtype=np.float64)
    h = z - zb

    if value == "depth":
        out = np.maximum(0.0, h)
        out[out < _EPS] = NODATA
    elif value == "maxdepth":
        out = np.maximum(0.0, zmax - zb)
        out[(out < _EPS) | (out <= -9990.0) | (out >= 9999.0)] = NODATA
    elif value == "fsl":
        out = z.copy()
        out[(z < zb + _EPS) | (zb > 9999.0)] = NODATA
    elif value == "maxfsl":
        out = zmax.copy()
        out[(zmax < zb + _EPS) | (zb > 9999.0)] = NODATA
    elif value == "velocityx":
        out = np.where(h > _EPS, qx / np.where(h > _EPS, h, 1.0), NODATA)
    elif value == "velocityy":
        out = np.where(h > _EPS, qy / np.where(h > _EPS, h, 1.0), NODATA)
    elif value == "dischargex":
        out = qx * resolution
    elif value == "dischargey":
        out = qy * resolution
    elif value == "froude":
        hs = np.where(h > _EPS, h, 1.0)
        vel = np.hypot(qx / hs, qy / hs)
        out = np.where(h > _EPS, vel / np.sqrt(C.GRAVITY * hs), NODATA)
    elif value == "dem":
        out = zb.copy()
    elif value == "manningcoefficient":
        out = np.asarray(static.manning, dtype=np.float64).copy()
    else:
        raise ValueError(f"unknown output value '{value}'")
    return out


class RasterOutputWriter:
    """Writes the configured <dataTarget> rasters at each output time."""

    def __init__(self, targets, target_dir, domain):
        """targets: list of dicts with keys value, format, target (filename
        mask with %t)."""
        import os
        self.targets = targets
        self.target_dir = target_dir
        self.domain = domain
        os.makedirs(target_dir, exist_ok=True)

    def __call__(self, sim, t: float):
        from pathlib import Path
        for tgt in self.targets:
            field = derive_field(tgt["value"], sim.state_logical,
                                 sim.static_logical, sim.domain.dx)
            name = tgt["target"].replace("%t", str(int(round(t))))
            raster = Raster.from_domain_array(
                field, xll=self.domain.xll, yll=self.domain.yll,
                cell_size=self.domain.dx, nodata=NODATA)
            write_raster(Path(self.target_dir) / name, raster,
                         fmt=tgt.get("format", "tif"))
