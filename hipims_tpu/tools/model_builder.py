"""Model builder: generate ready-to-run model directories.

The reference ships a Node.js CLI (`hipims-mb`, tools/model-builder/
main.js:305-327) that builds pluvial, analytical and laboratory models —
DEM rasters, boundary CSVs and an XML configuration.  This is its Python
equivalent, generating the same artefact set against this framework's
(reference-compatible) schema, including the analytical cases with
validation rasters (tools/model-builder/tests/README.md:33-64).

Usage:
    python -m hipims_tpu.tools.model_builder --name test --type dam-break \\
        --directory ./models/test [--resolution 2] [--scheme godunov]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..io.raster import Raster, write_raster
from ..validation.cases import (SloshingBowl, ritter_dry_dam_break,
                                stoker_wet_dam_break)

XML_TEMPLATE = """<?xml version="1.0"?>
<configuration>
\t<metadata>
\t\t<name>{name}</name>
\t\t<description>{description}</description>
\t</metadata>
\t<execution>
\t\t<executor name="TPU" />
\t</execution>
\t<simulation>
\t\t<parameter name="duration" value="{duration}" />
\t\t<parameter name="outputFrequency" value="{output_frequency}" />
\t\t<parameter name="floatingPointPrecision" value="{precision}" />
\t\t<domainSet>
\t\t\t<domain type="cartesian" deviceNumber="1">
\t\t\t\t<data sourceDir="topography/" targetDir="output/">
{sources}
\t\t\t\t\t<dataTarget type="raster" value="depth" format="GTiff" target="depth_%t.tif" />
\t\t\t\t\t<dataTarget type="raster" value="velocityX" format="GTiff" target="velX_%t.tif" />
\t\t\t\t\t<dataTarget type="raster" value="velocityY" format="GTiff" target="velY_%t.tif" />
\t\t\t\t\t<dataTarget type="raster" value="maxdepth" format="GTiff" target="maxdepth_%t.tif" />
\t\t\t\t</data>
\t\t\t\t<scheme name="{scheme}">
\t\t\t\t\t<parameter name="courantNumber" value="{courant}" />
\t\t\t\t\t<parameter name="frictionEffects" value="{friction}" />
\t\t\t\t</scheme>
\t\t\t\t<boundaryConditions sourceDir="boundaries/">
\t\t\t\t\t<domainEdge edge="north" treatment="closed" />
\t\t\t\t\t<domainEdge edge="south" treatment="closed" />
\t\t\t\t\t<domainEdge edge="east" treatment="closed" />
\t\t\t\t\t<domainEdge edge="west" treatment="closed" />
{timeseries}
\t\t\t\t</boundaryConditions>
\t\t\t</domain>
\t\t</domainSet>
\t</simulation>
</configuration>
"""


def _emit(directory, name, description, zb, extras, duration,
          output_frequency, scheme="godunov", resolution=2.0,
          manning=0.03, friction="yes", courant=0.5, rainfall=None,
          depth=None, validation=None):
    directory = Path(directory)
    (directory / "topography").mkdir(parents=True, exist_ok=True)
    (directory / "boundaries").mkdir(exist_ok=True)
    (directory / "output").mkdir(exist_ok=True)

    write_raster(directory / "topography" / "dem.asc",
                 Raster.from_domain_array(zb, cell_size=resolution))
    sources = [
        '\t\t\t\t\t<dataSource type="raster" value="structure,dem" '
        'source="dem.asc" />',
        f'\t\t\t\t\t<dataSource type="constant" '
        f'value="manningCoefficient" source="{manning}" />',
    ]
    if depth is not None:
        if np.isscalar(depth):
            sources.append(f'\t\t\t\t\t<dataSource type="constant" '
                           f'value="depth" source="{depth}" />')
        else:
            write_raster(directory / "topography" / "depth.asc",
                         Raster.from_domain_array(depth,
                                                  cell_size=resolution))
            sources.append('\t\t\t\t\t<dataSource type="raster" '
                           'value="depth" source="depth.asc" />')
    timeseries = []
    if rainfall is not None:
        rows = "\n".join(f"{t},{v}" for t, v in rainfall)
        (directory / "boundaries" / "rainfall.csv").write_text(
            "Time (s),Rainfall intensity (mm/hr)\n" + rows + "\n")
        timeseries.append(
            '\t\t\t\t\t<timeseries type="atmospheric" name="Rainfall" '
            'value="rain-intensity" source="rainfall.csv" />')

    if validation is not None:
        (directory / "validation").mkdir(exist_ok=True)
        for fname, grid in validation.items():
            write_raster(directory / "validation" / fname,
                         Raster.from_domain_array(grid,
                                                  cell_size=resolution))

    xml = XML_TEMPLATE.format(
        name=name, description=description, duration=duration,
        output_frequency=output_frequency, precision="double",
        scheme=scheme, courant=courant, friction=friction,
        sources="\n".join(sources), timeseries="\n".join(timeseries))
    (directory / f"{name}.xml").write_text(xml)
    return directory / f"{name}.xml"


def build_pluvial(directory, name="pluvial", size=500, resolution=2.0,
                  rain_mm_hr=70.0, duration=3600.0, scheme="godunov"):
    """Synthetic pluvial test: undulating catchment + uniform rainfall
    (the reference builds these from EA LiDAR; we synthesise terrain)."""
    n = int(size)
    x = np.linspace(0, 4 * np.pi, n)
    y = np.linspace(0, 4 * np.pi, n)
    zb = (2.0 * np.sin(x)[None, :] * np.cos(y)[:, None]
          + 0.01 * np.arange(n)[:, None] * resolution / 10.0)
    return _emit(directory, name, "Synthetic pluvial catchment", zb,
                 {}, duration, duration / 6, scheme=scheme,
                 resolution=resolution, depth=0.0,
                 rainfall=[(0, rain_mm_hr), (duration / 2, rain_mm_hr),
                           (duration, 0.0)])


def build_dam_break(directory, name="dam-break", n=400, resolution=2.0,
                    h_up=2.0, h_down=0.2, duration=40.0,
                    scheme="godunov"):
    """1-D dam break strip with Stoker validation rasters at each output
    interval (reference analogue: TestDamBreakEmergingBed)."""
    rows = 8
    zb = np.zeros((rows, n))
    zb[:2, :] = 9999.9
    zb[-2:, :] = 9999.9
    x = (np.arange(n) + 0.5) * resolution
    x0 = n * resolution / 2
    depth = np.where(x < x0, h_up, h_down)[None, :].repeat(rows, 0)
    depth[:2] = 0.0
    depth[-2:] = 0.0

    out_freq = duration / 4
    validation = {}
    for k in range(1, 5):
        t = k * out_freq
        if h_down > 0:
            h_ex, _ = stoker_wet_dam_break(h_up, h_down, x, t, x0)
        else:
            h_ex, _ = ritter_dry_dam_break(h_up, x, t, x0)
        validation[f"depth_exact_{int(t)}.asc"] = \
            h_ex[None, :].repeat(rows, 0)

    return _emit(directory, name, "Stoker/Ritter dam break", zb, {},
                 duration, out_freq, scheme=scheme, resolution=resolution,
                 friction="no", depth=depth, validation=validation)


def build_sloshing_bowl(directory, name="sloshing-bowl", n=200,
                        scheme="muscl-hancock"):
    """Thacker planar sloshing bowl with analytic depth rasters
    (reference analogue: TestSloshingBowl.js)."""
    case = SloshingBowl()
    pad = 1.3
    x = np.linspace(-case.a * pad, case.a * pad, n)
    dxr = x[1] - x[0]
    rows = 8
    zb1 = case.bed(x)
    zb = zb1[None, :].repeat(rows, 0)
    zb[:2, :] = 9999.9
    zb[-2:, :] = 9999.9
    depth = np.maximum(case.surface(x, 0.0) - zb1, 0.0)[None, :].repeat(
        rows, 0)
    depth[:2] = 0.0
    depth[-2:] = 0.0

    duration = case.period
    out_freq = case.period / 4
    validation = {}
    for k in range(1, 5):
        t = k * out_freq
        h_ex = np.maximum(case.surface(x, t) - zb1, 0.0)
        validation[f"depth_exact_{int(t)}.asc"] = \
            h_ex[None, :].repeat(rows, 0)
    return _emit(directory, name, "Thacker sloshing parabolic bowl", zb,
                 {}, duration, out_freq, scheme=scheme, resolution=dxr,
                 friction="no", depth=depth, validation=validation)


BUILDERS = {
    "pluvial": build_pluvial,
    "dam-break": build_dam_break,
    "sloshing-bowl": build_sloshing_bowl,
}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="hipims-tpu-mb",
                                 description=__doc__.splitlines()[0])
    ap.add_argument("--name", "-n", default=None)
    ap.add_argument("--type", "-t", required=True, choices=sorted(BUILDERS))
    ap.add_argument("--directory", "-d", required=True)
    ap.add_argument("--scheme", default=None)
    args = ap.parse_args(argv)
    kw = {}
    if args.name:
        kw["name"] = args.name
    if args.scheme:
        kw["scheme"] = args.scheme
    path = BUILDERS[args.type](args.directory, **kw)
    print(f"Model written: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
