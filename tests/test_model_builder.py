"""Model-builder CLI: generated models must load and run, and the
dam-break model must match its own bundled validation rasters."""

import numpy as np
import pytest

from hipims_tpu.io.raster import read_raster
from hipims_tpu.io.xml_config import load_config
from hipims_tpu.tools.model_builder import main as mb_main


def test_dam_break_model_validates(tmp_path):
    mb_main(["-t", "dam-break", "-d", str(tmp_path / "db")])
    model = load_config(tmp_path / "db" / "dam-break.xml")
    sim = model.simulation()
    sim.run_to(10.0)

    exact = read_raster(tmp_path / "db" / "validation" /
                        "depth_exact_10.asc").to_domain_array()
    h = sim.depth()
    mid = slice(3, 5)
    l1 = np.abs(h[mid, 2:-2] - exact[mid, 2:-2]).mean()
    assert l1 < 0.03, f"L1 vs validation raster {l1}"


def test_pluvial_model_runs(tmp_path):
    mb_main(["-t", "pluvial", "-d", str(tmp_path / "pl")])
    model = load_config(tmp_path / "pl" / "pluvial.xml")
    model.config.duration = 120.0
    model.config.output_frequency = 120.0
    sim = model.simulation()
    sim.run()
    assert sim.volume() > 0


def test_sloshing_model_builds(tmp_path):
    mb_main(["-t", "sloshing-bowl", "-d", str(tmp_path / "sb")])
    model = load_config(tmp_path / "sb" / "sloshing-bowl.xml")
    assert model.config.scheme == "muscl-hancock"
    assert (tmp_path / "sb" / "validation").exists()
