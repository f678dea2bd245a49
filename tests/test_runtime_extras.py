"""Checkpoint/resume, embedding API, and gridded-boundary config tests."""

import numpy as np
import pytest

from hipims_tpu.domain import Domain
from hipims_tpu.runtime import Simulation, SimulationConfig
from hipims_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from tests.test_simulation import circular_dam_domain


def _cfg(duration, **kw):
    return SimulationConfig(scheme="godunov", duration=duration,
                            output_frequency=duration, friction=False,
                            batch_size=8, batch_auto=False, **kw)


def test_checkpoint_resume_exact(tmp_path):
    """Checkpoint at t=2 then resume must equal continuing in memory.
    (A sync point at t=2 alters the dt sequence vs a straight 0->4 run —
    reference behaviour — so the baseline also pauses at 2.)"""
    a = Simulation(circular_dam_domain(n=48), _cfg(4.0))
    a.run_to(2.0)
    save_checkpoint(tmp_path / "ck.npz", a)
    a.run_to(4.0)

    b = Simulation(circular_dam_domain(n=48), _cfg(4.0))
    load_checkpoint(tmp_path / "ck.npz", b)
    assert float(b.carry.t) == pytest.approx(2.0, abs=1e-5)
    b.run_to(4.0)

    assert b.t == pytest.approx(a.t, abs=1e-9)
    for x, y, name in zip(a.state, b.state, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-12, atol=1e-12, err_msg=name)


def test_checkpoint_rejects_mismatch(tmp_path):
    a = Simulation(circular_dam_domain(n=32), _cfg(1.0))
    save_checkpoint(tmp_path / "ck.npz", a)
    b = Simulation(circular_dam_domain(n=48), _cfg(1.0))
    with pytest.raises(ValueError, match="grid"):
        load_checkpoint(tmp_path / "ck.npz", b)


def test_embedding_api(tmp_path):
    from hipims_tpu.api import device_count, simulation_load
    from hipims_tpu.io.raster import Raster, write_raster

    write_raster(tmp_path / "dem.asc", Raster(np.zeros((16, 24)),
                                              cell_size=2.0))
    (tmp_path / "m.xml").write_text("""<?xml version="1.0"?>
    <configuration><metadata><name>API</name></metadata>
    <simulation>
      <parameter name="duration" value="5" />
      <parameter name="outputFrequency" value="5" />
      <domainSet><domain type="cartesian">
        <data sourceDir="." targetDir="out/">
          <dataSource type="constant" value="depth" source="0.3" />
          <dataSource type="constant" value="manningCoefficient"
                      source="0.03" />
          <dataSource type="raster" value="structure,dem" source="dem.asc"/>
        </data>
        <scheme name="Godunov" />
      </domain></domainSet></simulation></configuration>""")

    handle = simulation_load(tmp_path / "m.xml")
    info = handle.domain_info()
    assert (info.rows, info.cols) == (16, 24)
    assert info.resolution == 2.0
    handle.launch(blocking=True)
    assert handle.progress == pytest.approx(1.0, abs=1e-4)
    depth = handle.field("depth")
    assert depth.shape == (16, 24)
    assert device_count() >= 1
    handle.close()


def test_gridded_boundary_from_config(tmp_path):
    """Radar-rainfall rasters via a strftime mask + realStart."""
    from hipims_tpu.io.raster import Raster, write_raster
    from hipims_tpu.io.xml_config import load_config

    (tmp_path / "bdy").mkdir()
    write_raster(tmp_path / "dem.asc", Raster(np.zeros((20, 20)),
                                              cell_size=2.0))
    # Three hourly radar frames at 10x10 4m cells, increasing rates.
    for i, stamp in enumerate(["200001010000", "200001010100",
                               "200001010200"]):
        write_raster(tmp_path / "bdy" / f"radar_{stamp}.asc",
                     Raster(np.full((10, 10), 10.0 * (i + 1)),
                            cell_size=4.0))

    (tmp_path / "m.xml").write_text("""<?xml version="1.0"?>
    <configuration><metadata><name>Radar</name></metadata>
    <simulation>
      <parameter name="duration" value="7200" />
      <parameter name="outputFrequency" value="7200" />
      <parameter name="realStart" value="2000-01-01 00:00:00"
                 format="%Y-%m-%d %H:%M:%S" />
      <domainSet><domain type="cartesian">
        <data sourceDir="." targetDir="out/">
          <dataSource type="constant" value="depth" source="0.0" />
          <dataSource type="constant" value="manningCoefficient"
                      source="0.03" />
          <dataSource type="raster" value="structure,dem" source="dem.asc"/>
        </data>
        <scheme name="Godunov" />
        <boundaryConditions sourceDir="bdy/">
          <timeseries type="gridded" name="Radar" value="rain-intensity"
                      mask="radar_%Y%m%d%H%M.asc" interval="3600" />
        </boundaryConditions>
      </domain></domainSet></simulation></configuration>""")

    model = load_config(tmp_path / "m.xml")
    assert len(model.boundaries) == 1
    b = model.boundaries[0]
    assert b.series.shape == (3, 10, 10)
    assert b.series[1, 0, 0] == 20.0
    assert b.interval == 3600.0

    sim = model.simulation()
    sim.run_to(60.0)
    # ~1 min of 10 mm/hr rain on the interior.
    area = 18 * 18 * 4.0
    expected = 10.0 / 3.6e6 * 60.0 * area
    assert sim.volume() == pytest.approx(expected, rel=0.05)
