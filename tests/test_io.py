"""Raster/CSV/XML I/O round-trips and config loading."""

import numpy as np
import pytest

from hipims_tpu.io.csv_series import (read_timeseries_csv, series_interval,
                                      series_length)
from hipims_tpu.io.raster import Raster, read_raster, write_raster


def test_asc_roundtrip(tmp_path):
    data = np.random.default_rng(0).uniform(0, 10, (12, 17))
    r = Raster(data=data, xll=1000.0, yll=2000.0, cell_size=2.0,
               nodata=-9999.0)
    p = tmp_path / "t.asc"
    write_raster(p, r)
    r2 = read_raster(p)
    np.testing.assert_allclose(r2.data, data, atol=1e-6)
    assert r2.xll == 1000.0 and r2.yll == 2000.0 and r2.cell_size == 2.0


def test_tiff_roundtrip(tmp_path):
    data = np.random.default_rng(1).uniform(-5, 5, (33, 65)).astype(np.float32)
    r = Raster(data=data, xll=424520.0, yll=565146.0, cell_size=2.0,
               nodata=-9999.0)
    p = tmp_path / "t.tif"
    write_raster(p, r)
    r2 = read_raster(p)
    np.testing.assert_array_equal(r2.data, data)
    assert r2.cell_size == pytest.approx(2.0)
    assert r2.xll == pytest.approx(424520.0)
    assert r2.yll == pytest.approx(565146.0)
    assert r2.nodata == -9999.0


def test_domain_orientation_roundtrip():
    data = np.arange(12.0).reshape(3, 4)
    r = Raster(data=data)
    dom = r.to_domain_array()
    # Row 0 of the domain is the southernmost = last raster row.
    np.testing.assert_array_equal(dom[0], data[-1])
    r2 = Raster.from_domain_array(dom)
    np.testing.assert_array_equal(r2.data, data)


def test_csv_series(tmp_path):
    p = tmp_path / "rain.csv"
    p.write_text("Time (s),Rate (mm/hr)\n0,70\n3600,70\n7200,0\n")
    s = read_timeseries_csv(p, n_cols=2)
    assert s.shape == (3, 2)
    assert series_interval(s) == 3600.0
    assert series_length(s) == 7200.0


def test_xml_config_load(tmp_path):
    # Build a tiny model directory with an ASC DEM and rainfall.
    import textwrap
    (tmp_path / "topo").mkdir()
    (tmp_path / "bdy").mkdir()
    dem = Raster(data=np.zeros((24, 32)), xll=0.0, yll=0.0, cell_size=2.0)
    write_raster(tmp_path / "topo" / "dem.asc", dem)
    (tmp_path / "bdy" / "rain.csv").write_text(
        "Time,Rate\n0,50\n3600,50\n7200,0\n")
    xml = textwrap.dedent("""\
        <?xml version="1.0"?>
        <configuration>
          <metadata><name>Tiny</name><description>d</description></metadata>
          <simulation>
            <parameter name="duration" value="120" />
            <parameter name="outputFrequency" value="60" />
            <parameter name="floatingPointPrecision" value="double" />
            <domainSet>
              <domain type="cartesian" deviceNumber="1">
                <data sourceDir="topo/" targetDir="out/">
                  <dataSource type="constant" value="depth" source="0.0" />
                  <dataSource type="constant" value="manningCoefficient"
                              source="0.03" />
                  <dataSource type="raster" value="structure,dem"
                              source="dem.asc" />
                  <dataTarget type="raster" value="depth" format="GTiff"
                              target="depth_%t.tif" />
                </data>
                <scheme name="Godunov">
                  <parameter name="courantNumber" value="0.5" />
                  <parameter name="frictionEffects" value="yes" />
                </scheme>
                <boundaryConditions sourceDir="bdy/">
                  <domainEdge edge="north" treatment="closed" />
                  <domainEdge edge="south" treatment="closed" />
                  <domainEdge edge="east" treatment="closed" />
                  <domainEdge edge="west" treatment="closed" />
                  <timeseries type="atmospheric" name="Rain"
                              value="rain-intensity" source="rain.csv" />
                </boundaryConditions>
              </domain>
            </domainSet>
          </simulation>
        </configuration>
    """)
    cfg_path = tmp_path / "model.xml"
    cfg_path.write_text(xml)

    from hipims_tpu.io.xml_config import load_config
    model = load_config(cfg_path)
    assert model.name == "Tiny"
    assert model.config.scheme == "godunov"
    assert model.config.duration == 120.0
    assert model.domain.rows == 24 and model.domain.cols == 32
    assert len(model.boundaries) == 1
    assert model.boundaries[0].values[0] == 50.0

    sim = model.simulation()
    sim.run()
    assert sim.t == pytest.approx(120.0, abs=1e-5)
    assert sim.volume() > 0  # rain accumulated
    # Outputs written for each interval.
    outs = sorted((tmp_path / "out").glob("depth_*.tif"))
    assert [o.name for o in outs] == ["depth_120.tif", "depth_60.tif"]
    r = read_raster(outs[0])
    assert r.data.shape == (24, 32)


def test_cli_runs(tmp_path, capsys):
    dem = Raster(data=np.zeros((16, 16)), cell_size=2.0)
    write_raster(tmp_path / "dem.asc", dem)
    xml = f"""<?xml version="1.0"?>
    <configuration>
      <metadata><name>CLI</name></metadata>
      <simulation>
        <parameter name="duration" value="10" />
        <parameter name="outputFrequency" value="10" />
        <domainSet><domain type="cartesian">
          <data sourceDir="." targetDir="out/">
            <dataSource type="constant" value="depth" source="0.1" />
            <dataSource type="constant" value="manningCoefficient"
                        source="0.03" />
            <dataSource type="raster" value="structure,dem"
                        source="dem.asc" />
          </data>
          <scheme name="Godunov" />
        </domain></domainSet>
      </simulation>
    </configuration>"""
    p = tmp_path / "m.xml"
    p.write_text(xml)
    from hipims_tpu.cli import main
    assert main(["--config-file", str(p), "--disable-screen"]) == 0
    # Precision override: the XML default (double) forced to compensated.
    assert main(["--config-file", str(p), "--disable-screen",
                 "--precision", "compensated"]) == 0
    out = capsys.readouterr().out
    assert "float32c" in out


def test_native_codec_matches_python():
    """Native RLC decode and ASC formatter agree with the Python paths."""
    from hipims_tpu.native import (asc_format_native, decode_rlc_native,
                                   get_lib)
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")

    # RLC parity on the real reference DEM blocks.
    from pathlib import Path
    dem = Path("/root/reference/test/newcastle-centre/topography/"
               "NewcastleCentreDEM_2m.img")
    if dem.exists():
        from hipims_tpu.io.hfa import read_hfa
        r = read_hfa(dem)   # exercises native path
        assert r.data.shape == (195, 342)
        assert float(r.data.mean()) == pytest.approx(56.567615, rel=1e-6)

    data = np.random.default_rng(0).uniform(-5, 5, (13, 17))
    body = asc_format_native(data)
    assert body is not None
    parsed = np.loadtxt(body.decode().splitlines())
    np.testing.assert_allclose(parsed, data, atol=1e-6)


def test_multi_domain_stitching(tmp_path):
    """Two overlapping <domain> entries (the reference's decomposed config
    layout) stitch back into one union grid."""
    import textwrap
    # Two 12-row rasters overlapping by 4 rows -> 20-row union.
    lower = Raster(data=np.full((12, 16), 1.0), xll=0.0, yll=0.0,
                   cell_size=2.0)
    upper = Raster(data=np.full((12, 16), 2.0), xll=0.0, yll=16.0,
                   cell_size=2.0)
    write_raster(tmp_path / "lower.asc", lower)
    write_raster(tmp_path / "upper.asc", upper)
    xml = textwrap.dedent("""\
        <?xml version="1.0"?>
        <configuration><metadata><name>Decomposed</name></metadata>
        <simulation>
          <parameter name="duration" value="10" />
          <parameter name="outputFrequency" value="10" />
          <domainSet syncMethod="timestep">
            <domain type="cartesian" deviceNumber="1">
              <data sourceDir="." targetDir="out/">
                <dataSource type="constant" value="depth" source="0.1" />
                <dataSource type="constant" value="manningCoefficient"
                            source="0.03" />
                <dataSource type="raster" value="structure,dem"
                            source="lower.asc" />
              </data>
              <scheme name="Godunov" />
            </domain>
            <domain type="cartesian" deviceNumber="2">
              <data sourceDir="." targetDir="out/">
                <dataSource type="raster" value="structure,dem"
                            source="upper.asc" />
              </data>
              <scheme name="Godunov" />
            </domain>
          </domainSet>
        </simulation></configuration>""")
    (tmp_path / "m.xml").write_text(xml)

    from hipims_tpu.io.xml_config import load_config
    model = load_config(tmp_path / "m.xml")
    assert model.config.sync_method == "timestep"
    assert model.domain.rows == 20 and model.domain.cols == 16
    zb = model.domain.zb
    assert zb[0, 0] == 1.0       # lower domain rows
    assert zb[-1, 0] == 2.0      # upper domain rows
    assert zb[9, 0] == 2.0       # overlap rows taken from the later domain


def test_hfa_write_read_roundtrip(tmp_path):
    """The from-scratch HFA writer must round-trip through the HFA reader
    (data, georeferencing, nodata), including non-multiple-of-64 grids."""
    from hipims_tpu.io.hfa import read_hfa, write_hfa

    rng = np.random.default_rng(7)
    data = rng.normal(50.0, 5.0, size=(70, 130)).astype(np.float32)
    data[0, 0] = -9999.0
    r = Raster(data=data, xll=421000.0, yll=563000.0, cell_size=2.0,
               nodata=-9999.0)
    write_raster(tmp_path / "out.img", r)

    back = read_hfa(tmp_path / "out.img")
    assert back.rows == 70 and back.cols == 130
    np.testing.assert_array_equal(back.data, data)
    assert back.xll == pytest.approx(421000.0)
    assert back.yll == pytest.approx(563000.0)
    assert back.cell_size == pytest.approx(2.0)
    assert back.nodata == pytest.approx(-9999.0)

    # float64 path
    r64 = Raster(data=data.astype(np.float64), xll=0.0, yll=0.0,
                 cell_size=10.0)
    write_raster(tmp_path / "out64.img", r64)
    back64 = read_hfa(tmp_path / "out64.img")
    np.testing.assert_array_equal(back64.data, data.astype(np.float64))

    # read_raster magic dispatch picks the HFA reader for .img output
    again = read_raster(tmp_path / "out.img")
    np.testing.assert_array_equal(again.to_domain_array(),
                                  r.to_domain_array())


def test_gauge_timeseries_output(tmp_path):
    """<dataTarget type="timeseries"> samples point gauges to a CSV."""
    import textwrap
    dem = Raster(data=np.zeros((16, 16)), xll=100.0, yll=200.0, cell_size=2.0)
    write_raster(tmp_path / "dem.asc", dem)
    (tmp_path / "gauges.csv").write_text(
        "105,205,G_A\n115,215,G_B\n9999,9999,outside\n")
    xml = textwrap.dedent("""\
        <?xml version="1.0"?>
        <configuration>
          <metadata><name>Gauge</name></metadata>
          <simulation>
            <parameter name="duration" value="20" />
            <parameter name="outputFrequency" value="10" />
            <domainSet><domain type="cartesian">
              <data sourceDir="." targetDir="out/">
                <dataSource type="constant" value="depth" source="0.25" />
                <dataSource type="constant" value="manningCoefficient"
                            source="0.03" />
                <dataSource type="raster" value="structure,dem"
                            source="dem.asc" />
                <dataTarget type="timeseries" value="depth"
                            source="gauges.csv" target="gauges_h.csv" />
              </data>
              <scheme name="Godunov" />
            </domain></domainSet>
          </simulation>
        </configuration>
    """)
    (tmp_path / "model.xml").write_text(xml)
    from hipims_tpu.io.xml_config import load_config
    sim = load_config(tmp_path / "model.xml").simulation()
    sim.run()
    lines = (tmp_path / "out" / "gauges_h.csv").read_text().splitlines()
    assert lines[0] == "Time (s),G_A,G_B"  # out-of-domain gauge dropped
    assert len(lines) == 3  # header + t=10 + t=20
    for line in lines[1:]:
        t, a, b = (float(v) for v in line.split(","))
        assert a == pytest.approx(0.25, abs=1e-6)
        assert b == pytest.approx(0.25, abs=1e-6)


def test_xml_executor_element(tmp_path, caplog):
    """<execution><executor name deviceFilter> is read, not silently
    dropped: CPU-only filters become a platform hint, anything else is
    acknowledged at info level, unknown executor params warn (reference
    schema: README.md:60-63, src/Base/CExecutorControl.cpp:51-98)."""
    import logging
    import textwrap
    dem = Raster(data=np.zeros((8, 16)), xll=0.0, yll=0.0, cell_size=2.0)
    write_raster(tmp_path / "dem.asc", dem)

    def cfg_with(executor_xml):
        xml = textwrap.dedent(f"""\
            <?xml version="1.0"?>
            <configuration>
              <metadata><name>E</name><description>d</description></metadata>
              <execution>{executor_xml}</execution>
              <simulation>
                <parameter name="duration" value="10" />
                <domainSet>
                  <domain type="cartesian">
                    <data sourceDir="" targetDir="out/">
                      <dataSource type="raster" value="structure,dem"
                                  source="dem.asc" />
                    </data>
                  </domain>
                </domainSet>
              </simulation>
            </configuration>
        """)
        p = tmp_path / "m.xml"
        p.write_text(xml)
        return p

    from hipims_tpu.io.xml_config import load_config

    p = cfg_with('<executor name="OpenCL">'
                 '<parameter name="deviceFilter" value="CPU" /></executor>')
    model = load_config(p)
    assert model.platform_hint == "cpu"

    with caplog.at_level(logging.INFO, logger="hipims_tpu.config"):
        p = cfg_with('<executor name="OpenCL">'
                     '<parameter name="deviceFilter" value="GPU" />'
                     '</executor>')
        model = load_config(p)
    assert model.platform_hint is None
    assert any("deviceFilter" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="hipims_tpu.config"):
        p = cfg_with('<executor name="CUDA">'
                     '<parameter name="bogus" value="1" /></executor>')
        load_config(p)
    msgs = [r.message for r in caplog.records]
    assert any("unknown executor" in m for m in msgs)
    assert any("bogus" in m for m in msgs)


def test_cli_checkpoint_resume(tmp_path, capsys):
    """--checkpoint writes a resumable checkpoint at every output time;
    --resume continues from it, skipping already-written outputs, and
    the resumed end state matches an uninterrupted run exactly."""
    dem = Raster(data=np.zeros((16, 16)), cell_size=2.0)
    write_raster(tmp_path / "dem.asc", dem)
    xml = """<?xml version="1.0"?>
    <configuration>
      <metadata><name>CK</name></metadata>
      <simulation>
        <parameter name="duration" value="{dur}" />
        <parameter name="outputFrequency" value="5" />
        <domainSet><domain type="cartesian">
          <data sourceDir="." targetDir="{out}/">
            <dataSource type="constant" value="depth" source="0.1" />
            <dataSource type="constant" value="manningCoefficient"
                        source="0.03" />
            <dataSource type="raster" value="structure,dem"
                        source="dem.asc" />
            <dataTarget type="raster" value="depth" format="GTiff"
                        target="depth_%t.tif" />
          </data>
          <scheme name="Godunov" />
        </domain></domainSet>
      </simulation>
    </configuration>"""
    from hipims_tpu.cli import main

    # Uninterrupted 10 s run.
    (tmp_path / "full.xml").write_text(xml.format(dur=10, out="out_full"))
    assert main(["-c", str(tmp_path / "full.xml"), "-n"]) == 0

    # Interrupted: run to 5 s with a checkpoint, then resume to 10 s.
    (tmp_path / "half.xml").write_text(xml.format(dur=5, out="out_half"))
    ck = tmp_path / "run.npz"
    assert main(["-c", str(tmp_path / "half.xml"), "-n",
                 "--checkpoint", str(ck)]) == 0
    assert ck.exists()
    (tmp_path / "rest.xml").write_text(xml.format(dur=10, out="out_rest"))
    assert main(["-c", str(tmp_path / "rest.xml"), "-n",
                 "--resume", str(ck)]) == 0
    assert "Resumed" in capsys.readouterr().out

    # The resumed run skipped the t=5 output (it belongs to the first
    # leg) and wrote only t=10.
    rest = sorted(p.name for p in (tmp_path / "out_rest").glob("*.tif"))
    assert rest == ["depth_10.tif"]

    a = read_raster(tmp_path / "out_full" / "depth_10.tif").data
    b = read_raster(tmp_path / "out_rest" / "depth_10.tif").data
    np.testing.assert_array_equal(a, b)

    # A bad resume target errors cleanly.
    assert main(["-c", str(tmp_path / "rest.xml"), "-n",
                 "--resume", str(tmp_path / "missing.npz")]) == 1


def test_cli_mass_balance_flag(tmp_path, capsys):
    """--mass-balance logs the volume budget at every output time; a
    closed dam-break domain must conserve exactly."""
    dem = Raster(data=np.zeros((16, 16)), cell_size=2.0)
    write_raster(tmp_path / "dem.asc", dem)
    (tmp_path / "m.xml").write_text("""<?xml version="1.0"?>
    <configuration><metadata><name>MB</name></metadata>
    <simulation>
      <parameter name="duration" value="10" />
      <parameter name="outputFrequency" value="5" />
      <domainSet><domain type="cartesian">
        <data sourceDir="." targetDir="out/">
          <dataSource type="constant" value="depth" source="0.2" />
          <dataSource type="constant" value="manningCoefficient"
                      source="0.03" />
          <dataSource type="raster" value="structure,dem"
                      source="dem.asc" />
        </data>
        <scheme name="Godunov" />
      </domain></domainSet></simulation></configuration>""")
    from hipims_tpu.cli import main
    assert main(["-c", str(tmp_path / "m.xml"), "-n",
                 "--mass-balance"]) == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if "Mass balance" in ln]
    assert len(lines) == 2
    # Parse the printed delta instead of string-matching "+0.000":
    # a -1e-15 drift formats as "-0.000" under %+.3f and would fail a
    # literal match while being physically perfect.
    import re
    for ln in lines:
        m = re.search(r"delta ([+-][\d.]+)", ln)
        assert m, ln
        assert abs(float(m.group(1))) <= 1e-3, ln
