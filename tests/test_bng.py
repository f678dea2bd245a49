"""BNG tile arithmetic + offline EA LiDAR mosaicking (the reference's
real-data pluvial workflow, tools/model-builder/BngConversion.js /
Extent.js / DomainBNG.js, run without a network)."""

import numpy as np
import pytest

from hipims_tpu.io.raster import Raster, write_raster
from hipims_tpu.tools.bng import (en_to_ref, mosaic_extent, ref_to_en,
                                  tile_names_for_extent)


def test_en_to_ref_known_squares():
    # The Newcastle DEM's corner (424520, 565146) sits in NZ26 — the EA
    # tile for central Newcastle.
    assert en_to_ref(424520, 565146, 1) == "NZ26"
    assert en_to_ref(425000, 565000, 0) == "NZ"
    # Well-known 100 km squares.
    assert en_to_ref(530000, 180000, 0) == "TQ"     # London
    assert en_to_ref(325000, 675000, 0) == "NT"     # Edinburgh
    assert en_to_ref(0, 0, 0) == "SV"               # Scilly
    # Out of the supported area.
    assert en_to_ref(700001, 0, 0) == ""


def test_ref_to_en_roundtrip():
    for e, n in ((424520, 565146), (530100, 180900), (0, 0),
                 (699999, 1299999)):
        ref = en_to_ref(e, n, 5)
        ee, nn = ref_to_en(ref)
        assert (ee, nn) == (int(e), int(n))
    assert ref_to_en("NZ26") == (420000, 560000)
    with pytest.raises(ValueError):
        ref_to_en("not a ref!")


def test_tile_names_for_extent():
    # 12 km x 2 km extent straddling a tile boundary -> 2 columns of
    # tiles (Extent.js:43-58 semantics).
    names = tile_names_for_extent(424000, 565000, 436000, 567000)
    assert names == ["NZ26", "NZ36"]
    # Fully inside one tile.
    assert tile_names_for_extent(421000, 561000, 424000, 563000) == ["NZ26"]


@pytest.fixture
def tile_dir(tmp_path):
    """Two synthetic 10 km 'EA' tiles at 100 m resolution, with distinct
    elevations so the mosaic seams are checkable."""
    for tile, value in (("NZ26", 10.0), ("NZ36", 20.0)):
        e, n = ref_to_en(tile)
        data = np.full((100, 100), value)
        data[0, 0] = value + 1.0          # south-west corner marker
        write_raster(tmp_path / f"LIDAR-DTM-2M-{tile}.asc",
                     Raster.from_domain_array(data, xll=e, yll=n,
                                              cell_size=100.0))
    return tmp_path


def test_mosaic_across_tiles(tile_dir):
    # 4 km x 2 km extent straddling the NZ26/NZ36 seam at x=430000.
    zb, missing = mosaic_extent(tile_dir, 428000, 562000, 432000, 564000,
                                resolution=100.0)
    assert missing == []
    assert zb.shape == (20, 40)
    assert (zb[:, :20] == 10.0).all()     # west half from NZ26
    assert (zb[:, 20:] == 20.0).all()     # east half from NZ36
    # Missing tile -> disabled cells + warning list.
    zb2, missing2 = mosaic_extent(tile_dir, 428000, 562000, 432000,
                                  572000, resolution=100.0)
    assert "NZ27" in missing2 and "NZ37" in missing2
    assert (zb2[-10:, :] == -9999.0).all()


def test_real_data_pluvial_model_builds_and_runs(tile_dir, tmp_path):
    """End-to-end: tile dir -> model -> simulation (rain on real-ish
    terrain), via the same CLI surface as the reference's hipims-mb."""
    from hipims_tpu.io.xml_config import load_config
    from hipims_tpu.tools.model_builder import main as mb_main

    out = tmp_path / "model"
    rc = mb_main(["-t", "pluvial", "-d", str(out),
                  "--terrain-dir", str(tile_dir),
                  "--extent", "428000,562000,432000,564000",
                  "--resolution", "100.0"])
    assert rc == 0

    model = load_config(out / "pluvial.xml")
    assert model.domain.rows == 20 and model.domain.cols == 40
    assert model.domain.xll == 428000.0 and model.domain.yll == 562000.0
    assert model.domain.zb[5, 5] == 10.0 and model.domain.zb[5, 35] == 20.0

    model.config.duration = 30.0
    model.config.output_frequency = 30.0
    sim = model.simulation()
    sim.run()
    assert sim.volume() > 0.0             # the rain landed
    assert np.isfinite(sim.depth()).all()


def test_missing_extent_errors(tile_dir, tmp_path):
    from hipims_tpu.tools.model_builder import build_pluvial

    with pytest.raises(ValueError, match="extent"):
        build_pluvial(tmp_path / "m", terrain_dir=tile_dir)
    with pytest.raises(ValueError, match="no tile raster"):
        build_pluvial(tmp_path / "m2", terrain_dir=tile_dir,
                      extent=(0.0, 0.0, 2000.0, 2000.0), resolution=100.0)
