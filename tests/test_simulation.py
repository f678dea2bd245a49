"""End-to-end simulation driver tests: circular dam break, rainfall mass
balance, output scheduling, dynamic timestep behaviour."""

import numpy as np
import pytest

from hipims_tpu.domain import Domain
from hipims_tpu.ops.boundaries import UniformBoundary
from hipims_tpu.runtime import Simulation, SimulationConfig


def circular_dam_domain(n=64, dx=2.0, h_in=2.5, h_out=0.5, radius=None,
                        center=None):
    zb = np.zeros((n, n))
    dom = Domain(zb=zb, manning=0.0, dx=dx, dy=dx)
    cy = cx = n / 2.0 if center is None else center
    radius = radius or n * dx / 8.0
    yy, xx = np.mgrid[0:n, 0:n]
    r = np.hypot((yy - cy) * dx, (xx - cx) * dx)
    depth = np.where(r <= radius, h_in, h_out)
    dom.set_initial_depth(depth)
    return dom


@pytest.mark.parametrize("scheme", ["godunov", "muscl-hancock"])
def test_circular_dam_break(scheme):
    # 65 cells => the grid (and its closed-edge walls, whose width equals
    # the scheme's static ring) is exactly symmetric about cell 32.
    dom = circular_dam_domain(n=65, center=32.0)
    cfg = SimulationConfig(scheme=scheme, duration=5.0, output_frequency=5.0,
                           friction=False, batch_size=8)
    sim = Simulation(dom, cfg)
    vol0 = sim.volume()
    sim.run()

    assert sim.t == pytest.approx(5.0, abs=1e-6)
    h = sim.depth()
    # Volume conserved in the walled basin.
    assert sim.volume() == pytest.approx(vol0, rel=1e-6)
    # Wave has moved out: centre drew down, ring above background.
    assert h[32, 32] < 2.5
    assert h.max() < 2.5 + 1e-6
    # Four-fold symmetry of the radial wave about cell (32, 32):
    # reflection maps index i -> 64 - i.
    w = sim.scheme.radius  # wall width = static ring
    hh = h[w:65 - w, w:65 - w]
    np.testing.assert_allclose(hh, hh[::-1, ::-1], atol=1e-8)
    np.testing.assert_allclose(hh, hh[:, ::-1], atol=1e-8)
    np.testing.assert_allclose(hh, hh.T, atol=1e-8)
    # No NaNs anywhere.
    assert np.isfinite(h).all()


def test_rainfall_mass_balance():
    """Uniform rainfall at a constant rate must add exactly
    rate * area * time of water to a closed flat basin."""
    n = 32
    dom = Domain(zb=np.zeros((n, n)), manning=0.03, dx=2.0, dy=2.0)
    dom.set_initial_depth(0.0)

    rate_mm_hr = 72.0  # 2e-5 m/s
    rain = UniformBoundary(
        values=np.full(100, rate_mm_hr), interval=60.0,
        length=6000.0, is_loss=False)

    cfg = SimulationConfig(scheme="godunov", duration=60.0,
                           output_frequency=60.0, batch_size=16)
    sim = Simulation(dom, cfg, boundaries=(rain,))
    sim.run()

    # Rain falls on the interior (n-2)^2 cells only (edge ring excluded).
    # Hydrological gating applies rain in ~1 s chunks and drops the final
    # partial accumulation at the sync point (reference behaviour:
    # src/Boundaries/CLBoundaries.clc:165 gate + CLDynamicTimestep.clc:61-66
    # accumulator), so allow up to ~2 s of shortfall over the 60 s run.
    expected = (rate_mm_hr / 3.6e6) * 60.0 * (n - 2) ** 2 * 2.0 * 2.0
    assert sim.volume() <= expected * (1 + 1e-9)
    assert sim.volume() >= expected * (58.0 / 60.0)


def test_output_scheduling_hits_exact_times():
    dom = circular_dam_domain(n=32)
    cfg = SimulationConfig(scheme="godunov", duration=2.0,
                           output_frequency=0.5, friction=False,
                           batch_size=4)
    times = []
    sim = Simulation(dom, cfg,
                     output_writer=lambda s, t: times.append((t, s.t)))
    sim.run()
    assert [t for t, _ in times] == [0.5, 1.0, 1.5, 2.0]
    for target, actual in times:
        assert actual == pytest.approx(target, abs=1e-5)


def test_dry_domain_fast_forwards():
    """A completely dry domain must reach the end without tiny steps
    (the reference's inf-dt path capped by TIMESTEP_MAXIMUM)."""
    n = 16
    dom = Domain(zb=np.zeros((n, n)), manning=0.03, dx=2.0, dy=2.0)
    dom.set_initial_depth(0.0)
    cfg = SimulationConfig(scheme="godunov", duration=600.0,
                           output_frequency=600.0, batch_size=64)
    sim = Simulation(dom, cfg)
    sim.run()
    assert sim.t == pytest.approx(600.0, abs=1e-5)
    # 60s of early-limited 0.1s steps + 15s-capped steps thereafter.
    assert sim.total_steps < 700


def test_fixed_timestep_mode():
    dom = circular_dam_domain(n=32)
    cfg = SimulationConfig(scheme="godunov", duration=1.0,
                           output_frequency=1.0, timestep_mode="fixed",
                           fixed_timestep=0.02, friction=False, batch_size=10)
    sim = Simulation(dom, cfg)
    sim.run()
    assert sim.t == pytest.approx(1.0, abs=1e-6)
    assert sim.total_steps == pytest.approx(50, abs=2)
