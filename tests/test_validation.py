"""Asserted analytical validation: dam breaks and the sloshing bowl.

These are the automated equivalents of the reference's manual test-case
battery (tools/model-builder/tests/, SURVEY.md section 4): the schemes must
track the closed-form solutions within stated tolerances, and the
second-order scheme must beat the first-order one on the smooth case.
"""

import numpy as np
import pytest

from hipims_tpu.domain import Domain
from hipims_tpu.runtime import Simulation, SimulationConfig
from hipims_tpu.validation import (ritter_dry_dam_break, sloshing_bowl,
                                   stoker_wet_dam_break)


def _strip_domain(zb_1d, depth_1d, dx, rows=8):
    """A 1-D problem embedded in a strip (rows are y; flow along x).

    The outer TWO rows each side are walled dry: the MUSCL corrector's
    static two-cell ring (reference bounds,
    src/Schemes/CLSchemeMUSCLHancock.clc:568-573) would otherwise leave a
    wet static ghost row whose gradients drag the interior.
    """
    n = len(zb_1d)
    zb = np.tile(zb_1d, (rows, 1))
    depth = np.tile(depth_1d, (rows, 1)).copy()
    zb[:2, :] = 9999.9
    zb[-2:, :] = 9999.9
    depth[:2, :] = 0.0
    depth[-2:, :] = 0.0
    dom = Domain(zb=zb, manning=0.0, dx=dx, dy=dx)
    dom.set_initial_depth(depth)
    return dom


def _run(dom, scheme, duration, courant=0.5):
    cfg = SimulationConfig(scheme=scheme, duration=duration,
                           output_frequency=duration, friction=False,
                           courant=courant, batch_size=32)
    sim = Simulation(dom, cfg)
    sim.run()
    return sim


@pytest.mark.parametrize("scheme", ["godunov", "muscl-hancock"])
def test_stoker_wet_dam_break(scheme):
    n, dx = 400, 2.0
    x = (np.arange(n) + 0.5) * dx
    x0 = n * dx / 2
    h_l, h_r = 2.0, 0.2
    depth = np.where(x < x0, h_l, h_r)
    dom = _strip_domain(np.zeros(n), depth, dx)
    t_end = 40.0
    sim = _run(dom, scheme, t_end)

    h_num = sim.depth()[3, 1:-1]
    h_ex, _ = stoker_wet_dam_break(h_l, h_r, x[1:-1], t_end, x0)
    l1 = np.abs(h_num - h_ex).mean()
    # Shock-capturing schemes smear the shock over a few cells; the L1
    # error should still be small relative to the jump.
    assert l1 < 0.025, f"L1 depth error {l1}"
    # Plateau depth between fan and shock must be right.
    cl = np.sqrt(9.81 * h_l)
    plat = (x[1:-1] > x0 + 5) & (x[1:-1] < x0 + 0.7 * cl * t_end)
    assert abs(np.median(h_num[plat]) - np.median(h_ex[plat])) < 0.01


@pytest.mark.parametrize("scheme", ["godunov", "muscl-hancock"])
def test_ritter_dry_dam_break(scheme):
    n, dx = 400, 2.0
    x = (np.arange(n) + 0.5) * dx
    x0 = n * dx / 3
    h_l = 1.0
    depth = np.where(x < x0, h_l, 0.0)
    dom = _strip_domain(np.zeros(n), depth, dx)
    t_end = 30.0
    sim = _run(dom, scheme, t_end)

    h_num = sim.depth()[3, 1:-1]
    h_ex, _ = ritter_dry_dam_break(h_l, x[1:-1], t_end, x0)
    l1 = np.abs(h_num - h_ex).mean()
    assert l1 < 0.02, f"L1 depth error {l1}"

    # Wet/dry front position: numerical front lags the exact one slightly
    # but must be in the right place within ~15% of the fan length.
    cl = np.sqrt(9.81 * h_l)
    front_ex = x0 + 2.0 * cl * t_end
    wet = np.nonzero(h_num > 1e-4)[0]
    front_num = x[1:-1][wet[-1]]
    assert abs(front_num - front_ex) < 0.15 * (3.0 * cl * t_end)


def test_sloshing_bowl_oscillation():
    """Half a period of planar sloshing: surface must track the analytic
    plane; tests wet/dry movement and well-balancedness together."""
    n = 200
    x, zb1, z01, case = sloshing_bowl(n=n)
    dx = x[1] - x[0]
    depth0 = np.maximum(z01 - zb1, 0.0)
    dom = _strip_domain(zb1, depth0, dx)
    t_end = case.period / 2.0
    sim = _run(dom, "godunov", t_end)

    z_ex = case.surface(x, t_end)
    h_ex = np.maximum(z_ex - zb1, 0.0)
    h_num = sim.depth()[3]
    wet = h_ex > 0.05
    err = np.abs(h_num[wet] - h_ex[wet]).mean()
    # Amplitude ~ amp * a = 6 m surface tilt over the bowl; errors should
    # stay well under the oscillation amplitude.
    scale = case.amp * case.a
    assert err < 0.15 * scale, f"mean depth err {err} vs scale {scale}"
    # Velocity should be near the analytic uniform value mid-bowl.
    u_ex = case.velocity(t_end)
    st = sim.state_logical
    mid = slice(n // 2 - 20, n // 2 + 20)
    h_mid = sim.depth()[3][mid]
    u_num = np.where(h_mid > 0.1,
                     np.asarray(st.qx)[3][mid] / np.maximum(h_mid, 0.1), 0.0)
    # Phase error over half a period keeps u slightly off its analytic
    # zero crossing; bound by a fraction of the peak velocity g A / w.
    u_peak = 9.81 * case.amp / case.omega
    assert abs(np.median(u_num) - u_ex) < 0.3 * u_peak


def test_muscl_beats_godunov_on_smooth_case():
    """Second order must be more accurate on the smooth sloshing case."""
    n = 150
    x, zb1, z01, case = sloshing_bowl(n=n)
    dx = x[1] - x[0]
    depth0 = np.maximum(z01 - zb1, 0.0)
    t_end = case.period / 4.0

    errs = {}
    for scheme in ("godunov", "muscl-hancock"):
        dom = _strip_domain(zb1, depth0, dx)
        sim = _run(dom, scheme, t_end)
        z_ex = case.surface(x, t_end)
        h_ex = np.maximum(z_ex - zb1, 0.0)
        wet = h_ex > 0.5
        errs[scheme] = np.abs(sim.depth()[3][wet] - h_ex[wet]).mean()

    assert errs["muscl-hancock"] < errs["godunov"]


@pytest.mark.parametrize("scheme", ["godunov", "muscl-hancock"])
def test_stoker_f32_tracks_f64_beside_walls(scheme):
    """Regression: single-precision runs must not lose front momentum to
    ulp-noise stopping.  f32 rounding leaves ~1e-7 ghost cross-velocities
    pointing at the channel walls; with the reference's strict stopping
    comparison (CLSchemeGodunov.clc:105-133) those zeroed the cell's whole
    discharge, producing 0.11 m mean depth errors on this exact problem
    (vs 0.009 in f64).  STOP_FLOW_EPS thresholds the single-precision
    comparisons; the f32 solution must now track f64 to ~1e-4."""
    n, dx = 400, 2.0
    x = (np.arange(n) + 0.5) * dx
    depth = np.where(x < n * dx / 2, 2.0, 0.2)

    sols = {}
    for dtype in ("float64", "float32"):
        dom = _strip_domain(np.zeros(n), depth, dx)
        cfg = SimulationConfig(scheme=scheme, duration=20.0,
                               output_frequency=20.0, friction=False,
                               batch_size=32, dtype=dtype)
        sim = Simulation(dom, cfg)
        sim.run()
        sols[dtype] = sim.depth()

    dh = np.abs(sols["float64"] - sols["float32"])
    assert dh.max() < 1e-3, f"f32 diverged from f64: max |dh| = {dh.max()}"


def test_stop_condition_eps_semantics():
    """The stopping conditions treat sub-STOP_FLOW_EPS velocities as zero
    in f32 but keep the reference's strict comparison in f64 (oracle
    parity).  Wet cell (left) beside a high dry wall (right), with a tiny
    ghost velocity pushing toward the wall."""
    import jax.numpy as jnp

    from hipims_tpu import constants as C
    from hipims_tpu.ops.riemann import solve_interfaces

    ghost = 1e-7            # m/s-scale noise, below STOP_FLOW_EPS
    real = 1e-3             # a real (if small) flow, above it
    for dt_, stops_on_ghost in ((jnp.float32, False), (jnp.float64, True)):
        def one(q_toward_wall):
            zl = jnp.asarray([[1.0]], dt_)      # wet, depth 1 over bed 0
            zbl = jnp.asarray([[0.0]], dt_)
            zr = jnp.asarray([[9999.9]], dt_)   # wall: dry at its own bed
            zbr = jnp.asarray([[9999.9]], dt_)
            qal = jnp.asarray([[q_toward_wall]], dt_)  # along, toward wall
            zero = jnp.zeros((1, 1), dt_)
            f = solve_interfaces(zl, zbl, qal, zero, zr, zbr, zero, zero,
                                 C.VERY_SMALL)
            return bool(f.stop_l[0, 0]) or bool(f.stop_r[0, 0])

        assert one(real) is True, f"{dt_}: real inflow must stop"
        assert one(ghost) is stops_on_ghost, (
            f"{dt_}: ghost velocity stop behaviour wrong")
