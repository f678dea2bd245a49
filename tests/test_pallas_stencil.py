"""Pallas fused Godunov kernel vs. the XLA backend (interpret mode on CPU)."""

import numpy as np
import pytest

from hipims_tpu.ops.godunov import SchemeParams, godunov_step
from hipims_tpu.ops.pallas.stencil import godunov_step_pallas, supports
from hipims_tpu.ops.timestep import max_wave_speed
from hipims_tpu.state import DomainStatic, FlowState
from tests.test_godunov_oracle import random_domain


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    z, zmax, qx, qy, zb, n = random_domain(seed, rows=32, cols=128)
    state = FlowState(*[np.asarray(a) for a in (z, zmax, qx, qy)])
    static = DomainStatic(zb=zb, manning=n)
    params = SchemeParams(dx=2.0, dy=2.0)
    dt = 0.05

    want = godunov_step(state, static, dt, params)
    got, speed = godunov_step_pallas(state, static, dt, params,
                                     tile_rows=8, interpret=True)

    for g, w, name in zip(got, want, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-12, atol=1e-12, err_msg=name)

    want_speed = max_wave_speed(want.z, want.zmax, want.qx, want.qy,
                                static.zb, params.quite_small)
    assert float(speed) == pytest.approx(float(want_speed), rel=1e-12)


def test_pallas_multi_tile_consistency():
    """Different tilings must give identical results."""
    z, zmax, qx, qy, zb, n = random_domain(3, rows=64, cols=128)
    state = FlowState(*[np.asarray(a) for a in (z, zmax, qx, qy)])
    static = DomainStatic(zb=zb, manning=n)
    params = SchemeParams(dx=2.0, dy=2.0)

    a, sa = godunov_step_pallas(state, static, 0.05, params,
                                tile_rows=32, interpret=True)
    b, sb = godunov_step_pallas(state, static, 0.05, params,
                                tile_rows=8, interpret=True)
    # Tilings fuse differently in the compiler; agreement to an ulp.
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-14, atol=1e-14)
    assert float(sa) == pytest.approx(float(sb), rel=1e-14)


def test_supports_contract():
    assert supports(64, 128)
    assert not supports(66, 128)       # rows not 8-aligned
    assert not supports(64, 100)       # cols not lane-aligned
    assert not supports(8, 128, 8)     # single tile


@pytest.mark.parametrize("scheme", ["muscl-hancock", "inertial"])
def test_pallas_other_schemes_match_xla(scheme):
    from hipims_tpu.models import get_scheme
    from hipims_tpu.ops.pallas.stencil import stencil_step_pallas

    z, zmax, qx, qy, zb, n = random_domain(5, rows=32, cols=128)
    state = FlowState(*[np.asarray(a) for a in (z, zmax, qx, qy)])
    static = DomainStatic(zb=zb, manning=n)
    params = SchemeParams(dx=2.0, dy=2.0)
    dt = 0.05

    sch = get_scheme(scheme)
    want = sch.step(state, static, dt, params)
    got, speed = stencil_step_pallas(scheme, state, static, dt, params,
                                     simplified_speed=sch.simplified_speed,
                                     tile_rows=8, interpret=True)
    for g, w, name in zip(got, want, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-12, atol=1e-12, err_msg=name)

    want_speed = max_wave_speed(want.z, want.zmax, want.qx, want.qy,
                                static.zb, params.quite_small,
                                sch.simplified_speed)
    assert float(speed) == pytest.approx(float(want_speed), rel=1e-12)


@pytest.mark.parametrize("variant", ["split12", "recompute"])
def test_muscl_split_matches_whole(variant):
    """Two-kernel split MUSCL == whole-grid MUSCL (interpret mode), for
    both the 12-plane and the slope-recompute variants."""
    from hipims_tpu.models import get_scheme
    from hipims_tpu.ops.pallas.muscl_split import muscl_step_pallas_split

    z, zmax, qx, qy, zb, n = random_domain(6, rows=32, cols=128)
    state = FlowState(*[np.asarray(a) for a in (z, zmax, qx, qy)])
    static = DomainStatic(zb=zb, manning=n)
    params = SchemeParams(dx=2.0, dy=2.0)
    dt = 0.05

    want = get_scheme("muscl-hancock").step(state, static, dt, params)
    got, speed = muscl_step_pallas_split(state, static, dt, params,
                                         tile_rows=8, interpret=True,
                                         variant=variant)
    for g, w, name in zip(got, want, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-12, atol=1e-12, err_msg=name)
    want_speed = max_wave_speed(want.z, want.zmax, want.qx, want.qy,
                                static.zb, params.quite_small)
    assert float(speed) == pytest.approx(float(want_speed), rel=1e-12)


def test_muscl_variants_equivalent():
    """The recompute corrector re-derives the same limited slopes the
    split12 predictor stored; the variants agree to an ulp (the recompute
    expression tree fuses differently in the compiler, exactly like
    different tilings in test_pallas_multi_tile_consistency)."""
    from hipims_tpu.ops.pallas.muscl_split import muscl_step_pallas_split

    z, zmax, qx, qy, zb, n = random_domain(9, rows=32, cols=128)
    state = FlowState(*[np.asarray(a) for a in (z, zmax, qx, qy)])
    static = DomainStatic(zb=zb, manning=n)
    params = SchemeParams(dx=2.0, dy=2.0)

    a, sa = muscl_step_pallas_split(state, static, 0.05, params,
                                    tile_rows=8, interpret=True,
                                    variant="split12")
    b, sb = muscl_step_pallas_split(state, static, 0.05, params,
                                    tile_rows=8, interpret=True,
                                    variant="recompute")
    for x, y, name in zip(a, b, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-13, atol=1e-15, err_msg=name)
    assert float(sa) == pytest.approx(float(sb), rel=1e-13)


# ---------------------------------------------------------------------------
# Compensated-f32 plane through the fused kernels (see ops/compensated.py).
# ---------------------------------------------------------------------------

def _f32_domain(seed, rows=32, cols=128):
    z, zmax, qx, qy, zb, n = random_domain(seed, rows=rows, cols=cols)
    f32 = lambda a: np.asarray(a, dtype=np.float32)  # noqa: E731
    state = FlowState(f32(z), f32(zmax), f32(qx), f32(qy))
    static = DomainStatic(zb=f32(zb), manning=f32(n))
    return state, static


@pytest.mark.parametrize("scheme", ["godunov", "inertial"])
def test_pallas_compensated_matches_xla(scheme):
    """Multi-step comp accumulation: Pallas comp plane == XLA comp path."""
    from hipims_tpu.models import get_scheme
    from hipims_tpu.ops.pallas.stencil import stencil_step_pallas

    state, static = _f32_domain(11)
    sch = get_scheme(scheme)
    dt = np.float32(0.05)

    want, want_comp = state, np.zeros_like(np.asarray(state.z))
    got, got_comp = state, np.zeros_like(np.asarray(state.z))
    for _ in range(4):
        want, want_comp = sch.step(want, static, dt, SchemeParams(2.0, 2.0),
                                   comp=want_comp)
        got, speed, got_comp = stencil_step_pallas(
            scheme, got, static, dt, SchemeParams(2.0, 2.0),
            simplified_speed=sch.simplified_speed, tile_rows=8,
            interpret=True, comp=got_comp)
    # f32 interpret-mode fusion differs from XLA by an ulp or two; the
    # invariant that must match tightly is the TRUE surface z + comp.
    for g, w, name in zip(got, want, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
    true_g = np.asarray(got.z, np.float64) + np.asarray(got_comp, np.float64)
    true_w = np.asarray(want.z, np.float64) + np.asarray(want_comp,
                                                         np.float64)
    np.testing.assert_allclose(true_g, true_w, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("variant", ["split12", "recompute"])
# An ulp-level z difference can flip a limiter/stopping branch and grow a
# localized O(1e-6) state difference over the multi-step accumulation —
# plumbing errors would diverge wholesale, so the tolerance stays loose.
def test_muscl_split_compensated_matches_whole(variant):
    from hipims_tpu.models import get_scheme
    from hipims_tpu.ops.pallas.muscl_split import muscl_step_pallas_split

    state, static = _f32_domain(12)
    sch = get_scheme("muscl-hancock")
    dt = np.float32(0.05)

    want, want_comp = state, np.zeros_like(np.asarray(state.z))
    got, got_comp = state, np.zeros_like(np.asarray(state.z))
    for _ in range(3):
        want, want_comp = sch.step(want, static, dt, SchemeParams(2.0, 2.0),
                                   comp=want_comp)
        got, speed, got_comp = muscl_step_pallas_split(
            got, static, dt, SchemeParams(2.0, 2.0), tile_rows=8,
            interpret=True, variant=variant, comp=got_comp)
    for g, w, name in zip(got, want, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
    true_g = np.asarray(got.z, np.float64) + np.asarray(got_comp, np.float64)
    true_w = np.asarray(want.z, np.float64) + np.asarray(want_comp,
                                                         np.float64)
    np.testing.assert_allclose(true_g, true_w, rtol=1e-6, atol=1e-6)
