"""Vectorised Godunov step vs. the literal per-cell oracle.

The oracle (ops/oracle.py) transcribes the reference kernel semantics cell by
cell, including the per-cell datum shift and double interface evaluation.
The production path (ops/godunov.py) solves each interface once and applies
the closed-form shift correction; these tests prove the two agree to
round-off on adversarial wet/dry states.
"""

import numpy as np
import pytest

from hipims_tpu.ops.godunov import SchemeParams, godunov_step
from hipims_tpu.ops.oracle import godunov_step_oracle
from hipims_tpu.state import DomainStatic, FlowState


def random_domain(seed, rows=14, cols=18, dry_fraction=0.4,
                  disabled_fraction=0.1):
    rng = np.random.default_rng(seed)
    zb = rng.uniform(0.0, 3.0, (rows, cols))
    depth = rng.uniform(0.0, 2.0, (rows, cols))
    depth[rng.random((rows, cols)) < dry_fraction] = 0.0
    z = zb + depth
    qx = rng.uniform(-1.5, 1.5, (rows, cols)) * (depth > 0)
    qy = rng.uniform(-1.5, 1.5, (rows, cols)) * (depth > 0)
    zmax = z + rng.uniform(0.0, 0.5, (rows, cols))
    disabled = rng.random((rows, cols)) < disabled_fraction
    z[disabled] = -9999.0
    zmax[disabled] = -9999.0
    qx[disabled] = 0.0
    qy[disabled] = 0.0
    manning = rng.uniform(0.01, 0.06, (rows, cols))
    return z, zmax, qx, qy, zb, manning


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("friction", [True, False])
def test_matches_oracle(seed, friction):
    z, zmax, qx, qy, zb, n = random_domain(seed)
    dt, dx, dy = 0.05, 2.0, 2.0

    ref = godunov_step_oracle(z, zmax, qx, qy, zb, n, dt, dx, dy,
                              friction=friction)

    state = FlowState(*[np.asarray(a) for a in (z, zmax, qx, qy)])
    static = DomainStatic(zb=zb, manning=n)
    params = SchemeParams(dx=dx, dy=dy, friction=friction)
    out = godunov_step(state, static, dt, params)

    for got, want, name in zip(out, ref, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9,
                                   atol=1e-11, err_msg=name)


def test_suspended_timestep_is_identity():
    z, zmax, qx, qy, zb, n = random_domain(7)
    state = FlowState(*[np.asarray(a) for a in (z, zmax, qx, qy)])
    static = DomainStatic(zb=zb, manning=n)
    params = SchemeParams(dx=2.0, dy=2.0)
    out = godunov_step(state, static, -0.25, params)
    for got, want in zip(out, state):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_edge_ring_never_updates():
    z, zmax, qx, qy, zb, n = random_domain(9)
    state = FlowState(*[np.asarray(a) for a in (z, zmax, qx, qy)])
    static = DomainStatic(zb=zb, manning=n)
    params = SchemeParams(dx=2.0, dy=2.0)
    out = godunov_step(state, static, 0.05, params)
    for got, want in zip(out, state):
        got = np.asarray(got)
        want = np.asarray(want)
        np.testing.assert_array_equal(got[0, :], want[0, :])
        np.testing.assert_array_equal(got[-1, :], want[-1, :])
        np.testing.assert_array_equal(got[:, 0], want[:, 0])
        np.testing.assert_array_equal(got[:, -1], want[:, -1])


def test_lake_at_rest_is_well_balanced():
    """Still water over an irregular bed must stay still (C-property)."""
    rng = np.random.default_rng(12)
    rows, cols = 16, 24
    zb = rng.uniform(0.0, 4.0, (rows, cols))
    level = 5.0
    z = np.full((rows, cols), level)
    state = FlowState(z=z, zmax=z.copy(),
                      qx=np.zeros_like(z), qy=np.zeros_like(z))
    static = DomainStatic(zb=zb, manning=np.full_like(z, 0.03))
    params = SchemeParams(dx=2.0, dy=2.0)

    out = state
    for _ in range(20):
        out = godunov_step(out, static, 0.1, params)

    np.testing.assert_allclose(np.asarray(out.z), z, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.qx), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.qy), 0.0, atol=1e-12)


def test_lake_at_rest_with_emerged_bed():
    """Well-balancedness with partially emerged (dry) topography."""
    rng = np.random.default_rng(13)
    rows, cols = 16, 24
    zb = rng.uniform(0.0, 8.0, (rows, cols))  # some cells above water level
    level = 5.0
    z = np.maximum(zb, level)
    state = FlowState(z=z, zmax=z.copy(),
                      qx=np.zeros_like(z), qy=np.zeros_like(z))
    static = DomainStatic(zb=zb, manning=np.full_like(z, 0.03))
    params = SchemeParams(dx=2.0, dy=2.0)

    out = state
    for _ in range(20):
        out = godunov_step(out, static, 0.1, params)

    np.testing.assert_allclose(np.asarray(out.z), z, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.qx), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.qy), 0.0, atol=1e-10)


def test_mass_conservation_closed_basin():
    """Total volume is conserved in a closed basin (walled edges)."""
    rows, cols = 20, 28
    zb = np.zeros((rows, cols))
    # Wall off the never-updated edge ring so no mass crosses it.
    zb[0, :] = zb[-1, :] = zb[:, 0] = zb[:, -1] = 9999.9
    z = zb.copy()
    z[1:-1, 1:-1] = 0.1
    z[8:12, 10:16] = 2.0  # a mound of water
    state = FlowState(z=z, zmax=z.copy(),
                      qx=np.zeros_like(z), qy=np.zeros_like(z))
    static = DomainStatic(zb=zb, manning=np.full_like(z, 0.02))
    params = SchemeParams(dx=2.0, dy=2.0)

    interior = (slice(1, -1), slice(1, -1))
    vol0 = np.sum(z[interior] - zb[interior])
    out = state
    for _ in range(50):
        out = godunov_step(out, static, 0.05, params)
    vol1 = np.sum(np.asarray(out.z)[interior] - zb[interior])
    # Not exactly conservative: the scheme intentionally rounds sub-threshold
    # deltas to zero and clamps near-dry cells to the bed (reference:
    # src/Schemes/CLSchemeGodunov.clc:338-348, :379-380), so allow
    # threshold-scale drift (papers report <1% volume error end-to-end).
    np.testing.assert_allclose(vol1, vol0, rtol=1e-8)
