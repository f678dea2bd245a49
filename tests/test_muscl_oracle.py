"""Vectorised MUSCL-Hancock step vs. the literal per-cell oracle."""

import numpy as np
import pytest

from hipims_tpu.ops.godunov import SchemeParams
from hipims_tpu.ops.muscl import muscl_step
from hipims_tpu.ops.oracle_muscl import muscl_step_oracle
from hipims_tpu.state import DomainStatic, FlowState
from tests.test_godunov_oracle import random_domain


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("friction", [True, False])
def test_matches_oracle(seed, friction):
    z, zmax, qx, qy, zb, n = random_domain(seed)
    dt, dx, dy = 0.05, 2.0, 2.0

    ref = muscl_step_oracle(z, zmax, qx, qy, zb, n, dt, dx, dy,
                            friction=friction)

    state = FlowState(*[np.asarray(a) for a in (z, zmax, qx, qy)])
    static = DomainStatic(zb=zb, manning=n)
    params = SchemeParams(dx=dx, dy=dy, friction=friction)
    out = muscl_step(state, static, dt, params)

    for got, want, name in zip(out, ref, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9,
                                   atol=1e-11, err_msg=name)


def test_smooth_wet_domain_matches_oracle():
    """Fully wet, smooth state exercises the genuine second-order path."""
    rng = np.random.default_rng(42)
    rows, cols = 16, 20
    x = np.linspace(0, 2 * np.pi, cols)[None, :]
    y = np.linspace(0, 2 * np.pi, rows)[:, None]
    zb = 0.2 * np.sin(x) * np.cos(y)
    z = 2.0 + 0.3 * np.cos(x) * np.sin(y)
    qx = 0.5 * np.sin(x + y)
    qy = 0.5 * np.cos(x - y)
    zmax = z + 0.1
    n = np.full((rows, cols), 0.03)

    dt, dx, dy = 0.02, 1.0, 1.0
    ref = muscl_step_oracle(z, zmax, qx, qy, zb, n, dt, dx, dy)
    out = muscl_step(FlowState(z, zmax, qx, qy),
                     DomainStatic(zb, n), dt,
                     SchemeParams(dx=dx, dy=dy))
    for got, want, name in zip(out, ref, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10,
                                   atol=1e-12, err_msg=name)


def test_lake_at_rest_muscl():
    rng = np.random.default_rng(5)
    rows, cols = 16, 24
    zb = rng.uniform(0.0, 4.0, (rows, cols))
    z = np.full((rows, cols), 5.0)
    state = FlowState(z=z, zmax=z.copy(),
                      qx=np.zeros_like(z), qy=np.zeros_like(z))
    static = DomainStatic(zb=zb, manning=np.full_like(z, 0.03))
    params = SchemeParams(dx=2.0, dy=2.0)

    out = state
    for _ in range(10):
        out = muscl_step(out, static, 0.1, params)
    np.testing.assert_allclose(np.asarray(out.z), z, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.qx), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.qy), 0.0, atol=1e-10)
