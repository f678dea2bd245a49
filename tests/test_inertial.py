"""Partial-inertial scheme vs. a literal per-cell transcription."""

import numpy as np
import pytest

from hipims_tpu import constants as C
from hipims_tpu.ops.godunov import SchemeParams
from hipims_tpu.ops.inertial import inertial_step
from hipims_tpu.state import DomainStatic, FlowState
from tests.test_godunov_oracle import random_domain

G = C.GRAVITY


def _face(n, dt, prev_q, lv_up, bed_up, lv_dn, bed_dn, dx, vs):
    depth = max(lv_dn, lv_up) - max(bed_up, bed_dn)
    slope = (lv_dn - lv_up) / dx
    if depth < vs:
        return 0.0
    q = (prev_q - G * depth * dt * slope) / (
        1.0 + G * depth * dt * n * n * abs(prev_q) / depth ** (10.0 / 3.0))
    cel = np.sqrt(G * depth)
    if q > 0.0 and (abs(q) / depth) / cel > C.FROUDE_LIMIT:
        q = depth * cel * C.FROUDE_LIMIT
    if q < 0.0 and (abs(q) / depth) / cel > C.FROUDE_LIMIT:
        q = -depth * cel * C.FROUDE_LIMIT
    return q


def inertial_oracle(z, zmax, qx, qy, zb, manning, dt, dx, dy,
                    vs=C.VERY_SMALL):
    rows, cols = z.shape
    out = [a.astype(np.float64).copy() for a in (z, zmax, qx, qy)]
    if dt <= 0.0:
        return tuple(out)
    for y in range(1, rows - 1):
        for x in range(1, cols - 1):
            if zmax[y, x] <= -9999.0 or z[y, x] == -9999.0:
                continue
            nbr = {"N": (y + 1, x), "S": (y - 1, x),
                   "E": (y, x + 1), "W": (y, x - 1)}
            dry = int(z[y, x] - zb[y, x] < vs)
            dry += sum(int(z[j, i] - zb[j, i] < vs)
                       for j, i in nbr.values())
            if dry >= 5:
                continue
            nv = manning[y, x]
            jn, in_ = nbr["N"]
            je, ie = nbr["E"]
            js, is_ = nbr["S"]
            jw, iw = nbr["W"]
            q_n = _face(nv, dt, qy[jn, in_], z[jn, in_], zb[jn, in_],
                        z[y, x], zb[y, x], dx, vs)
            q_e = _face(nv, dt, qx[je, ie], z[je, ie], zb[je, ie],
                        z[y, x], zb[y, x], dx, vs)
            q_s = _face(nv, dt, qy[y, x], z[y, x], zb[y, x],
                        z[js, is_], zb[js, is_], dx, vs)
            q_w = _face(nv, dt, qx[y, x], z[y, x], zb[y, x],
                        z[jw, iw], zb[jw, iw], dx, vs)

            cz = z[y, x] + dt * (q_e - q_w + q_n - q_s) / dy
            czmax = zmax[y, x]
            if cz > czmax:
                czmax = cz
            if cz - zb[y, x] < vs:
                cz = zb[y, x]
            out[0][y, x] = cz
            out[1][y, x] = czmax
            out[2][y, x] = q_w
            out[3][y, x] = q_s
    return tuple(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_oracle(seed):
    z, zmax, qx, qy, zb, n = random_domain(seed)
    dt, dx, dy = 0.05, 2.0, 2.0
    ref = inertial_oracle(z, zmax, qx, qy, zb, n, dt, dx, dy)
    out = inertial_step(FlowState(z, zmax, qx, qy), DomainStatic(zb, n),
                        dt, SchemeParams(dx=dx, dy=dy))
    for got, want, name in zip(out, ref, ("z", "zmax", "qx", "qy")):
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9,
                                   atol=1e-11, err_msg=name)


def test_mismatched_manning_faces():
    """The same interface must use each computing cell's own n, so the two
    cells' stored face discharges differ when n differs (reference quirk)."""
    rows, cols = 8, 8
    zb = np.zeros((rows, cols))
    z = np.full((rows, cols), 1.0)
    z[:, :4] = 2.0  # slope from W to E
    qx = np.zeros((rows, cols))
    qy = np.zeros((rows, cols))
    n = np.full((rows, cols), 0.01)
    n[:, 4:] = 0.10
    out = inertial_step(FlowState(z, z.copy(), qx, qy),
                        DomainStatic(zb, n), 0.5,
                        SchemeParams(dx=2.0, dy=2.0))
    ref = inertial_oracle(z, z.copy(), qx, qy, zb, n, 0.5, 2.0, 2.0)
    np.testing.assert_allclose(np.asarray(out.qx), ref[2], rtol=1e-12)
