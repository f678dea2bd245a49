"""MINMOD/MINBEE slope limiter (Toro 2001, pp. 208-210).

Mirrors slopeLimiter / calculateLimitedSlope (reference:
src/Schemes/Limiters/CLSlopeLimiterMINMOD.clc:26-89): component-wise limited
slopes for (z, h, qx, qy), zeroed entirely at wet/dry fronts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import MINBEE_BETA


def limited_slope(left, center, right):
    """Component-wise MINBEE-limited slope.

    For the reference's beta = 1 the MINBEE function reduces exactly to
    MINMOD: phi = max(0, min(r, 1)), so phi * region_l is region_l when
    r >= 1, region_r when 0 <= r < 1 and 0 otherwise.  Evaluating that
    piecewise form directly avoids the per-component division (the hot
    kernels call this 8x per cell), at a <=1-ulp difference from the
    ratio form (r * region_l rounds once more).
    """
    region_l = center - left
    region_r = right - center
    if MINBEE_BETA == 1.0:
        pos = (region_l > 0.0) & (region_r > 0.0)
        neg = (region_l < 0.0) & (region_r < 0.0)
        return jnp.where(pos, jnp.minimum(region_l, region_r),
                         jnp.where(neg, jnp.maximum(region_l, region_r),
                                   0.0))
    r = jnp.where(region_l == 0.0, 0.0, region_r
                  / jnp.where(region_l == 0.0, 1.0, region_l))
    phi = jnp.maximum(
        jnp.maximum(0.0, jnp.minimum(MINBEE_BETA * r, 1.0)),
        jnp.minimum(r, MINBEE_BETA))
    return phi * region_l


def slope_vector(z_l, zb_l, qx_l, qy_l,
                 z_c, zb_c, qx_c, qy_c,
                 z_r, zb_r, qx_r, qy_r, very_small):
    """Limited slopes (dz, dh, dqx, dqy); all zero at wet/dry fronts."""
    wet = ((z_l - zb_l) >= very_small) & ((z_r - zb_r) >= very_small)
    sz = limited_slope(z_l, z_c, z_r)
    sh = limited_slope(z_l - zb_l, z_c - zb_c, z_r - zb_r)
    sqx = limited_slope(qx_l, qx_c, qx_r)
    sqy = limited_slope(qy_l, qy_c, qy_r)
    zero = jnp.zeros_like(sz)
    return (jnp.where(wet, sz, zero), jnp.where(wet, sh, zero),
            jnp.where(wet, sqx, zero), jnp.where(wet, sqy, zero))
