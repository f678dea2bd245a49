"""MINMOD/MINBEE slope limiter (Toro 2001, pp. 208-210).

Mirrors slopeLimiter / calculateLimitedSlope (reference:
src/Schemes/Limiters/CLSlopeLimiterMINMOD.clc:26-89): component-wise limited
slopes for (z, h, qx, qy), zeroed entirely at wet/dry fronts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import MINBEE_BETA


def limited_slope(left, center, right):
    """Component-wise MINBEE-limited slope."""
    region_l = center - left
    region_r = right - center
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
