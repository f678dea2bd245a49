"""Kernel experiments: MUSCL split variants (NOT part of the framework).

Variant v2: predictor outputs only the 4 half-step BASE planes; the
corrector recomputes the limited slopes from the original state (already
DMA'd with an 8-row halo), cutting HBM traffic from ~156 B/cell to
~92 B/cell at the cost of ~2 slope_vector evaluations per cell.
"""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hipims_tpu.domain import Domain
from hipims_tpu.ops.godunov import SchemeParams
from hipims_tpu.ops.muscl import (FaceExtrap, faces_from_base_slopes,
                                  muscl_corrector_full,
                                  muscl_predictor_base_slopes)
from hipims_tpu.ops.limiters import slope_vector
from hipims_tpu.ops.pallas import muscl_split as ms
from hipims_tpu.ops.pallas.stencil import (HALO, VMEM_LIMIT, pick_tile_rows,
                                           pipeline_epilogue,
                                           pipeline_prologue)
from hipims_tpu.state import DomainStatic, FlowState
from hipims_tpu import constants as C

RING = 2


def _predictor4_kernel(dt_ref, *refs, params, tile_rows, rows, cols):
    n_in = 5
    ins = refs[:n_in]
    outs = refs[n_in:n_in + 4]
    scr = refs[n_in + 4]
    out_scr = refs[n_in + 5]
    sem_in = refs[n_in + 6]
    sem_out = refs[n_in + 7]

    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    tr = tile_rows
    slot, nslot = pipeline_prologue(ins, outs, scr, out_scr, sem_in,
                                    sem_out, t, n_tiles, tr, rows)

    w0, w1 = HALO - 1, HALO + tr + 1
    z, zmax, qx, qy, zb = (scr[slot, k, w0:w1, :] for k in range(n_in))
    dt = dt_ref[0, 0]

    base, sx, sy = muscl_predictor_base_slopes(z, zmax, qx, qy, zb, dt,
                                               params)
    fo = FaceExtrap(z=z[1:-1, :], h=z[1:-1, :] - zb[1:-1, :],
                    qx=qx[1:-1, :], qy=qy[1:-1, :])
    for idx, (slab, comp_fo) in enumerate(zip(base, fo)):
        out_scr[slot, idx] = jnp.concatenate(
            [comp_fo[:, :1], slab, comp_fo[:, -1:]], axis=1)

    pipeline_epilogue(outs, out_scr, sem_out, t, n_tiles, tr, slot, nslot)


def _corrector_rs_kernel(dt_ref, *refs, params, tile_rows, rows, cols,
                         logical_rows, logical_cols):
    n_in = 10  # z zmax qx qy zb n + base(4)
    ins = refs[:n_in]
    outs = refs[n_in:n_in + 4]
    speed_ref = refs[n_in + 4]
    scr = refs[n_in + 5]
    out_scr = refs[n_in + 6]
    sem_in = refs[n_in + 7]
    sem_out = refs[n_in + 8]

    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    tr = tile_rows
    slot, nslot = pipeline_prologue(ins, outs, scr, out_scr, sem_in,
                                    sem_out, t, n_tiles, tr, rows)

    # Radius-2 window for the slope recompute.
    v0, v1 = HALO - 2, HALO + tr + 2
    z2, zmax2, qx2, qy2, zb2 = (scr[slot, k, v0:v1, :] for k in range(5))
    # Radius-1 window for everything else.
    w0, w1 = HALO - 1, HALO + tr + 1
    win = [scr[slot, k, w0:w1, :] for k in range(n_in)]
    z, zmax, qx, qy, zb, n = win[:6]
    base = FaceExtrap(*win[6:10])
    dt = dt_ref[0, 0]

    # Recompute the limited slopes exactly as the predictor did
    # (muscl_predictor_base_slopes), but FULL-WIDTH: east/west neighbours
    # via lane rolls, north/south via row-shifted scratch windows, edge
    # columns zeroed by an iota mask (Mosaic cannot concatenate arrays
    # whose sublane offsets differ).
    vs = params.very_small
    roll = lambda a, s: pltpu.roll(a, s, 1)
    zc, zbc = z, zb
    hc = zc - zbc
    qxc, qyc = qx, qy
    nw = (slice(2, None), slice(None))   # north rows of radius-2 window
    sw = (slice(None, -2), slice(None))  # south rows
    z_n, zb_n, qx_n, qy_n, zmax_n = (a[nw] for a in (z2, zb2, qx2, qy2,
                                                     zmax2))
    z_s, zb_s, qx_s, qy_s, zmax_s = (a[sw] for a in (z2, zb2, qx2, qy2,
                                                     zmax2))
    z_e, zb_e2, qx_e, qy_e, zmax_e = (roll(a, -1) for a in
                                      (zc, zbc, qxc, qyc, zmax))
    z_w, zb_w2, qx_w, qy_w, zmax_w = (roll(a, 1) for a in
                                      (zc, zbc, qxc, qyc, zmax))
    first_order = ((hc < 1e-5)
                   | (zmax_n <= -9998.0) | (zmax_e <= -9998.0)
                   | (zmax_s <= -9998.0) | (zmax_w <= -9998.0))
    sx = slope_vector(z_w, zb_w2, qx_w, qy_w,
                      zc, zbc, qxc, qyc,
                      z_e, zb_e2, qx_e, qy_e, vs)
    sy = slope_vector(z_s, zb_s, qx_s, qy_s,
                      zc, zbc, qxc, qyc,
                      z_n, zb_n, qx_n, qy_n, vs)
    cids0 = jax.lax.broadcasted_iota(jnp.int32, hc.shape, 1)
    kill = first_order | (cids0 == 0) | (cids0 == cols - 1)

    def mask_slope(vec):
        return tuple(jnp.where(kill, 0.0, s) for s in vec)

    faces = faces_from_base_slopes(base, mask_slope(sx), mask_slope(sy))

    zi, zmaxi, qxi, qyi = muscl_corrector_full(z, zmax, qx, qy, zb, n,
                                               faces, dt, params)

    gids = jax.lax.broadcasted_iota(jnp.int32, zi.shape, 0) + t * tr
    cids = jax.lax.broadcasted_iota(jnp.int32, zi.shape, 1) + 1
    ring = ((gids < RING) | (gids >= logical_rows - RING)
            | (cids < RING) | (cids >= logical_cols - RING))
    old = (z[1:-1, 1:-1], zmax[1:-1, 1:-1], qx[1:-1, 1:-1], qy[1:-1, 1:-1])
    zi, zmaxi, qxi, qyi = (jnp.where(ring, o, v) for o, v in
                           zip(old, (zi, zmaxi, qxi, qyi)))

    def full_width(old2d, interior):
        return jnp.concatenate(
            [old2d[1:-1, :1], interior, old2d[1:-1, -1:]], axis=1)

    zf = full_width(z, zi)
    zmaxf = full_width(zmax, zmaxi)
    qxf = full_width(qx, qxi)
    qyf = full_width(qy, qyi)
    out_scr[slot, 0] = zf
    out_scr[slot, 1] = zmaxf
    out_scr[slot, 2] = qxf
    out_scr[slot, 3] = qyf

    h = zf - zb[1:-1, :]
    wet = (h > params.quite_small) & (zmaxf > C.NODATA)
    h_safe = jnp.where(wet, h, 1.0)
    cel = jnp.sqrt(C.GRAVITY * jnp.maximum(h, 0.0))
    spd = jnp.maximum(jnp.abs(qxf), jnp.abs(qyf)) / h_safe + cel
    spd = jnp.where(wet, spd, 0.0)
    speed_ref[t, 0] = jnp.max(spd)

    pipeline_epilogue(outs, out_scr, sem_out, t, n_tiles, tr, slot, nslot)


@functools.partial(jax.jit, static_argnames=(
    "params", "tile_rows", "logical_rows", "logical_cols"))
def muscl_step_v2(state, static, dt, params, tile_rows,
                  logical_rows=None, logical_cols=None):
    rows, cols = state.z.shape
    n_tiles = rows // tile_rows
    dtype = state.z.dtype
    lr = logical_rows or rows
    lc = logical_cols or cols
    dt_arr = jnp.reshape(jnp.asarray(dt, dtype=dtype), (1, 1))
    plane = jax.ShapeDtypeStruct((rows, cols), dtype)

    pk = functools.partial(_predictor4_kernel, params=params,
                           tile_rows=tile_rows, rows=rows, cols=cols)
    pred = pl.pallas_call(
        pk,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            scratch_shapes=[
                pltpu.VMEM((2, 5, tile_rows + 2 * HALO, cols), dtype),
                pltpu.VMEM((2, 4, tile_rows, cols), dtype),
                pltpu.SemaphoreType.DMA((2, 5)),
                pltpu.SemaphoreType.DMA((2, 4)),
            ]),
        out_shape=[plane] * 4,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
    )(dt_arr, state.z, state.zmax, state.qx, state.qy, static.zb)

    ck = functools.partial(_corrector_rs_kernel, params=params,
                           tile_rows=tile_rows, rows=rows, cols=cols,
                           logical_rows=lr, logical_cols=lc)
    n_in = 10
    zo, zmaxo, qxo, qyo, speeds = pl.pallas_call(
        ck,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * n_in,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=[
                pltpu.VMEM((2, n_in, tile_rows + 2 * HALO, cols), dtype),
                pltpu.VMEM((2, 4, tile_rows, cols), dtype),
                pltpu.SemaphoreType.DMA((2, n_in)),
                pltpu.SemaphoreType.DMA((2, 4)),
            ]),
        out_shape=[plane] * 4 + [jax.ShapeDtypeStruct((n_tiles, 1), dtype)],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
    )(dt_arr, state.z, state.zmax, state.qx, state.qy, static.zb,
      static.manning, *pred)

    return FlowState(z=zo, zmax=zmaxo, qx=qxo, qy=qyo), jnp.max(speeds)


def main():
    rows = cols = 1408
    yy, xx = np.mgrid[0:rows, 0:cols]
    zb = 0.2 * np.sin(xx / 50.0) * np.cos(yy / 50.0)
    dom = Domain(zb=zb, manning=0.03, dx=10.0, dy=10.0)
    r = np.hypot((yy - rows / 2) * 10.0, (xx - cols / 2) * 10.0)
    dom.set_initial_depth(np.where(r <= rows * 10.0 / 6.0, 8.0, 2.0))
    state, static = dom.build(np.float32)
    params = SchemeParams(dx=10.0, dy=10.0, very_small=1e-10,
                          quite_small=1e-10, friction=True)
    dt = jnp.float32(0.4)
    K = 100

    def timeit(fn, st, label):
        o = fn(st)
        _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            o = fn(st)
            _ = float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        el = min(ts)
        print(f"{label}: {el/K*1e3:.3f} ms/iter -> "
              f"{rows*cols*K/el/1e9:.2f} G cells/s")

    for trr in (88, 176, 352):
        @jax.jit
        def run_v0(st, trr=trr):
            def body(c, _):
                ns, spd = ms.muscl_step_pallas_split.__wrapped__(
                    c, static, dt, params, trr, False, rows, cols)
                return ns, None
            out, _ = jax.lax.scan(body, st, None, length=K)
            return out

        @jax.jit
        def run_v2(st, trr=trr):
            def body(c, _):
                ns, spd = muscl_step_v2.__wrapped__(
                    c, static, dt, params, trr, rows, cols)
                return ns, None
            out, _ = jax.lax.scan(body, st, None, length=K)
            return out

        timeit(run_v0, state, f"v0 split 12-plane tr={trr}")
        timeit(run_v2, state, f"v2 slope-recompute tr={trr}")

    # bitwise check
    s0, w0 = ms.muscl_step_pallas_split(state, static, dt, params, 88,
                                        False, rows, cols)
    s2, w2 = muscl_step_v2(state, static, dt, params, 88, rows, cols)
    for a, b, nm in zip(s0, s2, ("z", "zmax", "qx", "qy")):
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        print(nm, "max|diff|", d)
    print("wave", float(w0), float(w2))


if __name__ == "__main__":
    main()
