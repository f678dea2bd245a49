"""MUSCL-Hancock as TWO fused Pallas kernels (predictor / corrector).

The single fused MUSCL kernel (predictor + two interface sweeps + update in
one body) compiles but loses to this split: recomputing the predictor for
the halo ring and the doubled VMEM working set outweigh the saved HBM
round-trip.  The scheme is split at its natural seam — exactly where the
reference splits it into mch_1st / mch_2nd kernel launches
(src/Schemes/CSchemeMUSCLHancock.cpp:646-680):

  * kernel P: per row tile, DMA the five needed fields in (aligned halo),
    run the half-step predictor in VMEM, write the half-step BASE state +
    limited SLOPES (12 planes: 4 x (z, h, qx, qy) for base/sx/sy) — the
    four face extrapolations reconstruct bitwise as base +- 0.5*slope,
    so this carries the same information as the reference's 16-plane
    face store (sFaceStructure, CSchemeMUSCLHancock.cpp:469-496) in 25%
    less HBM traffic;
  * kernel C: DMA state + base/slopes in, reconstruct the faces in VMEM,
    run the corrector + implicit friction + CFL partial max, write the 4
    updated fields.

HBM traffic ~ (5+12)*4 B in + (12+4)*4 B out ≈ 132 B/cell; each kernel is
Godunov-sized so compilation is fast.  Same alignment contract and
logical-ring masking as ops/pallas/stencil.py; the scheme's static ring is
TWO cells (reference corrector bounds,
src/Schemes/CLSchemeMUSCLHancock.clc:568-573).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C
from ...state import DomainStatic, FlowState
from ..godunov import SchemeParams
from ..limiters import slope_vector
from ..muscl import (FaceExtrap, faces_from_base_slopes, first_order_mask,
                     muscl_corrector_full, muscl_predictor_base_slopes)
from .stencil import (HALO, VMEM_LIMIT, _i32, _x64_scope,
                      pick_tile_rows, pipeline_epilogue, pipeline_prologue,
                      supports)

N_PRED = 12   # base(z,h,qx,qy) + sx(4) + sy(4)
RING = 2      # MUSCL static ring width

# Which split variant the simulation uses by default:
#   "split12"   — predictor stores base + limited slopes (12 planes,
#                 ~132 B/cell of HBM traffic);
#   "recompute" — predictor stores only the 4 base planes and the
#                 corrector recomputes the limited slopes from the state
#                 tile already resident in VMEM (~92 B/cell at the cost of
#                 ~2 extra slope_vector evaluations per cell).
# Measured on a TPU v5 lite chip, 1408x1408 f32, 200-step scan, after
# the i32 index pinning sped up the VPU side: the two variants land
# within the relay's run-to-run variance of each other (split12
# 1.75-1.95, recompute 1.74-2.02 G cells/s across repeated identical
# runs) — the pre-pinning 25% recompute advantage is gone.  split12 is
# the default for its lower VPU load (more headroom for the compensated
# plane); env-overridable, and the bench sweep records both.
DEFAULT_VARIANT = os.environ.get("HIPIMS_MUSCL_VARIANT", "split12")


def _predictor_kernel(dt_ref, *refs, params, tile_rows, rows, cols):
    n_in = 5
    ins = refs[:n_in]
    outs = refs[n_in:n_in + N_PRED]
    scr = refs[n_in + N_PRED]
    out_scr = refs[n_in + N_PRED + 1]
    sem_in = refs[n_in + N_PRED + 2]
    sem_out = refs[n_in + N_PRED + 3]

    # i32 pin: under an x64-enabled host program_id is i64 and
    # Mosaic's memref_slice rejects i64 indices.
    t = _i32(pl.program_id(0))
    n_tiles = _i32(pl.num_programs(0))
    tr = tile_rows
    slot, nslot = pipeline_prologue(ins, outs, scr, out_scr, sem_in,
                                    sem_out, t, n_tiles, tr, rows)

    w0, w1 = HALO - 1, HALO + tr + 1
    z, zmax, qx, qy, zb = (scr[slot, _i32(k), w0:w1, :] for k in range(n_in))
    dt = dt_ref[0, 0]

    base, sx, sy = muscl_predictor_base_slopes(z, zmax, qx, qy, zb, dt,
                                               params)

    # Static edge columns: first-order placeholders (base = original
    # state, zero slopes) — finite, and exactly what the reference's
    # fallback stores for such cells.
    fo = FaceExtrap(z=z[1:-1, :], h=z[1:-1, :] - zb[1:-1, :],
                    qx=qx[1:-1, :], qy=qy[1:-1, :])
    idx = 0
    for slab, comp_fo in zip(base, fo):
        out_scr[slot, _i32(idx)] = jnp.concatenate(
            [comp_fo[:, :1], slab, comp_fo[:, -1:]], axis=1)
        idx += 1
    zeros = jnp.zeros((base.z.shape[0], 1), base.z.dtype)
    for vec in (sx, sy):
        for slab in vec:
            out_scr[slot, _i32(idx)] = jnp.concatenate([zeros, slab, zeros],
                                                 axis=1)
            idx += 1

    pipeline_epilogue(outs, out_scr, sem_out, t, n_tiles, tr, slot, nslot)


def _corrector_kernel(dt_ref, *refs, params, tile_rows, rows, cols,
                      logical_rows, logical_cols, compensated=False,
                      speed_window=None, with_origin=False):
    if with_origin:
        origin_ref, *refs = refs
        oy0, ox0 = origin_ref[0, 0], origin_ref[0, 1]
    else:
        oy0 = ox0 = 0
    n_in = 6 + N_PRED + (1 if compensated else 0)
    n_out = 4 + (1 if compensated else 0)
    ins = refs[:n_in]
    outs = refs[n_in:n_in + n_out]
    speed_ref = refs[n_in + n_out]
    scr = refs[n_in + n_out + 1]
    out_scr = refs[n_in + n_out + 2]
    sem_in = refs[n_in + n_out + 3]
    sem_out = refs[n_in + n_out + 4]

    # i32 pin: under an x64-enabled host program_id is i64 and
    # Mosaic's memref_slice rejects i64 indices.
    t = _i32(pl.program_id(0))
    n_tiles = _i32(pl.num_programs(0))
    tr = tile_rows
    slot, nslot = pipeline_prologue(ins, outs, scr, out_scr, sem_in,
                                    sem_out, t, n_tiles, tr, rows)

    w0, w1 = HALO - 1, HALO + tr + 1
    win = [scr[slot, _i32(k), w0:w1, :] for k in range(n_in)]
    z, zmax, qx, qy, zb, n = win[:6]
    base = FaceExtrap(*win[6:10])
    sx = tuple(win[10:14])
    sy = tuple(win[14:18])
    comp = win[18] if compensated else None
    faces = faces_from_base_slopes(base, sx, sy)
    dt = dt_ref[0, 0]

    out = muscl_corrector_full(z, zmax, qx, qy, zb, n, faces, dt, params,
                               comp=comp)
    zi, zmaxi, qxi, qyi = out[:4]

    # Two-cell static ring by global index.
    gids = (jax.lax.broadcasted_iota(jnp.int32, zi.shape, 0) + t * tr
            + oy0)
    cids = (jax.lax.broadcasted_iota(jnp.int32, zi.shape, 1) + 1 + ox0)
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
    out_scr[slot, _i32(0)] = zf
    out_scr[slot, _i32(1)] = zmaxf
    out_scr[slot, _i32(2)] = qxf
    out_scr[slot, _i32(3)] = qyf
    if compensated:
        compi = jnp.where(ring, comp[1:-1, 1:-1], out[4])
        out_scr[slot, _i32(4)] = full_width(comp, compi)

    h = zf - zb[1:-1, :]
    wet = (h > params.quite_small) & (zmaxf > C.NODATA)
    h_safe = jnp.where(wet, h, 1.0)
    cel = jnp.sqrt(C.GRAVITY * jnp.maximum(h, 0.0))
    spd = jnp.maximum(jnp.abs(qxf), jnp.abs(qyf)) / h_safe + cel
    spd = jnp.where(wet, spd, 0.0)
    if speed_window is not None:
        # Mesh mode: only this device's OWN cells feed the CFL max (see
        # ops/pallas/stencil.py).
        r0, nr, c0, nc = speed_window
        srows = jax.lax.broadcasted_iota(jnp.int32, spd.shape, 0) + t * tr
        scols = jax.lax.broadcasted_iota(jnp.int32, spd.shape, 1)
        own = ((srows >= r0) & (srows < r0 + nr)
               & (scols >= c0) & (scols < c0 + nc))
        spd = jnp.where(own, spd, 0.0)
    speed_ref[t, 0] = jnp.max(spd)

    pipeline_epilogue(outs, out_scr, sem_out, t, n_tiles, tr, slot, nslot)


# ---------------------------------------------------------------------------
# "recompute" variant: 4-plane predictor + slope-recomputing corrector.
# ---------------------------------------------------------------------------

def _predictor_base_kernel(dt_ref, *refs, params, tile_rows, rows, cols):
    """Half-step predictor storing ONLY the 4 base planes; the corrector
    recomputes the limited slopes from the state tile it already holds."""
    n_in = 5
    ins = refs[:n_in]
    outs = refs[n_in:n_in + 4]
    scr = refs[n_in + 4]
    out_scr = refs[n_in + 5]
    sem_in = refs[n_in + 6]
    sem_out = refs[n_in + 7]

    # i32 pin: under an x64-enabled host program_id is i64 and
    # Mosaic's memref_slice rejects i64 indices.
    t = _i32(pl.program_id(0))
    n_tiles = _i32(pl.num_programs(0))
    tr = tile_rows
    slot, nslot = pipeline_prologue(ins, outs, scr, out_scr, sem_in,
                                    sem_out, t, n_tiles, tr, rows)

    w0, w1 = HALO - 1, HALO + tr + 1
    z, zmax, qx, qy, zb = (scr[slot, _i32(k), w0:w1, :] for k in range(n_in))
    dt = dt_ref[0, 0]

    base, _sx, _sy = muscl_predictor_base_slopes(z, zmax, qx, qy, zb, dt,
                                                 params)
    # Static edge columns: first-order placeholders (original state).
    fo = FaceExtrap(z=z[1:-1, :], h=z[1:-1, :] - zb[1:-1, :],
                    qx=qx[1:-1, :], qy=qy[1:-1, :])
    for idx, (slab, comp_fo) in enumerate(zip(base, fo)):
        out_scr[slot, _i32(idx)] = jnp.concatenate(
            [comp_fo[:, :1], slab, comp_fo[:, -1:]], axis=1)

    pipeline_epilogue(outs, out_scr, sem_out, t, n_tiles, tr, slot, nslot)


def _corrector_recompute_kernel(dt_ref, *refs, params, tile_rows, rows,
                                cols, logical_rows, logical_cols,
                                compensated=False, speed_window=None,
                                with_origin=False):
    if with_origin:
        origin_ref, *refs = refs
        oy0, ox0 = origin_ref[0, 0], origin_ref[0, 1]
    else:
        oy0 = ox0 = 0
    """Corrector that re-derives the limited slopes from the original
    state (DMA'd with the standard aligned halo) instead of loading the 8
    slope planes from HBM — bitwise-identical faces, ~40 B/cell less HBM
    traffic.  East/west neighbours come from lane rolls and north/south
    from row-shifted scratch windows; edge columns and first-order cells
    are zeroed exactly as ``muscl_predictor_base_slopes`` stored them
    (Mosaic cannot concatenate arrays whose sublane offsets differ, hence
    the roll + iota-mask construction)."""
    n_in = 10 + (1 if compensated else 0)  # z zmax qx qy zb n + base(4)
    n_out = 4 + (1 if compensated else 0)
    ins = refs[:n_in]
    outs = refs[n_in:n_in + n_out]
    speed_ref = refs[n_in + n_out]
    scr = refs[n_in + n_out + 1]
    out_scr = refs[n_in + n_out + 2]
    sem_in = refs[n_in + n_out + 3]
    sem_out = refs[n_in + n_out + 4]

    # i32 pin: under an x64-enabled host program_id is i64 and
    # Mosaic's memref_slice rejects i64 indices.
    t = _i32(pl.program_id(0))
    n_tiles = _i32(pl.num_programs(0))
    tr = tile_rows
    slot, nslot = pipeline_prologue(ins, outs, scr, out_scr, sem_in,
                                    sem_out, t, n_tiles, tr, rows)

    # Radius-2 row window for the slope recompute's N/S neighbours.
    v0, v1 = HALO - 2, HALO + tr + 2
    z2, zmax2, qx2, qy2, zb2 = (scr[slot, _i32(k), v0:v1, :] for k in range(5))
    # Radius-1 window for everything else.
    w0, w1 = HALO - 1, HALO + tr + 1
    win = [scr[slot, _i32(k), w0:w1, :] for k in range(n_in)]
    z, zmax, qx, qy, zb, n = win[:6]
    base = FaceExtrap(*win[6:10])
    comp = win[10] if compensated else None
    dt = dt_ref[0, 0]

    vs = params.very_small
    # _i32: a python-int shift binds as an i64 constant under an
    # x64-enabled host, which Mosaic rejects.
    roll = lambda a, s: pltpu.roll(a, _i32(s), 1)  # noqa: E731
    zc, zbc = z, zb
    hc = zc - zbc
    qxc, qyc = qx, qy
    nw = (slice(2, None), slice(None))   # north rows of radius-2 window
    sw = (slice(None, -2), slice(None))  # south rows
    z_n, zb_n, qx_n, qy_n, zmax_n = (a[nw] for a in (z2, zb2, qx2, qy2,
                                                     zmax2))
    z_s, zb_s, qx_s, qy_s, zmax_s = (a[sw] for a in (z2, zb2, qx2, qy2,
                                                     zmax2))
    # pltpu.roll only takes non-negative shifts: left-by-1 == right-by-
    # (cols-1).
    z_e, zb_e, qx_e, qy_e, zmax_e = (roll(a, cols - 1) for a in
                                     (zc, zbc, qxc, qyc, zmax))
    z_w, zb_w, qx_w, qy_w, zmax_w = (roll(a, 1) for a in
                                     (zc, zbc, qxc, qyc, zmax))
    first_order = first_order_mask(hc, zmax_n, zmax_e, zmax_s, zmax_w)
    sx = slope_vector(z_w, zb_w, qx_w, qy_w,
                      zc, zbc, qxc, qyc,
                      z_e, zb_e, qx_e, qy_e, vs)
    sy = slope_vector(z_s, zb_s, qx_s, qy_s,
                      zc, zbc, qxc, qyc,
                      z_n, zb_n, qx_n, qy_n, vs)
    cids0 = jax.lax.broadcasted_iota(jnp.int32, hc.shape, 1)
    # The rolls wrap at the row ends; those lanes are exactly the static
    # edge columns whose stored slopes are zero.
    kill = first_order | (cids0 == 0) | (cids0 == cols - 1)

    def mask_slope(vec):
        return tuple(jnp.where(kill, 0.0, s) for s in vec)

    faces = faces_from_base_slopes(base, mask_slope(sx), mask_slope(sy))

    out = muscl_corrector_full(z, zmax, qx, qy, zb, n, faces, dt, params,
                               comp=comp)
    zi, zmaxi, qxi, qyi = out[:4]

    gids = (jax.lax.broadcasted_iota(jnp.int32, zi.shape, 0) + t * tr
            + oy0)
    cids = (jax.lax.broadcasted_iota(jnp.int32, zi.shape, 1) + 1 + ox0)
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
    out_scr[slot, _i32(0)] = zf
    out_scr[slot, _i32(1)] = zmaxf
    out_scr[slot, _i32(2)] = qxf
    out_scr[slot, _i32(3)] = qyf
    if compensated:
        compi = jnp.where(ring, comp[1:-1, 1:-1], out[4])
        out_scr[slot, _i32(4)] = full_width(comp, compi)

    h = zf - zb[1:-1, :]
    wet = (h > params.quite_small) & (zmaxf > C.NODATA)
    h_safe = jnp.where(wet, h, 1.0)
    cel = jnp.sqrt(C.GRAVITY * jnp.maximum(h, 0.0))
    spd = jnp.maximum(jnp.abs(qxf), jnp.abs(qyf)) / h_safe + cel
    spd = jnp.where(wet, spd, 0.0)
    if speed_window is not None:
        # Mesh mode: only this device's OWN cells feed the CFL max (see
        # ops/pallas/stencil.py).
        r0, nr, c0, nc = speed_window
        srows = jax.lax.broadcasted_iota(jnp.int32, spd.shape, 0) + t * tr
        scols = jax.lax.broadcasted_iota(jnp.int32, spd.shape, 1)
        own = ((srows >= r0) & (srows < r0 + nr)
               & (scols >= c0) & (scols < c0 + nc))
        spd = jnp.where(own, spd, 0.0)
    speed_ref[t, 0] = jnp.max(spd)

    pipeline_epilogue(outs, out_scr, sem_out, t, n_tiles, tr, slot, nslot)


@functools.partial(jax.jit, static_argnames=(
    "params", "tile_rows", "interpret", "logical_rows", "logical_cols",
    "variant", "speed_window"))
def muscl_step_pallas_split(state: FlowState, static: DomainStatic, dt,
                            params: SchemeParams, tile_rows=None,
                            interpret: bool = False, logical_rows=None,
                            logical_cols=None, variant=None, comp=None,
                            speed_window=None, origin=None):
    """Fused two-kernel MUSCL step + CFL reduce.  Returns
    (new_state, max_wave_speed), plus the updated compensation plane when
    ``comp`` (compensated-f32 z accumulation) is given — the residue only
    touches the corrector, which owns the full-step z update.  ``variant``
    picks the predictor/corrector pair ("split12" | "recompute";
    None = DEFAULT_VARIANT)."""
    rows, cols = state.z.shape
    compensated = comp is not None
    with_origin = origin is not None
    if variant is None:
        variant = DEFAULT_VARIANT
    if variant not in ("split12", "recompute"):
        raise ValueError(f"unknown MUSCL split variant '{variant}'")
    if tile_rows is None:
        tile_rows = pick_tile_rows(rows, cols, 60)
    if not supports(rows, cols, tile_rows):
        raise ValueError(
            f"grid {rows}x{cols} with tile_rows={tile_rows} violates the "
            "Pallas alignment contract (see Domain.pad_for_tiles)")
    n_tiles = rows // tile_rows
    dtype = state.z.dtype
    lr = logical_rows or rows
    lc = logical_cols or cols
    n_pred = N_PRED if variant == "split12" else 4
    pred_fn = (_predictor_kernel if variant == "split12"
               else _predictor_base_kernel)
    corr_fn = (_corrector_kernel if variant == "split12"
               else _corrector_recompute_kernel)

    dt_arr = jnp.reshape(jnp.asarray(dt, dtype=dtype), (1, 1))
    plane = jax.ShapeDtypeStruct((rows, cols), dtype)

    # ---- kernel P -------------------------------------------------------
    pk = functools.partial(pred_fn, params=params,
                           tile_rows=tile_rows, rows=rows, cols=cols)
    # x64 disabled while tracing f32 pallas_calls: see ops/pallas/stencil.py.
    with _x64_scope(dtype):
        pred = pl.pallas_call(
            pk,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
                out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_pred,
                scratch_shapes=[
                    pltpu.VMEM((2, 5, tile_rows + 2 * HALO, cols), dtype),
                    pltpu.VMEM((2, n_pred, tile_rows, cols), dtype),
                    pltpu.SemaphoreType.DMA((2, 5)),
                    pltpu.SemaphoreType.DMA((2, n_pred)),
                ]),
            out_shape=[plane] * n_pred,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(dt_arr, state.z, state.zmax, state.qx, state.qy, static.zb)

    # ---- kernel C -------------------------------------------------------
    ck = functools.partial(corr_fn, params=params,
                           tile_rows=tile_rows, rows=rows, cols=cols,
                           logical_rows=lr, logical_cols=lc,
                           compensated=compensated,
                           speed_window=speed_window,
                           with_origin=with_origin)
    n_in = 6 + n_pred + (1 if compensated else 0)
    n_out = 4 + (1 if compensated else 0)
    n_smem_in = 2 if with_origin else 1
    corr_inputs = [dt_arr]
    if with_origin:
        corr_inputs.append(jnp.asarray(origin, jnp.int32).reshape(1, 2))
    corr_inputs += [state.z, state.zmax, state.qx, state.qy,
                    static.zb, static.manning, *pred]
    if compensated:
        corr_inputs.append(comp)
    with _x64_scope(dtype):
        outs = pl.pallas_call(
            ck,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem_in
                + [pl.BlockSpec(memory_space=pl.ANY)] * n_in,
                out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out
                + [pl.BlockSpec(memory_space=pltpu.SMEM)],
                scratch_shapes=[
                    pltpu.VMEM((2, n_in, tile_rows + 2 * HALO, cols),
                               dtype),
                    pltpu.VMEM((2, n_out, tile_rows, cols), dtype),
                    pltpu.SemaphoreType.DMA((2, n_in)),
                    pltpu.SemaphoreType.DMA((2, n_out)),
                ]),
            out_shape=[plane] * n_out
            + [jax.ShapeDtypeStruct((n_tiles, 1), dtype)],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(*corr_inputs)

    zo, zmaxo, qxo, qyo = outs[:4]
    speeds = outs[-1]
    new = FlowState(z=zo, zmax=zmaxo, qx=qxo, qy=qyo)
    if compensated:
        return new, jnp.max(speeds), outs[4]
    return new, jnp.max(speeds)
