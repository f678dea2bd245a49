"""Fused shallow-water steps as Pallas TPU kernels (all three schemes).

The XLA backend materialises every interface-flux array in HBM (~20-40
array round-trips per step), which makes the step bandwidth-bound.  These
kernels fuse the whole step: for each row tile the six input fields are
DMA'd (with halo) HBM->VMEM once, the full update (reconstruction + fluxes
+ sources + friction for Godunov/MUSCL; inertial discharges for the
simplified scheme) plus the per-tile CFL partial max run entirely in VMEM,
and the four updated fields are written back — ~40 B/cell of HBM traffic.
This plays the role the reference's LDS cache configs attempted
(src/Schemes/CLSchemeGodunov.clc:389-643, CLSchemeMUSCLHancock.clc:809-1118
mch_cacheMaximum), profitable here because the VMEM tile is large and the
reduction rides along for free.

Alignment contract (TPU DMA slices must be (8,128)-tile aligned):
  * rows % tile_rows == 0, tile_rows % 8 == 0, cols % 128 == 0,
    at least two tiles (Domain.pad_for_tiles arranges this; smaller grids
    fall back to the XLA backend);
  * each tile OUTPUTS rows [t*TR, (t+1)*TR) and LOADS the aligned halo
    window [t*TR-8, (t+1)*TR+8) (clamped at the array ends, with the
    placement offset fixed per first/middle/last case so all slices stay
    static and aligned);
  * the LOGICAL grid's static ring (1 cell for Godunov/inertial, 2 for
    MUSCL-Hancock, matching the reference's kernel bounds) is preserved
    via index masks, so padded grids behave identically.

Numerics are shared with the XLA backend (the *_interior functions), so the
backends agree bit-for-bit up to compiler fusion differences.
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
from ..godunov import SchemeParams, godunov_interior
from ..inertial import inertial_interior
from ..muscl import muscl_interior

N_IN = 6   # z, zmax, qx, qy, zb, n
N_OUT = 4  # z, zmax, qx, qy
HALO = 8   # aligned halo rows each side (stencils need <= 2)

# scheme -> (interior update fn, stencil radius / static ring width,
#            VMEM temporaries per cell estimate in floats)
INTERIOR = {
    "godunov": (godunov_interior, 1, 40),
    "muscl-hancock": (muscl_interior, 2, 100),
    "inertial": (inertial_interior, 1, 24),
}


# Mosaic's default VMEM ceiling is 16 MiB; the physical VMEM on current
# chips (e.g. v5e: 128 MiB) is far larger, so we raise the compiler limit
# and size tiles against a working budget.  Both are env-tunable for
# experiments.
VMEM_LIMIT = int(os.environ.get("HIPIMS_PALLAS_VMEM_LIMIT", 96 * 2**20))
VMEM_BUDGET = int(os.environ.get("HIPIMS_PALLAS_VMEM", 40 * 2**20))


def pick_tile_rows(rows: int, cols: int, temp_floats: int = 40,
                   vmem_budget=None) -> int:
    """Largest multiple-of-8 divisor of ``rows`` within the VMEM budget."""
    override = os.environ.get("HIPIMS_PALLAS_TILE_ROWS")
    if override:
        return int(override)
    if vmem_budget is None:
        vmem_budget = VMEM_BUDGET
    per_row = cols * 4 * temp_floats
    cap = max(8, min(vmem_budget // per_row, rows // 2))
    best = 0
    for cand in range(8, rows + 1, 8):
        if rows % cand == 0 and cand <= cap:
            best = cand
    return best


# ---------------------------------------------------------------------------
# Double-buffered tile DMA (shared with muscl_split.py).
#
# Grid iterations run sequentially on a TensorCore and scratch/semaphores
# persist across them, so tile t's kernel body prefetches tile t+1's halo
# window into the other scratch slot and drains tile t's store lazily —
# input DMA, compute, and output DMA all overlap.  Start/wait descriptor
# pairs must match, hence the mirrored three-case structure (the halo
# window is clamped at the array ends to keep every slice 8-row aligned).
# ---------------------------------------------------------------------------

def _i32(v):
    # Literal plane indices must stay 32-bit: under an x64-enabled host
    # they otherwise lower as i64 scalars, which Mosaic's memref_slice
    # rejects ("operand #1 must be ... 32-bit signless integer").
    return jnp.asarray(v, jnp.int32)


def _x64_scope(dtype):
    """x64-disabled tracing scope for f32 kernels (no-op for f64)."""
    import contextlib
    if dtype == jnp.float32:
        return jax.enable_x64(False)
    return contextlib.nullcontext()


def _halo_copy(ins, scr, sem, ti, slot, case, tr, rows, k):
    ik = _i32(k)
    slot = _i32(slot)
    if case == "first":
        return pltpu.make_async_copy(
            ins[k].at[pl.ds(0, tr + HALO)],
            scr.at[slot, ik, pl.ds(HALO, tr + HALO)], sem.at[slot, ik])
    if case == "last":
        return pltpu.make_async_copy(
            ins[k].at[pl.ds(rows - tr - HALO, tr + HALO)],
            scr.at[slot, ik, pl.ds(0, tr + HALO)], sem.at[slot, ik])
    start = pl.multiple_of(_i32(ti * tr - HALO), 8)
    return pltpu.make_async_copy(
        ins[k].at[pl.ds(start, tr + 2 * HALO)],
        scr.at[slot, ik], sem.at[slot, ik])


def _halo_load(ins, scr, sem, ti, slot, n_tiles, tr, rows, op):
    n_in = len(ins)
    is_first = ti == 0
    is_last = ti == n_tiles - 1
    not_first = jnp.logical_not(is_first)

    def run(case):
        for k in range(n_in):
            dma = _halo_copy(ins, scr, sem, ti, slot, case, tr, rows, k)
            dma.start() if op == "start" else dma.wait()

    @pl.when(is_first)
    def _():
        run("first")

    @pl.when(not_first & is_last)
    def _():
        run("last")

    @pl.when(not_first & jnp.logical_not(is_last))
    def _():
        run("mid")


def start_halo_load(ins, scr, sem, ti, slot, n_tiles, tr, rows):
    _halo_load(ins, scr, sem, ti, slot, n_tiles, tr, rows, "start")


def wait_halo_load(ins, scr, sem, ti, slot, n_tiles, tr, rows):
    _halo_load(ins, scr, sem, ti, slot, n_tiles, tr, rows, "wait")


def start_tile_store(outs, out_scr, sem, ti, slot, tr):
    slot = _i32(slot)
    start = pl.multiple_of(_i32(ti * tr), 8)
    for k in range(len(outs)):
        ik = _i32(k)
        pltpu.make_async_copy(out_scr.at[slot, ik],
                              outs[k].at[pl.ds(start, tr)],
                              sem.at[slot, ik]).start()


def wait_tile_store(outs, out_scr, sem, slot, tr):
    # The wait only consumes the semaphore byte count; every store moves
    # the same (tr, cols) block, so a fixed-offset descriptor matches.
    slot = _i32(slot)
    for k in range(len(outs)):
        ik = _i32(k)
        pltpu.make_async_copy(out_scr.at[slot, ik],
                              outs[k].at[pl.ds(0, tr)],
                              sem.at[slot, ik]).wait()


def pipeline_prologue(ins, outs, scr, out_scr, sem_in, sem_out, t,
                      n_tiles, tr, rows):
    """Per-grid-step entry of the double-buffered pipeline: prefetch tile
    t+1's halo window, wait for tile t's inputs, drain tile t-2's store.
    Returns (slot, nslot)."""
    two = jnp.asarray(2, t.dtype)
    slot = jax.lax.rem(t, two)
    nslot = jax.lax.rem(t + 1, two)

    @pl.when(t == 0)
    def _():
        start_halo_load(ins, scr, sem_in, 0, 0, n_tiles, tr, rows)

    @pl.when(t + 1 < n_tiles)
    def _():
        start_halo_load(ins, scr, sem_in, t + 1, nslot, n_tiles, tr, rows)

    wait_halo_load(ins, scr, sem_in, t, slot, n_tiles, tr, rows)

    @pl.when(t >= 2)
    def _():
        wait_tile_store(outs, out_scr, sem_out, slot, tr)

    return slot, nslot


def pipeline_epilogue(outs, out_scr, sem_out, t, n_tiles, tr, slot, nslot):
    """Start tile t's store; at the final tile drain both slots."""
    start_tile_store(outs, out_scr, sem_out, t, slot, tr)

    @pl.when(t == n_tiles - 1)
    def _():
        wait_tile_store(outs, out_scr, sem_out, nslot, tr)
        wait_tile_store(outs, out_scr, sem_out, slot, tr)


def supports(rows: int, cols: int, tile_rows=None,
             scheme: str = "godunov") -> bool:
    if rows % 8 or cols % 128:
        return False
    temp = INTERIOR[scheme][2]
    tr = tile_rows or pick_tile_rows(rows, cols, temp)
    return tr >= 8 and rows % tr == 0 and rows // tr >= 2


def _kernel(dt_ref, *refs, scheme: str, params: SchemeParams,
            tile_rows: int, rows: int, cols: int, logical_rows: int,
            logical_cols: int, simplified_speed: bool,
            compensated: bool = False, speed_window=None,
            with_origin: bool = False):
    interior_fn, radius, _ = INTERIOR[scheme]
    if with_origin:
        # Mesh mode: (1, 2) SMEM scalar holding the global index of this
        # device's extended block's first row/col, so the logical ring
        # mask is evaluated in TRUE global coordinates in-kernel (no
        # masking pass over the full block outside).
        origin_ref, *refs = refs
        oy0, ox0 = origin_ref[0, 0], origin_ref[0, 1]
    else:
        oy0 = ox0 = 0
    n_in = N_IN + (1 if compensated else 0)   # + comp plane
    n_out = N_OUT + (1 if compensated else 0)
    ins = refs[:n_in]
    outs = refs[n_in:n_in + n_out]
    speed_ref = refs[n_in + n_out]
    scr = refs[n_in + n_out + 1]       # (2, n_in, TR+2*HALO, C)
    out_scr = refs[n_in + n_out + 2]   # (2, n_out, TR, C)
    sem_in = refs[n_in + n_out + 3]
    sem_out = refs[n_in + n_out + 4]

    # i32 pin: under an x64-enabled host program_id is i64 and
    # Mosaic's memref_slice rejects i64 indices.
    t = _i32(pl.program_id(0))
    n_tiles = _i32(pl.num_programs(0))
    tr = tile_rows
    # Double-buffered pipeline: prefetch tile t+1 while computing t.
    # scr row HALO+j of a slot holds global row ti*TR+j; the out-of-range
    # halo rows of the first/last tiles hold stale data that only feeds
    # the masked-out ring rows.
    slot, nslot = pipeline_prologue(ins, outs, scr, out_scr, sem_in,
                                    sem_out, t, n_tiles, tr, rows)

    # Compute window: interior of [HALO-radius, HALO+TR+radius) == output
    # rows.
    w0, w1 = HALO - radius, HALO + tr + radius
    z, zmax, qx, qy, zb, n = (scr[slot, _i32(k), w0:w1, :]
                              for k in range(N_IN))
    comp = scr[slot, _i32(N_IN), w0:w1, :] if compensated else None
    dt = dt_ref[0, 0]

    out = interior_fn(z, zmax, qx, qy, zb, n, dt, params, comp=comp) \
        if compensated else interior_fn(z, zmax, qx, qy, zb, n, dt, params)
    zi, zmaxi, qxi, qyi = out[:4]

    # The LOGICAL grid's static ring stays untouched (padding cells beyond
    # it are disabled and already keep their state): mask by global index.
    gids = jax.lax.broadcasted_iota(jnp.int32, zi.shape, 0) + t * tr + oy0
    cids = (jax.lax.broadcasted_iota(jnp.int32, zi.shape, 1) + radius
            + ox0)
    ring = ((gids < radius) | (gids >= logical_rows - radius)
            | (cids < radius) | (cids >= logical_cols - radius))
    rs = slice(radius, -radius)
    old = (z[rs, rs], zmax[rs, rs], qx[rs, rs], qy[rs, rs])
    zi, zmaxi, qxi, qyi = (jnp.where(ring, o, v) for o, v in
                           zip(old, (zi, zmaxi, qxi, qyi)))

    # Reassemble full-width rows (static edge columns keep old values);
    # concatenate is Mosaic-supported, scatter/dynamic_update_slice not.
    def full_width(old2d, interior):
        return jnp.concatenate(
            [old2d[rs, :radius], interior, old2d[rs, -radius:]], axis=1)

    zf = full_width(z, zi)
    zmaxf = full_width(zmax, zmaxi)
    qxf = full_width(qx, qxi)
    qyf = full_width(qy, qyi)
    out_scr[slot, _i32(0)] = zf
    out_scr[slot, _i32(1)] = zmaxf
    out_scr[slot, _i32(2)] = qxf
    out_scr[slot, _i32(3)] = qyf
    if compensated:
        compi = jnp.where(ring, comp[rs, rs], out[4])
        out_scr[slot, _i32(4)] = full_width(comp, compi)

    # ---- fused CFL partial max over the updated rows ---------------------
    # Covers every global row across the tile set, like the reference's
    # full-grid reduction (src/Schemes/CLDynamicTimestep.clc:185-223).
    h = zf - zb[rs, :]
    wet = (h > params.quite_small) & (zmaxf > C.NODATA)
    h_safe = jnp.where(wet, h, 1.0)
    cel = jnp.sqrt(C.GRAVITY * jnp.maximum(h, 0.0))
    if simplified_speed:
        spd = cel
    else:
        spd = jnp.maximum(jnp.abs(qxf), jnp.abs(qyf)) / h_safe + cel
    spd = jnp.where(wet, spd, 0.0)
    if speed_window is not None:
        # Under a mesh the local block is halo-extended; only this
        # device's OWN cells may contribute to the global CFL max, so the
        # sharded dt matches the single-device run exactly (the XLA
        # halo-deep path masks identically; parallel/halo_deep.py).
        r0, nr, c0, nc = speed_window
        srows = jax.lax.broadcasted_iota(jnp.int32, spd.shape, 0) + t * tr
        scols = jax.lax.broadcasted_iota(jnp.int32, spd.shape, 1)
        own = ((srows >= r0) & (srows < r0 + nr)
               & (scols >= c0) & (scols < c0 + nc))
        spd = jnp.where(own, spd, 0.0)
    speed_ref[t, 0] = jnp.max(spd)

    # ---- write back (async; drained two tiles later / at the end) --------
    pipeline_epilogue(outs, out_scr, sem_out, t, n_tiles, tr, slot, nslot)


@functools.partial(jax.jit, static_argnames=(
    "scheme", "params", "simplified_speed", "tile_rows", "interpret",
    "logical_rows", "logical_cols", "speed_window"))
def stencil_step_pallas(scheme: str, state: FlowState, static: DomainStatic,
                        dt, params: SchemeParams,
                        simplified_speed: bool = False,
                        tile_rows=None,
                        interpret: bool = False,
                        logical_rows=None,
                        logical_cols=None,
                        comp=None,
                        speed_window=None,
                        origin=None):
    """Fused step + CFL reduce for any scheme.  Returns
    (new_state, max_wave_speed), or (new_state, max_wave_speed, comp_new)
    when ``comp`` (the compensated-f32 z residue plane) is given — the
    residue rides the same DMA pipeline as a 7th input / 5th output
    plane.  ``origin`` (mesh mode): (1, 2) int32 global index of this
    block's first row/col, moving the logical-ring masking in-kernel."""
    rows, cols = state.z.shape
    temp = INTERIOR[scheme][2]
    compensated = comp is not None
    with_origin = origin is not None
    if tile_rows is None:
        tile_rows = pick_tile_rows(rows, cols, temp)
    if not supports(rows, cols, tile_rows, scheme):
        raise ValueError(
            f"grid {rows}x{cols} with tile_rows={tile_rows} violates the "
            "Pallas alignment contract (see Domain.pad_for_tiles)")
    n_tiles = rows // tile_rows
    dtype = state.z.dtype
    n_in = N_IN + (1 if compensated else 0)
    n_out = N_OUT + (1 if compensated else 0)

    kernel = functools.partial(
        _kernel, scheme=scheme, params=params, tile_rows=tile_rows,
        rows=rows, cols=cols,
        logical_rows=logical_rows or rows, logical_cols=logical_cols or cols,
        simplified_speed=simplified_speed, compensated=compensated,
        speed_window=speed_window, with_origin=with_origin)

    dt_arr = jnp.reshape(jnp.asarray(dt, dtype=dtype), (1, 1))

    n_smem_in = 2 if with_origin else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem_in
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, n_in, tile_rows + 2 * HALO, cols), dtype),
            pltpu.VMEM((2, n_out, tile_rows, cols), dtype),
            pltpu.SemaphoreType.DMA((2, n_in)),
            pltpu.SemaphoreType.DMA((2, n_out)),
        ],
    )

    out_shapes = (
        [jax.ShapeDtypeStruct((rows, cols), dtype) for _ in range(n_out)]
        + [jax.ShapeDtypeStruct((n_tiles, 1), dtype)]
    )

    inputs = [dt_arr]
    if with_origin:
        inputs.append(jnp.asarray(origin, jnp.int32).reshape(1, 2))
    inputs += [state.z, state.zmax, state.qx, state.qy,
               static.zb, static.manning]
    if compensated:
        inputs.append(comp)

    # Trace f32 kernels with x64 disabled: under an x64-enabled host the
    # auto-generated block index maps return i64, which Mosaic rejects
    # at func.return.  (f64 runs — CPU interpret mode only — keep x64 so
    # in-kernel literals match the f64 refs.)
    with _x64_scope(dtype):
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
            interpret=interpret,
        )(*inputs)

    zo, zmaxo, qxo, qyo = outs[:4]
    speeds = outs[-1]
    new = FlowState(z=zo, zmax=zmaxo, qx=qxo, qy=qyo)
    if compensated:
        return new, jnp.max(speeds), outs[4]
    return new, jnp.max(speeds)


def godunov_step_pallas(state, static, dt, params, simplified_speed=False,
                        tile_rows=None, interpret=False, logical_rows=None,
                        logical_cols=None):
    """Back-compat alias for the first-order kernel."""
    return stencil_step_pallas("godunov", state, static, dt, params,
                               simplified_speed, tile_rows, interpret,
                               logical_rows, logical_cols)


# Unjitted callable for use inside enclosing jitted scans.
godunov_step_pallas.__wrapped__ = functools.partial(
    stencil_step_pallas.__wrapped__, "godunov")
