"""Halo-deep stepping over a device mesh ("forecast" sync, TPU-native).

The reference's novel multi-domain mode lets each domain free-run several
iterations between halo exchanges, bounded by the halo depth ("rollback
limit" = overlap - 1; reference: src/Domain/CDomainBase.cpp:163-174,
CSchemeGodunov.cpp:1273-1305, README.md:26-29).  The TPU-native equivalent
implemented here: a ``shard_map`` window that

  1. keeps the state in a persistently halo-EXTENDED local block for the
     whole batch (only the halo strips move per window: ppermutes +
     in-place slice updates, rows then columns so the corner blocks
     transport in two hops),
  2. runs K steps per exchange window — each step invalidates one more
     halo ring, exactly the reference's shrinking halo validity, with NO
     rollback needed because the timestep is the global lock-step
     minimum (a scalar pmax of wave speeds over ICI per step, the
     analogue of MPI_Allreduce(MIN); reference:
     src/MPI/CMPIManager.cpp:837-889),
  3. returns the interior block at batch end.

Compared with per-step GSPMD halo exchange this amortises collective
latency K-fold at the cost of ~2*K*radius*(1/r + 1/c) redundant compute —
the same trade the reference makes with its overlap rows, minus the
unfinished rollback machinery (CModel.cpp:988 "code not yet ready").

Boundaries apply per device on the halo-extended local block with
``origin`` threading the block's global offset, so position-dependent
forcing (gridded georeferencing, cell scatter indices) evaluates in true
global coordinates; halo copies of forced cells receive the same forcing
their owners apply (see ops/boundaries.py module docstring).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C
from ..ops.godunov import SchemeParams
from ..ops.timestep import TimestepParams, advance
from ..state import DomainStatic, FlowState, StepCarry


def halo_pads(window: int, radius: int, backend: str = "xla",
              local_rows=None):
    """(pad_r, pad_c) halo depths for one exchange window.

    +1: the outermost extended ring never updates and skips boundary
    forcing, so it must sit one ring beyond the needed validity depth.
    The Pallas backend rounds the pads up to the DMA alignment contract
    (extended columns stay 128-aligned => pad_c to a multiple of 64) and,
    given the local block's row count, additionally sizes pad_r so the
    extended rows are 64-divisible — otherwise an unlucky prime factor
    (e.g. 2816 + 2*4 = 8*353) forces 8-row tiles and a 353-step Mosaic
    grid that takes minutes to compile and pipelines poorly."""
    need = window * radius + 1
    if backend != "pallas":
        return need, need
    pad_c = -(-need // 64) * 64
    if local_rows is None or local_rows % 8:
        return -(-need // 4) * 4, pad_c
    # Smallest pad_r >= need with (local_rows + 2*pad_r) % 64 == 0
    # (local_rows is 8-aligned, so the target residue is even and the
    # resulting pad_r is a multiple of 4, keeping rows 8-aligned too).
    residue = ((64 - local_rows % 64) // 2) % 32
    pad_r = need + (residue - need) % 32
    return pad_r, pad_c


def build_halo_deep_batch(mesh: Mesh, scheme, params: SchemeParams,
                          ts_params: TimestepParams,
                          boundaries: Sequence, end_time: float,
                          window: int, logical_rows: int, logical_cols: int,
                          compensated: bool = False,
                          backend: str = "xla",
                          interpret: bool = False,
                          muscl_variant=None,
                          local_rows=None):
    """Jitted runner: (state, carry, static, sync_time, comp, n_windows) ->
    (state, carry, comp), executing ``window`` steps per halo exchange.
    ``comp`` is the compensated-f32 z residue plane (or None); it is halo-
    exchanged and stepped alongside the state (see ops/compensated.py).

    ``backend="pallas"`` runs the fused VMEM kernels on each device's
    halo-extended local block instead of the XLA step — the reference's
    link+scheme integration (src/Schemes/CSchemeGodunov.cpp:1235-1334)
    re-expressed as shard_map(ppermute halos -> fused kernel window); the
    kernels' own CFL partial max is restricted to owned cells so the
    lock-step dt is bit-identical to the single-device run."""
    py, px = mesh.devices.shape
    radius = 2 if scheme.name == "muscl-hancock" else 1
    pad_r, pad_c = halo_pads(window, radius, backend, local_rows)
    step_fn = scheme.step
    simplified = ts_params.simplified_speed
    use_pallas = backend == "pallas"
    if use_pallas:
        from ..ops.pallas.muscl_split import muscl_step_pallas_split
        from ..ops.pallas.stencil import stencil_step_pallas

    grid_spec = P("my", "mx")

    def _refresh_halos(ext):
        """Refresh the halo frame of a persistently-extended array from
        the neighbours' interiors: strip ppermutes + in-place slice
        updates (rows full-width first, then columns full-height, which
        transports the corners in two hops)."""
        er, ec = ext.shape
        r, c = er - 2 * pad_r, ec - 2 * pad_c
        dus = jax.lax.dynamic_update_slice
        if py > 1:
            up = [(i, i + 1) for i in range(py - 1)]
            down = [(i, i - 1) for i in range(1, py)]
            from_below = jax.lax.ppermute(
                jax.lax.dynamic_slice(ext, (r, 0), (pad_r, ec)),
                "my", up)
            from_above = jax.lax.ppermute(
                jax.lax.dynamic_slice(ext, (pad_r, 0), (pad_r, ec)),
                "my", down)
            ext = dus(ext, from_below, (0, 0))
            ext = dus(ext, from_above, (r + pad_r, 0))
        if px > 1:
            left = [(i, i + 1) for i in range(px - 1)]
            right = [(i, i - 1) for i in range(1, px)]
            from_left = jax.lax.ppermute(
                jax.lax.dynamic_slice(ext, (0, c), (er, pad_c)),
                "mx", left)
            from_right = jax.lax.ppermute(
                jax.lax.dynamic_slice(ext, (0, pad_c), (er, pad_c)),
                "mx", right)
            ext = dus(ext, from_left, (0, 0))
            ext = dus(ext, from_right, (0, c + pad_c))
        return ext

    def make_local_batch(n_windows: int):
        def local_batch(state, carry, static, sync_time, comp):
            z, zmax, qx, qy = state
            zb, n = static

            # Global offsets of this device's block.
            r, c = z.shape
            assert pad_r <= r and pad_c <= c, (
                f"halo pads ({pad_r}, {pad_c}) exceed the local block "
                f"({r}x{c}); shrink forecast_window or the mesh")
            oy = jax.lax.axis_index("my") * r
            ox = jax.lax.axis_index("mx") * c

            # One-time extension into a zero frame; the static fields'
            # halos are filled once (they never change), the state's are
            # refreshed in place at the top of every window.
            def ext0(a):
                frame = jnp.zeros((r + 2 * pad_r, c + 2 * pad_c), a.dtype)
                return jax.lax.dynamic_update_slice(frame, a,
                                                    (pad_r, pad_c))

            ez, ezmax, eqx, eqy = (ext0(a) for a in (z, zmax, qx, qy))
            ezb, en = _refresh_halos(ext0(zb)), _refresh_halos(ext0(n))
            ecomp = ext0(comp) if compensated else None

            # Static-ring + out-of-domain mask on the extended block
            # (global index space; zero-filled out-of-mesh halos land
            # outside too).
            er, ec = ez.shape
            gy = jax.lax.broadcasted_iota(jnp.int32, (er, ec), 0) \
                + (oy - pad_r)
            gx = jax.lax.broadcasted_iota(jnp.int32, (er, ec), 1) \
                + (ox - pad_c)
            ring = ((gy < radius) | (gy >= logical_rows - radius)
                    | (gx < radius) | (gx >= logical_cols - radius))

            estatic = DomainStatic(ezb, en)
            speed_window = (pad_r, r, pad_c, c)
            # Global index of the extended block's first row/col: the
            # kernels evaluate the logical ring mask in-kernel with it,
            # removing the full-block masking passes the XLA path needs.
            origin = jnp.stack([oy - pad_r, ox - pad_c]).astype(
                jnp.int32).reshape(1, 2)

            def step_body(sc, _):
                st, cr, cm = sc
                # Boundaries on the extended block (halo copies get the
                # same forcing their owners apply); position-dependent
                # forcing evaluates in global coordinates via the block
                # origin, and the mask (~ring: inside the logical grid,
                # off the static ghost ring) bounds the forced cells to
                # exactly the set every other execution path forces.
                bdy_origin = (oy - pad_r, ox - pad_c)
                allowed = ~ring
                for b in boundaries:
                    if compensated:
                        st, cm = b.apply(st, estatic, cr.t, cr.dt,
                                         cr.t_hydro, params, comp=cm,
                                         origin=bdy_origin, mask=allowed)
                    else:
                        st = b.apply(st, estatic, cr.t, cr.dt, cr.t_hydro,
                                     params, origin=bdy_origin,
                                     mask=allowed)

                if use_pallas:
                    # Fused kernel on the extended block.  With ``origin``
                    # its internal ring mask runs in TRUE global
                    # coordinates (freezing the domain's static ring and
                    # every out-of-domain halo cell in-kernel), and its
                    # fused CFL partial is masked to owned cells — no
                    # full-block masking passes outside the kernel.
                    if scheme.name == "muscl-hancock":
                        out = muscl_step_pallas_split.__wrapped__(
                            st, estatic, cr.dt, params, None, interpret,
                            logical_rows, logical_cols, muscl_variant,
                            cm, speed_window, origin)
                    else:
                        out = stencil_step_pallas.__wrapped__(
                            scheme.name, st, estatic, cr.dt, params,
                            simplified, None, interpret, logical_rows,
                            logical_cols, cm, speed_window, origin)
                    if compensated:
                        new, local_max, cm_new = out
                    else:
                        new, local_max = out
                        cm_new = None
                else:
                    if compensated:
                        new, cm_new = step_fn(st, estatic, cr.dt, params,
                                              comp=cm)
                        cm_new = jnp.where(ring, cm, cm_new)
                    else:
                        new = step_fn(st, estatic, cr.dt, params)
                        cm_new = None
                    new = FlowState(*(jnp.where(ring, o, v)
                                      for o, v in zip(st, new)))
                    # Global lock-step dt: max speed over owned cells.
                    h = new.z - ezb
                    wet = (h > params.quite_small) & (new.zmax > C.NODATA)
                    hs = jnp.where(wet, h, 1.0)
                    cel = jnp.sqrt(C.GRAVITY * jnp.maximum(h, 0.0))
                    if simplified:
                        spd = cel
                    else:
                        spd = jnp.maximum(jnp.abs(new.qx),
                                          jnp.abs(new.qy)) / hs + cel
                    # Only this device's owned cells count (each once).
                    own = ((gy >= oy) & (gy < oy + r)
                           & (gx >= ox) & (gx < ox + c))
                    spd = jnp.where(wet & own, spd, 0.0)
                    local_max = jnp.max(spd)

                # Max across the mesh (the Allreduce(MIN) analogue).
                gmax = jax.lax.pmax(jax.lax.pmax(local_max, "my"), "mx")
                cr = advance(cr, gmax, sync_time, end_time, params.dx,
                             ts_params)
                return (new, cr, cm_new), None

            def window_body(wc, _):
                est, cr, cm = wc
                est = FlowState(*(_refresh_halos(a) for a in est))
                if compensated:
                    cm = _refresh_halos(cm)
                (est, cr, cm), _ = jax.lax.scan(step_body, (est, cr, cm),
                                                length=window)
                return (est, cr, cm), None

            est = FlowState(ez, ezmax, eqx, eqy)
            (est, carry, ecomp), _ = jax.lax.scan(
                window_body, (est, carry, ecomp), length=n_windows)

            interior = (slice(pad_r, pad_r + r), slice(pad_c, pad_c + c))
            out_comp = ecomp[interior] if compensated else comp
            return tuple(a[interior] for a in est), carry, out_comp

        return local_batch

    try:
        shard_map = jax.shard_map
    except AttributeError:                      # older jax
        from jax.experimental.shard_map import shard_map

    comp_spec = grid_spec if compensated else P()
    sm_kwargs = dict(
        mesh=mesh,
        in_specs=((grid_spec,) * 4, P(), (grid_spec, grid_spec), P(),
                  comp_spec),
        out_specs=((grid_spec,) * 4, P(), comp_spec),
    )

    def _shard(fn):
        try:
            # pallas_call outputs carry no varying-across-mesh metadata,
            # which newer jax's shard_map checker rejects.
            return shard_map(fn, check_vma=False, **sm_kwargs)
        except TypeError:                       # older jax: no check_vma
            return shard_map(fn, **sm_kwargs)

    @partial(jax.jit, static_argnames=("n_steps",),
             donate_argnames=("state", "carry", "comp"))
    def run_batch(state: FlowState, carry: StepCarry, static: DomainStatic,
                  sync_time, comp, n_steps: int):
        # n_steps counts exchange windows here (window steps each).  The
        # whole batch runs inside ONE shard_map: the state stays in its
        # halo-extended form across windows (only the halo strips move
        # per window) and the window/step loops are scans, so the
        # compiled graph is one-step sized regardless of the batch.
        st, carry, comp = _shard(make_local_batch(n_steps))(
            tuple(state), carry, tuple(static), sync_time, comp)
        # NaN/Inf probe, as in Simulation._build_run_batch: divergence
        # poisons the batch statistic the host reads back.
        poison = 0.0 * jnp.sum(st[0])
        carry = carry._replace(batch_dt_total=carry.batch_dt_total + poison)
        return FlowState(*st), carry, comp

    return run_batch
