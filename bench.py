"""Headline benchmark: MUSCL-Hancock cell-update rate on one chip.

Mirrors the reference's Malpasset configuration scale (~1.8-2M cells,
MUSCL-Hancock, dynamic CFL timestep, friction on) and reports cell-updates
per second against the reference's best single-GPU 32-bit rate of
556 M cells/s (NVIDIA Tesla M2075, BASELINE.md).

Prints exactly one JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

With --full (or BENCH_FULL=1) it additionally sweeps all three schemes,
both precisions and both MUSCL Pallas variants, appends every result to
stderr and writes the table to BENCH_DETAIL.json (the numbers behind
docs/ROOFLINE.md).

Environment knobs (defaults in parentheses):
  BENCH_ROWS/BENCH_COLS (1408)  grid; 2816 is the amortised regime but
                                costs a ~13-min Mosaic compile on the
                                TPU relay (see BENCH_2816.json)
  BENCH_STEPS (200), BENCH_REPS (3), BENCH_STEPS_F64 (20)
  BENCH_SCHEME (muscl-hancock), BENCH_DTYPE (float32),
  BENCH_BACKEND (auto), BENCH_VARIANT (measured default)
  BENCH_MESH (unset)            run on an N-device mesh (1 = the
                                halo-deep machinery on one chip)
  BENCH_SYNC (timestep)         mesh sync discipline; "forecast" enables
                                halo-deep windows with the amortised
                                (one-collective-per-window) dt
  BENCH_WINDOW (8)              steps per forecast exchange window
  BENCH_SKIP_EXTRA=1            headline only (no f32c/f64/mesh extras)
  BENCH_EXTRA_DEADLINE (420 s)  wall budget before extras are skipped
"""

import json
import os
import sys
import time

# Persistent compilation cache: the fused kernels take minutes to build
# on the TPU relay; cached executables make repeat benchmark runs (and
# the driver's end-of-round run) start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

# Reference rates from BASELINE.md (Malpasset, config A — the fastest —
# on the best GPU, NVIDIA Tesla M2075).
BASELINE_F32 = 556e6   # 32-bit MUSCL-Hancock
BASELINE_F64 = 159e6   # 64-bit MUSCL-Hancock


def build_domain(rows, cols):
    """Fully wet radial dam break over a gently undulating bed: no
    dry-cell shortcuts, friction active everywhere — worst-case honest
    rate."""
    import numpy as np

    from hipims_tpu.domain import Domain

    yy, xx = np.mgrid[0:rows, 0:cols]
    zb = 0.2 * np.sin(xx / 50.0) * np.cos(yy / 50.0)
    dom = Domain(zb=zb, manning=0.03, dx=10.0, dy=10.0)
    r = np.hypot((yy - rows / 2) * 10.0, (xx - cols / 2) * 10.0)
    dom.set_initial_depth(np.where(r <= rows * 10.0 / 6.0, 8.0, 2.0))
    return dom


def run_case(scheme, dtype, backend, variant, rows, cols, steps, reps,
             mesh_n=None, sync=None, window=None):
    """Return (rate_cells_per_s, elapsed, sim, carry) for one config."""
    import jax.numpy as jnp

    from hipims_tpu.runtime import Simulation, SimulationConfig

    mesh = None
    if mesh_n is None and os.environ.get("BENCH_MESH"):
        mesh_n = int(os.environ["BENCH_MESH"])
    if mesh_n:
        # N-device mesh (halo-deep shard_map path; 1 validates that the
        # fused kernels keep their rate under the mesh machinery).
        from hipims_tpu.parallel import make_mesh
        mesh = make_mesh(mesh_n)

    # Forecast-window sweep knobs (BENCH_SYNC=forecast BENCH_WINDOW=K):
    # under a mesh, K steps share one halo exchange AND one CFL
    # collective (parallel/halo_deep.py dt_mode="window").
    sync = sync or os.environ.get("BENCH_SYNC", "timestep")
    window = window if window is not None else int(
        os.environ.get("BENCH_WINDOW", 8))
    cfg = SimulationConfig(scheme=scheme, duration=1e9,
                           output_frequency=1e9, dtype=dtype,
                           batch_size=steps, batch_auto=False,
                           kernel_backend=backend, muscl_variant=variant,
                           sync_method=sync, forecast_window=window)
    sim = Simulation(build_domain(rows, cols), cfg, mesh=mesh)
    sync_t = jnp.asarray(1e9, dtype=sim.dtype)
    # ``steps`` counts PHYSICAL steps; the halo-deep forecast path scans
    # windows, so convert (and report the true cell-update rate).
    units = max(1, steps // sim._steps_per_unit)
    physical = units * sim._steps_per_unit

    # Warm-up (compile + first batch).  The scalar read-back is the sync
    # point: block_until_ready alone does not block through the remote
    # relay used in this environment.
    state, carry, comp = sim._run_batch(sim.state, sim.carry, sim.static,
                                        sync_t, sim.comp, n_steps=units)
    _ = float(carry.t)

    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        state, carry, comp = sim._run_batch(state, carry, sim.static,
                                            sync_t, comp, n_steps=units)
        _ = float(carry.t)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    return rows * cols * physical / elapsed, elapsed, sim, carry


_T0 = time.monotonic()


def main():
    import jax

    # Default 1408^2 compiles in ~40 s on the TPU relay; 2816^2 (7.9 M
    # cells, the amortised regime — docs/ROOFLINE.md) gains ~6% on MUSCL
    # and ~40% on Godunov but takes ~13 min of Mosaic compile, so use
    # BENCH_ROWS/BENCH_COLS=2816 for the headline-chasing runs.
    rows = int(os.environ.get("BENCH_ROWS", 1408))
    cols = int(os.environ.get("BENCH_COLS", 1408))
    steps = int(os.environ.get("BENCH_STEPS", 200))
    scheme = os.environ.get("BENCH_SCHEME", "muscl-hancock")
    # The split Pallas MUSCL kernels compile in ~30 s on the TPU relay and
    # run ~1.4x the XLA path, so "auto" resolves to Pallas on a TPU chip.
    backend = os.environ.get("BENCH_BACKEND", "auto")
    variant = os.environ.get("BENCH_VARIANT") or None
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    reps = int(os.environ.get("BENCH_REPS", 3))
    full = "--full" in sys.argv or os.environ.get("BENCH_FULL") == "1"
    device = jax.devices()[0].platform

    suffixes = {"float64": "f64", "float32": "f32", "float32c": "f32c"}
    baselines = {"float64": BASELINE_F64, "float32": BASELINE_F32,
                 "float32c": BASELINE_F64}   # f32c is the f64-accuracy mode

    rate, elapsed, sim, carry = run_case(scheme, dtype, backend, variant,
                                         rows, cols, steps, reps)
    out = {
        "metric": f"{scheme.replace('-', '_')}_cell_updates_per_s_"
                  f"{suffixes[dtype]}",
        "value": round(rate, 1),
        "unit": "cells/s",
        "vs_baseline": round(rate / baselines[dtype], 4),
    }
    # Land the headline immediately: on a slow relay the extra cases can
    # take minutes each, and an external timeout must not cost the
    # primary result.  If the extras complete, the enriched line follows
    # (first- and last-line parsers both see a valid record).
    print(json.dumps(out), flush=True)

    # The precision story in the same line: the compensated-f32 mode (the
    # f64-accuracy-class answer, tests/test_compensated.py) and emulated
    # XLA f64, both against the reference's 159 M cells/s f64 GPU rate.
    # Deadline guard: when the TPU relay is slow the headline compile
    # alone can take many minutes — skip the extra cases rather than risk
    # the whole run being cut off with nothing printed.
    extra = {}
    deadline = float(os.environ.get("BENCH_EXTRA_DEADLINE", 420.0))
    if time.monotonic() - _T0 > deadline:
        print(f"# extras skipped: headline took "
              f"{time.monotonic() - _T0:.0f}s (> {deadline:.0f}s deadline)",
              file=sys.stderr)
    elif os.environ.get("BENCH_SKIP_EXTRA") != "1":
        for dt_, st in (("float32c", steps),
                        ("float64", int(os.environ.get("BENCH_STEPS_F64",
                                                       20)))):
            if dt_ == dtype:
                continue
            if time.monotonic() - _T0 > deadline:
                # Re-checked between extras: each costs a fresh compile
                # on the relay, and an external timeout must not cut the
                # run before the enriched line lands.
                print(f"# extra {dt_} skipped: deadline", file=sys.stderr)
                continue
            try:
                r, _, sm, _ = run_case(scheme, dt_, "auto" if dt_ != "float64"
                                       else "xla", variant, rows, cols, st,
                                       max(1, reps - 1))
            except Exception as e:  # noqa: BLE001
                print(f"# extra {dt_} failed: {e}", file=sys.stderr)
                continue
            extra[f"{suffixes[dt_]}_cells_per_s"] = round(r, 1)
            extra[f"{suffixes[dt_]}_vs_f64_baseline"] = round(
                r / BASELINE_F64, 4)
        # Mesh-mode rate on the same grid (1-device mesh: the full
        # halo-deep shard_map machinery — persistent extended blocks,
        # ppermute strips, windowed scan — so BENCH_rN.json itself
        # evidences the multi-chip-path perf parity claim).
        if time.monotonic() - _T0 <= deadline:
            try:
                # >=2 timed reps: a single rep can absorb a stray relay
                # stall/recompile and misreport the mesh overhead by 50x
                # (observed once); min-of-2 discards it.
                r, _, sm, _ = run_case(scheme, dtype, backend, variant,
                                       rows, cols, steps,
                                       max(2, reps - 1), mesh_n=1)
                extra["mesh1_cells_per_s"] = round(r, 1)
                extra["mesh1_frac_of_fused"] = round(r / rate, 4)
                extra["mesh1_backend"] = sm.backend
            except Exception as e:  # noqa: BLE001
                print(f"# mesh extra failed: {e}", file=sys.stderr)
        else:
            print("# mesh extra skipped: deadline", file=sys.stderr)
    if extra:
        out["extra"] = extra
        print(json.dumps(out), flush=True)
    print(f"# grid={rows}x{cols} steps={steps} elapsed={elapsed:.3f}s "
          f"t_sim={float(carry.t):.3f}s dt={float(carry.dt):.4f}s "
          f"device={device} backend={sim.backend}", file=sys.stderr)

    if not full:
        return

    # ---- full sweep (written to BENCH_DETAIL.json, not stdout) ----------
    detail = [dict(out, scheme=scheme, dtype=dtype, backend=sim.backend,
                   variant=variant or "default")]
    f64_steps = int(os.environ.get("BENCH_STEPS_F64", 20))
    cases = [
        # (scheme, dtype, backend, variant, steps, baseline)
        ("muscl-hancock", "float32", "auto", "split12", steps, BASELINE_F32),
        ("muscl-hancock", "float32c", "auto", None, steps, BASELINE_F64),
        ("godunov", "float32", "auto", None, steps, None),
        ("godunov", "float32c", "auto", None, steps, BASELINE_F64),
        ("inertial", "float32", "auto", None, steps, None),
        ("muscl-hancock", "float64", "xla", None, f64_steps, BASELINE_F64),
        ("godunov", "float64", "xla", None, f64_steps, None),
    ]
    for sch, dt_, bk, var, st, base in cases:
        try:
            r, el, sm, cr = run_case(sch, dt_, bk, var, rows, cols, st,
                                     max(1, reps - 1))
        except Exception as e:  # noqa: BLE001 — record and continue
            print(f"# FAILED {sch}/{dt_}/{var}: {e}", file=sys.stderr)
            continue
        sfx = suffixes[dt_]
        entry = {
            "metric": f"{sch.replace('-', '_')}_cell_updates_per_s_{sfx}",
            "value": round(r, 1),
            "unit": "cells/s",
            "scheme": sch, "dtype": dt_, "backend": sm.backend,
            "variant": var or "default", "steps": st,
        }
        if base:
            entry["vs_baseline"] = round(r / base, 4)
        detail.append(entry)
        print(f"# {sch:14s} {dt_} {sm.backend:6s} variant={var or '-':9s} "
              f"{r / 1e6:9.1f} Mcells/s  ({el:.3f}s/{st} steps)",
              file=sys.stderr)

    with open("BENCH_DETAIL.json", "w") as f:
        json.dump({"device": device, "grid": [rows, cols],
                   "cases": detail}, f, indent=1)
    print("# detail -> BENCH_DETAIL.json", file=sys.stderr)


if __name__ == "__main__":
    main()
