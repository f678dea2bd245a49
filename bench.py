"""Headline benchmark: MUSCL-Hancock cell-update rate on one chip.

Mirrors the reference's Malpasset configuration scale (~1.8-2M cells,
MUSCL-Hancock, dynamic CFL timestep, friction on) and reports cell-updates
per second against the reference's best single-GPU 32-bit rate of
556 M cells/s (NVIDIA Tesla M2075, BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

BASELINE_CELLS_PER_S = 556e6  # reference 32-bit MUSCL-Hancock, Tesla M2075


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from hipims_tpu.domain import Domain
    from hipims_tpu.runtime import Simulation, SimulationConfig

    rows = int(os.environ.get("BENCH_ROWS", 1408))
    cols = int(os.environ.get("BENCH_COLS", 1408))
    steps = int(os.environ.get("BENCH_STEPS", 200))
    scheme = os.environ.get("BENCH_SCHEME", "muscl-hancock")
    # The split Pallas MUSCL kernels compile in ~30 s here and run ~1.4x
    # the XLA path, so "auto" resolves to Pallas on a TPU chip.
    backend = os.environ.get("BENCH_BACKEND", "auto")

    # Fully wet radial dam break over a gently undulating bed: no dry-cell
    # shortcuts, friction active everywhere — worst-case honest rate.
    yy, xx = np.mgrid[0:rows, 0:cols]
    zb = 0.2 * np.sin(xx / 50.0) * np.cos(yy / 50.0)
    dom = Domain(zb=zb, manning=0.03, dx=10.0, dy=10.0)
    r = np.hypot((yy - rows / 2) * 10.0, (xx - cols / 2) * 10.0)
    dom.set_initial_depth(np.where(r <= rows * 10.0 / 6.0, 8.0, 2.0))

    cfg = SimulationConfig(scheme=scheme, duration=1e9,
                           output_frequency=1e9, dtype="float32",
                           batch_size=steps, batch_auto=False,
                           kernel_backend=backend)
    sim = Simulation(dom, cfg)

    sync = jnp.asarray(1e9, dtype=sim.dtype)

    # Warm-up (compile + first batch).  The scalar read-back is the sync
    # point: block_until_ready alone does not block through the remote
    # relay used in this environment.
    state, carry = sim._run_batch(sim.state, sim.carry, sim.static, sync,
                                  n_steps=steps)
    _ = float(carry.t)

    reps = int(os.environ.get("BENCH_REPS", 3))
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        state, carry = sim._run_batch(state, carry, sim.static, sync,
                                      n_steps=steps)
        _ = float(carry.t)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    cells = rows * cols
    rate = cells * steps / elapsed
    out = {
        "metric": f"{scheme.replace('-', '_')}_cell_updates_per_s_f32",
        "value": round(rate, 1),
        "unit": "cells/s",
        "vs_baseline": round(rate / BASELINE_CELLS_PER_S, 4),
    }
    print(json.dumps(out))
    print(f"# grid={rows}x{cols} steps={steps} elapsed={elapsed:.3f}s "
          f"t_sim={float(carry.t):.3f}s dt={float(carry.dt):.4f}s "
          f"device={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
