"""Scheme definitions: first-order Godunov, MUSCL-Hancock, partial-inertial.

A Scheme bundles the pure per-step function with the metadata the driver
needs (CFL speed variant).  Factory names match the reference's
configuration vocabulary ("godunov", "muscl-hancock", "inertial";
reference: src/Schemes/CScheme.cpp:141-175).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from ..ops.godunov import godunov_step
from ..ops.inertial import inertial_step
from ..ops.muscl import muscl_step


class Scheme(NamedTuple):
    name: str
    step: Callable            # (state, static, dt, params) -> state
    simplified_speed: bool    # CFL uses sqrt(gh) only (inertial)
    order: int
    radius: int               # stencil radius = static-ring width


SCHEMES = {
    "godunov": Scheme("godunov", godunov_step, False, 1, 1),
    "muscl-hancock": Scheme("muscl-hancock", muscl_step, False, 2, 2),
    "inertial": Scheme("inertial", inertial_step, True, 1, 1),
}


def get_scheme(name: str) -> Scheme:
    key = name.strip().lower().replace("_", "-")
    if key not in SCHEMES:
        raise ValueError(
            f"Unknown scheme '{name}'; expected one of {sorted(SCHEMES)}")
    return SCHEMES[key]
