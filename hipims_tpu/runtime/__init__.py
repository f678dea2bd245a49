"""Simulation runtime: master loop, batching, outputs, progress."""

from .simulation import Simulation, SimulationConfig  # noqa: F401
