"""Numerical operators: reconstruction, Riemann fluxes, friction, limiters,
timestep control, boundary application.  All functions are pure and
jit-compatible; the hot per-step composites live in godunov/muscl/inertial.
"""
