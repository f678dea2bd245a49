"""Physical and numerical constants for the shallow-water core.

Mirrors the compile-time constants the reference injects into its device code
(reference: src/OpenCL/Executors/CLUniversalHeader.clh:33 GRAVITY;
src/Schemes/CLDynamicTimestep.clh:24-29 timestep limits;
src/Schemes/CSchemeGodunov.cpp:56-57 dry thresholds;
src/Schemes/CLSchemeInertial.clh:24 Froude limit;
src/Boundaries/CLBoundaries.clh:28 hydrological timestep).

In the reference these become ``#define`` specialisation constants at OpenCL
JIT time; here they are Python-level closure constants specialised at
``jax.jit`` trace time, which is the direct XLA analogue.
"""

GRAVITY = 9.81

# Depth below which a cell is considered dry ("VERY_SMALL") and the slightly
# larger threshold used by the CFL reduction ("QUITE_SMALL" = 10x).
VERY_SMALL = 1e-10
QUITE_SMALL = 1e-9

# Sentinel marking a disabled cell in the state arrays. A disabled cell has
# z == zmax == NODATA and never updates; neighbours see it as dry.
NODATA = -9999.0

# Bed elevation used to impose a closed ("wall") domain edge.
CLOSED_EDGE_ELEVATION = 9999.9

# Dynamic timestep controls.
TIMESTEP_MINIMUM = 1e-10
TIMESTEP_MAXIMUM = 15.0
TIMESTEP_EARLY_LIMIT = 0.1
TIMESTEP_EARLY_LIMIT_DURATION = 60.0
TIMESTEP_START_MINIMUM = 1e-10
TIMESTEP_START_MINIMUM_DURATION = 1.0

# Hydrological processes (rainfall/losses) accumulate over their own, larger
# timestep before being applied.
TIMESTEP_HYDROLOGICAL = 1.0

# Froude-number discharge limiter for the partial-inertial scheme.
FROUDE_LIMIT = 0.8

# MINMOD/MINBEE limiter coefficient (reference:
# src/Schemes/Limiters/CLSlopeLimiterMINMOD.clh:23).
MINBEE_BETA = 1.0
