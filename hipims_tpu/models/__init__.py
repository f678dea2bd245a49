"""Numerical scheme registry — the framework's "model families".

Each scheme is a pure step function plus metadata; the factory mirrors
CScheme::createFromConfig (reference: src/Schemes/CScheme.cpp:119-175).
"""

from .schemes import SCHEMES, Scheme, get_scheme  # noqa: F401
