"""Logging, benchmarking and misc utilities."""
