"""Utilities: config, persistence, result store, synthetic data, profiling."""
