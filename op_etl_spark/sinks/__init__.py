"""Sinks: staging writes, truncate-and-load, manifest gating, dataset
routing (reference K1-K6)."""
