"""Utilities: device-truth microbenchmarking, profiling helpers."""
