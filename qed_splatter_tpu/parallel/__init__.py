"""Parallelism: device meshes, sharded train steps, multi-host utilities."""
