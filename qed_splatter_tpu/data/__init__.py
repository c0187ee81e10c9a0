"""Data layer: transforms.json parsing, PLY IO, RGB-D datasets, init tooling."""
