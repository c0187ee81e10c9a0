"""TPU compute ops: projection, SH, tiling, rasterization, image/pointcloud math."""
