"""Mesh extraction and export (native marching cubes + PLY/OBJ writers)."""

from humanliff_tpu.mesh.marching_cubes import marching_cubes, smooth_grid
from humanliff_tpu.mesh.io import write_ply, write_obj
