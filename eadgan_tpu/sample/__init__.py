"""Artifact rendering (layer L8): image grids with torchvision parity."""

from eadgan_tpu.sample.grid import make_grid, save_image

__all__ = ["make_grid", "save_image"]
