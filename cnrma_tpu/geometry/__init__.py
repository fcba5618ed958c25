from cnrma_tpu.geometry.tsdf import TSDF, coordinates_grid
from cnrma_tpu.geometry.boxes import DepthBoxes
