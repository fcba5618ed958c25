from cnrma_tpu.ops.backproject import backproject_view, accumulate_views
from cnrma_tpu.ops.ray_marching import (
    get_ray_parameters, ray_march_neus, ray_march_depth, RayMarchPoints)
