from cnrma_tpu.eval.indoor_eval import indoor_eval
from cnrma_tpu.eval.mesh_eval import eval_mesh_metrics
