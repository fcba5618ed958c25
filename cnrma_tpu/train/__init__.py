from cnrma_tpu.train.optim import build_optimizer, build_lr_schedule
from cnrma_tpu.train.state import TrainState
