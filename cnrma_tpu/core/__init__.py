from cnrma_tpu.core.config import Config
from cnrma_tpu.core.registry import Registry, build_from_cfg
