"""Train state + orbax checkpointing.

Replaces the reference's mmcv CheckpointHook / ``load_from`` /
``resume_from`` machinery (``train.py:235-245``, config keys
``ray_marching_scannet.py:41-42``): ``load_from`` restores weights only,
``resume`` restores weights + optimizer + step.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats,
               tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx)

    def apply_gradients(self, grads, new_batch_stats) -> "TrainState":
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            batch_stats=new_batch_stats,
                            opt_state=opt_state)


def save_checkpoint(path: str, state: TrainState,
                    meta: Optional[Dict[str, Any]] = None) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"step": state.step, "params": state.params,
               "batch_stats": state.batch_stats,
               "opt_state": state.opt_state}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if meta:
        import json
        with open(os.path.join(path, "cnrma_meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str, state: TrainState,
                    weights_only: bool = False) -> TrainState:
    """weights_only=True == reference ``load_from``; False == resume."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {"step": state.step, "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
    restored = ckptr.restore(path, template)
    if weights_only:
        return state.replace(params=restored["params"],
                             batch_stats=restored["batch_stats"])
    return state.replace(step=restored["step"],
                         params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"])
