"""Train state pytree: params, optimizer state, EMA.

Replaces detectron2's model/optimizer/scheduler checkpoint triple plus
the d2go EMAHook (reference meta_fcos_runner.py:307-313, 350). The EMA
is just another pytree updated functionally each step; eval-with-EMA
(meta_fcos_runner.py:692-699) reads ``state.ema_params``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    ema_decay: float = dataclasses.field(default=0.9998,
                                         metadata=dict(static=True))

    def apply_updates(self, grads, tx) -> "TrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                new_ema, new_params)
        return TrainState(step=self.step + 1, params=new_params,
                          opt_state=new_opt, ema_params=new_ema,
                          ema_decay=self.ema_decay)


def create_train_state(params, tx, use_ema: bool = False,
                       ema_decay: float = 0.9998) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        ema_decay=ema_decay,
    )
