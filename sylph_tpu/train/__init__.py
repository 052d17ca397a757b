"""Training runtime: optimizer/freezing, train state, sharded steps,
checkpointing — the TPU-native replacement for d2go's SimpleTrainer +
hook stack (reference meta_fcos_runner.py:290-379)."""

from .optimizer import build_freeze_mask, build_lr_schedule, build_optimizer
from .packing import PackedState, ensure_packed, pack_state, unpack_state
from .train_state import TrainState, create_train_state
from .steps import (finalize_step, make_episodic_train_step,
                    make_pretrain_train_step)

__all__ = [
    "build_optimizer", "build_lr_schedule", "build_freeze_mask",
    "TrainState", "create_train_state",
    "PackedState", "pack_state", "unpack_state", "ensure_packed",
    "finalize_step", "make_pretrain_train_step",
    "make_episodic_train_step",
]
