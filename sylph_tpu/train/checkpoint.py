"""Checkpointing: orbax train-state snapshots + the class-code bank.

Replaces detectron2's DetectionCheckpointer stack
(meta_fcos_runner.py:307-328):

  * ``CheckpointManager`` — periodic save / latest-restore of the full
    TrainState (params, optimizer, EMA, step), resume-or-load semantics
    (reference resume_or_load + start-iter arithmetic :315-324);
  * module-filtered loading — drop param subtrees matching
    MODEL.WEIGHTS_FILTER_BY_MODULE prefixes before load
    (``_weight_preprocess``, meta_fcos_runner.py:232-288);
  * class codes are a second checkpoint species (one ``.pth`` per class
    in the reference, meta_learn_evaluation.py:316-325): here a single
    ``.npz`` bank (save_code_bank/load_code_bank) plus the per-class
    ``.npz`` files written by evaluation/meta_eval.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    HAVE_ORBAX = True
except Exception:  # pragma: no cover
    HAVE_ORBAX = False


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        assert HAVE_ORBAX
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(
            jax.tree.map(np.asarray, _state_to_pytree(state))))
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state, step: Optional[int] = None):
        """Restore into the structure of ``state`` (resume)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return state, 0
        target = jax.tree.map(np.asarray, _state_to_pytree(state))
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(target))
        return _pytree_to_state(state, restored), step


def _state_to_pytree(state) -> Dict[str, Any]:
    if hasattr(state, "unpack"):  # PackedState at the dispatch boundary
        state = state.unpack()
    return {"step": state.step, "params": state.params,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params if state.ema_params is not None
            else {}}


def _pytree_to_state(template, tree):
    import dataclasses
    return dataclasses.replace(
        template, step=tree["step"], params=tree["params"],
        opt_state=jax.tree.unflatten(
            jax.tree.structure(template.opt_state),
            jax.tree.leaves(tree["opt_state"])),
        ema_params=(tree["ema_params"] or None)
        if template.ema_params is not None else None)


# ------------------------------------------------------------- param loading
def load_params_any(path: str) -> Dict:
    """Raw model params from a NATIVE checkpoint: a flat ``.npz``
    ("a/b/c" keys, tools/convert_checkpoint.py layout) or an orbax
    CheckpointManager directory (train-state snapshots).

    Returns a nested numpy dict with shapes AS STORED — no template
    restore — so callers (e.g. TFA cls-logits surgery,
    reference fcos.py:344-380) can read subtrees from checkpoints whose
    head size differs from the current model's."""
    if path.endswith(".npz"):
        flat = np.load(path)
        out: Dict = {}
        for k in flat.files:
            node = out
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = flat[k]
        return out
    assert HAVE_ORBAX, "orbax required to read checkpoint directories"
    mngr = ocp.CheckpointManager(os.path.abspath(path))
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint steps under {path}")
    tree = mngr.restore(step)
    return tree["params"]



def filter_params_by_module(params: Dict, prefixes: List[str]) -> Dict:
    """Drop top-level subtrees whose path starts with any prefix
    (MODEL.WEIGHTS_FILTER_BY_MODULE, meta_fcos_runner.py:232-288)."""
    if not prefixes:
        return params

    def keep(path: str) -> bool:
        return not any(path.startswith(p) for p in prefixes)

    def walk(node, path=""):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                child = walk(v, p)
                if child:
                    out[k] = child
            elif keep(p):
                out[k] = v
        return out

    return walk(params)


def merge_params(init_params: Dict, loaded: Dict) -> Dict:
    """Overlay loaded leaves onto freshly-initialized params (surgical
    loading — missing keys keep their init, like detectron2's loader).

    Shape-mismatched leaves are SKIPPED with a warning, matching
    detectron2 checkpointer semantics: the TFA flow loads a C_base-class
    checkpoint into a NUM_CLASSES head and then patches the overlapping
    logits rows afterwards (_preload_cls_logits), so a few mismatches
    are expected, not fatal. But a checkpoint where MOST leaves mismatch
    is simply the wrong checkpoint (different FPN width, depth, ...) —
    loading it "successfully" onto random init would silently produce
    garbage, so that raises instead.
    """
    import copy
    import logging
    out = copy.deepcopy(init_params)
    skipped, merged = [], [0]

    def walk(dst, src, path=""):
        for k, v in src.items():
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                walk(dst[k], v, p)
            elif k in dst:
                if np.shape(dst[k]) != np.shape(v):
                    ss, ds = np.shape(v), np.shape(dst[k])
                    # s2d stem (TPU.S2D_STEM): stored 7x7 stride-2 stem
                    # kernels load into the exact-equivalent (4,4,4C,O)
                    # space-to-depth layout, and vice versa (the scatter
                    # is an exact reindexing both ways).
                    if (len(ss) == 4 and ss[:2] == (7, 7)
                            and ds == (4, 4, 4 * ss[2], ss[3])):
                        from ..models.resnet import stem_kernel_to_s2d
                        dst[k] = stem_kernel_to_s2d(v)
                        merged[0] += 1
                        continue
                    if (len(ds) == 4 and ds[:2] == (7, 7)
                            and ss == (4, 4, 4 * ds[2], ds[3])):
                        from ..models.resnet import stem_kernel_from_s2d
                        dst[k] = stem_kernel_from_s2d(v)
                        merged[0] += 1
                        continue
                    skipped.append((p, ss, ds))
                    logging.getLogger(__name__).warning(
                        "merge_params: skipping %s — checkpoint shape %s "
                        "!= model shape %s", p, ss, ds)
                    continue
                dst[k] = v
                merged[0] += 1
    walk(out, loaded)
    if skipped:
        logging.getLogger(__name__).warning(
            "merge_params: %d leaves skipped on shape mismatch "
            "(%d merged); first: %s", len(skipped), merged[0],
            skipped[:3])
        if len(skipped) > merged[0]:
            raise ValueError(
                f"merge_params: {len(skipped)} of "
                f"{len(skipped) + merged[0]} checkpoint leaves mismatch "
                f"the model (e.g. {skipped[:3]}) — this looks like the "
                "wrong checkpoint for this architecture, refusing to "
                "continue on mostly-random weights")
    return out


# ---------------------------------------------------------------- code banks
def save_code_bank(path: str, bank: Dict[str, np.ndarray],
                   class_names: Optional[List[str]] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = dict(bank)
    if class_names is not None:
        payload["class_names"] = np.asarray(class_names)
    np.savez(path, **payload)


def load_code_bank(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path, allow_pickle=False)
    return {k: data[k] for k in data.files}
