"""Metrics writing and loss-stream monitoring.

Replaces the reference's d2go/detectron2 event stack
(CommonMetricPrinter + JSONWriter + TensorBoard, meta_fcos_runner.py:
364-372) with a console printer and a ``metrics.json`` JSON-lines
writer, and the AbnormalLossChecker hook (meta_fcos_runner.py:332-341)
with a window-based loss watchdog.
"""

from __future__ import annotations

import json
import os
import time
from collections import deque
from typing import Dict, Optional


class MetricsWriter:
    """Writes metrics.json lines AND real TensorBoard event files
    (utils/tb_writer.py) — the reference logs through d2go's JSON +
    TensorBoard writer pair."""

    def __init__(self, output_dir: Optional[str] = None,
                 print_every: int = 20, tensorboard: bool = True):
        self.print_every = print_every
        self._f = None
        self._tb = None
        self._mem_ok = True   # memory_stats() unsupported → stop asking
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._f = open(os.path.join(output_dir, "metrics.json"), "a")
            if tensorboard:
                from .tb_writer import TBEventWriter
                self._tb = TBEventWriter(os.path.join(output_dir, "tb"))
        self._t0 = time.perf_counter()
        self._last = self._t0

    def write(self, step: int, metrics: Dict[str, float], lr: float = None):
        row = {"iteration": step,
               **{k: float(v) for k, v in metrics.items()}}
        if lr is not None:
            row["lr"] = float(lr)
        if self._f:
            self._f.write(json.dumps(row) + "\n")
            self._f.flush()
        if self._tb:
            self._tb.add_scalars(step, {k: v for k, v in row.items()
                                        if k != "iteration"})
        if step % self.print_every == 0:
            now = time.perf_counter()
            rate = self.print_every / max(now - self._last, 1e-9)
            self._last = now
            losses = "  ".join(f"{k}: {float(v):.4f}"
                               for k, v in metrics.items())
            lr_s = f"  lr: {lr:.2e}" if lr is not None else ""
            mem_s = ""
            peak = self._peak_hbm_gb()
            if peak is not None:
                mem_s = f"  hbm_peak: {peak:.2f} GB"
            print(f"iter {step}  {losses}{lr_s}{mem_s}  ({rate:.2f} it/s)")

    def _peak_hbm_gb(self) -> Optional[float]:
        """Device peak-memory telemetry (the reference prints d2go/
        detectron2's ``max_mem`` from torch.cuda.max_memory_allocated in
        CommonMetricPrinter). Returns None where the PJRT client doesn't
        expose memory_stats (e.g. virtual CPU devices)."""
        if not self._mem_ok:
            return None
        try:
            import jax
            stats = jax.local_devices()[0].memory_stats()
            peak = (stats or {}).get("peak_bytes_in_use")
            if peak is None:
                self._mem_ok = False
                return None
            return peak / 1e9
        except Exception:
            self._mem_ok = False
            return None

    def close(self):
        if self._f:
            self._f.close()
        if self._tb:
            self._tb.close()


def write_eval_results_tb(results: Dict[str, Dict], output_dir: str,
                          step: int = 0) -> None:
    """Flatten ``do_test`` results into TensorBoard scalars.

    The reference pushes meta-test results through
    flatten_results_dict -> put_scalar as ``{dataset}/{task}/{metric}``
    (reference meta_fcos_runner.py:614-671); repeated-seed runs are
    additionally logged per seed as ``{dataset}/{task}/run{i}/{metric}``
    so the mean±std aggregation (``*_std`` keys) stays inspectable.
    """
    if not output_dir:
        return
    import math

    from .tb_writer import TBEventWriter

    scalars: Dict[str, float] = {}

    def put(tag, v):
        if isinstance(v, (int, float)) and math.isfinite(float(v)):
            scalars[tag] = float(v)

    for ds, res in results.items():
        if not isinstance(res, dict):
            continue
        for task, metrics in res.items():
            if task == "runs" and isinstance(metrics, list):
                for i, run in enumerate(metrics):
                    for k, v in run.items():
                        put(f"{ds}/bbox/run{i}/{k}", v)
            elif isinstance(metrics, dict):
                for k, v in metrics.items():
                    put(f"{ds}/{task}/{k}", v)
    tb = TBEventWriter(os.path.join(output_dir, "tb"))
    tb.add_scalars(step, scalars)
    tb.close()


class AbnormalLossChecker:
    """Flags NaN/inf or a loss exploding vs its recent window
    (reference ABNORMAL_CHECKER, meta_fcos_runner.py:332-341)."""

    def __init__(self, window: int = 20, ratio: float = 20.0):
        self.window = window
        self.ratio = ratio
        self._hist: Dict[str, deque] = {}

    def check(self, metrics: Dict[str, float]) -> Dict[str, str]:
        problems = {}
        for k, v in metrics.items():
            v = float(v)
            import math
            if not math.isfinite(v):
                problems[k] = f"non-finite loss {v}"
                continue
            h = self._hist.setdefault(k, deque(maxlen=self.window))
            if len(h) == self.window:
                mean = sum(h) / len(h)
                if mean > 0 and v > self.ratio * mean:
                    problems[k] = (f"loss spiked to {v:.4f} "
                                   f"({self.ratio}x window mean {mean:.4f})")
            h.append(v)
        return problems
