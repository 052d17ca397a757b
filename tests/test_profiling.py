"""Profiling utility tests."""

import jax.numpy as jnp
import numpy as np

from sylph_tpu.utils.profiling import flop_count, latency


def test_flop_count_matmul():
    a = jnp.zeros((128, 256), jnp.float32)
    b = jnp.zeros((256, 128), jnp.float32)
    cost = flop_count(lambda x, y: x @ y, a, b)
    # 2*M*N*K = 8.4 MFLOPs (XLA may report exactly or -1 when unknown)
    if cost["flops"] > 0:
        assert 0.5 * 2 * 128 * 128 * 256 <= cost["flops"] \
            <= 2 * 2 * 128 * 128 * 256


def test_latency_measures_positive():
    import jax
    f = jax.jit(lambda x: jnp.sin(x).sum())
    t = latency(f, jnp.ones((64, 64)), iters=3, warmup=1)
    assert t > 0


def test_setup_utils(tmp_path):
    """Env dump, config + diff-config dump (reference setup_after_launch
    tools/setup.py:233-274), post-mortem decorator pass-through."""
    import os
    from sylph_tpu.config import get_default_cfg
    from sylph_tpu.utils.setup import (cfg_diff, collect_env_info,
                                       post_mortem_if_fail,
                                       setup_after_launch)

    env = collect_env_info()
    assert "jax:" in env and "python:" in env

    cfg = get_default_cfg()
    default = get_default_cfg()
    cfg.SOLVER.BASE_LR = 0.123
    cfg.MODEL.FCOS.NUM_CLASSES = 7
    diff = cfg_diff(cfg, default)
    assert diff == {"SOLVER": {"BASE_LR": 0.123},
                    "MODEL": {"FCOS": {"NUM_CLASSES": 7}}}

    out = str(tmp_path / "o")
    setup_after_launch(cfg, out, default_cfg=default)
    assert os.path.exists(os.path.join(out, "config.yaml"))
    assert os.path.exists(os.path.join(out, "config_diff.yaml"))
    assert os.path.exists(os.path.join(out, "env.txt"))
    import yaml
    with open(os.path.join(out, "config_diff.yaml")) as f:
        assert yaml.safe_load(f) == diff

    @post_mortem_if_fail
    def ok(x):
        return x + 1
    assert ok(1) == 2

    @post_mortem_if_fail
    def bad():
        raise ValueError("boom")
    import pytest
    with pytest.raises(ValueError):
        bad()  # SYLPH_POST_MORTEM unset -> plain re-raise


def test_tb_event_writer_roundtrip(tmp_path):
    """Hand-rolled tfevents files parse in TensorBoard's own loader
    (scalar values survive; TB migrates simple_value -> tensor)."""
    import glob
    import struct
    from sylph_tpu.utils.tb_writer import TBEventWriter, crc32c

    # crc32c golden vectors (RFC 3720 / Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0

    w = TBEventWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 0.75, "lr": 0.01})
    w.add_scalar(2, "loss", 0.5)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    try:
        from tensorboard.backend.event_processing import event_file_loader
    except ImportError:
        return  # framing already validated by the golden CRCs
    got = {}
    for e in event_file_loader.EventFileLoader(files[0]).Load():
        for v in e.summary.value:
            got[(e.step, v.tag)] = struct.unpack(
                "<f", v.tensor.tensor_content)[0] \
                if v.tensor.tensor_content else v.tensor.float_val[0]
    assert abs(got[(1, "loss")] - 0.75) < 1e-6
    assert abs(got[(1, "lr")] - 0.01) < 1e-6
    assert abs(got[(2, "loss")] - 0.5) < 1e-6


def test_metrics_writer_emits_tb(tmp_path):
    import glob
    from sylph_tpu.utils.events import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    w.write(1, {"loss": 1.0}, lr=0.1)
    w.close()
    assert glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))


def test_metrics_writer_hbm_probe_degrades_gracefully(tmp_path, capsys):
    """The hbm_peak console field (reference: d2go CommonMetricPrinter's
    max_mem) must not break logging on devices without memory_stats;
    the probe latches off after the first failure."""
    from sylph_tpu.utils.events import MetricsWriter

    w = MetricsWriter(str(tmp_path), print_every=1)
    w.write(1, {"loss": 1.0}, lr=0.1)
    out = capsys.readouterr().out
    assert "iter 1" in out
    peak = w._peak_hbm_gb()
    # virtual CPU devices report no peak_bytes_in_use -> None + latch;
    # if the platform does report, the number must be sane
    assert peak is None or 0.0 < peak < 256.0
    if peak is None:
        assert w._mem_ok is False
    w.close()


def test_eval_results_flatten_to_tb(tmp_path):
    """do_test results land in TB as {dataset}/bbox/{metric} scalars,
    per-seed runs included, NaNs skipped (reference
    meta_fcos_runner.py:614-671 flatten + put_scalar)."""
    import glob
    import struct

    from sylph_tpu.utils.events import write_eval_results_tb

    results = {
        "coco_meta_val_all": {
            "bbox": {"AP": 31.5, "AP_std": 0.4, "nAP": 18.0,
                     "APl": float("nan")},
            "runs": [{"AP": 31.1}, {"AP": 31.9}],
        },
    }
    write_eval_results_tb(results, str(tmp_path), step=7)
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    try:
        from tensorboard.backend.event_processing import event_file_loader
    except ImportError:
        return
    got = {}
    for e in event_file_loader.EventFileLoader(files[0]).Load():
        for v in e.summary.value:
            got[(e.step, v.tag)] = struct.unpack(
                "<f", v.tensor.tensor_content)[0] \
                if v.tensor.tensor_content else v.tensor.float_val[0]
    ds = "coco_meta_val_all"
    assert abs(got[(7, f"{ds}/bbox/AP")] - 31.5) < 1e-5
    assert abs(got[(7, f"{ds}/bbox/AP_std")] - 0.4) < 1e-6
    assert abs(got[(7, f"{ds}/bbox/run0/AP")] - 31.1) < 1e-5
    assert abs(got[(7, f"{ds}/bbox/run1/AP")] - 31.9) < 1e-5
    assert (7, f"{ds}/bbox/APl") not in got  # NaN skipped
