"""Launch/setup utilities: env dump, config dumps, post-mortem.

TPU-native analog of the reference's tools/setup.py launch helpers
(setup_after_launch :233-274, log_system_info :313-323,
dump_cfg :332-336, post_mortem_if_fail via mobile_cv :39).
"""

from __future__ import annotations

import functools
import os
import platform
import sys
from typing import Dict, Optional


def collect_env_info() -> str:
    """Environment summary (reference logs detectron2's
    collect_env_info; here: python/jax/libtpu/device inventory)."""
    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
    ]
    try:
        import jax
        lines.append(f"jax: {jax.__version__}")
        try:
            devs = jax.devices()
            lines.append(
                f"devices: {len(devs)} x {devs[0].device_kind} "
                f"(platform={devs[0].platform}, "
                f"process_count={jax.process_count()})")
        except Exception as e:  # pragma: no cover - no backend
            lines.append(f"devices: unavailable ({e})")
    except ImportError:  # pragma: no cover
        lines.append("jax: not installed")
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            import importlib
            m = importlib.import_module(mod)
            lines.append(f"{mod}: {getattr(m, '__version__', '?')}")
        except ImportError:
            pass
    for var in ("XLA_FLAGS", "JAX_PLATFORMS", "SYLPH_TEST_MODE"):
        if os.environ.get(var):
            lines.append(f"{var}={os.environ[var]}")
    return "\n".join(lines)


def cfg_diff(cfg: Dict, default: Dict) -> Dict:
    """Nested diff: keys in ``cfg`` whose value differs from ``default``
    (the reference dumps a diff config next to the full one,
    setup.py:264-268)."""
    out = {}
    for k, v in cfg.items():
        d = default.get(k) if isinstance(default, dict) else None
        if isinstance(v, dict):
            sub = cfg_diff(v, d if isinstance(d, dict) else {})
            if sub:
                out[k] = sub
        elif d != v:
            out[k] = v
    return out


def setup_after_launch(cfg, output_dir: str,
                       default_cfg=None) -> None:
    """Create the output dir, dump the full + diff config, and log the
    environment (reference setup_after_launch, tools/setup.py:233-274)."""
    import yaml

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    if default_cfg is not None:
        with open(os.path.join(output_dir, "config_diff.yaml"), "w") as f:
            yaml.safe_dump(_plain(cfg_diff(cfg, default_cfg)), f,
                           sort_keys=False)
    env = collect_env_info()
    with open(os.path.join(output_dir, "env.txt"), "w") as f:
        f.write(env + "\n")
    print("[setup] environment:\n" + env)


def _plain(d):
    return {k: _plain(v) if isinstance(v, dict) else v for k, v in d.items()}


def post_mortem_if_fail(fn=None):
    """Decorator: drop into pdb.post_mortem on uncaught exception when
    SYLPH_POST_MORTEM=1 (reference wraps main with mobile_cv's
    post_mortem_if_fail)."""
    def deco(f):
        @functools.wraps(f)
        def wrapped(*a, **kw):
            try:
                return f(*a, **kw)
            except Exception:
                if os.environ.get("SYLPH_POST_MORTEM"):
                    import pdb
                    import traceback
                    traceback.print_exc()
                    pdb.post_mortem()
                raise
        return wrapped
    return deco(fn) if fn is not None else deco
