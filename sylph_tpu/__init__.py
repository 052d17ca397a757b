"""sylph_tpu — TPU-native incremental few-shot object detection.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
facebookresearch/sylph-few-shot-detection (CVPR 2022, arXiv:2203.13903):
a class-agnostic FCOS detector whose final classification layer's weights
are *synthesized* by a hypernetwork ("code generator") from a K-shot
support set, so novel classes register without gradient updates.

Design notes (TPU-first, not a port):
  * All compute paths are pure functions compiled once under `jax.jit` /
    `pjit` with static shapes: images live on fixed bucketed canvases,
    ground truth is padded to a static box count with validity masks, and
    the per-class "class codes" live in a fixed-capacity HBM code bank.
  * FPN levels are processed as a stacked location axis, the conditional
    classification head is a single einsum on the MXU, and NMS / top-k
    post-processing run on device over fixed-size candidate sets.
  * Multi-chip scaling uses `jax.sharding.Mesh` + NamedSharding: the
    episode/batch axis is data-parallel, loss normalizers use `psum`, and
    class-code generation shards the class axis and `all_gather`s the
    fixed-shape code tensors.
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large freed buffers in the glibc arena instead of munmap.

    glibc serves big allocations via mmap and returns them to the OS on
    free, so every image batch re-faults its pages; on memory-ballooned
    VM hosts first-touch faults throttle to ~7-30 MB/s and a 200 MB
    batch stack costs ~11 s (measured) — vs 0.1 s once the pages stay
    warm. Raising M_MMAP_THRESHOLD / M_TRIM_THRESHOLD makes freed batch
    buffers recycle warm arena pages, the allocator-level counterpart
    of data/loader.py::_BufferPool. No-op where glibc is absent.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)   # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)   # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_malloc()


def enable_compilation_cache(path: str = "~/.cache/sylph_tpu_xla") -> None:
    """Persist compiled XLA executables across processes.

    The episodic R-50 train step takes ~30 min to compile on v5e the
    first time; with the cache every later run (resume, eval, bench)
    loads it in seconds. Called by tools/train_net.py and bench tools.
    """
    import os

    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
