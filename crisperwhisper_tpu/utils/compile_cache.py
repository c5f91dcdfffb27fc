"""Persistent XLA compilation cache (VERDICT r3 item 6).

`ASRPipeline.warmup()` precompiles one program per power-of-2 chunk
batch size; on the axon TPU backend each is a multi-minute remote
compile, paid again every process start. JAX's persistent compilation
cache keys executables by (HLO, compile options, backend version) and
replays them from disk, making the second process's warmup ~free.

The reference has no analog (torch eager recompiles nothing but also
fuses nothing); this is TPU-runtime plumbing in the XLA compilation
model's terms (trace once -> compile once -> reuse across processes).

Env: CW_COMPILE_CACHE overrides the cache directory; CW_COMPILE_CACHE=0
disables. Default: ~/.cache/crisperwhisper_tpu/xla.
"""

from __future__ import annotations

import os

_ENABLED_DIR: str | None = None


def enable_persistent_cache(cache_dir: str | None = None,
                            tpu_only: bool = False) -> str | None:
    """Idempotently point JAX's persistent compilation cache at
    `cache_dir` (default: $CW_COMPILE_CACHE or
    ~/.cache/crisperwhisper_tpu/xla). Returns the directory in use, or
    None when disabled via CW_COMPILE_CACHE=0.

    Thresholds are set to cache everything: serving compiles are few,
    large, and expensive; the disk cost is trivial next to the
    multi-minute axon compile it saves (pipeline/asr.py warmup docs).

    tpu_only=True (the serving default) skips CPU backends: XLA:CPU
    persists AOT machine code whose target-feature set may not match
    the loading host ("could lead to execution errors such as SIGILL"
    — cpu_aot_loader.cc), and CPU compiles are cheap anyway. An
    explicit CW_COMPILE_CACHE dir overrides the skip.
    """
    global _ENABLED_DIR
    env = os.environ.get("CW_COMPILE_CACHE")
    if env == "0":
        return None
    if tpu_only and cache_dir is None and not env:
        import jax
        try:
            if jax.devices()[0].platform not in ("tpu", "axon"):
                return None
        except Exception:          # no backend at all  # pragma: no cover
            return None
    if cache_dir is None:
        cache_dir = env or os.path.join(
            os.path.expanduser("~"), ".cache", "crisperwhisper_tpu", "xla")
    if _ENABLED_DIR == cache_dir:
        return cache_dir
    import jax
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # default min-compile-time (1 s) would skip the small per-shape
    # host programs; cache everything.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED_DIR = cache_dir
    return cache_dir
