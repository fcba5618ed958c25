"""Persistent XLA compilation cache setup.

Full-pipeline compiles are expensive (minutes locally, tens of minutes via
a remote-compile TPU tunnel); caching compiled executables on disk makes
every later process start in seconds.  Call before the first jit execution.
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    """Make the ``JAX_PLATFORMS`` env var authoritative again.

    Some environments (e.g. a sitecustomize that registers a remote TPU
    platform) pin ``jax_platforms`` via ``jax.config``, which silently
    overrides the env var — so ``JAX_PLATFORMS=cpu python tools/...``
    would still dispatch to the remote device.  Calling this before the
    first backend use restores the standard env-var semantics.  No-op
    when the env var is unset.
    """
    val = os.environ.get("JAX_PLATFORMS")
    if val:
        try:
            import jax
            jax.config.update("jax_platforms", val)
        except Exception:
            pass


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 10.0) -> str:
    """Point JAX's compilation cache at ``path`` (default: repo/.jax_cache).

    Works via env vars when set early, falling back to jax.config updates
    (effective any time before the first compilation).
    """
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        pass
    return path
