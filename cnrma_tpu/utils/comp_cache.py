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


def machine_fingerprint() -> str:
    """Short hash of the host CPU's feature-flag set.

    XLA:CPU AOT executables embed the compile machine's features; loading
    them on a different machine type warns ("+prefer-no-gather ... could
    lead to execution errors such as SIGILL") and can hang or crash the
    step (observed: the sandbox VM migrates between physical host types
    across sessions, and a round-3 dryrun hung executing code AOT-compiled
    on the previous host).  Keying the CPU cache directory by machine type
    makes stale entries unreachable instead of load-and-pray.
    """
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 10.0,
                            per_machine: bool | None = None) -> str:
    """Point JAX's compilation cache at ``path`` (default: repo/.jax_cache).

    Works via env vars when set early, falling back to jax.config updates
    (effective any time before the first compilation).

    ``per_machine=True`` scopes the cache to this host's CPU feature set
    (``.jax_cache_cpu/<fingerprint>``) — required for XLA:CPU runs, whose
    cached AOT code is machine-type-specific (see ``machine_fingerprint``).
    TPU executables target the device, not the host, so the shared default
    directory stays correct across host migrations.  The default (``None``)
    auto-selects per-machine scope when ``JAX_PLATFORMS`` pins this process
    to CPU (the test suite and the multichip dryrun).
    """
    if per_machine is None:
        per_machine = os.environ.get(
            "JAX_PLATFORMS", "").strip().lower().startswith("cpu")
    if path is None:
        base = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        if per_machine:
            path = os.path.join(base, ".jax_cache_cpu",
                                machine_fingerprint())
        else:
            path = os.path.join(base, ".jax_cache")
    os.makedirs(path, exist_ok=True)
    if per_machine:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    else:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        pass
    return path
