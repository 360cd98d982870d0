"""Backend/platform selection.

Some environments register extra PJRT plugins that take priority over the
JAX_PLATFORMS environment variable (they prepend themselves to the live
config after jax import).  ``apply_platform_env()`` re-asserts the user's
choice from AICG_PLATFORM (or JAX_PLATFORMS) against the live config; call
it at every process entry point before the first jax operation.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    want = os.environ.get("AICG_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if not want:
        enable_compilation_cache()
        return
    import jax

    if jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
    enable_compilation_cache()


def raise_cpu_collective_timeouts() -> None:
    """N fake CPU devices time-share this host's core(s); XLA:CPU's collective
    rendezvous hard-aborts the process after 40 s by default — raise both
    timeouts so a slow box degrades gracefully instead.  Must run before the
    backend initializes.  Each flag is added independently only if the user
    hasn't already pinned it."""
    flags = os.environ.get("XLA_FLAGS", "")
    for flag, value in (
        ("--xla_cpu_collective_timeout_seconds", 600),
        ("--xla_cpu_collective_call_terminate_timeout_seconds", 1800),
    ):
        if flag not in flags:
            flags = f"{flags} {flag}={value}".strip()
    os.environ["XLA_FLAGS"] = flags


def _cpu_fingerprint() -> str:
    """Hash of this host's CPU feature flags.  XLA:CPU AOT cache entries are
    compiled for the build host's exact machine features and SIGILL when
    loaded on a host without them — so CPU cache entries must never be
    shared across machines (the TPU backend compiles remotely and is safe)."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.blake2b(line.encode(), digest_size=4).hexdigest()
    except OSError:
        pass
    import platform as _platform

    return hashlib.blake2b(_platform.processor().encode(), digest_size=4).hexdigest()


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the deep conv nets take minutes to
    compile on remote-compile TPU backends; cache so it's paid once.

    The cache is partitioned per backend — and for CPU per host fingerprint
    (see _cpu_fingerprint) — under one base directory."""
    import jax

    base = os.environ.get(
        "AICG_COMPILE_CACHE", os.path.expanduser("~/.cache/aicg_jax_cache")
    )
    # the LIVE config wins: entry points like dryrun_multichip force the CPU
    # backend via jax.config even when the session env pins a TPU platform
    want = (
        (jax.config.jax_platforms or "")
        or os.environ.get("AICG_PLATFORM")
        or os.environ.get("JAX_PLATFORMS")
        or ""
    ).split(",")[0]
    # CPU entries are host-specific; TPU/remote backends keep the shared base
    # directory (their entries are portable and already warm across rounds).
    # An UNPINNED platform ("") almost always resolves to the CPU backend, so
    # treat it as CPU — writing feature-specific AOT entries into the shared
    # base is the SIGILL hazard this partition exists to prevent.
    cache_dir = base if want not in ("", "cpu") else os.path.join(
        base, f"cpu-{_cpu_fingerprint()}"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
