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


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the deep conv nets take minutes to
    compile on remote-compile TPU backends; cache so it's paid once."""
    import jax

    cache_dir = os.environ.get(
        "AICG_COMPILE_CACHE", os.path.expanduser("~/.cache/aicg_jax_cache")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
