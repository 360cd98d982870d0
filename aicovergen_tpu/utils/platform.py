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
        return
    import jax

    if jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
