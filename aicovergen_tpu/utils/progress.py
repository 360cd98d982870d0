"""Progress reporting.

The reference routed progress either to stdout or a gradio Progress object
(reference src/main.py:159-163).  Here a progress sink is any callable
``(percent: float, message: str) -> None``; the default prints.
"""

from __future__ import annotations

from typing import Callable, Optional

ProgressFn = Callable[[float, str], None]


def _print_progress(percent: float, message: str) -> None:
    print(f"[{percent * 100:5.1f}%] {message}", flush=True)


def display_progress(message: str, percent: float, progress: Optional[ProgressFn] = None) -> None:
    (progress or _print_progress)(percent, message)
    if progress is not None:
        # still emit a structured debug event when a UI sink swallowed it
        from .logging import get_logger

        get_logger("aicovergen.progress").debug("%.0f%% %s", percent * 100, message)
