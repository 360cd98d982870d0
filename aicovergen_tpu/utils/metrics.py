"""Per-stage timing metrics + optional profiler tracing.

The reference threads vestigial ``times=[0,0,0]`` accumulators through its VC
stack and never prints them (reference src/rvc.py:148-150,
src/vc_infer_pipeline.py:403,438,469-471); this is that idea done properly:
a collector that records wall-seconds per pipeline stage, derives RTF
(audio-seconds processed per wall-second), and emits one structured log line.

Profiling: set ``AICG_PROFILE=/dir`` to capture a ``jax.profiler`` trace of
everything inside ``profile_trace()`` (viewable with tensorboard/xprof).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class Metrics:
    """Accumulates stage -> seconds; one instance per pipeline run."""

    audio_seconds: Optional[float] = None
    stages: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def add(self, name: str, seconds: float) -> None:
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    def report(self) -> dict:
        """{stage: {seconds, rtf}} + totals; rtf = audio-s per wall-s."""
        out = {"stages": {}, "total_seconds": round(self.total, 3)}
        for name, secs in self.stages.items():
            entry = {"seconds": round(secs, 3)}
            if self.audio_seconds and secs > 0:
                entry["rtf"] = round(self.audio_seconds / secs, 2)
            out["stages"][name] = entry
        if self.audio_seconds:
            out["audio_seconds"] = round(self.audio_seconds, 2)
            if self.total > 0:
                out["rtf"] = round(self.audio_seconds / self.total, 2)
        return out

    def log(self, label: str = "pipeline") -> None:
        report = self.report()
        print(f"AICG_METRICS {label} {json.dumps(report)}", flush=True)
        from .logging import get_logger, log_event

        log_event(get_logger("aicovergen.metrics"), label, **report)


@contextlib.contextmanager
def profile_trace(label: str = "aicg"):
    """jax.profiler trace gated on AICG_PROFILE=<dir>; no-op otherwise."""
    profile_dir = os.environ.get("AICG_PROFILE")
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(profile_dir, label)):
        yield
