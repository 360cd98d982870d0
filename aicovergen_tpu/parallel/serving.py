"""Multi-song serving scheduler over a device mesh: the two postures.

The reference serves one song at a time on one GPU, with per-song chunk
threads inside the separator (reference src/mdx.py:238-243) and a strictly
serial Gradio queue (reference src/webui.py:317-322).  On a TPU host with an
n-device mesh there are two ways to run N concurrent covers (SURVEY §2.2
"multi-song throughput serving", §7.9):

  whole_mesh — ONE CoverPipeline whose MDX chunk / VC segment batches shard
      over the full mesh's "data" axis; N worker threads feed it and the
      pipeline's device admission gate serializes their device sections.
      Minimizes single-cover latency (every cover gets all chips) but the
      whole-track stages (effects, mixdown, hpf) don't scale on "data", so
      aggregate throughput flattens once the gate saturates.

  submesh — the mesh is PARTITIONED into k = n/submesh_devices independent
      lanes, each lane a CoverPipeline over its own submesh (or a plain
      single device) with a dedicated worker thread; jobs go to the next
      free lane.  Covers never contend for a gate across lanes, whole-track
      stages run k-wide in parallel, and HBM working sets stay per-lane —
      the classic throughput posture.  Per-cover latency is that of a
      submesh_devices-chip cover.

Each lane pins its computations with ``jax.default_device`` (thread-local),
so un-annotated ops land on the lane's devices, not device 0.

Posture selection is a deployment knob: ``AICG_SERVING_POSTURE``
(whole_mesh|submesh) + ``AICG_SUBMESH_DEVICES`` (devices per lane, default
1), read by ``scheduler_from_config``.  The webui passes them through
(``--posture``/``--submesh-devices``).  The dryrun
(__graft_entry__._serving_throughput_dryrun) runs an 8-job round under both
postures on the virtual 8-device mesh and asserts every output matches the
single-device cover bit-for-bit at the 16-bit PCM floor.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

POSTURES = ("whole_mesh", "submesh")


@dataclass
class Lane:
    """One serving lane: a pipeline plus the device its un-annotated ops pin
    to.  whole_mesh has N workers sharing one lane's pipeline; submesh has
    one worker per lane."""

    pipeline: object
    device: object
    name: str = ""


class ServingScheduler:
    """Run N concurrent covers on an n-device host under a posture.

    store/runtime/stem_cache are forwarded to every CoverPipeline.  For
    posture="whole_mesh", `workers` threads share one full-mesh pipeline;
    for posture="submesh", one thread per lane (k = n_devices /
    submesh_devices lanes) and `workers` is ignored.
    """

    def __init__(
        self,
        store,
        posture: str = "whole_mesh",
        n_devices: Optional[int] = None,
        submesh_devices: int = 1,
        model_parallel: int = 1,
        workers: int = 4,
        runtime=None,
        stem_cache: Optional[str] = "behind",
        pipeline_factory: Optional[Callable] = None,
    ) -> None:
        import jax

        from ..pipeline.cover import CoverPipeline
        from .mesh import make_mesh, submesh

        if posture not in POSTURES:
            raise ValueError(f"posture must be one of {POSTURES}, got {posture!r}")
        devices = jax.devices()
        n = min(n_devices or len(devices), len(devices))
        devices = devices[:n]
        self.posture = posture
        self.store = store
        # only forward runtime when given: CoverPipeline's default_factory
        # must not be overridden with an explicit None
        extra = {"runtime": runtime} if runtime is not None else {}
        make_pipeline = pipeline_factory or (
            lambda mesh: CoverPipeline(
                store, mesh=mesh, stem_cache=stem_cache, **extra
            )
        )

        self.lanes: List[Lane] = []
        if posture == "whole_mesh":
            mesh = make_mesh(n, model_parallel=model_parallel) if n > 1 else None
            pipe = make_pipeline(mesh)
            for i in range(max(workers, 1)):
                self.lanes.append(Lane(pipe, devices[0], name=f"whole_mesh/w{i}"))
        else:
            if submesh_devices < 1 or n % submesh_devices != 0:
                raise ValueError(
                    f"submesh_devices={submesh_devices} must divide {n} devices"
                )
            k = n // submesh_devices
            for i in range(k):
                devs = devices[i * submesh_devices : (i + 1) * submesh_devices]
                mesh = (
                    submesh(devs, model_parallel=model_parallel)
                    if len(devs) > 1
                    else None
                )
                self.lanes.append(
                    Lane(make_pipeline(mesh), devs[0], name=f"submesh/{i}")
                )

    @property
    def pipelines(self):
        seen, out = set(), []
        for lane in self.lanes:
            if id(lane.pipeline) not in seen:
                seen.add(id(lane.pipeline))
                out.append(lane.pipeline)
        return out

    def run(self, jobs: Sequence[dict]) -> list:
        """Run every job (a dict of song_cover kwargs) to completion across
        the lanes; returns results in job order (a path, or the exception
        that cover raised — failure isolation: one bad job never takes down
        the round)."""
        import jax

        job_q: "queue.Queue" = queue.Queue()
        for i, job in enumerate(jobs):
            job_q.put((i, job))
        results: list = [None] * len(jobs)

        def work(lane: Lane):
            while True:
                try:
                    i, job = job_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    # thread-local default device: the lane's un-annotated
                    # ops (effects, mixdown, uploads) land on ITS submesh,
                    # not device 0
                    with jax.default_device(lane.device):
                        results[i] = lane.pipeline.song_cover(**job)
                except Exception as e:  # noqa: BLE001 — isolate per job
                    results[i] = e

        threads = [
            threading.Thread(target=work, args=(lane,), daemon=True)
            for lane in self.lanes
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return results

    def drain(self, raise_errors: bool = False) -> None:
        for pipe in self.pipelines:
            drain = getattr(pipe, "drain_cache", None)
            if drain is not None:
                drain(raise_errors=raise_errors)


def scheduler_from_config(store, runtime=None, workers: int = 4,
                          stem_cache: Optional[str] = "behind") -> ServingScheduler:
    """ServingScheduler from the env-tiered knobs: AICG_SERVING_POSTURE
    (default whole_mesh — the measured-latency-optimal single-chip posture),
    AICG_SUBMESH_DEVICES, AICG_NUM_DEVICES, AICG_MODEL_PARALLEL."""
    import os

    from ..utils.config import default_config

    cfg = default_config()
    return ServingScheduler(
        store,
        posture=os.environ.get("AICG_SERVING_POSTURE", "whole_mesh"),
        n_devices=cfg.num_devices,
        submesh_devices=int(os.environ.get("AICG_SUBMESH_DEVICES", "1")),
        model_parallel=cfg.model_parallel,
        workers=workers,
        runtime=runtime,
        stem_cache=stem_cache,
    )
