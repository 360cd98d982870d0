"""Device-mesh utilities: the framework's communication backend.

The reference is a single-process single-GPU app with thread-level chunk
parallelism (reference src/mdx.py:201-235); here parallel execution is
expressed through `jax.sharding` over a named mesh and XLA collectives ride
the ICI:

  * axis "data"  — batch/chunk data parallelism (MDX chunk batches, VC
    segment batches, concurrent songs, training batches);
  * axis "model" — tensor parallelism for the wide matmuls (attention QKV /
    FFN of the text encoder and HuBERT) via GSPMD sharding constraints.

All helpers degrade gracefully to a single device.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        platforms = sorted({d.platform for d in devices})
        raise RuntimeError(
            f"make_mesh needs {n} devices but jax.devices() has only "
            f"{len(devices)} on platform(s) {platforms}; for a simulated mesh "
            "set jax.config.update('jax_platforms','cpu') and "
            "jax.config.update('jax_num_cpu_devices', n) before any jax op"
        )
    devices = devices[:n]
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def submesh(devices, model_parallel: int = 1) -> Mesh:
    """Mesh over an EXPLICIT device subset — the job-per-submesh serving
    posture partitions the host's devices into independent lanes
    (parallel/serving.py), each lane owning one of these meshes."""
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def shard_batch(x, mesh: Mesh):
    """Place an array with its leading axis split across "data"."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Zero-pad the leading axis so it divides the data-parallel width.
    Returns (padded, original_length)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths), n


def serving_mesh(
    num_devices: Optional[int] = None, model_parallel: int = 1
) -> Optional[Mesh]:
    """Mesh for the serving path: all (or num_devices) visible devices,
    arranged (data = n/model_parallel, model = model_parallel); None on a
    single device.  Entry points call this so multi-chip hosts shard MDX
    chunk batches and VC segment batches over "data" automatically, and —
    with model_parallel > 1 (AICG_MODEL_PARALLEL) — run the HuBERT /
    text-encoder matmuls tensor-parallel over "model" for single-song
    latency (SURVEY §2.2; parallel/tp.py)."""
    n = len(jax.devices())
    want = min(num_devices or n, n)
    if want <= 1:
        return None
    mp = max(1, model_parallel)
    if want % mp:
        raise ValueError(
            f"model_parallel={mp} does not divide the {want}-device serving mesh"
        )
    return make_mesh(want, model_parallel=mp)


def serving_mesh_from_config() -> Optional[Mesh]:
    """serving_mesh() with widths from the env-tiered RuntimeConfig
    (AICG_NUM_DEVICES / AICG_MODEL_PARALLEL) — the one constructor every
    serving entry point (CLI, web UI, Predictor) shares."""
    from ..utils.config import default_config

    cfg = default_config()
    return serving_mesh(cfg.num_devices, cfg.model_parallel)


def make_chunk_sharder(mesh: Optional[Mesh]):
    """Sharding hook for pipeline.separate.make_chunk_runner: places each
    chunk batch across the "data" axis."""
    if mesh is None:
        return None

    def shard(x):
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    # consumers that need a mesh-aware program (pipeline.vc._assemble_sharded)
    # recover the mesh from the hook instead of widening every signature
    shard.mesh = mesh
    return shard
