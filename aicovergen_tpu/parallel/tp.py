"""Tensor-parallel ("model"-axis) parameter placement for the SERVING path.

Data parallelism alone leaves chips idle on short songs: a 30 s cover has
only a handful of MDX chunks / VC segments, so a v4-8 serving a single song
runs at single-chip latency.  Sharding the wide matmuls of HuBERT and the
RVC text encoder over the mesh "model" axis (SURVEY §2.2: "optional TP
sharding of the HuBERT encoder ... for latency") lets those layers use every
chip even at batch 1.

The scheme is the Megatron column/row split expressed purely through
parameter shardings — GSPMD inserts the all-reduces:

  * attention q/k/v and FFN-in weights  : split the OUTPUT dim ("column"),
    biases along;
  * attention out and FFN-out weights   : split the INPUT dim ("row") —
    the following add triggers one psum per block;
  * everything else (convs, norms, embeddings, the NSF decoder) replicated.

The NSF-HiFiGAN decoder and MDX conv-TDF stay replicated: their time axis is
already data-parallel (chunk/segment batches), and channel-sharded small
convs lose more to collectives than they gain on the MXU.

`linear()` weights are torch-convention (out, in); the text encoder's
conv1d weights are OIH (out, in, 1) — rules below mirror
parallel/train.py:_tp_param_spec, which trains with the same layout.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def hubert_tp_spec(path: str) -> P:
    """TP rules for the HuBERT-base tree (models/hubert.py naming)."""
    if ".attention." in path:
        for proj in ("q_proj", "k_proj", "v_proj"):
            if f".{proj}.weight" in path:
                return P("model", None)
            if f".{proj}.bias" in path:
                return P("model")
        if ".out_proj.weight" in path:
            return P(None, "model")
    if ".feed_forward.intermediate_dense.weight" in path:
        return P("model", None)
    if ".feed_forward.intermediate_dense.bias" in path:
        return P("model")
    if ".feed_forward.output_dense.weight" in path:
        return P(None, "model")
    return P()


def _tp_param_spec(path_parts, value) -> P:
    """Tensor-parallel sharding rules for the synthesizer tree: shard the
    text-encoder FFN hidden dim and attention projections over "model".
    Lives here (not parallel/train.py) so the serving path never imports
    the trainer's optax dependency; the trainer imports these same rules,
    so a train->serve handoff keeps placements."""
    path = ".".join(path_parts)
    if ".ffn_layers." in path and path.endswith("conv_1.weight"):
        return P("model", None, None)
    if ".ffn_layers." in path and path.endswith("conv_1.bias"):
        return P("model")
    if ".ffn_layers." in path and path.endswith("conv_2.weight"):
        return P(None, "model", None)
    if ".attn_layers." in path and any(
        path.endswith(f"conv_{c}.weight") for c in "qkv"
    ):
        return P("model", None, None)
    if ".attn_layers." in path and any(path.endswith(f"conv_{c}.bias") for c in "qkv"):
        return P("model")
    return P()


def synth_tp_spec(path: str) -> P:
    """TP rules for the RVC synthesizer tree (same rules the distributed
    trainer uses)."""
    return _tp_param_spec(tuple(path.split(".")), None)


def tp_place(params: dict, mesh: Mesh, rule) -> dict:
    """device_put a parameter tree onto `mesh` with per-leaf specs from
    `rule(dot_path) -> PartitionSpec`; P() leaves replicate."""

    def walk(node, parts):
        if isinstance(node, dict):
            return {k: walk(v, parts + (k,)) for k, v in node.items()}
        return NamedSharding(mesh, rule(".".join(parts)))

    return jax.device_put(params, walk(params, ()))


def mesh_model_parallel(mesh) -> int:
    """Width of the "model" axis of a mesh (1 when absent or no mesh)."""
    if mesh is None:
        return 1
    try:
        return int(mesh.shape.get("model", 1))
    except AttributeError:
        return 1
