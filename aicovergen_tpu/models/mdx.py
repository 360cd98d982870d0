"""ONNX graph -> JAX executor (the MDX-Net frontend).

The MDX separation architecture exists only inside UVR .onnx checkpoints —
the reference runs them as a black box through ONNX Runtime
(reference src/mdx.py:74-77).  Rather than hard-coding one architecture,
this module *traces* the ONNX graph with jnp ops: the whole net becomes a
single XLA program that fuses with the surrounding STFT/iSTFT
(pipeline/separate.py), runs on the MXU, and shards like any other JAX
computation.

Shape-carrying subgraphs (Shape -> Gather -> Concat -> Reshape chains) are
evaluated with concrete numpy at trace time, so dynamic-shape ops never
reach the device.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..convert.onnx_proto import OnnxGraph, OnnxNode, read_onnx


def _is_np(*vals) -> bool:
    return all(isinstance(v, (np.ndarray, np.generic, int, float)) for v in vals)


def _pads_to_jax(pads: List[int], ndims_spatial: int):
    # onnx pads: [x1_begin, x2_begin, ..., x1_end, x2_end, ...]
    return [(pads[i], pads[i + ndims_spatial]) for i in range(ndims_spatial)]


def _conv(node: OnnxNode, x, w, b=None):
    spatial = w.ndim - 2
    strides = tuple(node.attr("strides", [1] * spatial))
    dilations = tuple(node.attr("dilations", [1] * spatial))
    group = node.attr("group", 1)
    pads = node.attr("pads", [0] * (2 * spatial))
    auto_pad = node.attr("auto_pad", b"NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
        # explicit per-dim pads: lax's "SAME" is SAME_UPPER only — for odd
        # total padding SAME_LOWER puts the extra sample at the *beginning*
        padding = []
        for i in range(spatial):
            eff_k = (w.shape[2 + i] - 1) * dilations[i] + 1
            out_i = -(-x.shape[2 + i] // strides[i])
            total = max((out_i - 1) * strides[i] + eff_k - x.shape[2 + i], 0)
            lo = total // 2 if auto_pad == "SAME_UPPER" else total - total // 2
            padding.append((lo, total - lo))
    elif auto_pad == "VALID":
        padding = [(0, 0)] * spatial
    else:
        padding = _pads_to_jax(list(pads), spatial)
    dn_in = "NC" + "HWD"[:spatial]
    dn = (dn_in, "OI" + "HWD"[:spatial], dn_in)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilations,
        dimension_numbers=dn,
        feature_group_count=group,
    )
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * spatial)
    return y


def _conv_transpose(node: OnnxNode, x, w, b=None):
    spatial = w.ndim - 2
    strides = tuple(node.attr("strides", [1] * spatial))
    pads = list(node.attr("pads", [0] * (2 * spatial)))
    out_pads = list(node.attr("output_padding", [0] * spatial))
    group = node.attr("group", 1)
    # attributes this lowering does not model must be loud, not silently
    # dropped (matching the catch-all NotImplementedError policy elsewhere)
    dilations = node.attr("dilations", None)
    if dilations is not None and any(d != 1 for d in dilations):
        raise NotImplementedError(f"ConvTranspose dilations={list(dilations)}")
    if node.attr("output_shape", None) is not None:
        raise NotImplementedError("ConvTranspose output_shape attribute")
    auto_pad = node.attr("auto_pad", b"NOTSET")
    auto_pad = auto_pad.decode() if isinstance(auto_pad, bytes) else auto_pad
    if auto_pad != "NOTSET":
        raise NotImplementedError(f"ConvTranspose auto_pad={auto_pad}")
    k = w.shape[2:]
    w = jnp.flip(w, axis=tuple(range(2, w.ndim)))
    if group == 1:
        w = w.swapaxes(0, 1)
    else:
        # onnx ConvTranspose weight is (C_in, C_out/g, kH, kW); a grouped
        # transposed conv is a grouped dilated conv whose per-group kernels
        # are transposed: regroup to (C_out, C_in/g, kH, kW).
        cin, cout_g = w.shape[0], w.shape[1]
        w = w.reshape((group, cin // group, cout_g) + k)
        w = w.swapaxes(1, 2).reshape((group * cout_g, cin // group) + k)
    padding = [
        (k[i] - 1 - pads[i], k[i] - 1 - pads[i + spatial] + out_pads[i])
        for i in range(spatial)
    ]
    dn_in = "NC" + "HWD"[:spatial]
    dn = (dn_in, "OI" + "HWD"[:spatial], dn_in)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,) * spatial, padding=padding,
        lhs_dilation=strides, dimension_numbers=dn,
        feature_group_count=group,
    )
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * spatial)
    return y


def _pool(node: OnnxNode, x, mode: str):
    kernel = tuple(node.attr("kernel_shape"))
    spatial = len(kernel)
    strides = tuple(node.attr("strides", kernel))
    pads = node.attr("pads", [0] * (2 * spatial))
    window = (1, 1) + kernel
    strides_full = (1, 1) + strides
    padding = [(0, 0), (0, 0)] + _pads_to_jax(list(pads), spatial)
    if mode == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, strides_full, padding)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides_full, padding)
    if node.attr("count_include_pad", 0) or not any(p for p in pads):
        return summed / np.prod(kernel)
    ones = jnp.ones_like(x)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides_full, padding)
    return summed / counts


def _resize(node: OnnxNode, inputs):
    x = inputs[0]
    mode = node.attr("mode", b"nearest")
    if isinstance(mode, bytes):
        mode = mode.decode()
    ctm = node.attr("coordinate_transformation_mode", b"half_pixel")
    if isinstance(ctm, bytes):
        ctm = ctm.decode()
    scales = None
    sizes = None
    if len(inputs) >= 3 and inputs[2] is not None and np.size(inputs[2]):
        scales = np.asarray(inputs[2])
    if len(inputs) >= 4 and inputs[3] is not None and np.size(inputs[3]):
        sizes = np.asarray(inputs[3]).astype(int)
    if sizes is None:
        # onnx spec: output size = floor(input * scale), NOT round
        sizes = [int(np.floor(s * d)) for s, d in zip(scales, x.shape)]
    if mode == "nearest":
        # every common convention (asymmetric+floor — torch's export —,
        # half_pixel with any rounding) selects src = floor(dst/s) when the
        # scale is a whole upsampling factor, which is what jax.image.resize
        # computes; reject the cases where conventions genuinely diverge
        integer_scale = all(o % i == 0 for i, o in zip(x.shape, sizes))
        if ctm == "align_corners" or not integer_scale:
            raise NotImplementedError(
                f"Resize nearest with ctm={ctm}, sizes={sizes} vs {x.shape}"
            )
    elif ctm not in ("half_pixel", "pytorch_half_pixel"):
        # jax.image.resize linear/cubic sample at half-pixel centers
        raise NotImplementedError(f"Resize {mode} with ctm={ctm}")
    method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}[mode]
    return jax.image.resize(x, tuple(sizes), method=method)


def _slice(node: OnnxNode, inputs):
    x = inputs[0]
    if len(inputs) > 1:  # opset >= 10: tensors
        starts = np.asarray(inputs[1]).tolist()
        ends = np.asarray(inputs[2]).tolist()
        axes = (
            np.asarray(inputs[3]).tolist() if len(inputs) > 3 and inputs[3] is not None
            else list(range(len(starts)))
        )
        steps = (
            np.asarray(inputs[4]).tolist() if len(inputs) > 4 and inputs[4] is not None
            else [1] * len(starts)
        )
    else:
        starts = list(node.attr("starts"))
        ends = list(node.attr("ends"))
        axes = list(node.attr("axes", list(range(len(starts)))))
        steps = [1] * len(starts)
    slices = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        dim = x.shape[ax]
        en = min(en, dim) if en >= 0 else en
        slices[ax] = slice(int(st), int(en), int(sp))
    return x[tuple(slices)]


def _inline_identities(graph: OnnxGraph) -> OnnxGraph:
    """Graph pass: drop Identity nodes, rewiring consumers to the source
    name.  torch.onnx.export routes deduplicated initializers (e.g. BN
    running stats) through Identity, which would otherwise hide them from
    the conv+BN fusion pass."""
    alias: Dict[str, str] = {}
    for node in graph.nodes:
        if node.op_type == "Identity" and node.outputs[0] not in graph.outputs:
            src = node.inputs[0]
            alias[node.outputs[0]] = alias.get(src, src)
    if not alias:
        return graph
    graph.nodes = [
        n for n in graph.nodes
        if not (n.op_type == "Identity" and n.outputs[0] in alias)
    ]
    for node in graph.nodes:
        node.inputs = [alias.get(i, i) for i in node.inputs]
    return graph


def _fuse_conv_bn(graph: OnnxGraph) -> OnnxGraph:
    """Graph pass: fold BatchNormalization into a preceding Conv/ConvTranspose
    when the conv output feeds only the BN (BN broadcasts are ~100x slower
    than fused conv bias on the measured TPU backend)."""
    from ..convert.bn_fold import fold_conv_bn

    consumers: Dict[str, int] = {}
    for node in graph.nodes:
        for name in node.inputs:
            consumers[name] = consumers.get(name, 0) + 1
    for out in graph.outputs:
        consumers[out] = consumers.get(out, 0) + 1

    producer = {}
    for node in graph.nodes:
        for out in node.outputs:
            producer[out] = node

    inits = dict(graph.initializers)
    drop = set()
    for node in graph.nodes:
        if node.op_type != "BatchNormalization":
            continue
        src = producer.get(node.inputs[0])
        if src is None or src.op_type not in ("Conv", "ConvTranspose"):
            continue
        if consumers.get(node.inputs[0], 0) != 1:
            continue
        wname = src.inputs[1]
        if wname not in inits or any(
            n not in inits for n in node.inputs[1:5]
        ):
            continue
        conv_p = {"weight": inits[wname]}
        if len(src.inputs) > 2 and src.inputs[2] in inits:
            conv_p["bias"] = inits[src.inputs[2]]
        bn_p = {
            "weight": inits[node.inputs[1]],
            "bias": inits[node.inputs[2]],
            "running_mean": inits[node.inputs[3]],
            "running_var": inits[node.inputs[4]],
        }
        folded = fold_conv_bn(
            conv_p, bn_p, eps=node.attr("epsilon", 1e-5),
            transpose=src.op_type == "ConvTranspose",
        )
        # unique per BN node: torch.onnx.export dedups equal initializers, so
        # two convs can share one weight name — keying the fold on the weight
        # alone would let the second fusion overwrite the first conv's folded
        # tensors with this BN's stats
        uniq = node.outputs[0]
        new_w = f"{wname}__bnfold__{uniq}"
        new_b = f"{wname}__bnfold_bias__{uniq}"
        inits[new_w] = folded["weight"]
        inits[new_b] = folded["bias"]
        src.inputs = [src.inputs[0], new_w, new_b]
        src.outputs = list(node.outputs)  # conv now produces the BN's output
        drop.add(id(node))

    graph.nodes = [n for n in graph.nodes if id(n) not in drop]
    graph.initializers = inits
    return graph


class OnnxExecutor:
    """Callable: feed dict or single array -> output array(s).

    For jit use, call ``apply(weights, x)`` with ``weights`` (see the
    `.weights` attribute) passed as a jit *argument* — closed-over weights
    get embedded into the HLO as literals, which explodes compile time and
    can exceed remote-compiler request limits.
    """

    def __init__(self, graph: OnnxGraph, fuse: bool = True):
        if fuse:
            graph = _fuse_conv_bn(_inline_identities(graph))
        self.graph = graph
        self.initializers = {k: v for k, v in graph.initializers.items()}
        # split: large float tensors travel as jit args; small/int metadata
        # tensors (shape math, slice indices) stay concrete for tracing
        self.weights = {
            k: v
            for k, v in self.initializers.items()
            if v.dtype in (np.float32, np.float16, np.float64) and v.size > 64
        }
        self._static = {k: v for k, v in self.initializers.items() if k not in self.weights}

    def cast(self, dtype) -> Dict[str, object]:
        """Cast every float initializer (large weights AND small static
        tensors like biases) to `dtype` so the whole graph computes in one
        dtype; int/shape metadata stays concrete.  Returns the cast weights
        dict (pass it to apply())."""
        import jax.numpy as jnp

        np_dtype = jnp.dtype(dtype)  # ml_dtypes-backed numpy dtype (bf16 ok)

        def c(v):
            v = np.asarray(v)
            return v.astype(np_dtype) if np.issubdtype(v.dtype, np.floating) else v

        # cast on HOST so the device upload ships the narrow dtype (half the
        # bytes through a remote-TPU tunnel), not f32-then-cast-on-device.
        # Always cast FROM the pristine initializers: recasting the previous
        # cast (bf16 -> f32) would keep the truncated mantissas
        self._static = {k: c(self.initializers[k]) for k in self._static}
        self.weights = {k: c(self.initializers[k]) for k in self.weights}
        return self.weights

    def apply(self, weights: Dict[str, object], *args):
        graph = self.graph
        env: Dict[str, object] = dict(self._static)
        env.update(weights)
        if len(args) == 1 and not isinstance(args[0], dict):
            env[graph.inputs[0]] = args[0]
        else:
            feed = args[0] if isinstance(args[0], dict) else {}
            env.update(feed)
        return self._execute(env)

    def __call__(self, *args):
        graph = self.graph
        env: Dict[str, object] = dict(self.initializers)
        if len(args) == 1 and not isinstance(args[0], dict):
            env[graph.inputs[0]] = args[0]
        else:
            feed = args[0] if isinstance(args[0], dict) else {}
            env.update(feed)
        return self._execute(env)

    def trace(self, x) -> Dict[str, object]:
        """Eager per-node activation trace: run the graph once and return
        {tensor_name: value} for EVERY node output (not just the graph
        outputs).  Exists for the asset-gated real-checkpoint validation
        (tests/test_real_uvr.py): the conv-TDF architecture lives only
        inside the UVR .onnx files (reference src/mdx.py:74-77 runs them as
        a black box), so when a real checkpoint is present each intermediate
        is compared against onnxruntime layer by layer."""
        graph = self.graph
        env: Dict[str, object] = dict(self.initializers)
        env[graph.inputs[0]] = x
        record: Dict[str, object] = {}
        self._execute(env, record=record)
        return record

    def _execute(self, env: Dict[str, object], record: Optional[dict] = None):
        graph = self.graph
        for node in graph.nodes:
            # "" marks an omitted optional input (onnx convention) -> None;
            # a NAMED tensor that is missing must raise, not silently become
            # None (Conv/Gemm would read that as "no bias" and compute wrong)
            ins = []
            for n in node.inputs:
                if not n:
                    ins.append(None)
                elif n in env:
                    ins.append(env[n])
                else:
                    raise KeyError(
                        f"tensor {n!r} required by {node.op_type} "
                        f"{node.outputs[:1]} is not an initializer, feed, or "
                        "produced output"
                    )
            outs = self._run_node(node, ins)
            for name, val in zip(node.outputs, outs):
                env[name] = val
                if record is not None:
                    record[name] = val
        results = [env[o] for o in graph.outputs]
        return results[0] if len(results) == 1 else tuple(results)

    # ------------------------------------------------------------------ ops
    def _run_node(self, node: OnnxNode, ins):
        op = node.op_type
        x = ins[0] if ins else None
        if op == "Conv":
            return [_conv(node, x, ins[1], ins[2] if len(ins) > 2 else None)]
        if op == "ConvTranspose":
            return [_conv_transpose(node, x, ins[1], ins[2] if len(ins) > 2 else None)]
        if op == "BatchNormalization":
            scale, bias, mean, var = ins[1], ins[2], ins[3], ins[4]
            eps = node.attr("epsilon", 1e-5)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            # fold to y = x*k + b with k,b in f32, then cast to the activation
            # dtype: keeps rsqrt precise AND avoids numpy's ml_dtypes
            # promotion (np bf16 + python float -> f32) leaking f32 into a
            # bf16 graph when the BN params are trace-time numpy
            f32 = jnp.float32
            k = jnp.asarray(scale, f32) * jax.lax.rsqrt(jnp.asarray(var, f32) + eps)
            b = jnp.asarray(bias, f32) - jnp.asarray(mean, f32) * k
            dt = x.dtype
            return [x * k.reshape(shape).astype(dt) + b.reshape(shape).astype(dt)]
        if op == "InstanceNormalization":
            eps = node.attr("epsilon", 1e-5)
            axes = tuple(range(2, x.ndim))
            mean = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.var(x, axis=axes, keepdims=True)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            return [
                (x - mean) * jax.lax.rsqrt(var + eps) * ins[1].reshape(shape)
                + ins[2].reshape(shape)
            ]
        if op == "GroupNormalization":
            # opset 18+ native form (older torch exports decompose to
            # Reshape+InstanceNormalization+Reshape+Mul+Add, also supported)
            eps = node.attr("epsilon", 1e-5)
            groups = node.attr("num_groups")
            b, c = x.shape[0], x.shape[1]
            xg = x.reshape((b, groups, -1))
            mean = jnp.mean(xg, axis=2, keepdims=True)
            var = jnp.var(xg, axis=2, keepdims=True)
            xg = (xg - mean) * jax.lax.rsqrt(var + eps)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            return [
                xg.reshape(x.shape) * ins[1].reshape(shape) + ins[2].reshape(shape)
            ]
        if op == "Relu":
            return [jnp.maximum(x, 0)]
        if op == "LeakyRelu":
            alpha = node.attr("alpha", 0.01)
            return [jnp.where(x >= 0, x, x * alpha)]
        if op == "PRelu":
            slope = ins[1]
            if slope.ndim < x.ndim and slope.ndim >= 1:
                slope = slope.reshape((1, -1) + (1,) * (x.ndim - 2))
            return [jnp.where(x >= 0, x, x * slope)]
        if op == "Elu":
            alpha = node.attr("alpha", 1.0)
            return [jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1))]
        if op == "Sigmoid":
            return [jax.nn.sigmoid(x)]
        if op == "Tanh":
            return [jnp.tanh(x)]
        if op == "Softmax":
            return [jax.nn.softmax(x, axis=node.attr("axis", -1))]
        if op == "Clip":
            lo = ins[1] if len(ins) > 1 and ins[1] is not None else node.attr("min", -np.inf)
            hi = ins[2] if len(ins) > 2 and ins[2] is not None else node.attr("max", np.inf)
            return [jnp.clip(x, lo, hi)]
        if op in ("Add", "Sub", "Mul", "Div", "Pow"):
            a, b = ins[0], ins[1]
            fn = {
                "Add": lambda u, v: u + v,
                "Sub": lambda u, v: u - v,
                "Mul": lambda u, v: u * v,
                "Div": lambda u, v: u / v,
                "Pow": lambda u, v: u**v,
            }[op]
            if _is_np(a, b):
                return [np.asarray(fn(np.asarray(a), np.asarray(b)))]
            return [fn(a, b)]
        if op in ("Exp", "Log", "Sqrt", "Neg", "Abs", "Reciprocal", "Erf",
                  "Sin", "Cos", "Floor", "Ceil", "Round", "Softplus"):
            fn = {
                "Exp": jnp.exp, "Log": jnp.log, "Sqrt": jnp.sqrt, "Neg": jnp.negative,
                "Abs": jnp.abs, "Reciprocal": lambda v: 1.0 / v,
                "Erf": jax.scipy.special.erf,
                "Sin": jnp.sin, "Cos": jnp.cos, "Floor": jnp.floor,
                "Ceil": jnp.ceil, "Round": jnp.round, "Softplus": jax.nn.softplus,
            }[op]
            return [fn(x)]
        if op == "Mod":
            # fmod=0 (python-style modulo, the torch % export default)
            if node.attr("fmod", 0):
                return [jnp.fmod(ins[0], ins[1])]
            return [jnp.mod(ins[0], ins[1])]
        if op == "CumSum":
            axis = int(np.asarray(ins[1]))
            assert not node.attr("exclusive", 0) and not node.attr("reverse", 0)
            return [jnp.cumsum(x, axis=axis)]
        if op == "Where":
            return [jnp.where(ins[0], ins[1], ins[2])]
        if op in ("Less", "Greater", "LessOrEqual", "GreaterOrEqual", "Equal"):
            fn = {
                "Less": jnp.less, "Greater": jnp.greater,
                "LessOrEqual": jnp.less_equal, "GreaterOrEqual": jnp.greater_equal,
                "Equal": jnp.equal,
            }[op]
            a, b = ins[0], ins[1]
            if _is_np(a, b):
                return [np.asarray(fn(np.asarray(a), np.asarray(b)))]
            return [fn(a, b)]
        if op == "Not":
            return [jnp.logical_not(x)]
        if op == "Expand":
            target = [int(v) for v in np.asarray(ins[1]).tolist()]
            shape = list(jnp.broadcast_shapes(tuple(x.shape), tuple(target)))
            return [jnp.broadcast_to(x, shape)]
        if op == "Range":
            start, limit, delta = (np.asarray(v).item() for v in ins[:3])
            return [np.arange(start, limit, delta)]
        if op in ("ReduceMax", "ReduceMin"):
            axes = node.attr("axes")
            if len(ins) > 1 and ins[1] is not None:
                axes = np.asarray(ins[1]).tolist()
            axes = tuple(int(a) for a in axes) if axes is not None else None
            keep = bool(node.attr("keepdims", 1))
            fn = jnp.max if op == "ReduceMax" else jnp.min
            return [fn(x, axis=axes, keepdims=keep)]
        if op == "MatMul":
            return [jnp.matmul(ins[0], ins[1])]
        if op == "Gemm":
            a, b = ins[0], ins[1]
            if node.attr("transA", 0):
                a = a.T
            if node.attr("transB", 0):
                b = b.T
            y = node.attr("alpha", 1.0) * jnp.matmul(a, b)
            if len(ins) > 2 and ins[2] is not None:
                y = y + node.attr("beta", 1.0) * ins[2]
            return [y]
        if op == "Concat":
            axis = node.attr("axis")
            vals = [v for v in ins if v is not None]
            if _is_np(*vals):
                return [np.concatenate([np.atleast_1d(np.asarray(v)) for v in vals], axis=axis)]
            return [jnp.concatenate(vals, axis=axis)]
        if op == "Split":
            axis = node.attr("axis", 0)
            if len(ins) > 1 and ins[1] is not None:
                sizes = np.asarray(ins[1]).tolist()
            else:
                sizes = node.attr("split")
                if sizes is None:
                    n = len(node.outputs)
                    sizes = [x.shape[axis] // n] * n
            idx = np.cumsum(sizes)[:-1].tolist()
            return list(jnp.split(x, idx, axis=axis))
        if op == "Transpose":
            perm = node.attr("perm")
            return [jnp.transpose(x, perm)]
        if op == "Reshape":
            target = [int(v) for v in np.asarray(ins[1]).tolist()]
            # onnx: 0 copies the input dim (unless allowzero)
            if not node.attr("allowzero", 0):
                target = [x.shape[i] if t == 0 else t for i, t in enumerate(target)]
            return [jnp.reshape(x, target) if not _is_np(x) else np.reshape(x, target)]
        if op == "Squeeze":
            axes = (
                np.asarray(ins[1]).tolist()
                if len(ins) > 1 and ins[1] is not None
                else node.attr("axes")
            )
            if axes is None:
                return [jnp.squeeze(x)]
            return [jnp.squeeze(x, axis=tuple(int(a) for a in axes))]
        if op == "Unsqueeze":
            axes = (
                np.asarray(ins[1]).tolist()
                if len(ins) > 1 and ins[1] is not None
                else node.attr("axes")
            )
            y = x
            for a in sorted(int(v) for v in axes):
                y = jnp.expand_dims(y, a) if not _is_np(y) else np.expand_dims(y, a)
            return [y]
        if op == "Pad":
            mode = node.attr("mode", b"constant")
            if isinstance(mode, bytes):
                mode = mode.decode()
            pads = (
                np.asarray(ins[1]).tolist() if len(ins) > 1 and ins[1] is not None
                else node.attr("pads")
            )
            value = 0.0
            if len(ins) > 2 and ins[2] is not None:
                value = float(np.asarray(ins[2]))
            half = len(pads) // 2
            widths = [(pads[i], pads[i + half]) for i in range(half)]
            jmode = {"constant": "constant", "reflect": "reflect", "edge": "edge"}[mode]
            if jmode == "constant":
                return [jnp.pad(x, widths, mode=jmode, constant_values=value)]
            return [jnp.pad(x, widths, mode=jmode)]
        if op == "Gather":
            axis = node.attr("axis", 0)
            indices = ins[1]
            if _is_np(x, indices):
                return [np.take(np.asarray(x), np.asarray(indices).astype(int), axis=axis)]
            return [jnp.take(x, jnp.asarray(indices), axis=axis)]
        if op == "Shape":
            shape = np.asarray(np.shape(x), np.int64)
            return [shape]
        if op == "Cast":
            to = node.attr("to")
            from ..convert.onnx_proto import _DTYPE_MAP

            dtype = _DTYPE_MAP[to]
            if _is_np(x):
                return [np.asarray(x).astype(dtype)]
            return [x.astype(dtype)]
        if op == "Constant":
            val = node.attr("value")
            return [np.asarray(val)]
        if op == "ConstantOfShape":
            val = node.attr("value")
            fill = float(np.asarray(val).reshape(-1)[0]) if val is not None else 0.0
            shape = tuple(int(v) for v in np.asarray(x).tolist())
            return [np.full(shape, fill, np.float32 if val is None else np.asarray(val).dtype)]
        if op == "Identity":
            return [x]
        if op == "Flatten":
            axis = node.attr("axis", 1)
            lead = int(np.prod(x.shape[:axis])) if axis > 0 else 1
            return [jnp.reshape(x, (lead, -1))]
        if op in ("AveragePool", "MaxPool"):
            return [_pool(node, x, "avg" if op == "AveragePool" else "max")]
        if op == "GlobalAveragePool":
            return [jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)]
        if op in ("Resize", "Upsample"):
            if op == "Upsample" and len(ins) > 1:
                ins = [ins[0], None, ins[1]]
            return [_resize(node, ins)]
        if op == "Slice":
            return [_slice(node, ins)]
        if op == "ReduceMean":
            axes = node.attr("axes")
            keep = bool(node.attr("keepdims", 1))
            return [jnp.mean(x, axis=tuple(axes) if axes else None, keepdims=keep)]
        if op == "ReduceSum":
            axes = (
                np.asarray(ins[1]).tolist() if len(ins) > 1 and ins[1] is not None
                else node.attr("axes")
            )
            keep = bool(node.attr("keepdims", 1))
            return [jnp.sum(x, axis=tuple(axes) if axes else None, keepdims=keep)]
        raise NotImplementedError(f"ONNX op not implemented: {op} (node {node.name})")


def load_mdx_model(path: str) -> Callable:
    """Parse an MDX .onnx checkpoint into a traceable callable
    (B, 4, dim_f, dim_t) -> (B, 4, dim_f, dim_t)."""
    graph = read_onnx(path)
    return OnnxExecutor(graph)
