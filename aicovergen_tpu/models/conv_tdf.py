"""Conv-TDF (KUIELab/UVR MDX-Net) replica graph builder.

The reference treats the MDX separation nets as a black box behind
onnxruntime (reference src/mdx.py:74-77); the architecture — the published
KUIELab Conv_TDF_net family (Kim & Choi, "KUIELab-MDX-Net"): a first 1x1
conv, a transpose so frequency is the LAST axis, per-scale TFC-TDF blocks
(l x [3x3 Conv + BN + ReLU] plus a residual frequency-bottleneck Linear
pair with channel BatchNorms), strided-conv down / ConvTranspose up scaling
with MULTIPLICATIVE skip connections, and a final 1x1 conv — lives only
inside the shipped ``.onnx`` files.

This module reconstructs that topology as an ONNX wire-format graph (via
convert/onnx_proto.write_onnx) node-for-node matching what
``torch.onnx.export`` emits for the same torch modules
(scripts/make_mdx_torch_export.py holds the torch twin and the committed
exporter-output fixture), so that

  * tests prove the OnnxExecutor covers the full op set the real UVR
    checkpoints use (Conv/ConvTranspose/BatchNormalization/Relu/MatMul/Add/
    Mul/Transpose — a graph the executor cannot trace fails loudly, the
    same way ``UVR-MDX-NET-Voc_FT.onnx`` would);
  * bench.py runs separation at the real checkpoint dimensions
    (model_data.json: Voc_FT dim_f 3072, dim_t 2^8, n_fft 7680) with the
    published network's FLOPs/memory profile on synthetic weights.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class ConvTDFSpec:
    """Voc_FT-class defaults (KUIELab vocal model scale)."""

    dim_f: int = 3072
    dim_t: int = 256
    in_ch: int = 4  # stereo real/imag packing (reference src/mdx.py:37-43)
    g: int = 32  # channel growth per scale
    n_scales: int = 5  # encoder/decoder depth (num_blocks = 2*n_scales + 1)
    tfc: int = 2  # 3x3 convs per TFC block
    bn_factor: int = 8  # TDF bottleneck ratio


def build_conv_tdf_onnx(path: str, spec: ConvTDFSpec = ConvTDFSpec(), seed: int = 0) -> None:
    """Write a published-topology conv-TDF U-Net with random weights as an
    .onnx file.  Working layout after the first conv is (B, C, T, F) — the
    TDF MatMul acts on the trailing frequency axis."""
    rng = np.random.default_rng(seed)
    nodes = []
    init = {}
    uid = [0]

    def name(tag):
        uid[0] += 1
        return f"{tag}_{uid[0]}"

    def tensor(tag, shape, scale=None):
        n = name(tag)
        if scale is None:
            fan_in = int(np.prod(shape[1:])) or 1
            scale = 1.0 / np.sqrt(fan_in)
        init[n] = (rng.standard_normal(shape) * scale).astype(np.float32)
        return n

    def conv(x, cin, cout, k=3, stride=1, pad=None):
        w = tensor("w", (cout, cin, k, k))
        b = tensor("b", (cout,), 0.0)
        out = name("conv")
        pad = (k - 1) // 2 if pad is None else pad
        nodes.append(
            (
                "Conv",
                [x, w, b],
                [out],
                {
                    "kernel_shape": [k, k],
                    "strides": [stride, stride],
                    "pads": [pad, pad, pad, pad],
                },
            )
        )
        return out

    def bn(x, c):
        s = tensor("bn_s", (c,), 0.2)
        init[s] += 1.0
        b = tensor("bn_b", (c,), 0.1)
        m = tensor("bn_m", (c,), 0.1)
        v = tensor("bn_v", (c,), 0.0)
        init[v] = np.abs(init[v]) + 1.0
        out = name("bn")
        nodes.append(("BatchNormalization", [x, s, b, m, v], [out], {"epsilon": 1e-5}))
        return out

    def relu(x):
        out = name("relu")
        nodes.append(("Relu", [x], [out], {}))
        return out

    def linear(x, fin, fout):
        """nn.Linear on the trailing axis, as torch exports it: MatMul+Add."""
        w = tensor("tdf_w", (fin, fout))
        h = name("mm")
        nodes.append(("MatMul", [x, w], [h], {}))
        b = tensor("tdf_b", (fout,), 0.0)
        out = name("add")
        nodes.append(("Add", [h, b], [out], {}))
        return out

    def tfc_tdf(x, c, f, n_convs):
        """l x (3x3 conv + BN + ReLU), then a residual frequency bottleneck:
        x + ReLU(BN(Linear(ReLU(BN(Linear(x))))))."""
        h = x
        for _ in range(n_convs):
            h = relu(bn(conv(h, c, c), c))
        bf = max(f // spec.bn_factor, 4)
        t = relu(bn(linear(h, f, bf), c))
        t = relu(bn(linear(t, bf, f), c))
        out = name("res")
        nodes.append(("Add", [h, t], [out], {}))
        return out

    def down(x, cin, cout):
        return relu(bn(conv(x, cin, cout, k=2, stride=2, pad=0), cout))

    def up(x, cin, cout):
        w = tensor("uw", (cin, cout, 2, 2))
        b = tensor("ub", (cout,), 0.0)
        out = name("convt")
        nodes.append(
            ("ConvTranspose", [x, w, b], [out], {"kernel_shape": [2, 2], "strides": [2, 2]})
        )
        return relu(bn(out, cout))

    # ---- graph (working layout (B, C, T, F) between the transposes) ----
    g = spec.g
    x = relu(bn(conv("input", spec.in_ch, g, k=1, pad=0), g))  # first 1x1
    t0 = name("tr")
    nodes.append(("Transpose", [x], [t0], {"perm": [0, 1, 3, 2]}))
    x = t0

    skips = []
    c, f = g, spec.dim_f
    for i in range(spec.n_scales):
        x = tfc_tdf(x, c, f, spec.tfc)
        skips.append(x)
        x = down(x, c, c + g)
        c += g
        f //= 2

    x = tfc_tdf(x, c, f, spec.tfc)  # bottleneck block

    for i in reversed(range(spec.n_scales)):
        x = up(x, c, c - g)
        c -= g
        f *= 2
        mul = name("skipmul")
        nodes.append(("Mul", [x, skips[i]], [mul], {}))
        x = tfc_tdf(mul, c, f, spec.tfc)

    t1 = name("tr")
    nodes.append(("Transpose", [x], [t1], {"perm": [0, 1, 3, 2]}))
    out = conv(t1, c, spec.in_ch, k=1, pad=0)
    nodes[-1] = (nodes[-1][0], nodes[-1][1], ["output"], nodes[-1][3])

    from ..convert.onnx_proto import write_onnx

    write_onnx(
        path,
        nodes,
        init,
        {"input": [None, spec.in_ch, spec.dim_f, spec.dim_t]},
        ["output"],
        graph_name="conv_tdf_unet",
    )
