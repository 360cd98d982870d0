"""Conv-TDF (KUIELab/UVR MDX-Net) replica graph builder.

The reference treats the MDX separation nets as a black box behind
onnxruntime (reference src/mdx.py:74-77); the architecture — a TFC-TDF U-Net
(Choi et al., "KUIELab-MDX-Net"): dense 3x3 conv blocks (TFC) with a linear
bottleneck over the frequency axis (TDF), strided-conv down/up scaling and
skip concats — lives only inside the shipped ``.onnx`` files.

This module reconstructs that architecture as an ONNX wire-format graph
(via convert/onnx_proto.write_onnx) so that

  * tests can prove the OnnxExecutor covers the full op set the real UVR
    checkpoints use (Conv/ConvTranspose/BatchNormalization/Relu/MatMul/Add/
    Concat/Transpose — a graph the executor cannot trace fails loudly, the
    same way ``UVR-MDX-NET-Voc_FT.onnx`` would);
  * bench.py can run separation at the real checkpoint dimensions
    (model_data.json: Voc_FT dim_f 3072, dim_t 2^8, n_fft 7680) with a
    realistic FLOPs/memory profile on synthetic weights.
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
    """Write a conv-TDF U-Net with random weights as an .onnx file."""
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

    def tfc(x, cin, cout, n_convs):
        """Time-frequency convolutions: n x (conv3x3 + BN + ReLU)."""
        h = x
        c = cin
        for _ in range(n_convs):
            h = relu(bn(conv(h, c, cout), cout))
            c = cout
        return h

    def tdf(x, c, f):
        """Time-distributed fully-connected over the frequency axis with a
        bottleneck, residual: x + W2(relu(W1 x_f))."""
        bf = max(f // spec.bn_factor, 4)
        t1 = name("tr")
        nodes.append(("Transpose", [x], [t1], {"perm": [0, 1, 3, 2]}))  # (B,C,T,F)
        w1 = tensor("tdf_w1", (f, bf))
        h = name("mm")
        nodes.append(("MatMul", [t1, w1], [h], {}))
        b1 = tensor("tdf_b1", (bf,), 0.0)
        ha = name("add")
        nodes.append(("Add", [h, b1], [ha], {}))
        hr = relu(ha)
        w2 = tensor("tdf_w2", (bf, f))
        h2 = name("mm")
        nodes.append(("MatMul", [hr, w2], [h2], {}))
        b2 = tensor("tdf_b2", (f,), 0.0)
        h2a = name("add")
        nodes.append(("Add", [h2, b2], [h2a], {}))
        t2 = name("tr")
        nodes.append(("Transpose", [h2a], [t2], {"perm": [0, 1, 3, 2]}))  # back (B,C,F,T)
        out = name("res")
        nodes.append(("Add", [x, t2], [out], {}))
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

    # ---- graph ----
    g = spec.g
    f = spec.dim_f
    x = relu(bn(conv("input", spec.in_ch, g, k=1, pad=0), g))  # first 1x1

    skips = []
    c = g
    for i in range(spec.n_scales):
        x = tfc(x, c, c, spec.tfc)
        x = tdf(x, c, f)
        skips.append((x, c, f))
        x = down(x, c, c + g)
        c += g
        f //= 2

    x = tfc(x, c, c, spec.tfc)  # mid block
    x = tdf(x, c, f)

    for i in reversed(range(spec.n_scales)):
        skip, sc, sf = skips[i]
        x = up(x, c, sc)
        c, f = sc, sf
        cat = name("cat")
        nodes.append(("Concat", [x, skip], [cat], {"axis": 1}))
        x = tfc(cat, 2 * c, c, spec.tfc)
        x = tdf(x, c, f)

    out = conv(x, c, spec.in_ch, k=1, pad=0)
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
