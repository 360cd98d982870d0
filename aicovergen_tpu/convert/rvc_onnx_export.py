"""RVC synthesizer -> ONNX export (deployment interchange).

Role-equivalent of the reference's ONNX-export model variants
(reference src/infer_pack/models_onnx.py:532-649, SynthesizerTrnMsNSFsidM):
the full inference graph — text encoder with windowed relative attention,
reverse residual-coupling flow, NSF-HiFiGAN decoder with the cumsum sine
source — serialized through our dependency-free ONNX wire writer
(convert/onnx_proto.write_onnx).

Like the reference export, stochastic draws are *inputs* (`rnd` for the
z_p noise, models_onnx.py:635-646; plus `sine_noise` for the source), so
the graph is deterministic.  Unlike the reference we export with a static
frame count T (shape-specialized deployment graphs; re-export per bucket —
the same static-shape policy the TPU pipeline uses at runtime).

The exported graph round-trips through models/mdx.OnnxExecutor; parity vs
`synthesizer_infer` is tested in tests/test_onnx_export.py.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np

from ..models.rvc import RVCConfig


class _G:
    """Tiny ONNX graph builder: tracks nodes/initializers, names tensors."""

    def __init__(self):
        self.nodes: List[tuple] = []
        self.init: Dict[str, np.ndarray] = {}
        self._uid = 0

    def name(self, tag: str) -> str:
        self._uid += 1
        return f"{tag}_{self._uid}"

    def const(self, value, tag="c") -> str:
        n = self.name(tag)
        self.init[n] = np.asarray(value)
        return n

    def n(self, op: str, inputs: List[str], attrs: Optional[dict] = None, tag=None) -> str:
        out = self.name(tag or op.lower())
        self.nodes.append((op, inputs, [out], attrs or {}))
        return out

    # ---- composite helpers ----
    def add(self, a, b):
        return self.n("Add", [a, b])

    def mul(self, a, b):
        return self.n("Mul", [a, b])

    def matmul(self, a, b):
        return self.n("MatMul", [a, b])

    def transpose(self, x, perm):
        return self.n("Transpose", [x], {"perm": list(perm)})

    def reshape(self, x, shape):
        return self.n("Reshape", [x, self.const(np.asarray(shape, np.int64))])

    def pad2(self, x, pads):
        """pads: ONNX layout [b0..bn, e0..en]."""
        return self.n("Pad", [x, self.const(np.asarray(pads, np.int64))])

    def slice(self, x, starts, ends, axes):
        return self.n(
            "Slice",
            [x, self.const(np.asarray(starts, np.int64)),
             self.const(np.asarray(ends, np.int64)),
             self.const(np.asarray(axes, np.int64))],
        )

    def linear(self, x, p, tag="lin"):
        """(…, in) x torch Linear {weight (out,in), bias}."""
        y = self.matmul(x, self.const(np.asarray(p["weight"]).T.astype(np.float32)))
        if "bias" in p:
            y = self.add(y, self.const(np.asarray(p["bias"], np.float32)))
        return y

    def conv1d(self, x, p, stride=1, padding=0, dilation=1, groups=1, tag="conv"):
        """(B, C, T) torch Conv1d."""
        w = self.const(np.asarray(p["weight"], np.float32))
        ins = [x, w]
        if "bias" in p:
            ins.append(self.const(np.asarray(p["bias"], np.float32)))
        k = np.asarray(p["weight"]).shape[-1]
        return self.n(
            "Conv", ins,
            {"kernel_shape": [int(k)], "strides": [stride],
             "pads": [padding, padding], "dilations": [dilation], "group": groups},
            tag=tag,
        )

    def conv_transpose1d(self, x, p, stride, padding):
        w = self.const(np.asarray(p["weight"], np.float32))
        ins = [x, w]
        if "bias" in p:
            ins.append(self.const(np.asarray(p["bias"], np.float32)))
        k = np.asarray(p["weight"]).shape[-1]
        return self.n(
            "ConvTranspose", ins,
            {"kernel_shape": [int(k)], "strides": [stride], "pads": [padding, padding]},
        )

    def leaky(self, x, alpha):
        return self.n("LeakyRelu", [x], {"alpha": alpha})

    def layer_norm_ch(self, x, p, eps=1e-5):
        """LayerNorm over axis 1 of (B, C, T) (the reference modules.LayerNorm)."""
        mean = self.n("ReduceMean", [x], {"axes": [1], "keepdims": 1})
        centered = self.n("Sub", [x, mean])
        var = self.n("ReduceMean", [self.mul(centered, centered)], {"axes": [1], "keepdims": 1})
        denom = self.n("Sqrt", [self.add(var, self.const(np.float32(eps)))])
        xn = self.n("Div", [centered, denom])
        g = self.const(np.asarray(p.get("gamma", p.get("weight")), np.float32).reshape(1, -1, 1))
        b = self.const(np.asarray(p.get("beta", p.get("bias")), np.float32).reshape(1, -1, 1))
        return self.add(self.mul(xn, g), b)


# --------------------------------------------------------------- components


def _attention(g: _G, p, x, t: int, n_heads: int, hidden: int, window: int = 10):
    """multi_head_attention on (1, H, T) with static T
    (models/attention.py; reference attentions.py:162-359)."""
    dk = hidden // n_heads
    scale = 1.0 / math.sqrt(dk)

    q = g.conv1d(x, p["conv_q"])
    k = g.conv1d(x, p["conv_k"])
    v = g.conv1d(x, p["conv_v"])

    def heads(z):  # (1,H,T) -> (1,h,T,dk)
        return g.transpose(g.reshape(z, [1, n_heads, dk, t]), (0, 1, 3, 2))

    qh = g.mul(heads(q), g.const(np.float32(scale)))
    kh, vh = heads(k), heads(v)
    scores = g.matmul(qh, g.transpose(kh, (0, 1, 3, 2)))  # (1,h,T,T)

    # relative keys: static slice of the (2w+1) embedding to 2T-1 entries
    emb_k = np.asarray(p["emb_rel_k"], np.float32)[0]  # (2w+1, dk)
    rel_k = _rel_embeddings(emb_k, t, window)  # (2T-1, dk)
    rel_logits = g.matmul(qh, g.const(rel_k.T))  # (1,h,T,2T-1)
    scores = g.add(scores, _relative_to_absolute(g, rel_logits, t, n_heads))

    p_attn = g.n("Softmax", [scores], {"axis": -1})
    out = g.matmul(p_attn, vh)  # (1,h,T,dk)

    emb_v = np.asarray(p["emb_rel_v"], np.float32)[0]
    rel_w = _absolute_to_relative(g, p_attn, t, n_heads)  # (1,h,T,2T-1)
    out = g.add(out, g.matmul(rel_w, g.const(_rel_embeddings(emb_v, t, window))))

    out = g.reshape(g.transpose(out, (0, 1, 3, 2)), [1, hidden, t])
    return g.conv1d(out, p["conv_o"])


def _rel_embeddings(emb: np.ndarray, t: int, window: int) -> np.ndarray:
    """_get_relative_embeddings with static T (attentions.py:300-315):
    pad the (2w+1, dk) table to 2T-1 rows, centered."""
    pad = max(t - (window + 1), 0)
    start = max((window + 1) - t, 0)
    padded = np.pad(emb, ((pad, pad), (0, 0)))
    return padded[start : start + 2 * t - 1]


def _relative_to_absolute(g: _G, x, t: int, h: int):
    """(1,h,T,2T-1) -> (1,h,T,T)  (attentions.py:313-332), static shapes."""
    x = g.pad2(x, [0, 0, 0, 0, 0, 0, 0, 1])  # last dim -> 2T
    flat = g.reshape(x, [1, h, t * 2 * t])
    flat = g.pad2(flat, [0, 0, 0, 0, 0, t - 1])
    final = g.reshape(flat, [1, h, t + 1, 2 * t - 1])
    return g.slice(final, [0, t - 1], [t, 2 * t - 1], [2, 3])


def _absolute_to_relative(g: _G, x, t: int, h: int):
    """(1,h,T,T) -> (1,h,T,2T-1)  (attentions.py:334-348)."""
    x = g.pad2(x, [0, 0, 0, 0, 0, 0, 0, t - 1])
    flat = g.reshape(x, [1, h, t * t + t * (t - 1)])
    flat = g.pad2(flat, [0, 0, t, 0, 0, 0])  # t zeros at the START of axis 2
    return g.slice(g.reshape(flat, [1, h, t, 2 * t]), [1], [2 * t], [3])


def _ffn(g: _G, p, x, kernel: int):
    """conv1d FFN with same padding (attentions.py:362-417, full-length)."""
    pl, pr = (kernel - 1) // 2, kernel // 2

    def pad_same(z):
        if kernel == 1:
            return z
        return g.pad2(z, [0, 0, pl, 0, 0, pr])

    h = g.conv1d(pad_same(x), p["conv_1"])
    h = g.n("Relu", [h])
    return g.conv1d(pad_same(h), p["conv_2"])


def _encoder(g: _G, p, x, t: int, cfg: RVCConfig):
    for i in range(cfg.n_layers):
        si = str(i)
        y = _attention(g, p["attn_layers"][si], x, t, cfg.n_heads, cfg.hidden_channels)
        x = g.layer_norm_ch(g.add(x, y), p["norm_layers_1"][si])
        y = _ffn(g, p["ffn_layers"][si], x, cfg.kernel_size)
        x = g.layer_norm_ch(g.add(x, y), p["norm_layers_2"][si])
    return x


def _wavenet(g: _G, p, x, gcond, hidden: int, kernel: int, n_layers: int):
    output = None
    gk = g.conv1d(gcond, p["cond_layer"]) if gcond is not None else None
    for i in range(n_layers):
        dilation = 1**i  # dilation_rate 1 in the flow WN (models.py:121-127)
        padding = (kernel * dilation - dilation) // 2
        x_in = g.conv1d(x, p["in_layers"][str(i)], padding=padding, dilation=dilation)
        if gk is not None:
            g_l = g.slice(gk, [i * 2 * hidden], [(i + 1) * 2 * hidden], [1])
            x_in = g.add(x_in, g_l)
        ta = g.n("Tanh", [g.slice(x_in, [0], [hidden], [1])])
        sa = g.n("Sigmoid", [g.slice(x_in, [hidden], [2 * hidden], [1])])
        acts = g.mul(ta, sa)
        res_skip = g.conv1d(acts, p["res_skip_layers"][str(i)])
        if i < n_layers - 1:
            x = g.add(x, g.slice(res_skip, [0], [hidden], [1]))
            contrib = g.slice(res_skip, [hidden], [2 * hidden], [1])
        else:
            contrib = res_skip
        output = contrib if output is None else g.add(output, contrib)
    return output


def _flow_reverse(g: _G, p, x, gcond, cfg: RVCConfig, n_flows: int = 4):
    half = cfg.inter_channels // 2
    for i in reversed(range(n_flows)):
        # Flip (reverse direction: flip precedes the coupling)
        top = g.slice(x, [0], [half], [1])
        bot = g.slice(x, [half], [2 * half], [1])
        x = g.n("Concat", [bot, top], {"axis": 1})
        fp = p["flows"][str(2 * i)]
        x0 = g.slice(x, [0], [half], [1])
        x1 = g.slice(x, [half], [2 * half], [1])
        h = g.conv1d(x0, fp["pre"])
        h = _wavenet(g, fp["enc"], h, gcond, cfg.hidden_channels, 5, 3)
        m = g.conv1d(h, fp["post"])
        x1 = g.n("Sub", [x1, m])
        x = g.n("Concat", [x0, x1], {"axis": 1})
    return x


def _sine_source(g: _G, p, f0, t: int, upp: int, sr: int, sine_noise: str):
    """SourceModuleHnNSF with the cumsum sine generator, static T
    (models/rvc.py sine_gen; reference models.py:320-419)."""
    t_up = t * upp
    f0c = g.reshape(f0, [1, t, 1])
    rad = g.n("Mod", [g.mul(f0c, g.const(np.float32(1.0 / sr))), g.const(np.float32(1.0))])

    over = g.mul(g.n("CumSum", [rad, g.const(np.asarray(1, np.int64))]),
                 g.const(np.float32(upp)))
    # linear align-corners upsample via constant gather indices/weights
    pos = np.arange(t_up) * (t - 1) / (t_up - 1) if t > 1 else np.zeros(t_up)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, t - 1)
    w = (pos - lo).astype(np.float32).reshape(1, t_up, 1)
    over_lo = g.n("Gather", [over, g.const(lo)], {"axis": 1})
    over_hi = g.n("Gather", [over, g.const(hi)], {"axis": 1})
    over_up = g.add(
        g.mul(over_lo, g.const((1 - w).astype(np.float32))),
        g.mul(over_hi, g.const(w)),
    )
    rad_up = g.n("Gather", [rad, g.const(np.repeat(np.arange(t), upp))], {"axis": 1})

    over_mod = g.n("Mod", [over_up, g.const(np.float32(1.0))])
    prev = g.slice(over_mod, [0], [t_up - 1], [1])
    nxt = g.slice(over_mod, [1], [t_up], [1])
    wraps = g.n("Less", [g.n("Sub", [nxt, prev]), g.const(np.float32(0.0))])
    shift = g.n("Cast", [wraps], {"to": 1})  # float32
    shift = g.mul(shift, g.const(np.float32(-1.0)))
    # one zero frame at the start of axis 1 (pads: [b0,b1,b2, e0,e1,e2])
    shift = g.pad2(shift, [0, 1, 0, 0, 0, 0])
    phase = g.n("CumSum", [g.add(rad_up, shift), g.const(np.asarray(1, np.int64))])
    sine = g.n("Sin", [g.mul(phase, g.const(np.float32(2 * np.pi)))])
    sine = g.mul(sine, g.const(np.float32(0.1)))

    uv = g.n("Cast", [g.n("Greater", [f0c, g.const(np.float32(0.0))])], {"to": 1})
    uv = g.n("Gather", [uv, g.const(np.repeat(np.arange(t), upp))], {"axis": 1})
    namp = g.add(g.mul(uv, g.const(np.float32(0.003))),
                 g.mul(g.n("Sub", [g.const(np.float32(1.0)), uv]),
                       g.const(np.float32(0.1 / 3))))
    sine = g.add(g.mul(sine, uv), g.mul(namp, sine_noise))
    merged = g.linear(sine, p["l_linear"])
    return g.n("Tanh", [merged])  # (1, T*upp, 1)


def _generator_nsf(g: _G, p, x, f0, gcond, cfg: RVCConfig, t: int, sine_noise: str):
    upp = cfg.upp
    har = _sine_source(g, p["m_source"], f0, t, upp, cfg.sr, sine_noise)
    har = g.transpose(har, (0, 2, 1))  # (1,1,T*upp)

    x = g.conv1d(x, p["conv_pre"], padding=3)
    if gcond is not None:
        x = g.add(x, g.conv1d(gcond, p["cond"]))

    rates = cfg.upsample_rates
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, kz) in enumerate(zip(rates, cfg.upsample_kernel_sizes)):
        x = g.leaky(x, 0.1)
        x = g.conv_transpose1d(x, p["ups"][str(i)], stride=u, padding=(kz - u) // 2)
        if i + 1 < len(rates):
            stride_f0 = int(np.prod(rates[i + 1:]))
            xs = g.conv1d(har, p["noise_convs"][str(i)], stride=stride_f0,
                          padding=stride_f0 // 2)
        else:
            xs = g.conv1d(har, p["noise_convs"][str(i)])
        x = g.add(x, xs)
        acc = None
        for j, (kk, dil) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            blk = p["resblocks"][str(i * num_kernels + j)]
            xt = x
            if cfg.resblock == "1":
                for jj, d in enumerate(dil):
                    h = g.leaky(xt, 0.1)
                    h = g.conv1d(h, blk["convs1"][str(jj)], padding=(kk * d - d) // 2,
                                 dilation=d)
                    h = g.leaky(h, 0.1)
                    h = g.conv1d(h, blk["convs2"][str(jj)], padding=(kk - 1) // 2)
                    xt = g.add(h, xt)
            else:
                for jj, d in enumerate(dil):
                    h = g.leaky(xt, 0.1)
                    h = g.conv1d(h, blk["convs"][str(jj)], padding=(kk * d - d) // 2,
                                 dilation=d)
                    xt = g.add(h, xt)
            acc = xt if acc is None else g.add(acc, xt)
        x = g.mul(acc, g.const(np.float32(1.0 / num_kernels)))
    x = g.leaky(x, 0.01)
    x = g.conv1d(x, p["conv_post"], padding=3)
    return g.n("Tanh", [x])


def export_synthesizer_onnx(
    path: str,
    params: dict,
    cfg: RVCConfig,
    t: int,
    noise_scale: float = 0.66666,
) -> None:
    """Write the full .infer graph for a fixed frame count `t`.

    Inputs:  phone (1,T,emb), pitch (1,T) int64 [f0 models], nsff0 (1,T),
             sid (1,) int64, rnd (1,inter,T), sine_noise (1,T*upp,1).
    Output:  audio (1,1,T*upp).
    """
    g = _G()
    emb_dim = 768 if cfg.version == "v2" else 256
    hidden = cfg.hidden_channels

    enc = params["enc_p"]
    x = g.linear("phone", enc["emb_phone"])  # (1,T,H)
    if cfg.if_f0:
        x = g.add(x, g.n("Gather", [g.const(np.asarray(enc["emb_pitch"]["weight"],
                                                       np.float32)), "pitch"],
                         {"axis": 0}))
    x = g.mul(x, g.const(np.float32(math.sqrt(hidden))))
    x = g.leaky(x, 0.1)
    x = g.transpose(x, (0, 2, 1))  # (1,H,T)
    x = _encoder(g, enc["encoder"], x, t, cfg)
    stats = g.conv1d(x, enc["proj"])
    m_p = g.slice(stats, [0], [cfg.inter_channels], [1])
    logs_p = g.slice(stats, [cfg.inter_channels], [2 * cfg.inter_channels], [1])

    gcond = g.n("Gather", [g.const(np.asarray(params["emb_g"]["weight"], np.float32)),
                           "sid"], {"axis": 0})
    gcond = g.reshape(gcond, [1, cfg.gin_channels, 1])

    z_p = g.add(m_p, g.mul(g.mul(g.n("Exp", [logs_p]), "rnd"),
                           g.const(np.float32(noise_scale))))
    z = _flow_reverse(g, params["flow"], z_p, gcond, cfg)

    if cfg.if_f0:
        audio = _generator_nsf(g, params["dec"], z, "nsff0", gcond, cfg, t, "sine_noise")
    else:
        # plain HiFi-GAN generator (no-f0 variants)
        x = g.conv1d(z, params["dec"]["conv_pre"], padding=3)
        x = g.add(x, g.conv1d(gcond, params["dec"]["cond"]))
        num_kernels = len(cfg.resblock_kernel_sizes)
        for i, (u, kz) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            x = g.leaky(x, 0.1)
            x = g.conv_transpose1d(x, params["dec"]["ups"][str(i)], stride=u,
                                   padding=(kz - u) // 2)
            acc = None
            for j, (kk, dil) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                blk = params["dec"]["resblocks"][str(i * num_kernels + j)]
                xt = x
                for jj, d in enumerate(dil):
                    h = g.leaky(xt, 0.1)
                    h = g.conv1d(h, blk["convs1"][str(jj)], padding=(kk * d - d) // 2,
                                 dilation=d)
                    h = g.leaky(h, 0.1)
                    h = g.conv1d(h, blk["convs2"][str(jj)], padding=(kk - 1) // 2)
                    xt = g.add(h, xt)
                acc = xt if acc is None else g.add(acc, xt)
            x = g.mul(acc, g.const(np.float32(1.0 / num_kernels)))
        x = g.leaky(x, 0.01)
        x = g.conv1d(x, params["dec"]["conv_post"], padding=3)
        audio = g.n("Tanh", [x])

    # name the terminal node output "audio"
    op, ins, _outs, attrs = g.nodes[-1]
    g.nodes[-1] = (op, ins, ["audio"], attrs)

    inputs = {
        "phone": [1, t, emb_dim],
        "sid": [1],
        "rnd": [1, cfg.inter_channels, t],
    }
    if cfg.if_f0:
        inputs["pitch"] = [1, t]
        inputs["nsff0"] = [1, t]
        inputs["sine_noise"] = [1, t * cfg.upp, 1]

    from .onnx_proto import write_onnx

    write_onnx(path, g.nodes, g.init, inputs, ["audio"],
               graph_name=f"rvc_{cfg.version}_{'f0' if cfg.if_f0 else 'nono'}_T{t}")
