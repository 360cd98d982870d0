"""Export a reconstructed KUIELab MDX-Net through torch.onnx and verify the
OnnxExecutor traces the exporter's REAL output graph.

The reference executes UVR ``.onnx`` checkpoints as a black box through ONNX
Runtime (reference src/mdx.py:74-77); this environment has zero egress, so
the genuine checkpoint files cannot be fetched.  The closest retirable risk
(VERDICT r01 #1) is therefore:

  * same architecture family — the published KUIELab MDX-Net / Conv_TDF_net
    ("KUIELab-MDX-Net: A Two-Stream Neural Network for Music Demixing",
    Kim & Choi 2021; code topology: first 1x1 conv -> transpose so frequency
    is the last axis -> per-scale TFC-TDF blocks (l x [3x3 Conv + BN + ReLU]
    plus a residual frequency-bottleneck Linear pair) -> strided-conv
    downsample -> bottleneck block -> ConvTranspose upsample with
    MULTIPLICATIVE skip connections -> transpose back -> final 1x1 conv);
  * same exporter — ``torch.onnx.export``, which produced the real UVR
    files, with a dynamic batch axis (so any Shape/Gather/Reshape chains the
    exporter emits are present);
  * same numerics contract — our executor's output must match the torch
    eval-mode forward.

The torch modules below are written from the paper/public-code description;
nothing is copied from the reference repo (which contains no MDX model code
at all).  Outputs:

  tests/fixtures/mdx_torch_export.onnx  - small-dims exporter output (committed)
  tests/fixtures/mdx_torch_export.npz   - input + torch output golden (committed)

Usage:
  python scripts/make_mdx_torch_export.py            # small dims + fixture
  python scripts/make_mdx_torch_export.py --full     # Voc_FT dims (3072x256),
                                                     # export + trace + run once
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("AICG_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import torch  # noqa: E402
from torch import nn  # noqa: E402


def _install_onnx_stub():
    """torch's legacy (torchscript) exporter serializes the ModelProto in
    C++ and only imports the ``onnx`` package for an onnxscript-function
    post-pass (torchscript_exporter/onnx_proto_utils.py:_add_onnxscript_fn).
    We use no onnxscript functions, so a stub whose graph has no nodes makes
    that pass a no-op and the exporter writes the untouched proto bytes."""
    import importlib.machinery
    import types

    if "onnx" in sys.modules:
        return

    class _Graph:
        node = ()

    class _Model:
        graph = _Graph()
        functions = []

    mod = types.ModuleType("onnx")
    mod.__spec__ = importlib.machinery.ModuleSpec("onnx", None)
    mod.load_model_from_string = lambda b: _Model()
    sys.modules["onnx"] = mod


class TFC_TDF(nn.Module):
    """l x (3x3 Conv + BN + ReLU) with a residual frequency bottleneck:
    x + BN(ReLU(BN(Linear_f->f/bn(x)))) per the TFC-TDF block family."""

    def __init__(self, c: int, l: int, f: int, k: int = 3, bn: int = 8, bias: bool = True):
        super().__init__()
        self.H = nn.ModuleList(
            nn.Sequential(
                nn.Conv2d(c, c, k, stride=1, padding=k // 2),
                nn.BatchNorm2d(c),
                nn.ReLU(),
            )
            for _ in range(l)
        )
        self.tdf = nn.Sequential(
            nn.Linear(f, max(f // bn, 4), bias=bias),
            nn.BatchNorm2d(c),
            nn.ReLU(),
            nn.Linear(max(f // bn, 4), f, bias=bias),
            nn.BatchNorm2d(c),
            nn.ReLU(),
        )

    def forward(self, x):
        for h in self.H:
            x = h(x)
        return x + self.tdf(x)


class ConvTDFNetTrim(nn.Module):
    """U-Net over (B, 4, dim_f, dim_t) spectrogram packs: stereo re/im in
    channels (our pipeline/separate.py packing, reference src/mdx.py:37-43).
    Frequency is moved to the LAST axis after the first conv so the TDF
    Linear acts on it; skips are multiplicative at each decoder scale."""

    def __init__(self, dim_f=3072, dim_t=256, n_scales=5, g=32, l=2, k=3, bn=8):
        super().__init__()
        self.first_conv = nn.Sequential(
            nn.Conv2d(4, g, kernel_size=1), nn.BatchNorm2d(g), nn.ReLU()
        )
        scale = (2, 2)
        c, f = g, dim_f
        self.encoding_blocks = nn.ModuleList()
        self.ds = nn.ModuleList()
        for _ in range(n_scales):
            self.encoding_blocks.append(TFC_TDF(c, l, f, k, bn))
            self.ds.append(
                nn.Sequential(
                    nn.Conv2d(c, c + g, kernel_size=scale, stride=scale),
                    nn.BatchNorm2d(c + g),
                    nn.ReLU(),
                )
            )
            c += g
            f //= 2
        self.bottleneck_block = TFC_TDF(c, l, f, k, bn)
        self.us = nn.ModuleList()
        self.decoding_blocks = nn.ModuleList()
        for _ in range(n_scales):
            self.us.append(
                nn.Sequential(
                    nn.ConvTranspose2d(c, c - g, kernel_size=scale, stride=scale),
                    nn.BatchNorm2d(c - g),
                    nn.ReLU(),
                )
            )
            c -= g
            f *= 2
            self.decoding_blocks.append(TFC_TDF(c, l, f, k, bn))
        self.final_conv = nn.Sequential(nn.Conv2d(c, 4, kernel_size=1))

    def forward(self, x):
        x = self.first_conv(x)
        x = x.transpose(-1, -2)  # (B, C, T, F): Linear acts on frequency
        ds_outputs = []
        for enc, ds in zip(self.encoding_blocks, self.ds):
            x = enc(x)
            ds_outputs.append(x)
            x = ds(x)
        x = self.bottleneck_block(x)
        for i, (us, dec) in enumerate(zip(self.us, self.decoding_blocks)):
            x = us(x)
            x = x * ds_outputs[-i - 1]
            x = dec(x)
        x = x.transpose(-1, -2)
        return self.final_conv(x)


def export_net(path: str, seed: int, **spec) -> ConvTDFNetTrim:
    _install_onnx_stub()
    torch.manual_seed(seed)
    net = ConvTDFNetTrim(**spec)
    net.eval()
    dummy = torch.randn(1, 4, net_dim_f(spec), net_dim_t(spec))
    torch.onnx.export(
        net,
        dummy,
        path,
        opset_version=12,
        input_names=["input"],
        output_names=["output"],
        dynamic_axes={"input": {0: "batch"}, "output": {0: "batch"}},
        dynamo=False,
    )
    return net


def net_dim_f(spec):
    return spec.get("dim_f", 3072)


def net_dim_t(spec):
    return spec.get("dim_t", 256)


def run_ours(path: str, x: np.ndarray) -> np.ndarray:
    from aicovergen_tpu.convert.onnx_proto import read_onnx
    from aicovergen_tpu.models.mdx import OnnxExecutor

    ex = OnnxExecutor(read_onnx(path))
    return np.asarray(ex(x.astype(np.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="also export+run Voc_FT dims")
    args = ap.parse_args()

    fixtures = os.path.join(REPO, "tests", "fixtures")
    os.makedirs(fixtures, exist_ok=True)

    # --- small dims: committed fixture + numerics check -------------------
    spec = dict(dim_f=64, dim_t=32, n_scales=3, g=4, l=2, bn=8)
    small_path = os.path.join(fixtures, "mdx_torch_export.onnx")
    net = export_net(small_path, seed=11, **spec)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, spec["dim_f"], spec["dim_t"])).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = run_ours(small_path, x)
    err = np.max(np.abs(ours - ref)) / (np.max(np.abs(ref)) + 1e-12)
    print(f"[mdx-export] small dims: rel max err {err:.3e}  "
          f"(onnx {os.path.getsize(small_path)/1e3:.0f} kB)")
    assert err < 2e-4, err
    np.savez_compressed(
        os.path.join(fixtures, "mdx_torch_export.npz"), x=x, ref=ref
    )

    # op inventory of the real exporter output, for the record
    from aicovergen_tpu.convert.onnx_proto import read_onnx

    ops = sorted({n.op_type for n in read_onnx(small_path).nodes})
    print(f"[mdx-export] exporter op inventory: {ops}")

    if args.full:
        full_spec = dict(dim_f=3072, dim_t=256, n_scales=5, g=32, l=2, bn=8)
        full_path = "/tmp/mdx_voc_ft_replica.onnx"
        net_f = export_net(full_path, seed=12, **full_spec)
        xf = rng.standard_normal((1, 4, 3072, 256)).astype(np.float32)
        with torch.no_grad():
            ref_f = net_f(torch.from_numpy(xf)).numpy()
        ours_f = run_ours(full_path, xf)
        err_f = np.max(np.abs(ours_f - ref_f)) / (np.max(np.abs(ref_f)) + 1e-12)
        print(f"[mdx-export] Voc_FT dims (3072x256, 5 scales): rel max err {err_f:.3e}  "
              f"(onnx {os.path.getsize(full_path)/1e6:.1f} MB)")
        assert err_f < 2e-4, err_f


if __name__ == "__main__":
    main()
