"""Generate golden parity fixtures from the reference implementation.

Runs the reference's torch modules (mounted read-only at /root/reference)
with seeded random weights and deterministic noise, and records
inputs/weights/activations as .npz for tests/ to check the JAX ports
against.  The fixtures are committed; CI never needs torch-reference access.

Usage:  python scripts/make_fixtures.py [--only rvc,hubert,rmvpe,crepe]
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
OUT = os.path.join(REPO, "tests", "fixtures")
os.makedirs(OUT, exist_ok=True)


def _deterministic_torch():
    """Zero out the stochastic draws used in .infer paths so golden outputs
    are reproducible (z_p noise, SineGen noise/rand_ini)."""
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    _orig_rand = torch.rand

    def zero_rand(*args, **kw):
        return torch.zeros_like(_orig_rand(*args, **kw))

    torch.rand = zero_rand


def _state_to_npz_dict(module, prefix=""):
    return {
        f"sd:{k}": v.detach().cpu().numpy() for k, v in module.state_dict().items()
    }


def make_rvc():
    sys.path.insert(0, REF_SRC)
    from infer_pack import models as ref_models  # noqa

    torch.manual_seed(0)
    _deterministic_torch()

    # ---- v2 + f0 (the flagship path) with the real 40k architecture ----
    cfg = [
        1025, 32, 192, 192, 768, 2, 6, 3, 0.0, "1",
        [3, 7, 11], [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        [10, 10, 2, 2], 512, [16, 16, 4, 4], 109, 256, 40000,
    ]
    net = ref_models.SynthesizerTrnMs768NSFsid(*cfg, is_half=False)
    net.eval()

    T = 20
    phone = torch.randn(1, T, 768) * 0.3
    pitch = torch.randint(1, 255, (1, T))
    nsff0 = torch.rand(1, T) * 300 + 80
    sid = torch.tensor([3])
    lengths = torch.tensor([T])
    with torch.no_grad():
        o, x_mask, (z, z_p, m_p, logs_p) = net.infer(phone, lengths, pitch, nsff0, sid)
        # granular: encoder-only output for debugging
        m_p2, logs_p2, _ = net.enc_p(phone, pitch, lengths)

    out = _state_to_npz_dict(net)
    out.update(
        config=np.array(
            [1025, 32, 192, 192, 768, 2, 6, 3, 0, 1, 109, 256, 40000], dtype=np.int64
        ),
        phone=phone.numpy(),
        pitch=pitch.numpy(),
        nsff0=nsff0.numpy(),
        sid=sid.numpy(),
        lengths=lengths.numpy(),
        audio=o.numpy(),
        z=z.numpy(),
        z_p=z_p.numpy(),
        m_p=m_p.numpy(),
        logs_p=logs_p.numpy(),
    )
    np.savez_compressed(os.path.join(OUT, "rvc_synth_v2f0.npz"), **out)
    print("wrote rvc_synth_v2f0.npz  audio:", o.shape)

    # ---- v1, no-f0 (plain Generator path) ----
    torch.manual_seed(1)
    net2 = ref_models.SynthesizerTrnMs256NSFsid_nono(*cfg[:-1], sr=None, is_half=False)
    net2.eval()
    phone2 = torch.randn(1, T, 256) * 0.3
    with torch.no_grad():
        o2, _, _ = net2.infer(phone2, lengths, sid)
    out2 = _state_to_npz_dict(net2)
    out2.update(phone=phone2.numpy(), sid=sid.numpy(), lengths=lengths.numpy(), audio=o2.numpy())
    np.savez_compressed(os.path.join(OUT, "rvc_synth_v1nono.npz"), **out2)
    print("wrote rvc_synth_v1nono.npz  audio:", o2.shape)


def make_hubert():
    """Golden HuBERT activations via transformers' HubertModel (the public
    port of fairseq hubert_base, reference rvc.py:98-109 contract)."""
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(2)
    cfg = HubertConfig(
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
    )
    model = HubertModel(cfg)
    model.eval()
    audio = torch.randn(1, 16000) * 0.1
    with torch.no_grad():
        outs = model(audio, output_hidden_states=True)
    out = _state_to_npz_dict(model)
    out.update(
        audio=audio.numpy(),
        final=outs.last_hidden_state.numpy(),
        layer9=outs.hidden_states[9].numpy(),
        layer12=outs.hidden_states[12].numpy(),
    )
    np.savez_compressed(os.path.join(OUT, "hubert_base.npz"), **out)
    print("wrote hubert_base.npz  final:", outs.last_hidden_state.shape)


def make_rmvpe():
    """Golden E2E (DeepUnet+BiGRU) outputs.  rmvpe.py imports librosa at
    module top only for the mel basis; stub it out — the E2E net itself is
    pure torch."""
    mel_stub = types.ModuleType("librosa")
    filters_stub = types.ModuleType("librosa.filters")

    def _mel(sr, n_fft, n_mels, fmin, fmax, htk=False):
        from aicovergen_tpu.ops.mel import mel_filterbank

        return mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk)

    filters_stub.mel = lambda *, sr, n_fft, n_mels, fmin, fmax, htk=False: _mel(
        sr, n_fft, n_mels, fmin, fmax, htk
    )
    mel_stub.filters = filters_stub
    sys.modules.setdefault("librosa", mel_stub)
    sys.modules.setdefault("librosa.filters", filters_stub)

    sys.path.insert(0, REF_SRC)
    import importlib

    rmvpe_mod = importlib.import_module("rmvpe")

    torch.manual_seed(3)
    model = rmvpe_mod.E2E(4, 1, (2, 2))
    model.eval()
    n_frames = 64
    mel = torch.randn(1, 128, n_frames)  # (B, n_mels, T)
    with torch.no_grad():
        hidden = model(mel)
    out = _state_to_npz_dict(model)
    out.update(mel=mel.numpy(), hidden=hidden.numpy())
    np.savez_compressed(os.path.join(OUT, "rmvpe_e2e.npz"), **out)
    print("wrote rmvpe_e2e.npz  hidden:", hidden.shape)

    # decode golden: salience -> cents -> f0 on random salience
    torch.manual_seed(4)
    sal = torch.rand(50, 360).numpy().astype(np.float32)
    rm = rmvpe_mod.RMVPE.__new__(rmvpe_mod.RMVPE)
    rm.cents_mapping = np.pad(20 * np.arange(360) + 1997.3794084376191, (4, 4))
    f0 = rm.decode(sal.copy(), thred=0.03)
    np.savez_compressed(os.path.join(OUT, "rmvpe_decode.npz"), salience=sal, f0=f0)
    print("wrote rmvpe_decode.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="rvc,hubert,rmvpe")
    args = ap.parse_args()
    wanted = set(args.only.split(","))
    if "rvc" in wanted:
        make_rvc()
    if "hubert" in wanted:
        make_hubert()
    if "rmvpe" in wanted:
        make_rmvpe()


if __name__ == "__main__":
    main()
