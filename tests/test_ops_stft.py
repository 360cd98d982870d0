"""STFT/iSTFT parity vs torch.stft/istft and round-trip checks."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from aicovergen_tpu.ops.stft import stft, istft, hann_window


@pytest.mark.parametrize(
    "n_fft,hop,win_length,length",
    [
        (1024, 160, 1024, 16000),  # rmvpe mel config
        (7680, 1024, 7680, 7680 * 3),  # MDX Voc_FT config
        (512, 128, 384, 5000),  # win < n_fft padding path
    ],
)
def test_stft_matches_torch(n_fft, hop, win_length, length):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(length).astype(np.float32)
    win = hann_window(win_length)

    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, jnp.asarray(win)))
    theirs = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win_length,
        window=torch.from_numpy(win),
        center=True,
        return_complex=True,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("n_fft,hop", [(7680, 1024), (1024, 256)])
def test_istft_matches_torch(n_fft, hop):
    rng = np.random.default_rng(1)
    length = n_fft * 4
    x = rng.standard_normal(length).astype(np.float32)
    win = hann_window(n_fft)
    spec_t = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
        window=torch.from_numpy(win), center=True, return_complex=True,
    )
    y_t = torch.istft(spec_t, n_fft=n_fft, hop_length=hop,
                      window=torch.from_numpy(win), center=True).numpy()
    y_j = np.asarray(istft(jnp.asarray(spec_t.numpy()), n_fft, hop, jnp.asarray(win)))
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=2e-3)


def test_roundtrip_batched():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 2, 4096)).astype(np.float32)
    win = hann_window(1024)
    spec = stft(jnp.asarray(x), 1024, 256, jnp.asarray(win))
    y = istft(spec, 1024, 256, jnp.asarray(win))
    np.testing.assert_allclose(np.asarray(y), x[..., : y.shape[-1]], atol=1e-4)


def test_mdx_spec_packing():
    """The 4-channel real/imag packing contract of MDXModel.stft
    (reference src/mdx.py:37-54) done with our stft."""
    from aicovergen_tpu.pipeline.separate import spec_pack, spec_unpack

    n_fft, hop, dim_f, dim_t = 1024, 256, 400, 16
    chunk = hop * (dim_t - 1)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, chunk)).astype(np.float32)
    win = hann_window(n_fft)
    packed = spec_pack(jnp.asarray(x), n_fft, hop, jnp.asarray(win), dim_f)
    assert packed.shape == (1, 4, dim_f, dim_t)
    y = spec_unpack(packed, n_fft, hop, jnp.asarray(win), chunk)
    assert y.shape == (1, 2, chunk)

    # torch reference packing
    xt = torch.from_numpy(x.reshape(-1, chunk))
    st = torch.stft(xt, n_fft=n_fft, hop_length=hop, window=torch.from_numpy(win),
                    center=True, return_complex=True)
    st = torch.view_as_real(st).permute(0, 3, 1, 2)
    st = st.reshape(-1, 2, 2, n_fft // 2 + 1, dim_t).reshape(-1, 4, n_fft // 2 + 1, dim_t)
    np.testing.assert_allclose(np.asarray(packed), st[:, :, :dim_f].numpy(), atol=2e-3)
