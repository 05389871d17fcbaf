"""Golden tests for the DSP front-ends against independent implementations.

Strategy (the reference repo has no numerical unit tests, SURVEY.md §4; we add
them): each mel front-end is validated against a second, independently-written
implementation — transformers.audio_utils (numpy) for filterbanks and kaldi
fbank, and a direct numpy STFT for the HiFiGAN-style mel.
"""

import numpy as np
import pytest

from indextts_tpu.ops.mel import (
    kaldi_fbank,
    kaldi_mel_filterbank,
    mel_filterbank,
    mel_spectrogram,
    mel_spectrogram_24k_v1,
)
from indextts_tpu.ops.stft import hann_window, povey_window
from indextts_tpu.utils.wav_io import read_wav, write_wav


def test_mel_filterbank_matches_transformers_slaney():
    from transformers.audio_utils import mel_filter_bank

    ours = mel_filterbank(22050, 1024, 80, 0.0, None, scale="slaney", norm="slaney")
    theirs = mel_filter_bank(
        num_frequency_bins=513,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=11025.0,
        sampling_rate=22050,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns (n_freqs, n_mels)
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_mel_filterbank_matches_transformers_htk():
    from transformers.audio_utils import mel_filter_bank

    ours = mel_filterbank(24000, 1024, 100, 0.0, None, scale="htk", norm=None)
    theirs = mel_filter_bank(
        num_frequency_bins=513,
        num_mel_filters=100,
        min_frequency=0.0,
        max_frequency=12000.0,
        sampling_rate=24000,
        norm=None,
        mel_scale="htk",
    ).T
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_kaldi_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    ours = kaldi_mel_filterbank(16000, 512, 80, low_freq=20.0, high_freq=0.0)
    theirs = mel_filter_bank(
        num_frequency_bins=257,
        num_mel_filters=80,
        min_frequency=20.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm=None,
        mel_scale="kaldi",
        triangularize_in_mel_space=True,
    ).T
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_kaldi_fbank_matches_transformers_spectrogram(rng):
    from transformers.audio_utils import mel_filter_bank, spectrogram, window_function

    t = 16000
    y = rng.standard_normal(t).astype(np.float32) * 0.1
    ours = np.asarray(kaldi_fbank(y[None, :]))[0]  # (frames, 80)

    fb = mel_filter_bank(
        num_frequency_bins=257,
        num_mel_filters=80,
        min_frequency=20.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm=None,
        mel_scale="kaldi",
        triangularize_in_mel_space=True,
    )
    theirs = spectrogram(
        y,
        window_function(400, "povey", periodic=False),
        frame_length=400,
        hop_length=160,
        fft_length=512,
        power=2.0,
        center=False,
        preemphasis=0.97,
        mel_filters=fb,
        log_mel="log",
        mel_floor=float(np.finfo(np.float32).eps),
        remove_dc_offset=True,
    ).T  # (frames, 80)
    assert ours.shape == theirs.shape
    # ours runs in float32 on device; transformers computes in float64 —
    # log-domain differences of ~6e-3 on near-silent bins are expected.
    np.testing.assert_allclose(ours, theirs, atol=2e-2, rtol=1e-3)
    assert float(np.mean(np.abs(ours - theirs))) < 1e-3


def _np_stft_mag(y, n_fft, hop, window):
    frames = []
    for start in range(0, len(y) - n_fft + 1, hop):
        frames.append(y[start : start + n_fft] * window)
    spec = np.fft.rfft(np.stack(frames), axis=-1)
    return np.sqrt(np.abs(spec) ** 2 + 1e-9).T  # (freq, frames)


def test_mel22k_matches_numpy_reference(rng):
    n_fft, hop = 1024, 256
    y = (rng.standard_normal(22050) * 0.3).astype(np.float32)
    ours = np.asarray(mel_spectrogram(y[None, :]))[0]

    pad = (n_fft - hop) // 2
    ypad = np.pad(y, (pad, pad), mode="reflect")
    mag = _np_stft_mag(ypad, n_fft, hop, hann_window(n_fft).astype(np.float64))
    fb = mel_filterbank(22050, n_fft, 80, 0.0, None)
    ref = np.log(np.clip(fb @ mag, 1e-5, None))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)
    # frame count matches the HiFiGAN front-end contract: T // hop frames
    assert ours.shape[1] == 22050 // hop


def test_mel24k_v1_shape(rng):
    y = (rng.standard_normal(24000) * 0.2).astype(np.float32)
    m = np.asarray(mel_spectrogram_24k_v1(y[None, :]))
    assert m.shape == (1, 100, 24000 // 256 + 1)
    assert np.isfinite(m).all()


def test_povey_window_matches_kaldi_def():
    w = povey_window(400)
    n = np.arange(400)
    expect = (0.5 - 0.5 * np.cos(2 * np.pi * n / 399)) ** 0.85
    np.testing.assert_allclose(w, expect, atol=1e-6)


def test_wav_roundtrip(tmp_path, rng):
    sr = 22050
    y = (rng.standard_normal(sr) * 0.5).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, y, sr)
    x, sr2 = read_wav(p)
    assert sr2 == sr
    assert x.shape == (1, sr)
    np.testing.assert_allclose(x[0], y, atol=1e-4)


def test_wav_int16_passthrough(tmp_path):
    sr = 8000
    y = np.linspace(-32000, 32000, sr).astype(np.float32)
    p = str(tmp_path / "i.wav")
    write_wav(p, y, sr)  # already int16-scaled floats
    x, _ = read_wav(p)
    np.testing.assert_allclose(x[0] * 32768.0, y, atol=1.5)


def test_resample_preserves_tone():
    from indextts_tpu.utils.resample import resample_audio

    sr_in, sr_out, f = 22050, 16000, 440.0
    t = np.arange(sr_in) / sr_in
    y = np.sin(2 * np.pi * f * t).astype(np.float32)[None, :]
    z = resample_audio(y, sr_in, sr_out)
    assert abs(z.shape[-1] - sr_out) <= 2
    tt = np.arange(z.shape[-1]) / sr_out
    expect = np.sin(2 * np.pi * f * tt)
    # ignore filter edges
    sl = slice(500, -500)
    assert np.sqrt(np.mean((z[0][sl] - expect[sl]) ** 2)) < 1e-3


def test_mcd_metric_sane(rng):
    """MCD: 0 for identical signals, larger for noisier pairs, monotone."""
    from indextts_tpu.utils.metrics import mcd

    sr = 22050
    t = np.arange(sr) / sr
    a = np.sin(2 * np.pi * 220 * t).astype(np.float32) * 0.5
    assert mcd(a, a, sr) < 1e-3
    small = a + 0.01 * rng.standard_normal(sr).astype(np.float32)
    big = a + 0.2 * rng.standard_normal(sr).astype(np.float32)
    d_small, d_big = mcd(a, small, sr), mcd(a, big, sr)
    assert 0 < d_small < d_big


def test_rope_half_matches_interleaved_under_permutation():
    """apply_rotary_emb_half on deinterleaved lanes == lane-permutation of the
    literal gpt_fast interleaved rope (so q.k^T is unchanged)."""
    import jax.numpy as jnp
    import numpy as np
    from indextts_tpu.ops.rope import (apply_rotary_emb, apply_rotary_emb_half,
                                       deinterleave_rope_columns,
                                       precompute_freqs_cis)

    rng = np.random.default_rng(0)
    B, T, H, D = 2, 16, 4, 8
    x = rng.standard_normal((B, T, H, D)).astype(np.float32)
    fc = jnp.asarray(precompute_freqs_cis(T, D))
    ref = np.asarray(apply_rotary_emb(jnp.asarray(x), fc))
    ref_perm = np.concatenate([ref[..., 0::2], ref[..., 1::2]], axis=-1)
    x_perm = np.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)
    out = np.asarray(apply_rotary_emb_half(jnp.asarray(x_perm), fc))
    np.testing.assert_allclose(out, ref_perm, atol=1e-6)

    # and the converter-side column permutation produces exactly that layout
    lin = {"kernel": rng.standard_normal((6, 3 * H * D)).astype(np.float32),
           "bias": rng.standard_normal((3 * H * D,)).astype(np.float32)}
    out_lin = deinterleave_rope_columns(lin, H, D)
    q = lin["kernel"][:, : H * D].reshape(6, H, D)
    q_perm = np.concatenate([q[..., 0::2], q[..., 1::2]], axis=-1).reshape(6, H * D)
    np.testing.assert_array_equal(out_lin["kernel"][:, : H * D], q_perm)
    v = lin["kernel"][:, 2 * H * D:]
    np.testing.assert_array_equal(out_lin["kernel"][:, 2 * H * D:], v)
