"""Mel filterbanks and mel-spectrogram front-ends.

Three distinct mel front-ends exist in the reference and are rebuilt here:

1. ``mel_spectrogram_22k`` — HiFiGAN-style 80-mel/22.05 kHz (slaney scale+norm,
   log dynamic-range compression), feeding the s2mel DiT and BigVGAN-v2.
   Behavioral reference: `/root/reference/indextts/s2mel/modules/audio.py:45-82`.
2. ``kaldi_fbank`` — Kaldi-compatible 80-mel log fbank at 16 kHz feeding
   CAMPPlus (`/root/reference/indextts/infer_v2.py:457-462` uses
   torchaudio.compliance.kaldi.fbank with dither=0).
3. ``mel_spectrogram_24k_v1`` — torchaudio-style 100-mel/24 kHz (HTK scale,
   no norm, safe_log) feeding the v1 conditioning encoder
   (`/root/reference/indextts/utils/feature_extractors.py:24-50`).

Filterbank matrices are built once in numpy (host, at trace time) and closed
over as constants; the STFT+matmul run on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu.ops.stft import hann_window, povey_window, stft_magnitude, frame_signal

# ---------------------------------------------------------------------------
# mel scales
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _hz_to_mel_kaldi(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    scale: str = "slaney",
    norm: Optional[str] = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, (n_mels, n_fft//2 + 1).

    ``scale='slaney', norm='slaney'`` matches librosa defaults (used by the
    22 kHz front-end); ``scale='htk', norm=None`` matches torchaudio defaults
    (used by the v1 24 kHz front-end).
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    if scale == "slaney":
        to_mel, to_hz = _hz_to_mel_slaney, _mel_to_hz_slaney
    elif scale == "htk":
        to_mel, to_hz = _hz_to_mel_htk, _mel_to_hz_htk
    else:
        raise ValueError(f"unknown mel scale {scale}")
    mel_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz_pts = to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(dtype)


def kaldi_mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    dtype=np.float32,
) -> np.ndarray:
    """Kaldi-style mel bins: triangles computed *in mel space* on FFT bins.

    Matches torchaudio.compliance.kaldi.get_mel_banks (vtln_warp=1.0).
    Returns (n_mels, n_fft//2 + 1); kaldi drops the nyquist bin internally but
    its weight there is zero, so we keep the full rfft width for one matmul.
    """
    if high_freq <= 0.0:
        high_freq = sr / 2.0 + high_freq
    fft_bin_width = sr / n_fft
    mel_low = _hz_to_mel_kaldi(low_freq)
    mel_high = _hz_to_mel_kaldi(high_freq)
    mel_delta = (mel_high - mel_low) / (n_mels + 1)
    n_freqs = n_fft // 2 + 1
    bin_mels = _hz_to_mel_kaldi(fft_bin_width * np.arange(n_freqs))
    weights = np.zeros((n_mels, n_freqs), dtype=np.float64)
    for m in range(n_mels):
        left, center, right = (
            mel_low + m * mel_delta,
            mel_low + (m + 1) * mel_delta,
            mel_low + (m + 2) * mel_delta,
        )
        up = (bin_mels - left) / (center - left)
        down = (right - bin_mels) / (right - center)
        weights[m] = np.maximum(0.0, np.minimum(up, down))
    # kaldi zeroes the triangle outside [low, high] implicitly via the min/max
    return weights.astype(dtype)


# ---------------------------------------------------------------------------
# front-end 1: s2mel / BigVGAN 22.05 kHz 80-mel
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _mel22k_consts(n_fft, num_mels, sr, fmin, fmax):
    fb = mel_filterbank(sr, n_fft, num_mels, fmin, fmax, scale="slaney", norm="slaney")
    return fb, hann_window(n_fft)


def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int = 1024,
    num_mels: int = 80,
    sampling_rate: int = 22050,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    center: bool = False,
) -> jnp.ndarray:
    """HiFiGAN-style log-mel, (B, T) -> (B, num_mels, frames).

    Matches `s2mel/modules/audio.py:45-82`: reflect pad (n_fft-hop)/2 each
    side, hann window, |stft| with +1e-9 inside the sqrt, slaney mel, then
    log(clamp(x, 1e-5)).
    """
    fb, win = _mel22k_consts(n_fft, num_mels, sampling_rate, float(fmin), fmax)
    pad = int((n_fft - hop_size) / 2)
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    mag = stft_magnitude(y, jnp.asarray(win), n_fft=n_fft, hop=hop_size,
                         win_length=win_size, center=center)
    mel = jnp.einsum("mf,bft->bmt", jnp.asarray(fb), mag)
    return jnp.log(jnp.clip(mel, min=1e-5))


# alias matching the reference symbol name
mel_spectrogram_22k = mel_spectrogram


# ---------------------------------------------------------------------------
# front-end 2: Kaldi fbank (CAMPPlus input)
# ---------------------------------------------------------------------------

def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.lru_cache(maxsize=4)
def _kaldi_consts(sr, frame_length, num_mel_bins):
    n_fft = _next_pow2(frame_length)
    fb = kaldi_mel_filterbank(sr, n_fft, num_mel_bins)
    win = povey_window(frame_length)
    return n_fft, fb, win


@functools.partial(jax.jit, static_argnames=("num_mel_bins", "sample_frequency", "frame_length", "frame_shift"))
def kaldi_fbank(
    y: jnp.ndarray,
    num_mel_bins: int = 80,
    sample_frequency: int = 16000,
    frame_length: int = 400,
    frame_shift: int = 160,
    preemphasis: float = 0.97,
) -> jnp.ndarray:
    """Kaldi log-mel fbank, (B, T) -> (B, frames, num_mel_bins).

    Matches torchaudio.compliance.kaldi.fbank defaults with dither=0 as called
    by the reference (`infer_v2.py:457-460`): snip_edges framing, per-frame DC
    removal, pre-emphasis (first sample replicated), povey window, pad to the
    next power-of-two FFT, power spectrum, kaldi mel triangles, log with
    float-eps floor.
    """
    n_fft, fb, win = _kaldi_consts(sample_frequency, frame_length, num_mel_bins)
    frames = frame_signal(y.astype(jnp.float32), frame_length, frame_shift)  # (B,F,L)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # remove_dc_offset
    shifted = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - preemphasis * shifted
    frames = frames * jnp.asarray(win)[None, None, :]
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_fft - frame_length)))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.einsum("mf,btf->btm", jnp.asarray(fb), power)
    eps = float(np.finfo(np.float32).eps)
    return jnp.log(jnp.maximum(mel, eps))


# ---------------------------------------------------------------------------
# front-end 3: v1 conditioning 24 kHz 100-mel (torchaudio-style)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _mel24k_consts(n_fft, n_mels, sr, fmin, fmax):
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, scale="htk", norm=None)
    return fb, hann_window(n_fft)


def mel_spectrogram_24k_v1(
    y: jnp.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 100,
    mel_fmin: float = 0.0,
    mel_fmax: Optional[float] = None,
) -> jnp.ndarray:
    """v1 conditioning mel: torchaudio MelSpectrogram(power=1, center=True,
    htk scale, no norm) + log(clip(1e-7)).

    Behavioral reference: `utils/feature_extractors.py:24-50` + safe_log in
    `utils/common.py`.
    """
    fb, win = _mel24k_consts(n_fft, n_mels, sample_rate, float(mel_fmin), mel_fmax)
    mag = stft_magnitude(y, jnp.asarray(win), n_fft=n_fft, hop=hop_length,
                         win_length=n_fft, center=True, pad_mode="reflect")
    mel = jnp.einsum("mf,bft->bmt", jnp.asarray(fb), mag)
    return jnp.log(jnp.clip(mel, min=1e-7))
