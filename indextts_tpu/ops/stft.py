"""STFT primitives in JAX.

TPU-first design notes: framing is a gather-free reshape/strided-slice; the FFT
lowers to XLA's native RFFT. Everything is static-shape so one compile serves a
whole length bucket.

Behavioral reference: torch.stft as used by the HiFiGAN-style mel front-end
(`/root/reference/indextts/s2mel/modules/audio.py:45-82`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


def povey_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Kaldi's 'povey' window: hann(periodic=False)**0.85."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (win_length - 1))
    return (w ** 0.85).astype(dtype)


def frame_signal(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice (B, T) into (B, num_frames, frame_length); drops the tail."""
    b, t = y.shape
    num_frames = 1 + (t - frame_length) // hop if t >= frame_length else 0
    if num_frames <= 0:
        return jnp.zeros((b, 0, frame_length), dtype=y.dtype)
    # gather-free framing: one strided gather via dynamic_slice per hop is slow;
    # instead build index matrix once (static shapes) and use take.
    idx = np.arange(frame_length)[None, :] + hop * np.arange(num_frames)[:, None]
    return y[:, idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center", "pad_mode"))
def stft_magnitude(
    y: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int,
    center: bool = False,
    pad_mode: str = "reflect",
    eps: float = 1e-9,
) -> jnp.ndarray:
    """|STFT| of (B, T) -> (B, n_freq, frames), matching torch.stft semantics.

    With ``center=True`` pads n_fft//2 on both sides. The reference mel
    front-end calls with center=False after its own reflect pad of
    (n_fft - hop)/2 (`audio.py:57-60`).
    """
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode=pad_mode)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(y, n_fft, hop)  # (B, F, n_fft)
    frames = frames * window[None, None, :]
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + eps)
    return jnp.transpose(mag, (0, 2, 1))  # (B, n_freq, F)
