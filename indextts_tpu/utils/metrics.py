"""Evaluation metrics: mel-cepstral distortion (MCD) for waveform parity.

The reference ships no numerical parity tooling (SURVEY.md §4); this provides
the MCD-with-DTW measure used to compare synthesized waveforms against the
torch reference once real checkpoints are available
(`eval/parity_eval.py` drives it over `examples/cases.jsonl`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from indextts_tpu.ops.mel import mel_spectrogram


def mfcc_from_wav(wav: np.ndarray, sr: int = 22050, n_mfcc: int = 13) -> np.ndarray:
    """Log-mel -> DCT-II cepstra, (frames, n_mfcc), c0 dropped."""
    import jax.numpy as jnp
    from scipy.fftpack import dct

    mel = np.asarray(mel_spectrogram(jnp.asarray(wav[None, :], jnp.float32)))[0]
    cep = dct(mel.T, type=2, axis=1, norm="ortho")  # (frames, n_mels)
    return cep[:, 1 : n_mfcc + 1]


def dtw_path_cost(a: np.ndarray, b: np.ndarray) -> Tuple[float, int]:
    """DTW over frame-wise euclidean distance; returns (total cost, path len)."""
    na, nb = len(a), len(b)
    dist = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    acc = np.full((na + 1, nb + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, na + 1):
        j_lo, j_hi = 1, nb + 1
        for j in range(j_lo, j_hi):
            acc[i, j] = dist[i - 1, j - 1] + min(acc[i - 1, j], acc[i, j - 1],
                                                 acc[i - 1, j - 1])
    # backtrack path length
    i, j, steps = na, nb, 0
    while i > 0 or j > 0:
        steps += 1
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            k = int(np.argmin([acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]]))
            if k == 0:
                i, j = i - 1, j - 1
            elif k == 1:
                i -= 1
            else:
                j -= 1
    return float(acc[na, nb]), steps


def mcd(wav_a: np.ndarray, wav_b: np.ndarray, sr: int = 22050) -> float:
    """Mel-cepstral distortion (dB) with DTW alignment; standard 10√2/ln10 scale."""
    ca = mfcc_from_wav(wav_a, sr)
    cb = mfcc_from_wav(wav_b, sr)
    if len(ca) == 0 or len(cb) == 0:
        return float("inf")
    cost, steps = dtw_path_cost(ca, cb)
    k = 10.0 * np.sqrt(2.0) / np.log(10.0)
    return k * cost / max(steps, 1)
