"""WaveNet edge-fix padding (gather-free) vs the masked reflect-pad gather.

`wavenet_forward` with INDEXTTS_WN_PAD=edgefix replaces the per-layer
(B, T+pad, C) take_along_axis gather with a static left reflection + zero
tail + per-row right-edge corrections; the result must match the reflect
path on every valid frame for rows with len > pad_l.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from indextts_tpu.config import WaveNetConfig
from indextts_tpu.models.s2mel.dit import init_wavenet, wavenet_forward
from indextts_tpu.nn import InitRng, sequence_mask


@pytest.mark.parametrize("lens", [(24, 24), (17, 23), (24, 3)])
def test_edgefix_matches_reflect(monkeypatch, lens):
    w = WaveNetConfig(hidden_dim=32, num_layers=3, kernel_size=5)
    params = init_wavenet(InitRng(0), w)
    B, T = len(lens), 24
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, T, w.hidden_dim)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 1, w.hidden_dim)), jnp.float32)
    lengths = jnp.asarray(lens, jnp.int32)
    mask = sequence_mask(lengths, T)

    monkeypatch.setenv("INDEXTTS_WN_PAD", "reflect")
    ref = np.asarray(wavenet_forward(params, w, x, mask, g, lengths=lengths))
    monkeypatch.setenv("INDEXTTS_WN_PAD", "edgefix")
    got = np.asarray(wavenet_forward(params, w, x, mask, g, lengths=lengths))
    for b, ln in enumerate(lens):
        np.testing.assert_allclose(got[b, :ln], ref[b, :ln],
                                   atol=1e-5, rtol=1e-5, err_msg=f"row {b}")


def test_edgefix_dilation_falls_back(monkeypatch):
    """dilation_rate > 1 keeps the reflect gather (edgefix gated off)."""
    w = WaveNetConfig(hidden_dim=16, num_layers=2, kernel_size=3,
                      dilation_rate=2)
    params = init_wavenet(InitRng(1), w)
    B, T = 2, 16
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((B, T, w.hidden_dim)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 1, w.hidden_dim)), jnp.float32)
    lengths = jnp.asarray([16, 12], jnp.int32)
    mask = sequence_mask(lengths, T)
    monkeypatch.setenv("INDEXTTS_WN_PAD", "reflect")
    ref = np.asarray(wavenet_forward(params, w, x, mask, g, lengths=lengths))
    monkeypatch.setenv("INDEXTTS_WN_PAD", "edgefix")
    got = np.asarray(wavenet_forward(params, w, x, mask, g, lengths=lengths))
    # layer 0 has dilation 1 (edge-fixed), layer 1 dilation 2 (reflect);
    # valid frames must still agree
    for b, ln in enumerate((16, 12)):
        np.testing.assert_allclose(got[b, :ln], ref[b, :ln],
                                   atol=1e-5, rtol=1e-5)
