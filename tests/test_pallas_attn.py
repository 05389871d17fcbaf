"""Single-block VMEM attention kernel vs the dense masked softmax."""

import numpy as np

import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.ops.pallas.attn import single_block_attention


def test_single_block_attention_matches_dense(rng):
    B, H, T, D = 3, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    lens = jnp.asarray([256, 100, 1], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None])[:, None, None, :]
    ref = np.asarray(nn.mha(q, k, v, mask=mask))
    got = np.asarray(single_block_attention(q, k, v, lens, interpret=True))
    for b, L in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(got[b, :, :L], ref[b, :, :L], atol=2e-5,
                                   rtol=1e-4)


def test_single_block_attention_bf16(rng):
    B, H, T, D = 2, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
    lens = jnp.asarray([128, 77], jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None])[:, None, None, :]
    ref = np.asarray(nn.mha(q, k, v, mask=mask), np.float32)
    got = np.asarray(single_block_attention(q, k, v, lens, interpret=True),
                     np.float32)
    for b, L in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(got[b, :, :L], ref[b, :, :L], atol=3e-2,
                                   rtol=3e-2)


def test_packed_pair_attention_matches_single_block(rng):
    from indextts_tpu.ops.pallas.attn import packed_pair_attention

    B, H, T, D = 2, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.float32)
    lens = jnp.asarray([256, 100], jnp.int32)

    def to_bhtd(x):
        return x.reshape(B, T, H, D).transpose(0, 2, 1, 3)

    ref = np.asarray(single_block_attention(
        to_bhtd(q), to_bhtd(k), to_bhtd(v), lens, interpret=True))
    got = np.asarray(packed_pair_attention(q, k, v, lens, heads=H,
                                           interpret=True))
    got = got.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    for b, L in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(got[b, :, :L], ref[b, :, :L], atol=2e-5,
                                   rtol=1e-4)


def test_packed_pair_attention_bf16(rng):
    from indextts_tpu.ops.pallas.attn import packed_pair_attention

    B, H, T, D = 1, 8, 128, 64
    q = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.bfloat16)
    lens = jnp.asarray([77], jnp.int32)

    def to_bhtd(x):
        return x.reshape(B, T, H, D).transpose(0, 2, 1, 3)

    ref = np.asarray(single_block_attention(
        to_bhtd(q), to_bhtd(k), to_bhtd(v), lens, interpret=True),
        np.float32)
    got = np.asarray(packed_pair_attention(q, k, v, lens, heads=H,
                                           interpret=True), np.float32)
    got = got.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    for b, L in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(got[b, :, :L], ref[b, :, :L], atol=3e-2,
                                   rtol=3e-2)


def test_dit_backbone_packed_wiring(rng, monkeypatch):
    """The packed kernel as wired into dit_backbone_forward (natural-layout
    call, no head transposes) matches the dense CPU path."""
    import jax

    from indextts_tpu.config import DiTConfig
    from indextts_tpu.models.s2mel import dit
    from indextts_tpu.nn import InitRng
    from indextts_tpu.ops.pallas import attn as attn_mod
    from indextts_tpu.ops.rope import precompute_freqs_cis

    cfg = DiTConfig(hidden_dim=128, num_heads=2, depth=2, in_channels=8)
    assert cfg.head_dim == 64
    p = dit.init_dit_backbone(InitRng(3), cfg)
    B, T = 2, 256
    x = jnp.asarray(rng.standard_normal((B, T, 128)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, 1, 128)), jnp.float32)
    freqs = jnp.asarray(precompute_freqs_cis(T, cfg.head_dim, cfg.rope_base))
    lens = jnp.asarray([256, 130], jnp.int32)
    mask = jnp.arange(T)[None, :] < lens[:, None]

    ref = np.asarray(dit.dit_backbone_forward(p, cfg, x, c, freqs, mask,
                                              lengths=None))

    real = attn_mod.packed_pair_attention_rope
    monkeypatch.setattr(
        attn_mod, "packed_pair_attention_rope",
        lambda *a, **k: real(*a, interpret=True, **k))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = np.asarray(dit.dit_backbone_forward(p, cfg, x, c, freqs, mask,
                                              lengths=lens))
    for b, L in enumerate(np.asarray(lens)):
        np.testing.assert_allclose(got[b, :L], ref[b, :L], atol=2e-4,
                                   rtol=2e-3)


def test_packed_rope_matches_rope_then_packed(rng):
    """In-kernel half-split rope == apply_rotary_emb_half then attention."""
    from indextts_tpu.ops.pallas.attn import (packed_pair_attention,
                                              packed_pair_attention_rope)
    from indextts_tpu.ops.rope import (apply_rotary_emb_half,
                                       precompute_freqs_cis)

    B, H, T, D = 2, 4, 256, 64
    # bf16: the f32 rope rounds once more than XLA's fused multiply-add
    # before the bf16 cast -> rare 1-ulp flips (measured 24/65536 elements)
    for dt, atol in ((jnp.float32, 1e-5), (jnp.bfloat16, 4e-3)):
        q = jnp.asarray(rng.standard_normal((B, T, H * D)), dt)
        k = jnp.asarray(rng.standard_normal((B, T, H * D)), dt)
        v = jnp.asarray(rng.standard_normal((B, T, H * D)), dt)
        lens = jnp.asarray([256, 100], jnp.int32)
        freqs = jnp.asarray(precompute_freqs_cis(T, D))

        qr = apply_rotary_emb_half(q.reshape(B, T, H, D), freqs)
        kr = apply_rotary_emb_half(k.reshape(B, T, H, D), freqs)
        ref = np.asarray(packed_pair_attention(
            qr.reshape(B, T, H * D), kr.reshape(B, T, H * D), v, lens,
            heads=H, interpret=True), np.float32)
        got = np.asarray(packed_pair_attention_rope(
            q, k, v, lens, freqs, heads=H, interpret=True), np.float32)
        for b, L in enumerate(np.asarray(lens)):
            np.testing.assert_allclose(got[b, :L], ref[b, :L], atol=atol,
                                       rtol=1e-4)


def test_packed_pair_attention_long_t(rng):
    """The T>1536 branch (q_chunk drops to 128, serving-cap bucket path)."""
    from indextts_tpu.ops.pallas.attn import packed_pair_attention

    B, H, T, D = 1, 2, 1664, 64
    q = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.float32)
    lens = jnp.asarray([1600], jnp.int32)

    def to_bhtd(x):
        return x.reshape(B, T, H, D).transpose(0, 2, 1, 3)

    mask = (jnp.arange(T)[None, :] < lens[:, None])[:, None, None, :]
    ref = np.asarray(nn.mha(to_bhtd(q), to_bhtd(k), to_bhtd(v), mask=mask))
    got = np.asarray(packed_pair_attention(q, k, v, lens, heads=H,
                                           interpret=True))
    got = got.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got[0, :, :1600], ref[0, :, :1600],
                               atol=2e-5, rtol=1e-4)
