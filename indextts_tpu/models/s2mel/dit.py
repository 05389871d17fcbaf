"""Flow-matching DiT velocity estimator (semantic-to-mel), TPU-native.

Behavioral reference: `/root/reference/indextts/s2mel/modules/diffusion_transformer.py`
+ the gpt_fast backbone (`s2mel/modules/gpt_fast/model.py`) + WaveNet head
(`s2mel/modules/wavenet.py`):

  input  = concat[noisy-mel 80, prompt-mel 80, cond 512, style 192] -> 512
  body   = non-causal rope transformer, time-conditioned via AdaptiveLayerNorm
           (adaLN over RMSNorm; c = t_embedder(t))
  skip   = long skip: skip_linear(concat[body_out, noisy-mel])
  head   = 'wavenet': conv1 -> WN(g=t2) + res_projection -> FinalLayer(adaLN
           LayerNorm + linear) -> 1x1 conv -> 80   (or 'mlp')

All activations are (B, T, C); everything static-shape per mel-length bucket.
The Euler loop lives in cfm.py as a `lax.scan`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from indextts_tpu import nn
from indextts_tpu.config import DiTConfig, S2MelConfig, WaveNetConfig
from indextts_tpu.nn import InitRng, Params
from indextts_tpu.ops.rope import apply_rotary_emb_half, precompute_freqs_cis


# ---------------------------------------------------------------------------
# timestep embedding
# ---------------------------------------------------------------------------

def init_timestep_embedder(rng: InitRng, hidden: int, freq_dim: int = 256) -> Params:
    return {
        "mlp0": nn.dense_init(rng, freq_dim, hidden),
        "mlp2": nn.dense_init(rng, hidden, hidden),
    }


def timestep_embedding(t: jnp.ndarray, freq_dim: int = 256, max_period: float = 10000.0,
                       scale: float = 1000.0) -> jnp.ndarray:
    """(B,) -> (B, freq_dim); reference `diffusion_transformer.py:19-55`."""
    half = freq_dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = scale * t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def timestep_embed(p: Params, t: jnp.ndarray) -> jnp.ndarray:
    h = timestep_embedding(t)
    h = nn.dense(p["mlp0"], h)
    h = jax.nn.silu(h)
    return nn.dense(p["mlp2"], h)


# ---------------------------------------------------------------------------
# gpt_fast transformer backbone with adaLN
# ---------------------------------------------------------------------------

def _ada_ln_init(rng: InitRng, dim: int) -> Params:
    return {"project": nn.dense_init(rng, dim, 2 * dim), "norm": nn.rms_norm_init(rng, dim)}


def _ada_ln(p: Params, x: jnp.ndarray, c: Optional[jnp.ndarray], eps: float) -> jnp.ndarray:
    """AdaptiveLayerNorm (reference gpt_fast `model.py:20-38`). c: (B, 1, D).

    The modulation projection runs in fp32 (c is the fp32 timestep
    embedding, and it is a tiny (B, 1, D) matmul), but the big (B, T, D)
    scale-shift applies in the stream dtype: w/b vary only over (B, 1, D),
    so rounding them to bf16 once costs ~1 ulp on the modulated stream while
    halving the elementwise traffic (INDEXTTS_ADALN_F32=1 restores the f32
    elementwise for A/B). The result stays in x.dtype either way — fp32
    would silently promote the whole backbone and break the scan carry."""
    import os

    normed = nn.rms_norm(p["norm"], x, eps)
    if c is None:
        return normed
    wb = nn.dense(p["project"], c.astype(jnp.float32))
    w, b = jnp.split(wb, 2, axis=-1)
    if os.environ.get("INDEXTTS_ADALN_F32", "0") == "1":
        return (w * normed.astype(w.dtype) + b).astype(x.dtype)
    return (w.astype(x.dtype) * normed.astype(x.dtype)
            + b.astype(x.dtype)).astype(x.dtype)


def stack_layer_list(layers):
    """List of per-layer param dicts -> one dict of (L, ...)-stacked arrays
    (the backbone runs as a lax.scan: one compiled layer body instead of
    `depth` inlined copies — smaller programs, one flash-attention instance)."""
    import numpy as _np

    return jax.tree_util.tree_map(lambda *xs: _np.stack(
        [_np.asarray(x) for x in xs]), *layers)


def init_dit_backbone(rng: InitRng, cfg: DiTConfig) -> Params:
    D, H, Dh = cfg.hidden_dim, cfg.num_heads, cfg.head_dim
    inter = cfg.intermediate_size
    layers = []
    for _ in range(cfg.depth):
        layers.append({
            "attention_norm": _ada_ln_init(rng, D),
            "attn": {
                "wqkv": nn.dense_init(rng, D, 3 * H * Dh, bias=False),
                "wo": nn.dense_init(rng, H * Dh, D, bias=False),
            },
            "ffn_norm": _ada_ln_init(rng, D),
            "ff": {
                "w1": nn.dense_init(rng, D, inter, bias=False),
                "w3": nn.dense_init(rng, D, inter, bias=False),
                "w2": nn.dense_init(rng, inter, D, bias=False),
            },
        })
    return {"layers": stack_layer_list(layers), "norm": _ada_ln_init(rng, D)}


def dit_backbone_forward(p: Params, cfg: DiTConfig, x: jnp.ndarray,
                         c: jnp.ndarray, freqs_cis: jnp.ndarray,
                         mask: Optional[jnp.ndarray],
                         lengths: Optional[jnp.ndarray] = None,
                         seq_sharding=None) -> jnp.ndarray:
    """x: (B, T, D), c: (B, 1, D) time conditioning, mask: (B, T) keep-mask.

    seq_sharding (a NamedSharding over (batch, time, feature), time on the
    mesh's sp axis) turns on sequence-parallel execution: the residual
    stream is constrained to that sharding every layer and the DENSE
    attention form is used — GSPMD partitions the score matmul spatially
    and inserts the k all-gather itself, whereas a Pallas custom call would
    force a full gather + replicated compute.

    Attention, fastest-first on TPU (all length-masked, non-causal only):
    1. packed_pair_attention — natural (B, T, H*Dh) layout, heads in pairs
       on 128-lane slices, full-tile matmuls; 0.71 ms/layer device-measured
       at (16, 8, 1152, 64) vs 1.02 for the per-(b,h) kernel, AND it drops
       the 4 per-layer head transposes. Needs H even, 2*Dh == 128.
    2. single_block flash (nn.mha_flash) — per-(b,h) grid, measured 3.3 ms
       vs 4.5 ms dense per step (jax's tiled flash was SLOWER than dense;
       the win only appears with block_q == block_k == T).
    3. Dense masked softmax otherwise.
    Pad query rows attend only the pad segment under 1/2; every consumer
    masks by length downstream, so their garbage never escapes.
    """
    import os

    B, T, D = x.shape
    H, Dh = cfg.num_heads, cfg.head_dim
    # T caps: the single-block kernel holds the full (T, T) f32 scores in
    # VMEM under the default 16 MB scope (OOM measured at T=2560); the
    # packed kernel chunks queries and raises its VMEM limit, so it covers
    # the 1500-mel-token serving bucket (T~2304) too. Past its cap, dense.
    on_tpu = jax.default_backend() in ("tpu", "axon")
    kernel_ok = (not cfg.is_causal and lengths is not None and T % 128 == 0
                 and on_tpu and seq_sharding is None)
    # T cap = the r5 serving envelope (2688-frame mel bucket + 768-frame
    # prompt bucket): device-probed at T=3200/3456 under the kernel's
    # 100 MB vmem limit — packed 0.56/0.70 ms/layer vs dense 1.92/2.11
    # (tools/probe_attn_t3456.py; parity 1e-3 bf16 noise). Beyond 3456 the
    # unrolled f32 score temporaries outgrow the limit -> dense fallback.
    use_packed = (kernel_ok and T <= 3456 and H % 2 == 0 and 2 * Dh == 128
                  and os.environ.get("INDEXTTS_PACKED_ATTN", "1") != "0")
    use_flash = (kernel_ok and T <= 1536
                 and os.environ.get("INDEXTTS_FLASH_DIT", "1") != "0")
    attn_mask = None
    if mask is not None and not cfg.is_causal:
        attn_mask = mask[:, None, None, :].astype(bool)
    elif cfg.is_causal:
        attn_mask = jnp.tril(jnp.ones((T, T), bool))[None, None]

    def body(xc, lp):
        if seq_sharding is not None:
            xc = jax.lax.with_sharding_constraint(xc, seq_sharding)
        h = _ada_ln(lp["attention_norm"], xc, c, cfg.norm_eps)
        qkv = nn.dense(lp["attn"]["wqkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if use_packed:
            # rope is fused into the kernel (same half-split math on the
            # pre-rope rows) — the XLA-side rope costs ~5 ms/step of
            # narrow-lane elementwise traffic on the (B, T, H, 64) layout
            from indextts_tpu.ops.pallas.attn import \
                packed_pair_attention_rope
            out = packed_pair_attention_rope(q, k, v, lengths, freqs_cis,
                                             heads=H)
            xc = xc + nn.dense(lp["attn"]["wo"], out)
            h = _ada_ln(lp["ffn_norm"], xc, c, cfg.norm_eps)
            h = nn.dense(lp["ff"]["w2"],
                         jax.nn.silu(nn.dense(lp["ff"]["w1"], h))
                         * nn.dense(lp["ff"]["w3"], h))
            return xc + h, None
        # half-split rope: wqkv columns are pair-deinterleaved (random init
        # is layout-free; torch checkpoints are permuted by the converter)
        q = apply_rotary_emb_half(q.reshape(B, T, H, Dh), freqs_cis)
        k = apply_rotary_emb_half(k.reshape(B, T, H, Dh), freqs_cis)
        v = v.reshape(B, T, H, Dh)
        if use_flash:
            out = nn.mha_flash(q.transpose(0, 2, 1, 3),
                               k.transpose(0, 2, 1, 3),
                               v.transpose(0, 2, 1, 3), lengths)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
        else:
            out = nn.mha(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                         v.transpose(0, 2, 1, 3), mask=attn_mask)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
        xc = xc + nn.dense(lp["attn"]["wo"], out)
        h = _ada_ln(lp["ffn_norm"], xc, c, cfg.norm_eps)
        h = nn.dense(lp["ff"]["w2"],
                     jax.nn.silu(nn.dense(lp["ff"]["w1"], h))
                     * nn.dense(lp["ff"]["w3"], h))
        return xc + h, None

    x, _ = jax.lax.scan(body, x, p["layers"])
    return _ada_ln(p["norm"], x, c, cfg.norm_eps)


# ---------------------------------------------------------------------------
# WaveNet head
# ---------------------------------------------------------------------------

def init_wavenet(rng: InitRng, w: WaveNetConfig) -> Params:
    hc = w.hidden_dim
    layers = []
    for i in range(w.num_layers):
        dilation = w.dilation_rate ** i
        res_skip_ch = 2 * hc if i < w.num_layers - 1 else hc
        layers.append({
            "in_layer": nn.conv1d_init(rng, hc, 2 * hc, w.kernel_size),
            "res_skip": nn.conv1d_init(rng, hc, res_skip_ch, 1),
        })
    return {"layers": layers, "cond_layer": nn.conv1d_init(rng, hc, 2 * hc * w.num_layers, 1)}


def wavenet_forward(p: Params, w: WaveNetConfig, x: jnp.ndarray,
                    mask: Optional[jnp.ndarray], g: jnp.ndarray,
                    lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Non-causal WN with gated tanh/sigmoid units.

    x: (B, T, hc); g: (B, 1, hc) global conditioning (time embedding t2).
    Reference `wavenet.py:103-174` + fused gate `commons.py:132-141`.
    The in_layer convs use encodec SConv1d semantics: asymmetric *reflect*
    padding of (effective_kernel - 1), NOT the zero padding WN passes in
    (`encodec.py:212-228` ignores the padding arg) — replicated here with
    masked reflect padding around each row's valid region.
    """
    import os

    hc = w.hidden_dim
    output = jnp.zeros_like(x)
    g_all = nn.conv1d(p["cond_layer"], g, padding="VALID")  # (B, 1, 2*hc*L)
    m = mask[:, :, None].astype(x.dtype) if mask is not None else None
    T = x.shape[1]
    if lengths is None:
        lengths = jnp.sum(mask.astype(jnp.int32), axis=1) if mask is not None \
            else jnp.full((x.shape[0],), T, jnp.int32)
    # WN padding strategy:
    #   reflect — masked_reflect_pad: a (B, T+pad, C) take_along_axis gather
    #             per layer per Euler step (the round-2 default)
    #   edgefix — same values without the gather: static left reflection +
    #             zero tail + per-row right-edge corrections (only the last
    #             pad_r output columns of a row see the reflected tail, so
    #             patch exactly those via tiny matmuls and a (B, pad_r)-row
    #             scatter-add). Exact for rows with len > pad_l (serving rows
    #             are hundreds of frames; a len<=2 row is degenerate audio).
    #   zero    — profiling-only bound (wrong at row edges, same conv cost)
    pad_mode = os.environ.get("INDEXTTS_WN_PAD", "edgefix")
    if pad_mode == "edgefix":
        # beyond-len garbage must be exactly zero for the zero-tail conv
        x = x * m if m is not None else x
    for i, lp in enumerate(p["layers"]):
        dilation = w.dilation_rate ** i
        eff_k = (w.kernel_size - 1) * dilation + 1
        pad_total = eff_k - 1
        pad_r = pad_total // 2
        pad_l = pad_total - pad_r
        if pad_mode == "zero":
            x_pad = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
            x_in = nn.conv1d(lp["in_layer"], x_pad, padding="VALID",
                             dilation=dilation)
        elif pad_mode == "edgefix" and dilation == 1:
            k = w.kernel_size
            B = x.shape[0]
            left = x[:, 1:pad_l + 1][:, ::-1]          # reflect at 0, static
            x_pad = jnp.concatenate(
                [left, x, jnp.zeros((B, pad_r) + x.shape[2:], x.dtype)], 1)
            x_in = nn.conv1d(lp["in_layer"], x_pad, padding="VALID")
            kern = lp["in_layer"]["kernel"]            # (k, C, 2hc)
            rows = jnp.arange(B)
            last = lengths - 1
            for q in range(pad_r):
                # output column len-1-q misses the taps whose input index
                # lands in the zeroed tail; add W_t . x[reflect(idx)]
                j = jnp.clip(last - q, 0)
                corr = 0.0
                for tp in range(pad_l + q + 1, k):
                    src = jnp.clip(last + q + pad_l - tp, 0)
                    xv = jnp.take_along_axis(x, src[:, None, None],
                                             axis=1)[:, 0]        # (B, C)
                    corr = corr + (xv.astype(jnp.float32)
                                   @ kern[tp].astype(jnp.float32))
                corr = jnp.where((last - q >= 0)[:, None], corr, 0.0)
                x_in = x_in.at[rows, j].add(corr.astype(x_in.dtype))
        else:
            x_pad = nn.masked_reflect_pad(x, lengths, pad_l, pad_r)
            x_in = nn.conv1d(lp["in_layer"], x_pad, padding="VALID",
                             dilation=dilation)
        g_l = jax.lax.dynamic_slice_in_dim(g_all, i * 2 * hc, 2 * hc, axis=2)
        acts = x_in + g_l
        t_act = jnp.tanh(acts[..., :hc])
        s_act = jax.nn.sigmoid(acts[..., hc:])
        acts = t_act * s_act
        res_skip = nn.conv1d(lp["res_skip"], acts, padding="VALID")
        if i < w.num_layers - 1:
            x = x + res_skip[..., :hc]
            if m is not None:
                x = x * m
            output = output + res_skip[..., hc:]
        else:
            output = output + res_skip
    return output * m if m is not None else output


# ---------------------------------------------------------------------------
# full DiT
# ---------------------------------------------------------------------------

def init_dit(rng: InitRng, s2: S2MelConfig) -> Params:
    cfg, w = s2.DiT, s2.wavenet
    D = cfg.hidden_dim
    style_dim = s2.style_encoder.dim
    merge_in = D + cfg.in_channels * 2 + style_dim * int(cfg.style_condition and not cfg.style_as_token)
    p: Params = {
        "x_embedder": nn.dense_init(rng, cfg.in_channels, D),
        "cond_projection": nn.dense_init(rng, cfg.content_dim, D),
        "t_embedder": init_timestep_embedder(rng, D),
        "cond_x_merge_linear": nn.dense_init(rng, merge_in, D),
        "skip_linear": nn.dense_init(rng, D + cfg.in_channels, D),
        "transformer": init_dit_backbone(rng, cfg),
    }
    if cfg.final_layer_type == "wavenet":
        p["t_embedder2"] = init_timestep_embedder(rng, w.hidden_dim)
        p["conv1"] = nn.dense_init(rng, D, w.hidden_dim)
        p["wavenet"] = init_wavenet(rng, w)
        p["res_projection"] = nn.dense_init(rng, D, w.hidden_dim)
        p["final_layer"] = {
            "linear": nn.dense_init(rng, w.hidden_dim, w.hidden_dim),
            "adaLN": nn.dense_init(rng, D, 2 * w.hidden_dim),
        }
        p["conv2"] = nn.conv1d_init(rng, w.hidden_dim, cfg.in_channels, 1)
    else:
        p["final_mlp0"] = nn.dense_init(rng, D, D)
        p["final_mlp2"] = nn.dense_init(rng, D, cfg.in_channels)
    return p


def dit_forward(p: Params, s2: S2MelConfig, x: jnp.ndarray, prompt_x: jnp.ndarray,
                x_lens: jnp.ndarray, t: jnp.ndarray, style: jnp.ndarray,
                cond: jnp.ndarray, freqs_cis: Optional[jnp.ndarray] = None,
                mask_content: bool = False, seq_sharding=None) -> jnp.ndarray:
    """Velocity estimate.

    x, prompt_x: (B, T, 80) — NOTE (B, T, C) layout, transposed vs reference.
    t: (B,), style: (B, 192), cond: (B, T, content_dim).
    Returns (B, T, 80).
    """
    cfg, w = s2.DiT, s2.wavenet
    B, T, _ = x.shape
    t1 = timestep_embed(p["t_embedder"], t)                     # (B, D)
    cond_p = nn.dense(p["cond_projection"], cond)               # (B, T, D)
    x_in = jnp.concatenate([x, prompt_x, cond_p], axis=-1)
    if cfg.style_condition and not cfg.style_as_token:
        x_in = jnp.concatenate(
            [x_in, jnp.broadcast_to(style[:, None, :], (B, T, style.shape[-1])).astype(x.dtype)],
            axis=-1)
    if mask_content:
        # CFG null branch: zero everything after the noisy-mel channels
        keep = x_in[..., : cfg.in_channels]
        x_in = jnp.concatenate([keep, jnp.zeros_like(x_in[..., cfg.in_channels:])], axis=-1)
    x_in = nn.dense(p["cond_x_merge_linear"], x_in)             # (B, T, D)

    if freqs_cis is None:
        freqs_cis = jnp.asarray(precompute_freqs_cis(T, cfg.head_dim, cfg.rope_base))
    else:
        freqs_cis = freqs_cis[:T]
    mask = nn.sequence_mask(x_lens, T)
    x_res = dit_backbone_forward(p["transformer"], cfg, x_in, t1[:, None, :],
                                 freqs_cis, mask, lengths=x_lens,
                                 seq_sharding=seq_sharding)
    x_res = nn.dense(p["skip_linear"], jnp.concatenate([x_res, x], axis=-1))

    if cfg.final_layer_type == "wavenet":
        h = nn.dense(p["conv1"], x_res)
        t2 = timestep_embed(p["t_embedder2"], t)                # (B, hc)
        h = wavenet_forward(p["wavenet"], w, h, mask, t2[:, None, :])
        h = h + nn.dense(p["res_projection"], x_res)
        # FinalLayer: LayerNorm(no affine) modulated by t1, then linear
        shift_scale = nn.dense(p["final_layer"]["adaLN"],
                               jax.nn.silu(t1))                 # (B, 2*hc)
        shift, scale = jnp.split(shift_scale, 2, axis=-1)
        hn = nn.layer_norm({}, h, eps=1e-6)
        hn = hn * (1 + scale[:, None, :]) + shift[:, None, :]
        hn = nn.dense(p["final_layer"]["linear"], hn)
        out = nn.conv1d(p["conv2"], hn, padding="VALID")
    else:
        h = jax.nn.silu(nn.dense(p["final_mlp0"], x_res))
        out = nn.dense(p["final_mlp2"], h)
    return out
