"""BigVGAN-v2 neural vocoder, TPU-native.

Behavioral reference: `/root/reference/indextts/s2mel/modules/bigvgan/bigvgan.py`
(NVIDIA BigVGAN-v2, `nvidia/bigvgan_v2_22khz_80band_256x` config):

  conv_pre(80 -> 1536, k7)
  6 stages: weight-normed ConvTranspose1d upsample (rates 4,4,2,2,2,2) ->
            mean of 3 AMPBlock1 resblocks (kernels 3/7/11, dilations 1/3/5,
            anti-aliased snakebeta activations between convs)
  snakebeta post-activation -> conv_post(ch -> 1, k7, no bias) -> clamp [-1,1]

TPU design: (B, T, C) layout so every conv is an NWC `conv_general_dilated`
on the MXU; the anti-aliased activations call the fused op in `ops/snake.py`
(Pallas kernel underneath when enabled). Weight norm is folded at conversion
(reference calls remove_weight_norm at load, `bigvgan.py:388-400`).

Static length buckets: every op is masked/length-aware so the output matches
the reference's exact-length computation; callers slice wav[: len * 256].
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from indextts_tpu import nn
from indextts_tpu.config import BigVGANConfig
from indextts_tpu.nn import InitRng, Params
from indextts_tpu.ops.snake import antialias_activation


def _get_padding(k: int, d: int) -> int:
    return (k * d - d) // 2


def init_bigvgan(rng: InitRng, h: BigVGANConfig) -> Params:
    ch0 = h.upsample_initial_channel
    p: Params = {"conv_pre": nn.conv1d_init(rng, h.num_mels, ch0, 7)}
    ups = []
    resblocks = []
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        cin = ch0 // (2 ** i)
        cout = ch0 // (2 ** (i + 1))
        ups.append({"kernel": rng.normal((k, cin, cout), std=0.01),
                    "bias": rng.zeros((cout,))})
        for ks, dils in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
            convs1 = [nn.conv1d_init(rng, cout, cout, ks) for _ in dils]
            convs2 = [nn.conv1d_init(rng, cout, cout, ks) for _ in dils]
            acts = []
            for _ in range(2 * len(dils)):
                a = {"alpha": rng.zeros((cout,))}
                if h.activation == "snakebeta":
                    a["beta"] = rng.zeros((cout,))
                acts.append(a)
            resblocks.append({"convs1": convs1, "convs2": convs2, "acts": acts})
    p["ups"] = ups
    p["resblocks"] = resblocks
    ch_last = ch0 // (2 ** len(h.upsample_rates))
    p["activation_post"] = {"alpha": rng.zeros((ch_last,))}
    if h.activation == "snakebeta":
        p["activation_post"]["beta"] = rng.zeros((ch_last,))
    p["conv_post"] = nn.conv1d_init(rng, ch_last, 1, 7, bias=h.use_bias_at_final)
    return p


def _mask(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    if lengths is None:
        return x
    return jnp.where(nn.sequence_mask(lengths, x.shape[1])[:, :, None], x, 0.0)


def _res_conv(p: Params, x: jnp.ndarray, ks: int, d: int) -> jnp.ndarray:
    """Resblock conv. The time-folded formulation (`ops/fold_conv.py`) is
    kept as an OPT-IN (INDEXTTS_FOLDED_CONV=1; =force off-TPU) and is OFF by
    default — an honest negative: standalone micro-benchmarks showed 1.2-1.4x
    per-conv wins for lane-folding the narrow stages, but whole-vocoder
    in-process A/Bs measured 576 ms plain vs 806 ms folded (d=1 only) vs
    1033 ms (all convs): in model context XLA fuses masks/residuals into the
    plain convs, while the fold's pad+einsum chain breaks those fusions and
    the dilated folds run 5-7x the FLOPs."""
    import os

    flag = os.environ.get("INDEXTTS_FOLDED_CONV", "0")
    B, T, C = x.shape
    mm = os.environ.get("INDEXTTS_MATMUL_CONV", "0")
    if C >= 256 and mm != "0" and (mm == "force"
                                   or jax.default_backend() in ("tpu", "axon")):
        # wide stages: same conv as k shifted full-lane matmuls (f=1 fold) —
        # XLA's NWC conv lowering measured 1.6-3x slower than plain dots at
        # these shapes (tools/bench_bigvgan_ops.py, /tmp/bvops3 probes)
        from indextts_tpu.ops.fold_conv import fold_conv1d

        return fold_conv1d(p, x, 1, dilation=d, padding=_get_padding(ks, d))
    if d == 1 and flag != "0" and (flag == "force"
                                   or jax.default_backend() in ("tpu", "axon")):
        from indextts_tpu.ops.fold_conv import fold_conv1d, fold_factor

        f = fold_factor(C, T)
        if f > 1:
            return fold_conv1d(p, x, f, dilation=d,
                               padding=_get_padding(ks, d))
    return nn.conv1d(p, x, padding=_get_padding(ks, d), dilation=d)


def _amp_block(bp: Params, h: BigVGANConfig, x: jnp.ndarray, ks: int,
               dils, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """AMPBlock1 (reference `bigvgan.py:31-148`)."""
    beta_key = "beta" if h.activation == "snakebeta" else None
    for j, d in enumerate(dils):
        a1, a2 = bp["acts"][2 * j], bp["acts"][2 * j + 1]
        xt = antialias_activation(x, a1["alpha"], a1.get("beta"), lengths,
                                  h.snake_logscale)
        xt = _mask(xt, lengths)
        xt = _res_conv(bp["convs1"][j], xt, ks, d)
        xt = _mask(xt, lengths)
        xt = antialias_activation(xt, a2["alpha"], a2.get("beta"), lengths,
                                  h.snake_logscale)
        xt = _mask(xt, lengths)
        xt = _res_conv(bp["convs2"][j], xt, ks, 1)
        x = x + xt
        x = _mask(x, lengths)
    return x


def _amp_stage_grouped(blocks, h: BigVGANConfig, x: jnp.ndarray,
                       lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """All of one upsample stage's AMPBlock1 resblocks in lockstep on
    (B, T, n*C) stacked lanes — exact restructure of `mean(_amp_block_j(x))`.

    The narrow-stage convs are LATENCY-bound, not FLOP-bound: device probe
    (tools/probe_narrow_conv.py, B=4) measured a flat ~4.2 ms per plain
    conv at C=24/48 regardless of kernel size (0.5-3 TF/s), while one
    feature_group_count=3 conv over the stacked (B, T, 3C) tensor covers
    all three resblocks' convs for ~2.1-2.8 ms TOTAL (the 3/7/11 kernels
    zero-pad to 11 taps — exact, the extra taps multiply by zero). The
    three resblocks share the (1, 3, 5) dilation schedule, so their chains
    advance position-by-position together; snake alphas concatenate on the
    channel axis (the antialias kernel is per-channel).
    """
    n = len(blocks)
    kmax = max(h.resblock_kernel_sizes)
    x3 = jnp.concatenate([x] * n, axis=-1)
    dils = h.resblock_dilation_sizes[0]

    def cat_act(idx, key):
        parts = [bp["acts"][idx].get(key) for bp in blocks]
        if parts[0] is None:
            return None
        return jnp.concatenate([a.reshape(-1) for a in parts])

    def grouped(conv_key, j, xt, d):
        ws, bs = [], []
        for bp, ks in zip(blocks, h.resblock_kernel_sizes):
            w = bp[conv_key][j]["kernel"]          # (ks, C, C)
            off = (kmax - ks) // 2
            ws.append(jnp.pad(w, ((off, off), (0, 0), (0, 0))))
            bs.append(bp[conv_key][j]["bias"])
        wg = {"kernel": jnp.concatenate(ws, axis=2),
              "bias": jnp.concatenate(bs)}
        return nn.conv1d(wg, xt, padding=_get_padding(kmax, d), dilation=d,
                         groups=n)

    for j, d in enumerate(dils):
        a1 = cat_act(2 * j, "alpha")
        xt = antialias_activation(x3, a1, cat_act(2 * j, "beta"), lengths,
                                  h.snake_logscale)
        xt = _mask(xt, lengths)
        xt = grouped("convs1", j, xt, d)
        xt = _mask(xt, lengths)
        xt = antialias_activation(xt, cat_act(2 * j + 1, "alpha"),
                                  cat_act(2 * j + 1, "beta"), lengths,
                                  h.snake_logscale)
        xt = _mask(xt, lengths)
        xt = grouped("convs2", j, xt, 1)
        x3 = x3 + xt
        x3 = _mask(x3, lengths)
    C = x.shape[-1]
    xs = sum(x3[:, :, g * C:(g + 1) * C] for g in range(n))
    return xs / n


def _mask_folded(xf: jnp.ndarray, lengths: Optional[jnp.ndarray], f: int,
                 C: int) -> jnp.ndarray:
    """Valid-length mask in the folded (B, T/f, f*C) layout: element
    (r, lane) holds time r*f + lane//C."""
    if lengths is None:
        return xf
    R, fC = xf.shape[1], xf.shape[2]
    t = (jnp.arange(R, dtype=jnp.int32)[:, None] * f
         + jnp.arange(fC, dtype=jnp.int32)[None, :] // C)
    return jnp.where(t[None] < lengths[:, None, None], xf, 0.0)


def _amp_stage_folded(blocks, h: BigVGANConfig, x: jnp.ndarray,
                      lengths: Optional[jnp.ndarray],
                      interpret: bool = False) -> jnp.ndarray:
    """One upsample stage's MRF (mean of AMPBlock1 resblocks) carried
    END-TO-END in the time-folded (B, T/f, f*C) layout.

    Third attempt at the narrow-stage conv problem, built on the round-3
    probe receipts (docs/KERNELS.md): each narrow conv costs a flat
    ~4 ms/op — bound by the 128-lane-padded (B, T, C<128) layout, not
    FLOPs — and per-op folding wins 1.24-1.36x, but BOTH per-op
    integrations (folded convs, grouped MRF) lost whole-model because every
    op boundary paid a fold/unfold repack (36 per stage). Here the stage
    folds ONCE on entry and unfolds ONCE on exit: convs run as shifted
    full-lane matmuls (`fold_conv1d_prefolded`), the anti-aliased snake
    uses the prefolded Pallas entry, and masks/residuals are folded
    elementwise — no intermediate repack anywhere.

    Exact restructure of `mean(_amp_block_j(x))` (zero rows in the folded
    domain == zero time padding; tests/test_fold_conv.py).
    """
    from indextts_tpu.ops.fold_conv import fold_conv1d_prefolded
    from indextts_tpu.ops.snake import antialias_activation_prefolded

    B, T, C = x.shape
    f = 384 // C
    R = T // f
    xf0 = x.reshape(B, R, f * C)

    def aa(v, act):
        return antialias_activation_prefolded(
            v, act["alpha"], act.get("beta"), f, C, lengths,
            h.snake_logscale, interpret=interpret)

    acc = None
    for bp, ks, dils in zip(blocks, h.resblock_kernel_sizes,
                            h.resblock_dilation_sizes):
        xb = xf0
        for j, d in enumerate(dils):
            xt = aa(xb, bp["acts"][2 * j])
            xt = _mask_folded(xt, lengths, f, C)
            xt = fold_conv1d_prefolded(bp["convs1"][j], xt, f, C, dilation=d,
                                       padding=_get_padding(ks, d))
            xt = _mask_folded(xt, lengths, f, C)
            xt = aa(xt, bp["acts"][2 * j + 1])
            xt = _mask_folded(xt, lengths, f, C)
            xt = fold_conv1d_prefolded(bp["convs2"][j], xt, f, C, dilation=1,
                                       padding=_get_padding(ks, 1))
            xb = xb + xt
            xb = _mask_folded(xb, lengths, f, C)
        acc = xb if acc is None else acc + xb
    return (acc / len(blocks)).reshape(B, T, C)


def _use_stage_folded(h: BigVGANConfig, C: int, T: int, B: int) -> bool:
    """Stage-carried folded MRF dispatch — opt-in until device-validated
    (INDEXTTS_STAGE_FOLDED=1 on TPU; =force anywhere, for tests)."""
    import os

    flag = os.environ.get("INDEXTTS_STAGE_FOLDED", "0")
    if flag == "0" or C not in (24, 48, 96, 192) or T % (384 // C):
        return False
    if flag == "force":
        return True
    return jax.default_backend() in ("tpu", "axon") and B in (1, 2, 4, 8)


def _use_grouped_mrf(h: BigVGANConfig, C: int) -> bool:
    """Grouped-MRF dispatch — OPT-IN (INDEXTTS_GROUPED_MRF=1; =force
    off-TPU), OFF by default: another honest negative like the time-folded
    convs. The standalone probe (tools/probe_narrow_conv.py) measured plain
    narrow convs at a flat ~4.2 ms each (latency-bound) vs ~2.1-2.8 ms for
    one grouped conv covering 3 — but the whole-vocoder in-process A/B
    (tools/bench_grouped_mrf.py, B=4 mel 1088 bf16) measured plain 576.5 ms
    vs grouped 599.3: in model context XLA fuses the masks/antialias
    elementwise into the plain conv chain, so isolated conv timings
    overstate their in-model cost, and the stacked form pays the x3
    concat/stacking instead. Kept for A/B and as the probe's receipts."""
    import os

    flag = os.environ.get("INDEXTTS_GROUPED_MRF", "0")
    if flag == "0" or len(set(h.resblock_dilation_sizes)) != 1:
        return False
    return (C <= 48 and (flag == "force"
                         or jax.default_backend() in ("tpu", "axon")))


def _up_conv(up: Params, x: jnp.ndarray, u: int, k: int) -> jnp.ndarray:
    """Upsample ConvTranspose1d; INDEXTTS_SUBPIXEL_CONVT=1 (=force off-TPU)
    routes to the subpixel restructure (identical taps, no zero-insertion;
    1.11x per op in the device probe, /tmp/bvops3)."""
    import os

    flag = os.environ.get("INDEXTTS_SUBPIXEL_CONVT", "0")
    if flag != "0" and (flag == "force"
                        or jax.default_backend() in ("tpu", "axon")):
        return nn.conv_transpose1d_subpixel(up, x, u, padding=(k - u) // 2)
    return nn.conv_transpose1d(up, x, stride=u, padding=(k - u) // 2)


def bigvgan_forward(p: Params, h: BigVGANConfig, mel: jnp.ndarray,
                    mel_lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mel: (B, T, num_mels) -> wav (B, T * prod(rates)) in [-1, 1].

    mel_lens masks padded length buckets; outputs past len*prod(rates) are 0.
    """
    x = _mask(mel, mel_lens)
    x = nn.conv1d(p["conv_pre"], x, padding=3)
    lens = mel_lens
    num_kernels = len(h.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        x = _mask(x, lens)
        x = _up_conv(p["ups"][i], x, u, k)
        if lens is not None:
            lens = lens * u
        x = _mask(x, lens)
        if _use_stage_folded(h, x.shape[-1], x.shape[1], x.shape[0]):
            blocks = p["resblocks"][i * num_kernels:(i + 1) * num_kernels]
            x = _amp_stage_folded(blocks, h, x, lens)
        elif _use_grouped_mrf(h, x.shape[-1]):
            blocks = p["resblocks"][i * num_kernels:(i + 1) * num_kernels]
            x = _amp_stage_grouped(blocks, h, x, lens)
        else:
            xs = None
            for j, (ks, dils) in enumerate(zip(h.resblock_kernel_sizes,
                                               h.resblock_dilation_sizes)):
                r = _amp_block(p["resblocks"][i * num_kernels + j], h, x, ks,
                               dils, lens)
                xs = r if xs is None else xs + r
            x = xs / num_kernels
    ap = p["activation_post"]
    x = antialias_activation(x, ap["alpha"], ap.get("beta"), lens, h.snake_logscale)
    x = _mask(x, lens)
    x = nn.conv1d(p["conv_post"], x, padding=3)
    if h.use_tanh_at_final:
        x = jnp.tanh(x)
    else:
        x = jnp.clip(x, -1.0, 1.0)
    x = _mask(x, lens)
    return x[..., 0]
