"""Per-component wall profile of the full-scale CFM Euler step.

s2mel is 1.97 s per 8-seg batch (25 steps -> ~79 ms/step) but the DiT's
matmuls at the real shapes run at 132 TF/s (probe_int8_dit.py), which only
accounts for ~22 ms/step. This times cumulative prefixes of the per-step
computation (each wrapped in a 25-iteration lax.scan so dispatch amortizes):

  p0: merge-in (t_embed, cond_projection, cond_x_merge_linear)
  p1: + backbone matmuls, attention REPLACED by identity
  p2: + real attention (flash / dense per the production dispatcher)
  p3: + skip_linear
  p4: + full WaveNet head (= complete dit_forward)

Stage cost i = t(p_i) - t(p_{i-1}). B=16 rows (8 segments x CFG 2), T=1152.

Run from /root/repo: timeout 3600 python tools/profile_dit_stages.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, T = 16, 1152  # CFG-stacked batch of an 8-segment run
STEPS = 25


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from indextts_tpu import nn
    from indextts_tpu.config import S2MelConfig
    from indextts_tpu.models.s2mel import dit as D
    from indextts_tpu.nn import InitRng
    from indextts_tpu.ops.rope import (apply_rotary_emb_half,
                                       precompute_freqs_cis)

    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print("warm", flush=True)

    import os

    # production casts s2mel params to bf16 (pipeline/infer_v2.py
    # cast_tree(self.dtype)); INDEXTTS_PROF_DTYPE=f32 for the f32 lane
    dt = (jnp.float32 if os.environ.get("INDEXTTS_PROF_DTYPE", "bf16")
          in ("f32", "float32") else jnp.bfloat16)
    print(f"profile dtype: {dt.__name__}", flush=True)
    s2 = S2MelConfig()
    cfg, w = s2.DiT, s2.wavenet
    params = D.init_dit(InitRng(0), s2)
    params = jax.device_put(jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32).astype(dt)
        if hasattr(a, "dtype") else a, params))

    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.standard_normal((B, T, cfg.in_channels)), dt)
    prompt = jnp.zeros((B, T, cfg.in_channels), dt)
    lens = jnp.full((B,), T - 64, jnp.int32)
    style = jnp.asarray(r.standard_normal((B, s2.style_encoder.dim)), dt)
    cond = jnp.asarray(r.standard_normal((B, T, cfg.content_dim)), dt)
    freqs = jnp.asarray(precompute_freqs_cis(T, cfg.head_dim, cfg.rope_base))

    H, Dh, Dm = cfg.num_heads, cfg.head_dim, cfg.hidden_dim

    def step_fn(level):
        def merge_in(p, x, t):
            t1 = D.timestep_embed(p["t_embedder"], t)
            cond_p = nn.dense(p["cond_projection"], cond)
            x_in = jnp.concatenate([x, prompt, cond_p], axis=-1)
            x_in = jnp.concatenate(
                [x_in, jnp.broadcast_to(style[:, None, :],
                                        (B, T, style.shape[-1])
                                        ).astype(x.dtype)], axis=-1)
            return nn.dense(p["cond_x_merge_linear"], x_in), t1

        def backbone(p, x_in, t1, attn):
            c = t1[:, None, :]
            mask = nn.sequence_mask(lens, T)

            def body(xc, lp):
                h = D._ada_ln(lp["attention_norm"], xc, c, cfg.norm_eps)
                qkv = nn.dense(lp["attn"]["wqkv"], h)
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q = apply_rotary_emb_half(q.reshape(B, T, H, Dh), freqs)
                k = apply_rotary_emb_half(k.reshape(B, T, H, Dh), freqs)
                v = v.reshape(B, T, H, Dh)
                if attn == "id":
                    out = v
                elif attn == "packed":
                    from indextts_tpu.ops.pallas.attn import \
                        packed_pair_attention
                    out = packed_pair_attention(
                        q.reshape(B, T, H * Dh), k.reshape(B, T, H * Dh),
                        v.reshape(B, T, H * Dh), lens,
                        heads=H).reshape(B, T, H, Dh)
                elif attn == "flash":
                    out = nn.mha_flash(q.transpose(0, 2, 1, 3),
                                       k.transpose(0, 2, 1, 3),
                                       v.transpose(0, 2, 1, 3), lens
                                       ).transpose(0, 2, 1, 3)
                else:
                    am = mask[:, None, None, :].astype(bool)
                    out = nn.mha(q.transpose(0, 2, 1, 3),
                                 k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3), mask=am
                                 ).transpose(0, 2, 1, 3)
                out = out.reshape(B, T, H * Dh)
                xc = xc + nn.dense(lp["attn"]["wo"], out)
                h = D._ada_ln(lp["ffn_norm"], xc, c, cfg.norm_eps)
                h = nn.dense(lp["ff"]["w2"],
                             jax.nn.silu(nn.dense(lp["ff"]["w1"], h))
                             * nn.dense(lp["ff"]["w3"], h))
                return xc + h, None

            x, _ = lax.scan(body, x_in, p["transformer"]["layers"])
            return D._ada_ln(p["transformer"]["norm"], x, c, cfg.norm_eps)

        def f(p, x):
            def one(xc, i):
                t = jnp.full((B,), 0.5)
                x_in, t1 = merge_in(p, xc, t)
                if level == 0:
                    out = x_in[..., :cfg.in_channels]
                else:
                    attn = {1: "id"}.get(level, "packed")
                    x_res = backbone(p, x_in, t1, attn)
                    if level <= 2:
                        out = x_res[..., :cfg.in_channels]
                    else:
                        x_res = nn.dense(p["skip_linear"],
                                         jnp.concatenate([x_res, xc], -1))
                        if level == 3:
                            out = x_res[..., :cfg.in_channels]
                        else:
                            mask = nn.sequence_mask(lens, T)
                            h = nn.dense(p["conv1"], x_res)
                            t2 = D.timestep_embed(p["t_embedder2"], t)
                            h = D.wavenet_forward(p["wavenet"], w, h, mask,
                                                  t2[:, None, :])
                            h = h + nn.dense(p["res_projection"], x_res)
                            t1s = nn.dense(p["final_layer"]["adaLN"],
                                           jax.nn.silu(t1))
                            sh, sc = jnp.split(t1s, 2, axis=-1)
                            hn = nn.layer_norm({}, h, eps=1e-6)
                            hn = hn * (1 + sc[:, None, :]) + sh[:, None, :]
                            hn = nn.dense(p["final_layer"]["linear"], hn)
                            out = nn.conv1d(p["conv2"], hn, padding="VALID")
                return xc + (0.04 * out).astype(xc.dtype), None

            x, _ = lax.scan(one, x, jnp.arange(STEPS))
            return x[:1, :1, :1]

        return jax.jit(f)

    labels = ["p0 merge-in", "p1 +body(no attn)", "p2 +packed attn",
              "p3 +skip_linear", "p4 +wavenet head (full)"]
    prev = 0.0
    for level, label in enumerate(labels):
        f = step_fn(level)
        f(params, x0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(params, x0)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:26s}: cum {best * 1e3:7.1f} ms "
              f"({best * 1e3 / STEPS:5.2f} ms/step)  "
              f"stage {1e3 * (best - prev):+7.1f} ms", flush=True)
        prev = best

    # attention A/B at full scale, in-scan: flash vs dense
    for attn in ("packed", "flash", "dense"):
        def g(p, x, _attn=attn):
            def one(xc, i):
                t = jnp.full((B,), 0.5)
                t1 = D.timestep_embed(p["t_embedder"], t)
                cond_p = nn.dense(p["cond_projection"], cond)
                x_in = jnp.concatenate([xc, prompt, cond_p], axis=-1)
                x_in = jnp.concatenate(
                    [x_in, jnp.broadcast_to(style[:, None, :],
                                            (B, T, style.shape[-1])
                                            ).astype(xc.dtype)], axis=-1)
                x_in = nn.dense(p["cond_x_merge_linear"], x_in)
                c = t1[:, None, :]
                mask = nn.sequence_mask(lens, T)

                def body(hc, lp):
                    h = D._ada_ln(lp["attention_norm"], hc, c, cfg.norm_eps)
                    qkv = nn.dense(lp["attn"]["wqkv"], h)
                    q, k, v = jnp.split(qkv, 3, axis=-1)
                    q = apply_rotary_emb_half(q.reshape(B, T, H, Dh), freqs)
                    k = apply_rotary_emb_half(k.reshape(B, T, H, Dh), freqs)
                    v = v.reshape(B, T, H, Dh)
                    if _attn == "packed":
                        from indextts_tpu.ops.pallas.attn import \
                            packed_pair_attention
                        out = packed_pair_attention(
                            q.reshape(B, T, H * Dh), k.reshape(B, T, H * Dh),
                            v.reshape(B, T, H * Dh), lens,
                            heads=H).reshape(B, T, H, Dh)
                    elif _attn == "flash":
                        out = nn.mha_flash(q.transpose(0, 2, 1, 3),
                                           k.transpose(0, 2, 1, 3),
                                           v.transpose(0, 2, 1, 3), lens
                                           ).transpose(0, 2, 1, 3)
                    else:
                        am = mask[:, None, None, :].astype(bool)
                        out = nn.mha(q.transpose(0, 2, 1, 3),
                                     k.transpose(0, 2, 1, 3),
                                     v.transpose(0, 2, 1, 3), mask=am
                                     ).transpose(0, 2, 1, 3)
                    out = out.reshape(B, T, H * Dh)
                    hc = hc + nn.dense(lp["attn"]["wo"], out)
                    h = D._ada_ln(lp["ffn_norm"], hc, c, cfg.norm_eps)
                    h = nn.dense(lp["ff"]["w2"],
                                 jax.nn.silu(nn.dense(lp["ff"]["w1"], h))
                                 * nn.dense(lp["ff"]["w3"], h))
                    return hc + h, None

                xb, _ = lax.scan(body, x_in, p["transformer"]["layers"])
                xb = D._ada_ln(p["transformer"]["norm"], xb, c, cfg.norm_eps)
                return xc + (0.04 * xb[..., :cfg.in_channels]).astype(xc.dtype), None
            x, _ = lax.scan(one, x, jnp.arange(STEPS))
            return x[:1, :1, :1]
        jf = jax.jit(g)
        jf(params, x0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jf(params, x0)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        print(f"attn={attn:6s}: body cum {best * 1e3:7.1f} ms "
              f"({best * 1e3 / STEPS:5.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
