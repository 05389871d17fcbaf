"""Device A/B: speculative (prompt-lookup) decode vs baseline at B=1 full
scale — the single-segment serving shape the round-4 floor analysis said
only multi-token decode can improve (docs/KERNELS.md §1).

Measures, in ONE process (min of 3 each), 500 pinned tokens, P=120 prefix:

  base        generate()            — fused single-step kernel per token
  adv g=G     generate_spec forced with never-matching drafts — every chunk
              commits exactly 1 token, so ms/token == the chunk-program cost
              c(G) (the speculation overhead ceiling)
  oracle g=G  generate_spec forced with the base run's own tokens. NOTE
              (measured r4): with RANDOM weights this measures full-REJECT,
              not full-accept — the chunk program's float reassociation
              flips the sampled token within a few steps (agreement 0.008
              sampled / 0.052 greedy; the top-2 gap among 8194 ~Gaussian
              logits is order-statistic-tiny, so even argmax is
              tie-dominated). Real checkpoints' peaked logits don't have
              this property; the full-accept floor is the arithmetic
              c(G)/(G+1), and dynamic multi-commit correctness is pinned on
              the CPU lane (tests/test_speculative.py).
  lookup g=G  real prompt-lookup drafting on the random-weight token stream
              (acceptance is content-dependent; random-weight samples almost
              never match, so this measures the fallback path + lookup cost)

Speedup at acceptance rate a (per drafted token): tokens/chunk
n(a) = sum_{i<=G} a^i ~ (1-a^{G+1})/(1-a); ms/token = c(G)/n(a); break-even
where that equals the base ms/token.

Run from /root/repo: timeout 3000 python tools/bench_spec_decode.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N_TOK = 500
P = 120


def main():
    from indextts_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from indextts_tpu import nn
    from indextts_tpu.config import GPTConfig
    from indextts_tpu.engine.decode import SamplingConfig, generate
    from indextts_tpu.engine.speculative import generate_spec
    from indextts_tpu.models.gpt.gpt2 import (GPT2Dims, init_gpt2,
                                              quantize_gpt2_int8)
    from indextts_tpu.nn import InitRng

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = GPTConfig()
    dims = GPT2Dims(cfg.layers, cfg.model_dim, cfg.heads)
    rng = InitRng(0)
    r = np.random.default_rng(0)
    host = {
        "gpt": quantize_gpt2_int8(init_gpt2(rng, dims)),
        "mel_embedding": {"weight": (r.standard_normal(
            (cfg.number_mel_codes, dims.dim)) * 0.02).astype(np.float32)},
        "mel_pos_embedding": {"weight": (r.standard_normal(
            (cfg.max_mel_tokens + 8, dims.dim)) * 0.02).astype(np.float32)},
        "final_norm": nn.layer_norm_init(rng, dims.dim),
        "mel_head": nn.dense_init(rng, dims.dim, cfg.number_mel_codes,
                                  std=0.02),
    }
    params = jax.device_put(host)
    emb = jnp.asarray(r.standard_normal((1, P, dims.dim)) * 0.3, jnp.bfloat16)
    mask = jnp.ones((1, P), bool)
    # pin all 500 tokens (stop masked until the end)
    sampling = SamplingConfig(min_new_tokens=N_TOK)
    key = jax.random.PRNGKey(0)

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        toks = np.asarray(out[0][:, :8])
        print(f"{label}: first (compile+run) "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0][:, :8])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best:.3f} s = {best / N_TOK * 1e3:.2f} ms/token "
              f"(min of 3)", flush=True)
        return best, np.asarray(out[0]), out

    t_base, toks_base, _ = timed(
        "base       ", lambda: generate(params, cfg, dims, emb, mask, key,
                                        max_new_tokens=N_TOK,
                                        sampling=sampling))
    oracle = jnp.asarray(toks_base[0], jnp.int32)
    adv = jnp.asarray((toks_base[0].astype(np.int64) + 17)
                      % (cfg.number_mel_codes - 2), jnp.int32)

    for gamma in (4, 8):
        t_adv, _, _ = timed(
            f"adv    g={gamma} ",
            lambda g=gamma: generate_spec(params, cfg, dims, emb, mask, key,
                                          max_new_tokens=N_TOK,
                                          sampling=sampling, gamma=g,
                                          forced=True, draft_source=adv))
        t_orc, toks_orc, _ = timed(
            f"oracle g={gamma} ",
            lambda g=gamma: generate_spec(params, cfg, dims, emb, mask, key,
                                          max_new_tokens=N_TOK,
                                          sampling=sampling, gamma=g,
                                          forced=True, draft_source=oracle))
        agree = float((toks_orc[0] == toks_base[0]).mean())
        c = t_adv / N_TOK * 1e3
        base_ms = t_base / N_TOK * 1e3
        # break-even acceptance: c / n(a) = base  ->  n(a) = c / base
        need = c / base_ms
        a = 0.0
        for cand in np.linspace(0, 0.999, 1000):
            n = (1 - cand ** (gamma + 1)) / max(1 - cand, 1e-9)
            if n >= need:
                a = cand
                break
        print(f"  g={gamma}: chunk cost {c:.2f} ms/commit, full-accept "
              f"{t_orc / N_TOK * 1e3:.2f} ms/token, token agreement vs base "
              f"{agree:.3f}, break-even acceptance ~{a:.2f}", flush=True)

    def spec_stats(label, out, gamma):
        chunks, committed, singles = (int(v) for v in np.asarray(out[2]))
        acc = ((committed - chunks) / (chunks * gamma)) if chunks else 0.0
        print(f"  {label}: {chunks} chunks committed {committed}, "
              f"{singles} singles -> per-draft acceptance {acc:.3f}",
              flush=True)

    _, _, out_lk = timed(
        "lookup g=8 ",
        lambda: generate_spec(params, cfg, dims, emb, mask, key,
                              max_new_tokens=N_TOK, sampling=sampling,
                              gamma=8, ngram=2))
    spec_stats("lookup g=8", out_lk, 8)

    # GREEDY oracle rows: kept to DOCUMENT that greedy argmax does not fix
    # the random-weight tie problem (measured agreement 0.052 — still
    # full-reject); on a real checkpoint these rows demonstrate realized
    # full-accept throughput dynamically.
    greedy = SamplingConfig(do_sample=False, min_new_tokens=N_TOK)
    t_gb, toks_gb, _ = timed(
        "base  greedy", lambda: generate(params, cfg, dims, emb, mask, key,
                                         max_new_tokens=N_TOK,
                                         sampling=greedy))
    goracle = jnp.asarray(toks_gb[0], jnp.int32)
    for gamma in (4, 8):
        t_go, toks_go, _ = timed(
            f"g-orc  g={gamma} ",
            lambda g=gamma: generate_spec(params, cfg, dims, emb, mask, key,
                                          max_new_tokens=N_TOK,
                                          sampling=greedy, gamma=g,
                                          forced=True, draft_source=goracle))
        agree = float((toks_go[0] == toks_gb[0]).mean())
        print(f"  greedy g={gamma}: full-accept {t_go / N_TOK * 1e3:.2f} "
              f"ms/token ({t_gb / N_TOK * 1e3:.2f} base), agreement "
              f"{agree:.3f}", flush=True)


if __name__ == "__main__":
    main()
