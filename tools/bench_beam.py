"""Device A/B for beam decode: in-kernel ancestry map vs per-step KV gather.

Measures, at full GPT scale (24x1280 int8) on the attached TPU:
  - generate()        K=1, B=1   (the beams=1 serving baseline)
  - generate_beam K=3 with INDEXTTS_BEAM_ANC=0 (per-step (B*K, S) cache
    gather — the HF reorder semantics, round-2 status quo)
  - generate_beam K=3 with INDEXTTS_BEAM_ANC=1 (unordered cache + in-kernel
    ancestry selection, `ops/pallas/decode_step.py`)
and asserts the two beam variants emit IDENTICAL tokens on device.

Run from /root/repo (axon backend discovery breaks elsewhere):
    timeout 3000 python tools/bench_beam.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from indextts_tpu.config import GPTConfig
    from indextts_tpu.engine import beam as bm
    from indextts_tpu.engine import decode as dec
    from indextts_tpu.engine.decode import SamplingConfig
    from indextts_tpu.models.gpt import gpt2
    from indextts_tpu.models.gpt.unified_voice import init_unified_voice
    from indextts_tpu.nn import InitRng

    t0 = time.perf_counter()
    jax.jit(lambda x: x * 2)(jnp.ones((8, 128))).block_until_ready()
    print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = GPTConfig()
    dims = gpt2.GPT2Dims(cfg.layers, cfg.model_dim, cfg.heads)
    params = init_unified_voice(InitRng(0), cfg)
    params["gpt"] = gpt2.quantize_gpt2_int8(params["gpt"])  # on host
    params = jax.device_put(params)

    B, P = 1, 160
    nprng = np.random.default_rng(1)
    emb = jnp.asarray(nprng.normal(0, 0.3, (B, P, cfg.model_dim)),
                      jnp.bfloat16)
    mask = jnp.ones((B, P), bool)
    key = jax.random.PRNGKey(0)
    max_new = int(os.environ.get("BEAM_BENCH_TOKENS", "500"))
    samp1 = SamplingConfig(min_new_tokens=max_new - 1)
    samp3 = SamplingConfig(min_new_tokens=max_new - 1, num_beams=3)

    def timed(label, fn, reps=3):
        # first call compiles (and a fresh program's first execution can be
        # pathologically slow through the relay); then min over reps
        t0 = time.perf_counter()
        out = fn()
        tok = np.asarray(out[0][:, :1])
        print(f"{label}: first (compile+run) {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            tok = np.asarray(out[0][:, :1])  # host readback = real sync
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ms_tok = best / max_new * 1e3
        print(f"{label}: best {best:.3f}s for {max_new} tokens "
              f"-> {ms_tok:.2f} ms/token", flush=True)
        return out, best

    only_anc = os.environ.get("BEAM_BENCH_ONLY", "") == "anc"
    if only_anc:
        # reuse round-3 measured baselines (same shapes, min of 3)
        t_k1, t_gather, toks_gather = 0.444, 1.915, None
    else:
        out1, t_k1 = timed("K=1 generate", lambda: dec.generate(
            params, cfg, dims, emb, mask, key, max_new, sampling=samp1))

        os.environ["INDEXTTS_BEAM_ANC"] = "0"
        bm.generate_beam.clear_cache()
        outg, t_gather = timed("K=3 gather", lambda: bm.generate_beam(
            params, cfg, dims, emb, mask, key, max_new, sampling=samp3))
        toks_gather = np.asarray(outg[0])

    os.environ["INDEXTTS_BEAM_ANC"] = "1"
    bm.generate_beam.clear_cache()
    outa, t_anc = timed("K=3 anc", lambda: bm.generate_beam(
        params, cfg, dims, emb, mask, key, max_new, sampling=samp3))
    toks_anc = np.asarray(outa[0])

    if toks_gather is None:
        print(f"anc-only run: {t_anc / max_new * 1e3:.2f} ms/token; "
              f"vs recorded K=1 {t_k1 / max_new * 1e3:.2f} and gather "
              f"{t_gather / max_new * 1e3:.2f}")
        print(f"ratios: anc/K1 = {t_anc / t_k1:.2f}x, speedup vs gather = "
              f"{t_gather / t_anc:.2f}x")
        return
    match = bool((toks_gather == toks_anc).all())
    print(f"beam token identity (anc vs gather): {match}")
    print(f"ratios: gather/K1 = {t_gather / t_k1:.2f}x, "
          f"anc/K1 = {t_anc / t_k1:.2f}x, speedup anc vs gather = "
          f"{t_gather / t_anc:.2f}x", flush=True)
    if not match:
        diff = np.argmax(toks_gather[0] != toks_anc[0])
        print(f"FIRST DIFF at step {diff}: "
              f"{toks_gather[0, diff]} vs {toks_anc[0, diff]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
