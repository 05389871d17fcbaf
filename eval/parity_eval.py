"""Waveform parity evaluation against the torch reference.

Run when real checkpoints are present:

    python eval/parity_eval.py --model-dir checkpoints \
        --cases examples/cases.jsonl --ref-outputs ref_wavs/ --threshold 8.0

For each case in cases.jsonl, synthesizes with the TPU pipeline (greedy /
fixed seed) and reports MCD against pre-rendered reference waveforms
(`ref_wavs/<case_idx>.wav`, produced by running the torch reference with the
same seed). MCD <= threshold (dB) counts as parity.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def run_tiny(threshold: float) -> int:
    """Checkpoint-free CI lane: build a tiny model dir whose weights are
    saved from the torch reference modules (tests/reference_shim.py), run
    this harness's synthesize+MCD loop against reference wavs re-rendered by
    the torch stack from the same synth-boundary captures (eval/tiny_shim.py
    documents the exact parity surface)."""
    import tempfile

    import jax

    # CI lane: tiny models, CPU only (the axon sitecustomize would otherwise
    # route every tiny program through the TPU relay)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from eval import tiny_shim
    from indextts_tpu.utils.metrics import mcd
    from indextts_tpu.utils.wav_io import read_wav_mono

    d = tempfile.mkdtemp(prefix="indextts_tinyparity_")
    cfg = tiny_shim.shim_config()
    tiny_shim.build_assets(d)
    mods = tiny_shim.build_checkpoints(d, cfg)
    cases_path = os.path.join(d, "cases.jsonl")
    tiny_shim.make_cases(cases_path)

    from indextts_tpu.pipeline.infer_v2 import IndexTTS2

    tts = IndexTTS2(cfg_path=None, model_dir=d, cfg=cfg, dtype=jnp.float32,
                    seed=42)
    out_dir = os.path.join(d, "out")
    ref_dir = os.path.join(d, "ref")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(ref_dir, exist_ok=True)
    results = []
    with open(cases_path, "r", encoding="utf-8") as f:
        for idx, line in enumerate(f):
            case = json.loads(line)
            out = os.path.join(out_dir, f"{idx:02d}.wav")
            ref = os.path.join(ref_dir, f"{idx:02d}.wav")
            tts.capture = []
            tts.infer(spk_audio_prompt=os.path.join(d, case["prompt_audio"]),
                      text=case["text"], output_path=out, max_mel_tokens=24,
                      num_beams=1, do_sample=False, verbose=False)
            assert len(tts.capture) == 1, len(tts.capture)
            tiny_shim.render_reference(mods, tts.capture[0], ref)
            ours, _ = read_wav_mono(out, target_sr=22050)
            refw, _ = read_wav_mono(ref, target_sr=22050)
            dist = mcd(ours[0], refw[0])
            ok = dist <= threshold
            results.append((idx, dist, ok))
            print(f"case {idx}: MCD {dist:.2f} dB {'OK' if ok else 'FAIL'}")
    mean = float(np.mean([x for _, x, _ in results]))
    n_ok = sum(ok for *_, ok in results)
    print(f"tiny-shim parity: mean MCD {mean:.2f} dB; {n_ok}/{len(results)} "
          f"within {threshold} dB")
    return 0 if results and n_ok == len(results) else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="checkpoints")
    ap.add_argument("--cases", default="examples/cases.jsonl")
    ap.add_argument("--ref-outputs")
    ap.add_argument("--threshold", type=float, default=8.0)
    ap.add_argument("--out-dir", default="outputs/parity")
    ap.add_argument("--tiny", action="store_true",
                    help="checkpoint-free run against torch-reference "
                         "re-renders at tiny scale (CI lane)")
    args = ap.parse_args()
    if args.tiny:
        return run_tiny(args.threshold)
    if not args.ref_outputs:
        ap.error("--ref-outputs is required unless --tiny")

    from indextts_tpu.pipeline.infer_v2 import IndexTTS2
    from indextts_tpu.utils.metrics import mcd
    from indextts_tpu.utils.wav_io import read_wav_mono

    tts = IndexTTS2(cfg_path=os.path.join(args.model_dir, "config.yaml"),
                    model_dir=args.model_dir, seed=42)
    os.makedirs(args.out_dir, exist_ok=True)

    results = []
    with open(args.cases, "r", encoding="utf-8") as f:
        for idx, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            case = json.loads(line)
            out = os.path.join(args.out_dir, f"{idx:02d}.wav")
            kwargs = {}
            mode = case.get("emo_mode", 0)
            emo_audio = case.get("emo_audio") or case.get("emo_ref_path")
            if mode == 1 and emo_audio:
                kwargs["emo_audio_prompt"] = os.path.join("examples",
                                                          emo_audio)
                kwargs["emo_alpha"] = case.get("emo_weight", 0.8)
            elif mode == 2:
                kwargs["emo_vector"] = [case.get(f"emo_vec_{i}", 0.0)
                                        for i in range(1, 9)]
            elif mode == 3:
                kwargs["use_emo_text"] = True
                kwargs["emo_text"] = case.get("emo_text")
            tts.infer(spk_audio_prompt=os.path.join("examples",
                                                    case["prompt_audio"]),
                      text=case["text"], output_path=out, **kwargs)
            ref_path = os.path.join(args.ref_outputs, f"{idx:02d}.wav")
            if not os.path.exists(ref_path):
                print(f"case {idx}: no reference wav, skipped")
                continue
            ours, _ = read_wav_mono(out, target_sr=22050)
            ref, _ = read_wav_mono(ref_path, target_sr=22050)
            d = mcd(ours[0], ref[0])
            ok = d <= args.threshold
            results.append((idx, d, ok))
            print(f"case {idx}: MCD {d:.2f} dB {'OK' if ok else 'FAIL'}")

    if results:
        mean = float(np.mean([d for _, d, _ in results]))
        n_ok = sum(ok for *_, ok in results)
        print(f"mean MCD {mean:.2f} dB; {n_ok}/{len(results)} within "
              f"{args.threshold} dB")
        return 0 if n_ok == len(results) else 1
    print("no cases evaluated")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
