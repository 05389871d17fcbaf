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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="checkpoints")
    ap.add_argument("--cases", default="examples/cases.jsonl")
    ap.add_argument("--ref-outputs", required=True)
    ap.add_argument("--threshold", type=float, default=8.0)
    ap.add_argument("--out-dir", default="outputs/parity")
    args = ap.parse_args()

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
