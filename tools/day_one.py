"""Real-checkpoint day-one runbook — one command (VERDICT r4 item 8).

    python tools/day_one.py --model-dir checkpoints            # real mode
    python tools/day_one.py --dry-run                          # CI lane

Chains everything a first real-weights bring-up needs, in order:

  1. CONVERT   — `convert_model_dir` (tools/convert_checkpoints.py's body):
                 reference .pth/.safetensors layout -> native npz trees.
  2. MANIFEST  — diff every checkpoint's state-dict keys+shapes against the
                 pinned fixtures (`tests/fixtures/ckpt_manifests.json`, from
                 `tools/dump_ref_manifests.py`): catches upstream checkpoint
                 drift BEFORE a silent misconversion.
  3. PARITY    — `eval/parity_eval.py`: MCD of rendered cases against
                 reference-rendered outputs (--ref-outputs), 8 dB gate.
  4. SPEC SWEEP — speculative-decode acceptance at gamma in {4, 8} on real
                 codes (the quantity round 4 could not measure with random
                 weights): per-draft acceptance, commits/chunk vs the device
                 break-even ratio, and a keep/disable recommendation for the
                 default-on self-gating decoder (engine/speculative.py).

--dry-run exercises every step's machinery in-image without checkpoints:
conversion runs against fixture-synthesized tensors (the
tests/test_convert_manifest.py lane), parity runs its checkpoint-free
--tiny lane, and the sweep runs the tiny random pipeline (acceptance ~0 is
expected there — the adversarial case; the MECHANISM and report format are
what the CI lane pins, tests/test_day_one.py).

Reference loaders this replaces operationally:
`/root/reference/indextts/utils/checkpoint.py:22-31`,
`/root/reference/indextts/s2mel/modules/commons.py:579-635`.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

FIXTURE = os.path.join(_REPO, "tests", "fixtures", "ckpt_manifests.json")

# manifest family -> path inside the reference model dir (mirrors
# indextts_tpu/utils/checkpoint.py::convert_model_dir)
CKPT_PATHS = {
    "gpt": "gpt.pth",
    "s2mel": "s2mel.pth",
    "semantic_codec": "hf_cache/semantic_codec_model.safetensors",
    "campplus": "hf_cache/campplus_cn_common.bin",
    "bigvgan": "hf_cache/bigvgan/bigvgan_generator.pt",
    "w2vbert": "hf_cache/w2v-bert-2.0/model.safetensors",
}


def _step(name: str, ok: bool, detail: str = "") -> bool:
    print(f"[day-one] {name}: {'PASS' if ok else 'FAIL'}"
          + (f" — {detail}" if detail else ""), flush=True)
    return ok


def step_convert(model_dir: str, out_dir: str) -> bool:
    from indextts_tpu.utils.checkpoint import convert_model_dir

    written = convert_model_dir(model_dir, out_dir)
    for name, path in written.items():
        print(f"  converted {name} -> {path}")
    return _step("convert", bool(written),
                 f"{len(written)} checkpoint(s) -> {out_dir}"
                 if written else "no checkpoints found")


def step_manifest(model_dir: str) -> bool:
    """Diff each real checkpoint's state-dict keys+shapes vs the pinned
    manifest — upstream drift surfaces here, before conversion output is
    trusted."""
    from indextts_tpu.utils import convert

    with open(FIXTURE, "r", encoding="utf-8") as f:
        manifests = json.load(f)
    all_ok = True
    for family, rel in CKPT_PATHS.items():
        path = os.path.join(model_dir, rel)
        if not os.path.exists(path):
            print(f"  {family}: {rel} absent — skipped")
            continue
        want = manifests[family]["keys"]
        sd = convert.load_torch_state_dict(path)
        got = {k: list(v.shape) for k, v in sd.items()}
        missing = sorted(set(want) - set(got))
        added = sorted(set(got) - set(want))
        reshaped = sorted(k for k in set(want) & set(got)
                          if list(want[k]) != list(got[k]))
        ok = not (missing or added or reshaped)
        all_ok &= ok
        detail = (f"{len(got)} keys match" if ok else
                  f"missing={missing[:3]} added={added[:3]} "
                  f"reshaped={reshaped[:3]} "
                  f"(+{max(0, len(missing) + len(added) + len(reshaped) - 9)}"
                  f" more)")
        print(f"  {family}: {'ok' if ok else 'DRIFT'} — {detail}")
    return _step("manifest", all_ok)


def step_manifest_dryrun() -> bool:
    """CI lane: run the manifest-pinned conversion checks against
    fixture-synthesized tensors (the tests/test_convert_manifest.py suite —
    every manifest key must flow into the converted tree)."""
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_convert_manifest.py",
         "-q", "--no-header", "-p", "no:cacheprovider"],
        cwd=_REPO, capture_output=True, text=True, timeout=1200)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    return _step("manifest (fixture conversion)", proc.returncode == 0, tail)


def step_parity(model_dir: str, ref_outputs: str, dry_run: bool) -> bool:
    cmd = [sys.executable, "eval/parity_eval.py"]
    if dry_run:
        cmd.append("--tiny")
    else:
        if not ref_outputs:
            print("  (no --ref-outputs; render reference wavs with the "
                  "upstream repo and re-run for the MCD gate)")
            return _step("parity", True, "SKIPPED — no --ref-outputs")
        cmd += ["--model-dir", model_dir, "--ref-outputs", ref_outputs]
    proc = subprocess.run(cmd, cwd=_REPO, capture_output=True, text=True,
                          timeout=7200)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    return _step("parity" + (" (tiny lane)" if dry_run else ""),
                 proc.returncode == 0, tail)


def step_spec_sweep(model_dir: str, dry_run: bool,
                    text: str = None) -> bool:
    """Measure speculative-decode acceptance at gamma in {4, 8} through the
    shipping pipeline path and report against the device break-even ratio."""
    import jax
    import jax.numpy as jnp

    from indextts_tpu.engine.speculative import spec_commit_ratio
    from indextts_tpu.pipeline.infer_v2 import IndexTTS2

    if dry_run:
        sys.path.insert(0, os.path.join(_REPO, "eval"))
        from quality_gate import build_model_dir
        from test_pipeline_e2e import tiny_config

        d = tempfile.mkdtemp(prefix="indextts_dayone_")
        build_model_dir(d)
        tts = IndexTTS2(cfg_path=None, model_dir=d, cfg=tiny_config(),
                        dtype=jnp.float32)
        prompt = os.path.join(d, "prompt.wav")
        text = text or "hello world . the cat ."
        kw = dict(max_mel_tokens=24, num_beams=1, do_sample=False)
    else:
        tts = IndexTTS2(cfg_path=os.path.join(model_dir, "config.yaml"),
                        model_dir=model_dir)
        prompt = os.path.join("examples", "voice_01.wav")
        if not os.path.exists(prompt):
            return _step("spec sweep", False,
                         "no example prompt (run `indextts2 download` / "
                         "examples_downloader first)")
        text = text or ("The quick brown fox jumps over the lazy dog, "
                        "and the dog runs into the quiet forest at dawn.")
        kw = dict(num_beams=1)

    ok = True
    for gamma in (4, 8):
        os.environ["INDEXTTS_SPEC_DECODE"] = str(gamma)
        tts.last_spec_stats = None  # guard against a stale previous sweep
        try:
            tts._rng = jax.random.PRNGKey(0)
            tts.infer(spk_audio_prompt=prompt, text=text, output_path=None,
                      verbose=False, **kw)
            if tts.last_spec_stats is None:
                ok = False
                print(f"  gamma={gamma}: no spec stats — the text segmented "
                      f"into >1 segments (speculation is the B=1 path); "
                      f"pass a shorter --text")
                continue
            g, ch, com, sg = tts.last_spec_stats
            ratio = spec_commit_ratio(gamma)
            cpc = com / ch if ch else 0.0
            acc = (com - ch) / (ch * gamma) if ch else 0.0
            verdict = ("KEEP default-on (clears break-even)"
                       if cpc >= ratio else
                       "self-gate demotes it (below break-even) — "
                       "default-on stays safe")
            print(f"  gamma={gamma}: {ch} chunks committed {com} "
                  f"({sg} singles) -> {cpc:.2f} commits/chunk vs gate "
                  f"{ratio:.2f}, per-draft acceptance {acc:.2f} -> {verdict}")
        except Exception as e:  # noqa: BLE001 — report, don't crash the runbook
            ok = False
            print(f"  gamma={gamma}: FAILED {e!r}")
        finally:
            os.environ.pop("INDEXTTS_SPEC_DECODE", None)
    return _step("spec sweep", ok)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model-dir", default="checkpoints")
    ap.add_argument("--out-dir", default=None,
                    help="converted-npz dir (default <model-dir>/jax)")
    ap.add_argument("--ref-outputs", default=None,
                    help="dir of reference-rendered wavs for the MCD gate")
    ap.add_argument("--dry-run", action="store_true",
                    help="checkpoint-free CI lane (fixtures + tiny models)")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu") if args.dry_run else None

    results = []
    if args.dry_run:
        results.append(step_manifest_dryrun())
    else:
        results.append(step_convert(args.model_dir,
                                    args.out_dir or
                                    f"{args.model_dir}/jax"))
        results.append(step_manifest(args.model_dir))
    if not args.skip_parity:
        results.append(step_parity(args.model_dir, args.ref_outputs,
                                   args.dry_run))
    results.append(step_spec_sweep(args.model_dir, args.dry_run))
    ok = all(results)
    print(f"[day-one] {'ALL STEPS PASS' if ok else 'FAILURES ABOVE'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
