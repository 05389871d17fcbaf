"""Batch-subcommand contract tests, porting the scenario list of the
reference `cli_tests/test_cli_v2_batch.py` (51 scenarios) onto this repo's
pytest fixtures. Model-free: the engine is an injected recording factory.
"""

import json
import wave
from pathlib import Path

import pytest

from indextts_tpu import cli_v2
from tests.test_cli_v2 import (fake_factory, model_dir, user_env,  # noqa: F401
                               _write_wav, FakeTTS)


def run_cli(args, tts_factory=None, capsys=None):
    rc = cli_v2.main(args, tts_factory=tts_factory)
    out = capsys.readouterr() if capsys else None
    return rc, (out.out if out else ""), (out.err if out else "")


def make_recording_factory(record, infer_fn=None):
    """Factory recording ('init', kwargs) / ('infer', kwargs) in call order."""

    def default_infer(kwargs, n):
        _write_wav(kwargs["output_path"])

    class Engine:
        def __init__(self, **kw):
            record.append(("init", kw))

        def infer(self, **kw):
            record.append(("infer", kw))
            n = sum(1 for r in record if r[0] == "infer")
            (infer_fn or default_infer)(kw, n)
            return kw["output_path"]

    return Engine


def forbidden_factory(**_kw):
    raise AssertionError("tts factory must not be called during dry-run")


def jl(*rows):
    return "\n".join(json.dumps(r) if isinstance(r, dict) else r
                     for r in rows) + "\n"


@pytest.fixture
def voice(tmp_path):
    v = tmp_path / "voice.wav"
    _write_wav(v)
    return v


# ---------------------------------------------------------------------------
# dry-run manifest validation
# ---------------------------------------------------------------------------

def test_dry_run_validates_without_loading_model(user_env, model_dir, tmp_path,
                                                 voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text("\n" + jl({"text": "hello", "voice": str(voice),
                             "output": "out.wav"}) + "\n", encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run"],
                           tts_factory=forbidden_factory, capsys=capsys)
    assert (rc, out, err) == (0, "Batch file OK: 1 tasks\n", "")


def test_dry_run_rejects_non_object_json_one_based(user_env, model_dir,
                                                   tmp_path, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text('\n["not", "an", "object"]\n', encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 2" in err and "JSON object" in err


def test_dry_run_rejects_unknown_fields(user_env, model_dir, tmp_path, voice,
                                        capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": "out.wav", "bogus": True}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err and "unknown fields" in err and "bogus" in err


def test_dry_run_rejects_conflicting_text_sources(user_env, model_dir,
                                                  tmp_path, voice, capsys):
    (tmp_path / "input.txt").write_text("hello from file", encoding="utf-8")
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "text_file": "input.txt",
                      "voice": str(voice), "output": "out.wav"}),
                  encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err and "exactly one text source" in err


def test_dry_run_rejects_missing_output(user_env, model_dir, tmp_path, voice,
                                        capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err and "missing required field: output" in err


def test_dry_run_rejects_duplicate_outputs_with_line_number(
        user_env, model_dir, tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    rows = [{"text": t, "voice": str(voice), "output": "out.wav"}
            for t in ("hello", "world")]
    bf.write_text(jl(*rows), encoding="utf-8")
    for extra in ([], ["--force"]):  # force must NOT bypass duplicate check
        rc, out, err = run_cli(["batch", "--batch-file", str(bf),
                                "--model-dir", str(model_dir), "--dry-run",
                                *extra], capsys=capsys)
        assert (rc, out) == (1, "")
        assert "line 2" in err and "duplicate output" in err


def test_dry_run_resolves_paths_relative_to_batch_file_dir(
        user_env, model_dir, tmp_path, capsys):
    assets = tmp_path / "batch" / "assets"
    assets.mkdir(parents=True)
    _write_wav(assets / "voice.wav")
    (assets / "input.txt").write_text("hello from file", encoding="utf-8")
    bf = tmp_path / "batch" / "batch.jsonl"
    bf.write_text(jl({"text_file": "assets/input.txt",
                      "voice": "assets/voice.wav", "output": "out.wav"}),
                  encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run"],
                           tts_factory=forbidden_factory, capsys=capsys)
    assert (rc, out, err) == (0, "Batch file OK: 1 tasks\n", "")


def test_dry_run_checks_model_files_without_importing_runtime(
        user_env, model_dir, tmp_path, voice, capsys, monkeypatch):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": "out.wav"}), encoding="utf-8")
    # dry-run must not import runtime packages nor load the engine
    monkeypatch.setattr(cli_v2, "_load_indextts2",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("must not import runtime")))
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run"], capsys=capsys)
    assert (rc, out, err) == (0, "Batch file OK: 1 tasks\n", "")


# ---------------------------------------------------------------------------
# concat output contracts
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("extra,msg", [
    (["--concat"], "--output is required with --concat"),
    (["--concat", "--output", "final.mp3"], "--output must be a .wav file"),
    (["--output", "final.wav"], "--output is only valid with --concat"),
    (["--keep-temp"], "--keep-temp requires --concat"),
    (["--concat", "--output", "final.wav", "--output-dir", "auto"],
     "--concat cannot be used with --output-dir"),
    (["--concat", "--output", "final.wav", "--output-prefix", "chapter"],
     "--concat cannot be used with --output-prefix"),
])
def test_concat_rejects_invalid_output_contracts(user_env, model_dir, tmp_path,
                                                 voice, capsys, extra, msg):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run", *extra],
                           capsys=capsys)
    assert (rc, out) == (1, "")
    assert msg in err


def test_concat_dry_run_no_side_effects(user_env, model_dir, tmp_path, voice,
                                        capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "first", "voice": str(voice),
                      "silence_after_ms": 125}), encoding="utf-8")
    final = tmp_path / "new-parent" / "final.wav"
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--concat", "--output", str(final),
                            "--dry-run"], tts_factory=forbidden_factory,
                           capsys=capsys)
    assert (rc, out, err) == (0, "Batch concat OK: 1 tasks\n", "")
    assert not final.parent.exists() and not final.exists()


def test_concat_row_output_and_silence_contracts(user_env, model_dir, tmp_path,
                                                 voice, capsys):
    bf = tmp_path / "batch.jsonl"
    final = str(tmp_path / "final.wav")
    base = ["batch", "--batch-file", str(bf), "--model-dir", str(model_dir)]
    # row 'output' not allowed with --concat
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": "row.wav"}), encoding="utf-8")
    rc, out, err = run_cli(base + ["--concat", "--output", final, "--dry-run"],
                           capsys=capsys)
    assert rc == 1 and "line 1" in err \
        and "field 'output' is not allowed with --concat" in err
    # silence_after_ms only valid with --concat
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "silence_after_ms": 125, "output": "row.wav"}),
                  encoding="utf-8")
    rc, out, err = run_cli(base + ["--dry-run"], capsys=capsys)
    assert rc == 1 and "line 1" in err and "silence_after_ms" in err \
        and "only valid with --concat" in err
    # valid concat manifest with keep-temp dry-runs clean
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "silence_after_ms": 125}), encoding="utf-8")
    rc, out, err = run_cli(base + ["--concat", "--output", final,
                                   "--keep-temp", "--dry-run"], capsys=capsys)
    assert (rc, out, err) == (0, "Batch concat OK: 1 tasks\n", "")


def test_concat_generates_and_cleans_temp_dir(user_env, model_dir, tmp_path,
                                              voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "a", "voice": str(voice),
                      "silence_after_ms": 100},
                     {"text": "b", "voice": str(voice)}), encoding="utf-8")
    final = tmp_path / "final.wav"
    record = []
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--concat", "--output", str(final)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    assert out == f"Generated: {final}\n"
    assert [r[0] for r in record] == ["init", "infer", "infer"]
    with wave.open(str(final), "rb") as w:
        assert w.getnframes() == (int(0.1 * 22050) * 2
                                  + 22050 * 100 // 1000)
    assert not [p for p in tmp_path.iterdir()
                if p.name.startswith(".final.wav.")]


def test_concat_keep_temp_preserves_dir_after_success(user_env, model_dir,
                                                      tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    final = tmp_path / "final.wav"
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--concat", "--output", str(final),
                            "--keep-temp"],
                           tts_factory=make_recording_factory([]),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    temp_dirs = [p for p in tmp_path.iterdir()
                 if p.name.startswith(".final.wav.")]
    assert len(temp_dirs) == 1
    assert out == f"Generated: {final}\nTemp dir: {temp_dirs[0]}\n"
    assert (temp_dirs[0] / "0001.wav").exists()


@pytest.mark.parametrize("keep_temp", [False, True])
def test_concat_stops_on_inference_failure(user_env, model_dir, tmp_path,
                                           voice, capsys, keep_temp):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "a", "voice": str(voice)},
                     {"text": "b", "voice": str(voice)}), encoding="utf-8")
    final = tmp_path / "final.wav"

    def infer(kwargs, n):
        if n == 2:
            raise RuntimeError("boom")
        _write_wav(kwargs["output_path"])

    record = []
    args = ["batch", "--batch-file", str(bf), "--model-dir", str(model_dir),
            "--concat", "--output", str(final)]
    if keep_temp:
        args.append("--keep-temp")
    rc, out, err = run_cli(args,
                           tts_factory=make_recording_factory(record, infer),
                           capsys=capsys)
    assert (rc, out) == (4, "")
    assert "ERROR: batch file line 2 inference failed: boom" in err
    assert [r[0] for r in record] == ["init", "infer", "infer"]
    assert not final.exists()
    temp_dirs = [p for p in tmp_path.iterdir()
                 if p.name.startswith(".final.wav.")]
    if keep_temp:
        assert len(temp_dirs) == 1
        assert f"Temp dir: {temp_dirs[0]}" in err
        assert (temp_dirs[0] / "0001.wav").exists()
    else:
        assert temp_dirs == []


def test_concat_rejects_mismatched_segment_format(user_env, model_dir,
                                                  tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "a", "voice": str(voice)},
                     {"text": "b", "voice": str(voice)}), encoding="utf-8")
    final = tmp_path / "final.wav"

    def infer(kwargs, n):
        _write_wav(kwargs["output_path"], sr=22050 if n == 1 else 16000)

    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--concat", "--output", str(final)],
                           tts_factory=make_recording_factory([], infer),
                           capsys=capsys)
    assert (rc, out) == (4, "")
    assert "ERROR: batch file line 2 inference failed" in err
    assert "generated WAV format does not match baseline line 1" in err
    assert not final.exists()
    assert not [p for p in tmp_path.iterdir()
                if p.name.startswith(".final.wav.")]


def test_concat_cleanup_failure_does_not_override_inference_failure(
        user_env, model_dir, tmp_path, voice, capsys, monkeypatch):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    final = tmp_path / "final.wav"

    def infer(kwargs, n):
        raise RuntimeError("boom")

    import shutil as _shutil

    def bad_rmtree(path, *a, **k):
        raise OSError("cannot remove temp dir")

    monkeypatch.setattr(cli_v2.shutil, "rmtree", bad_rmtree)
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--concat", "--output", str(final)],
                           tts_factory=make_recording_factory([], infer),
                           capsys=capsys)
    assert (rc, out) == (4, "")
    assert "ERROR: batch file line 1 inference failed: boom" in err
    assert "WARNING: cleanup failed: cannot remove temp dir" in err
    assert err.index("inference failed") < err.index("cleanup failed")
    assert not final.exists()


def test_concat_cleanup_failure_after_success_is_inference_error(
        user_env, model_dir, tmp_path, voice, capsys, monkeypatch):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    final = tmp_path / "final.wav"
    monkeypatch.setattr(cli_v2.shutil, "rmtree",
                        lambda *a, **k: (_ for _ in ()).throw(
                            OSError("cannot remove temp dir")))
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--concat", "--output", str(final)],
                           tts_factory=make_recording_factory([]),
                           capsys=capsys)
    assert (rc, out) == (4, "")
    assert "ERROR: cleanup failed: cannot remove temp dir" in err
    assert final.exists()


def test_concat_dry_run_rejects_output_conflicts_without_side_effects(
        user_env, model_dir, tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    base = ["batch", "--batch-file", str(bf), "--model-dir", str(model_dir),
            "--concat", "--dry-run"]
    # final output == a protected input (the voice) even with --force
    rc, out, err = run_cli(base + ["--output", str(voice), "--force"],
                           capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err and "conflicts with protected input path" in err \
        and str(voice) in err
    # existing final output without --force
    existing = tmp_path / "exists.wav"
    existing.write_bytes(b"existing")
    rc, out, err = run_cli(base + ["--output", str(existing)], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "output file already exists" in err and str(existing) in err
    # --force allows it on dry-run, without touching the file
    rc, out, err = run_cli(base + ["--output", str(existing), "--force"],
                           capsys=capsys)
    assert (rc, out, err) == (0, "Batch concat OK: 1 tasks\n", "")
    assert existing.read_bytes() == b"existing"


@pytest.mark.parametrize("empty", [False, True])
def test_concat_dry_run_rejects_output_matching_batch_file(
        user_env, model_dir, tmp_path, voice, capsys, empty):
    # a .wav-named manifest so the output-extension check can't fire first
    bf = tmp_path / "batch.wav"
    bf.write_text("" if empty
                  else jl({"text": "hello", "voice": str(voice)}),
                  encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--concat", "--output", str(bf),
                            "--dry-run", "--force"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "conflicts with protected input path" in err and str(bf) in err


@pytest.mark.parametrize("value,msg", [
    (-1, "must be a non-negative integer"),
    (1.5, "must be a non-negative integer"),
    (True, "must be a non-negative integer"),
    ("100", "must be a non-negative integer"),
])
def test_concat_dry_run_rejects_invalid_silence_values(
        user_env, model_dir, tmp_path, voice, capsys, value, msg):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "silence_after_ms": value}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--concat",
                            "--output", str(tmp_path / "final.wav"),
                            "--dry-run"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err and "silence_after_ms" in err and msg in err


# ---------------------------------------------------------------------------
# execution semantics
# ---------------------------------------------------------------------------

def test_executes_in_order_with_one_init_and_summary(user_env, model_dir,
                                                     tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "first", "voice": str(voice),
                      "output": "a.wav"},
                     {"text": "second", "voice": str(voice),
                      "output": "b.wav"}), encoding="utf-8")
    record = []
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    assert [r[0] for r in record] == ["init", "infer", "infer"]
    assert record[1][1]["text"] == "first"
    assert record[2][1]["text"] == "second"
    assert record[1][1]["spk_audio_prompt"] == str(voice)
    assert out.endswith("Batch complete: 2 tasks generated\n")
    assert (tmp_path / "a.wav").exists() and (tmp_path / "b.wav").exists()


def test_auto_output_dir_numbered_outputs(user_env, model_dir, tmp_path, voice,
                                          capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "first", "voice": str(voice)},
                     {"text": "second", "voice": str(voice)}),
                  encoding="utf-8")
    record = []
    out_dir = tmp_path / "auto"
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--output-dir", str(out_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    assert record[1][1]["output_path"] == str(out_dir / "0001.wav")
    assert record[2][1]["output_path"] == str(out_dir / "0002.wav")
    assert (out_dir / "0001.wav").exists() and (out_dir / "0002.wav").exists()


def test_auto_output_dir_rejects_conflict_with_inputs(user_env, model_dir,
                                                      tmp_path, capsys):
    out_dir = tmp_path / "auto"
    out_dir.mkdir()
    voice_in_auto = out_dir / "0001.wav"
    _write_wav(voice_in_auto)
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": "auto/0001.wav"}),
                  encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--output-dir", str(out_dir),
                            "--force"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err and "conflicts with protected input path" in err \
        and str(voice_in_auto) in err


def test_auto_output_dir_rejects_conflict_with_batch_file(user_env, model_dir,
                                                          tmp_path, voice,
                                                          capsys):
    # batch file sits where the generated output would land
    out_dir = tmp_path / "auto"
    out_dir.mkdir()
    bf = out_dir / "0001.wav"  # batch file IS the generated output path
    bf.write_text(jl({"text": "hello", "voice": "../voice.wav"}),
                  encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--output-dir", str(out_dir),
                            "--force", "--dry-run"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err and "conflicts with protected input path" in err \
        and str(bf) in err


def test_auto_output_dir_uses_prefix(user_env, model_dir, tmp_path, voice,
                                     capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    out_dir = tmp_path / "auto"
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--output-dir", str(out_dir),
                            "--output-prefix", "chapter"],
                           tts_factory=make_recording_factory([]),
                           capsys=capsys)
    expected = out_dir / "chapter-0001.wav"
    assert (rc, err) == (0, "")
    assert out == f"Generated: {expected}\nBatch complete: 1 tasks generated\n"


@pytest.mark.parametrize("extra,msg", [
    (["--output-prefix", "chapter"], "--output-prefix requires --output-dir"),
    (["--output-dir", "auto", "--output-prefix", "a/b"],
     "--output-prefix must not contain path separators"),
    (["--output-dir", "auto", "--output-prefix", "a.wav"],
     "--output-prefix must not include a file extension"),
    (["--output-dir", "auto", "--output-prefix", " "],
     "--output-prefix must not be empty"),
])
def test_auto_output_dir_rejects_invalid_config(user_env, model_dir, tmp_path,
                                                voice, capsys, extra, msg):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run", *extra],
                           capsys=capsys)
    assert (rc, out) == (1, "")
    assert msg in err


def test_auto_output_dir_rejects_row_output(user_env, model_dir, tmp_path,
                                            voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": "row.wav"}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--output-dir",
                            str(tmp_path / "auto"), "--dry-run"],
                           capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err and "not allowed with --output-dir" in err


def test_auto_output_dir_dry_run_does_not_create_dir(user_env, model_dir,
                                                     tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    out_dir = tmp_path / "auto"
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--output-dir", str(out_dir),
                            "--dry-run"], capsys=capsys)
    assert (rc, out, err) == (0, "Batch file OK: 1 tasks\n", "")
    assert not out_dir.exists()


def test_auto_output_dir_respects_force_for_existing(user_env, model_dir,
                                                     tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    out_dir = tmp_path / "auto"
    out_dir.mkdir()
    existing = out_dir / "0001.wav"
    existing.write_bytes(b"old audio")
    args = ["batch", "--batch-file", str(bf), "--model-dir", str(model_dir),
            "--output-dir", str(out_dir)]
    rc, out, err = run_cli(args, capsys=capsys)
    assert (rc, out) == (1, "")
    assert "output file already exists" in err
    rc, out, err = run_cli(args + ["--force"],
                           tts_factory=make_recording_factory([]),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    assert existing.read_bytes() != b"old audio"


def test_auto_output_dir_relative_to_cwd(user_env, model_dir, tmp_path, voice,
                                         capsys, monkeypatch):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    monkeypatch.chdir(tmp_path)
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--output-dir", "auto-rel"],
                           tts_factory=make_recording_factory([]),
                           capsys=capsys)
    expected = (tmp_path / "auto-rel" / "0001.wav").resolve()
    assert (rc, err) == (0, "")
    assert expected.exists()


def test_auto_output_dir_rejects_file_blocking_parent(user_env, model_dir,
                                                      tmp_path, voice, capsys):
    blocked = tmp_path / "blocked"
    blocked.write_text("file blocks output directory", encoding="utf-8")
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice)}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--output-dir",
                            str(blocked / "sub"), "--dry-run"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "output parent path cannot be created" in err and str(blocked) in err


def test_maps_runtime_options_once(user_env, model_dir, tmp_path, voice,
                                   capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": "o.wav"}), encoding="utf-8")
    record = []
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--device", "tpu", "--fp16",
                            "--deepspeed", "--cuda-kernel", "--verbose"],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    init = record[0][1]
    assert init["device"] == "tpu" and init["use_fp16"] is True
    assert init["use_deepspeed"] is True and init["use_cuda_kernel"] is True
    assert record[1][1]["verbose"] is True
    assert sum(1 for r in record if r[0] == "init") == 1


def test_command_defaults_and_row_overrides(user_env, model_dir, tmp_path,
                                            capsys):
    default_voice = tmp_path / "default.wav"
    row_voice = tmp_path / "row.wav"
    default_emotion = tmp_path / "emo_default.wav"
    row_emotion = tmp_path / "emo_row.wav"
    for p in (default_voice, row_voice, default_emotion, row_emotion):
        _write_wav(p)
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl(
        {"text": "one", "output": "a.wav"},
        {"text": "two", "output": "b.wav", "voice": str(row_voice),
         "emotion_audio": str(row_emotion), "emotion_weight": 0.25},
        {"text": "three", "output": "c.wav",
         "emotion_vector": [0.0, 0.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0],
         "emotion_weight": 0.4}), encoding="utf-8")
    record = []
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--voice", str(default_voice),
                            "--emotion-audio", str(default_emotion),
                            "--emotion-weight", "0.75"],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    c1, c2, c3 = record[1][1], record[2][1], record[3][1]
    assert c1["spk_audio_prompt"] == str(default_voice)
    assert c1["emo_audio_prompt"] == str(default_emotion)
    assert c1["emo_alpha"] == 0.75
    assert c2["spk_audio_prompt"] == str(row_voice)
    assert c2["emo_audio_prompt"] == str(row_emotion)
    assert c2["emo_alpha"] == 0.25
    assert c3["spk_audio_prompt"] == str(default_voice)
    assert c3["emo_vector"] == [0.0, 0.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0]
    assert c3["emo_alpha"] == 0.4
    assert "emo_audio_prompt" not in c3


def test_row_emotion_weight_inherits_command_source(user_env, model_dir,
                                                    tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "output": "o.wav",
                      "emotion_weight": 0.3}), encoding="utf-8")
    record = []
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--voice", str(voice),
                            "--emotion-text", "warm and calm",
                            "--emotion-weight", "0.9"],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    call = record[1][1]
    assert call["use_emo_text"] is True
    assert call["emo_text"] == "warm and calm"
    assert call["emo_alpha"] == 0.3


def test_inherits_command_emotion_vector(user_env, model_dir, tmp_path, voice,
                                         capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "output": "o.wav"}), encoding="utf-8")
    record = []
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--voice", str(voice),
                            "--emotion-vector", "0,0,0.8,0,0,0,0,0",
                            "--emotion-weight", "0.6"],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    call = record[1][1]
    assert call["emo_vector"] == [0.0, 0.0, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0]
    assert call["emo_alpha"] == 0.6


def test_accepts_row_emotion_vector_cli_style_string(user_env, model_dir,
                                                     tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice), "output": "o.wav",
                      "emotion_vector": "0,0,0.8,0,0,0,0,0",
                      "emotion_weight": 0.45}), encoding="utf-8")
    record = []
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    call = record[1][1]
    assert call["emo_vector"] == [0.0, 0.0, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0]
    assert call["emo_alpha"] == 0.45


@pytest.mark.parametrize("row,needles", [
    ({"emotion_weight": 0.4}, ["emotion_weight", "requires an emotion source"]),
    ({"emotion_audio": "voice.wav", "emotion_text": "sad"},
     ["mutually exclusive"]),
    ({"emotion_vector": "0.5,0.5,0,0,0,0,0,0"}, ["emotion_vector",
                                                 "sum must be <= 0.8"]),
    ({"emotion_vector": [True, 0, 0, 0, 0, 0, 0, 0]},
     ["emotion_vector", "entries must be numeric"]),
])
def test_row_emotion_validation(user_env, model_dir, tmp_path, voice, capsys,
                                row, needles):
    bf = tmp_path / "batch.jsonl"
    task = {"text": "hello", "voice": str(voice), "output": "o.wav"}
    task.update(row)
    bf.write_text(jl(task), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err
    for n in needles:
        assert n in err, (n, err)


def test_stops_on_first_failure_keeps_prior_outputs(user_env, model_dir,
                                                    tmp_path, voice, capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "a", "voice": str(voice), "output": "a.wav"},
                     {"text": "b", "voice": str(voice), "output": "b.wav"},
                     {"text": "c", "voice": str(voice), "output": "c.wav"}),
                  encoding="utf-8")

    def infer(kwargs, n):
        if n == 2:
            raise RuntimeError("boom")
        _write_wav(kwargs["output_path"])

    record = []
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir)],
                           tts_factory=make_recording_factory(record, infer),
                           capsys=capsys)
    assert rc == 4
    assert out == f"Generated: {tmp_path / 'a.wav'}\n"
    assert "ERROR: batch file line 2 inference failed: boom" in err
    assert [r[0] for r in record] == ["init", "infer", "infer"]
    assert (tmp_path / "a.wav").exists()
    assert not (tmp_path / "b.wav").exists()
    assert not (tmp_path / "c.wav").exists()
    assert "Batch complete" not in out


def test_rejects_existing_output_before_model_init(user_env, model_dir,
                                                   tmp_path, voice, capsys):
    existing = tmp_path / "o.wav"
    existing.write_bytes(b"old")
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": str(existing)}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir)], tts_factory=forbidden_factory,
                           capsys=capsys)
    assert (rc, out) == (1, "")
    assert "ERROR: batch file line 1 output file already exists" in err
    assert str(existing) in err


def test_force_allows_existing_output(user_env, model_dir, tmp_path, voice,
                                      capsys):
    existing = tmp_path / "o.wav"
    existing.write_bytes(b"old audio")
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": str(existing)}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--force"],
                           tts_factory=make_recording_factory([]),
                           capsys=capsys)
    assert (rc, err) == (0, "")
    assert out == (f"Generated: {existing}\n"
                   f"Batch complete: 1 tasks generated\n")
    assert existing.read_bytes() != b"old audio"


def test_rejects_runtime_options_in_rows(user_env, model_dir, tmp_path, voice,
                                         capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": "o.wav", "device": "cpu"}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir), "--dry-run"], capsys=capsys)
    assert (rc, out) == (1, "")
    assert "line 1" in err and "unknown fields" in err and "device" in err


def test_resource_error_when_model_dir_missing(user_env, tmp_path, voice,
                                               capsys):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": "o.wav"}), encoding="utf-8")
    missing = tmp_path / "not-there"
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(missing)], capsys=capsys)
    assert (rc, out) == (2, "")
    assert "ERROR: model directory does not exist" in err
    assert str(missing) in err


def test_resource_error_with_download_help(user_env, tmp_path, voice, capsys):
    partial = tmp_path / "partial-model"
    partial.mkdir()
    (partial / "config.yaml").write_text("placeholder", encoding="utf-8")
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": "o.wav"}), encoding="utf-8")
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(partial)], capsys=capsys)
    assert (rc, out) == (2, "")
    assert "ERROR: missing required model files" in err
    assert "bpe.model" in err
    assert "huggingface-cli download IndexTeam/IndexTTS-2" in err
    assert "modelscope download --model IndexTeam/IndexTTS-2" in err


def test_runtime_error_when_import_fails(user_env, model_dir, tmp_path, voice,
                                         capsys, monkeypatch):
    bf = tmp_path / "batch.jsonl"
    bf.write_text(jl({"text": "hello", "voice": str(voice),
                      "output": "o.wav"}), encoding="utf-8")
    monkeypatch.setattr(cli_v2, "_load_indextts2",
                        lambda *a, **k: (_ for _ in ()).throw(
                            ImportError("jax missing")))
    rc, out, err = run_cli(["batch", "--batch-file", str(bf), "--model-dir",
                            str(model_dir)], capsys=capsys)
    assert (rc, out) == (3, "")
    assert "ERROR: runtime unavailable: jax missing" in err
