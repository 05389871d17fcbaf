"""Concat-, config/init- and download-subcommand contract tests, porting the
scenario lists of the reference `cli_tests/test_cli_v2_concat.py` (15),
`test_cli_v2_config.py` (16) and `test_cli_v2_download.py` (7) onto this
repo's pytest fixtures. Device strings use the TPU runtime's names.
"""

import json
import wave
from pathlib import Path

import pytest

from indextts_tpu import cli_v2
from indextts_tpu.utils import download as dl
from tests.test_cli_v2 import (fake_factory, model_dir, user_env,  # noqa: F401
                               _write_wav, FakeTTS)
from tests.test_cli_v2_batch import make_recording_factory, run_cli


def write_wav_frames(path, frames, channels=1, sample_width=1,
                     frame_rate=1000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sample_width)
        w.setframerate(frame_rate)
        w.writeframes(frames)


def read_wav(path):
    with wave.open(str(path), "rb") as w:
        return {"channels": w.getnchannels(), "sample_width": w.getsampwidth(),
                "frame_rate": w.getframerate(),
                "frames": w.readframes(w.getnframes())}


def config_text(user_env):
    return cli_v2._config_path().read_text(encoding="utf-8")


# ---------------------------------------------------------------------------
# concat
# ---------------------------------------------------------------------------

def test_concat_dry_run_no_output_parent_created(user_env, tmp_path, capsys):
    write_wav_frames(tmp_path / "clip.wav", b"\x01")
    cf = tmp_path / "c.jsonl"
    cf.write_text('{"audio": "clip.wav", "silence_after_ms": 5}\n',
                  encoding="utf-8")
    out = tmp_path / "new-parent" / "o.wav"
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(out), "--dry-run"],
                                 capsys=capsys)
    assert (rc, stdout, stderr) == (0, "Concat file OK: 1 segments\n", "")
    assert not out.parent.exists() and not out.exists()


def test_concat_dry_run_rejects_non_object_json_one_based(user_env, tmp_path,
                                                          capsys):
    cf = tmp_path / "c.jsonl"
    cf.write_text('\n["not", "an", "object"]\n', encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(tmp_path / "o.wav"),
                                  "--dry-run"], capsys=capsys)
    assert (rc, stdout) == (1, "")
    assert "line 2" in stderr and "JSON object" in stderr


def test_concat_dry_run_rejects_bad_json_and_unknown_fields(user_env, tmp_path,
                                                            capsys):
    write_wav_frames(tmp_path / "clip.wav", b"\x01")
    cf = tmp_path / "c.jsonl"
    base = ["concat", "--concat-file", str(cf), "--output",
            str(tmp_path / "o.wav"), "--dry-run"]
    cf.write_text('# not json\n', encoding="utf-8")
    rc, stdout, stderr = run_cli(base, capsys=capsys)
    assert (rc, stdout) == (1, "")
    assert "line 1" in stderr and "not valid JSON" in stderr
    cf.write_text('{"audio": "clip.wav", "text": "ignored"}\n',
                  encoding="utf-8")
    rc, stdout, stderr = run_cli(base, capsys=capsys)
    assert (rc, stdout) == (1, "")
    assert "line 1" in stderr and "unknown fields" in stderr \
        and "text" in stderr


@pytest.mark.parametrize("row,msg", [
    ('{"silence_after_ms": 5}', "missing required field: audio"),
    ('{"audio": 7}', "must be a string"),
    ('{"audio": ""}', "must not be empty"),
    ('{"audio": "clip.wav", "silence_after_ms": -1}',
     "must be a non-negative integer"),
    ('{"audio": "clip.wav", "silence_after_ms": 1.5}',
     "must be a non-negative integer"),
    ('{"audio": "clip.wav", "silence_after_ms": true}',
     "must be a non-negative integer"),
])
def test_concat_dry_run_rejects_invalid_segment_fields(user_env, tmp_path,
                                                       capsys, row, msg):
    write_wav_frames(tmp_path / "clip.wav", b"\x01")
    cf = tmp_path / "c.jsonl"
    cf.write_text("\n" + row + "\n", encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(tmp_path / "o.wav"),
                                  "--dry-run"], capsys=capsys)
    assert (rc, stdout) == (1, "")
    assert "line 2" in stderr and msg in stderr


def test_concat_resolves_cmd_paths_from_cwd_audio_from_manifest_dir(
        user_env, tmp_path, capsys, monkeypatch):
    assets = tmp_path / "bundle" / "assets"
    assets.mkdir(parents=True)
    write_wav_frames(assets / "CLIP.WAV", b"\x01")
    cf = tmp_path / "bundle" / "c.jsonl"
    cf.write_text('{"audio": "assets/CLIP.WAV"}\n', encoding="utf-8")
    monkeypatch.chdir(tmp_path)
    rc, stdout, stderr = run_cli(["concat", "--concat-file", "bundle/c.jsonl",
                                  "--output", "out.wav", "--dry-run"],
                                 capsys=capsys)
    assert (rc, stdout, stderr) == (0, "Concat file OK: 1 segments\n", "")
    assert not (tmp_path / "out.wav").exists()


def test_concat_rejects_non_wav_extensions_case_insensitively(user_env,
                                                              tmp_path,
                                                              capsys):
    write_wav_frames(tmp_path / "clip.wav", b"\x01")
    cf = tmp_path / "c.jsonl"
    cf.write_text('{"audio": "clip.wav"}\n', encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(tmp_path / "o.MP3"),
                                  "--dry-run"], capsys=capsys)
    assert (rc, stdout) == (1, "")
    assert "--output must be a .wav file" in stderr
    cf.write_text('{"audio": "clip.mp3"}\n', encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(tmp_path / "o.wav"),
                                  "--dry-run"], capsys=capsys)
    assert (rc, stdout) == (1, "")
    assert "line 1" in stderr and "field 'audio' must be a .wav file" in stderr


def test_concat_dry_run_checks_wav_existence_and_format(user_env, tmp_path,
                                                        capsys):
    cf = tmp_path / "c.jsonl"
    out = str(tmp_path / "o.wav")
    # missing file
    cf.write_text('{"audio": "missing.wav"}\n', encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", out, "--dry-run"], capsys=capsys)
    assert rc == 2 and "line 1" in stderr and "does not exist" in stderr
    # unreadable / not a wav
    (tmp_path / "bad.wav").write_bytes(b"not a riff")
    cf.write_text('{"audio": "bad.wav"}\n', encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", out, "--dry-run"], capsys=capsys)
    assert rc == 1 and "line 1" in stderr
    # empty wav
    write_wav_frames(tmp_path / "empty.wav", b"")
    cf.write_text('{"audio": "empty.wav"}\n', encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", out, "--dry-run"], capsys=capsys)
    assert rc == 1 and "line 1" in stderr and "empty" in stderr
    # format mismatch against line 1 baseline
    write_wav_frames(tmp_path / "a.wav", b"\x01", frame_rate=1000)
    write_wav_frames(tmp_path / "b.wav", b"\x01", frame_rate=2000)
    cf.write_text('{"audio": "a.wav"}\n{"audio": "b.wav"}\n', encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", out, "--dry-run"], capsys=capsys)
    assert rc == 1 and "line 2" in stderr and "baseline line 1" in stderr \
        and "WAV format does not match" in stderr


def test_concat_dry_run_rejects_empty_manifest(user_env, tmp_path, capsys):
    cf = tmp_path / "c.jsonl"
    cf.write_text("\n \n", encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(tmp_path / "o.wav"),
                                  "--dry-run"], capsys=capsys)
    assert (rc, stdout) == (1, "")
    assert "at least one segment" in stderr


def test_concat_dry_run_rejects_output_path_conflicts(user_env, tmp_path,
                                                      capsys):
    write_wav_frames(tmp_path / "clip.wav", b"\x01")
    cf = tmp_path / "c.wav"  # manifest named .wav so it can collide
    cf.write_text('{"audio": "clip.wav"}\n', encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(cf), "--dry-run"],
                                 capsys=capsys)
    assert rc == 1 and "--output must not be the same path as --concat-file" \
        in stderr
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(tmp_path / "clip.wav"),
                                  "--dry-run"], capsys=capsys)
    assert rc == 1 and "line 1" in stderr and "conflicts with --output" \
        in stderr
    blocked = tmp_path / "blocked"
    blocked.write_text("file blocks directory creation", encoding="utf-8")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(blocked / "o.wav"),
                                  "--dry-run"], capsys=capsys)
    assert rc == 1 and "output parent path cannot be created" in stderr


def test_concat_dry_run_existing_output_force_untouched(user_env, tmp_path,
                                                        capsys):
    write_wav_frames(tmp_path / "clip.wav", b"\x01")
    cf = tmp_path / "c.jsonl"
    cf.write_text('{"audio": "clip.wav"}\n', encoding="utf-8")
    existing = tmp_path / "o.wav"
    existing.write_bytes(b"existing output")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(existing), "--dry-run"],
                                 capsys=capsys)
    assert (rc, stdout) == (1, "")
    assert "output file already exists" in stderr
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(existing), "--dry-run",
                                  "--force"], capsys=capsys)
    assert (rc, stdout, stderr) == (0, "Concat file OK: 1 segments\n", "")
    assert existing.read_bytes() == b"existing output"


def test_concat_generates_in_manifest_order_with_silence(user_env, tmp_path,
                                                         capsys):
    write_wav_frames(tmp_path / "a.wav", b"\x01\x02")
    write_wav_frames(tmp_path / "b.wav", b"\x03")
    cf = tmp_path / "c.jsonl"
    cf.write_text(json.dumps({"audio": "a.wav", "silence_after_ms": 2}) + "\n"
                  + json.dumps({"audio": "b.wav", "silence_after_ms": 1}),
                  encoding="utf-8")
    out = tmp_path / "o.wav"
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(out)], capsys=capsys)
    assert (rc, stdout, stderr) == (0, f"Generated: {out}\n", "")
    got = read_wav(out)
    assert got["channels"] == 1 and got["sample_width"] == 1 \
        and got["frame_rate"] == 1000
    assert got["frames"] == b"\x01\x02\x00\x00\x03\x00"


def test_concat_execution_skips_model_resource_checks(user_env, tmp_path,
                                                      capsys, monkeypatch):
    write_wav_frames(tmp_path / "clip.wav", b"\x01")
    cf = tmp_path / "c.jsonl"
    cf.write_text('{"audio": "clip.wav"}\n', encoding="utf-8")
    monkeypatch.setattr(cli_v2, "_report_missing_model_resources",
                        lambda *a: (_ for _ in ()).throw(
                            AssertionError("must not check model resources")))
    monkeypatch.setattr(cli_v2, "_load_indextts2",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("must not load runtime")))
    out = tmp_path / "o.wav"
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(out)], capsys=capsys)
    assert (rc, stdout, stderr) == (0, f"Generated: {out}\n", "")


def test_concat_force_overwrites_during_execution(user_env, tmp_path, capsys):
    write_wav_frames(tmp_path / "clip.wav", b"\x04\x05")
    cf = tmp_path / "c.jsonl"
    cf.write_text('{"audio": "clip.wav"}\n', encoding="utf-8")
    out = tmp_path / "o.wav"
    out.write_bytes(b"old output")
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(out)], capsys=capsys)
    assert rc == 1 and "output file already exists" in stderr
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(out), "--force"],
                                 capsys=capsys)
    assert (rc, stdout, stderr) == (0, f"Generated: {out}\n", "")
    assert read_wav(out)["frames"] == b"\x04\x05"


def test_concat_execution_failure_removes_temp_wav(user_env, tmp_path, capsys,
                                                   monkeypatch):
    write_wav_frames(tmp_path / "clip.wav", b"\x01")
    cf = tmp_path / "c.jsonl"
    cf.write_text('{"audio": "clip.wav"}\n', encoding="utf-8")
    out = tmp_path / "o.wav"
    monkeypatch.setattr(cli_v2.os, "replace",
                        lambda *a: (_ for _ in ()).throw(
                            OSError("replace failed")))
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(out)], capsys=capsys)
    assert (rc, stdout) == (4, "")
    assert "ERROR: concat failed: replace failed" in stderr
    assert "WARNING: cleanup failed" not in stderr
    assert not out.exists()
    assert not [p for p in tmp_path.iterdir() if p.suffix == ".tmp"
                or p.name.startswith(".o.wav.")]


def test_concat_cleanup_failure_appended_after_primary(user_env, tmp_path,
                                                       capsys, monkeypatch):
    write_wav_frames(tmp_path / "clip.wav", b"\x01")
    cf = tmp_path / "c.jsonl"
    cf.write_text('{"audio": "clip.wav"}\n', encoding="utf-8")
    out = tmp_path / "o.wav"
    monkeypatch.setattr(cli_v2.os, "replace",
                        lambda *a: (_ for _ in ()).throw(
                            OSError("replace failed")))
    monkeypatch.setattr(cli_v2.os, "unlink",
                        lambda *a: (_ for _ in ()).throw(
                            OSError("cannot remove temp")))
    rc, stdout, stderr = run_cli(["concat", "--concat-file", str(cf),
                                  "--output", str(out)], capsys=capsys)
    assert (rc, stdout) == (4, "")
    assert "ERROR: concat failed: replace failed" in stderr
    assert "WARNING: cleanup failed: cannot remove temp" in stderr
    assert stderr.index("concat failed") < stderr.index("cleanup failed")
    assert not out.exists()


# ---------------------------------------------------------------------------
# init / config persistence
# ---------------------------------------------------------------------------

def test_init_creates_config_and_default_dir_without_model_files(user_env,
                                                                 capsys):
    rc, stdout, stderr = run_cli(["init"], capsys=capsys)
    assert (rc, stderr) == (0, "")
    cfg_path = cli_v2._config_path()
    default_dir = cli_v2._default_model_dir()
    assert f"Config: {cfg_path}" in stdout
    assert f"Model directory: {default_dir}" in stdout
    assert f'model_dir = "{default_dir.as_posix()}"' in config_text(user_env)
    assert list(default_dir.iterdir()) == []


def test_init_with_model_dir_persists_it(user_env, tmp_path, capsys):
    d = tmp_path / "custom-models"
    rc, stdout, stderr = run_cli(["init", "--model-dir", str(d)],
                                 capsys=capsys)
    assert (rc, stderr) == (0, "")
    assert f"Model directory: {d}" in stdout
    assert d.exists()
    assert f'model_dir = "{d.as_posix()}"' in config_text(user_env)


def test_config_path_prints_location(user_env, capsys):
    rc, stdout, stderr = run_cli(["config", "path"], capsys=capsys)
    assert (rc, stdout, stderr) == (0, f"{cli_v2._config_path()}\n", "")


def test_config_set_model_dir_persists(user_env, tmp_path, capsys):
    d = (tmp_path / "models").resolve()
    rc, stdout, stderr = run_cli(["config", "set", "model_dir", str(d)],
                                 capsys=capsys)
    assert (rc, stdout, stderr) == (0, f"model_dir = {d}\n", "")
    assert f'model_dir = "{d.as_posix()}"' in config_text(user_env)


def test_config_set_runtime_preferences(user_env, capsys):
    assert run_cli(["config", "set", "default_device", "tpu:0"],
                   capsys=capsys) == (0, "default_device = tpu:0\n", "")
    assert run_cli(["config", "set", "use_fp16", "true"],
                   capsys=capsys) == (0, "use_fp16 = true\n", "")
    assert run_cli(["config", "set", "use_deepspeed", "false"],
                   capsys=capsys) == (0, "use_deepspeed = false\n", "")
    assert run_cli(["config", "set", "use_cuda_kernel", "true"],
                   capsys=capsys) == (0, "use_cuda_kernel = true\n", "")
    text = config_text(user_env)
    assert 'default_device = "tpu:0"' in text
    assert "use_fp16 = true" in text
    assert "use_deepspeed = false" in text
    assert "use_cuda_kernel = true" in text


def test_config_set_bool_rejects_non_boolean(user_env, capsys):
    rc, stdout, stderr = run_cli(["config", "set", "use_fp16", "2"],
                                 capsys=capsys)
    assert (rc, stdout) == (1, "")
    assert "ERROR: use_fp16 must be true or false" in stderr
    assert not cli_v2._config_path().exists()


def test_config_get_prints_current(user_env, tmp_path, capsys):
    d = (tmp_path / "models").resolve()
    run_cli(["config", "set", "model_dir", str(d)], capsys=capsys)
    run_cli(["config", "set", "default_device", "cpu"], capsys=capsys)
    rc, stdout, stderr = run_cli(["config", "get"], capsys=capsys)
    assert (rc, stderr) == (0, "")
    assert f'model_dir = "{d.as_posix()}"' in stdout
    assert 'default_device = "cpu"' in stdout


# ---------------------------------------------------------------------------
# model-dir resolution precedence
# ---------------------------------------------------------------------------

def _make_full_model_dir(base, name="m"):
    d = base / name
    d.mkdir()
    for f in cli_v2.REQUIRED_MODEL_FILES:
        (d / f).write_bytes(b"x")
    for sub in cli_v2.REQUIRED_MODEL_DIRS:
        (d / sub).mkdir(parents=True)
    for f in cli_v2.REQUIRED_AUX_MODEL_FILES:
        p = d.joinpath(*f.split("/"))
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
    for sub in cli_v2.REQUIRED_AUX_MODEL_DIRS:
        d.joinpath(*sub.split("/")).mkdir(parents=True, exist_ok=True)
    return d


def test_check_uses_persisted_model_dir(user_env, tmp_path, capsys):
    d = _make_full_model_dir(tmp_path)
    run_cli(["config", "set", "model_dir", str(d)], capsys=capsys)
    rc, stdout, stderr = run_cli(["check"], capsys=capsys)
    assert (rc, stderr) == (0, "")
    assert f"OK: model directory {d.resolve()}" in stdout


def test_check_model_dir_precedence_cli_env_config(user_env, tmp_path, capsys,
                                                   monkeypatch):
    cli_dir = _make_full_model_dir(tmp_path, "cli")
    env_dir = _make_full_model_dir(tmp_path, "env")
    cfg_dir = _make_full_model_dir(tmp_path, "cfg")
    run_cli(["config", "set", "model_dir", str(cfg_dir)], capsys=capsys)
    monkeypatch.setenv("INDEXTTS2_MODEL_DIR", str(env_dir))
    rc, stdout, _ = run_cli(["check", "--model-dir", str(cli_dir)],
                            capsys=capsys)
    assert rc == 0 and f"OK: model directory {cli_dir.resolve()}" in stdout
    rc, stdout, _ = run_cli(["check"], capsys=capsys)
    assert rc == 0 and f"OK: model directory {env_dir.resolve()}" in stdout
    monkeypatch.delenv("INDEXTTS2_MODEL_DIR")
    rc, stdout, _ = run_cli(["check"], capsys=capsys)
    assert rc == 0 and f"OK: model directory {cfg_dir.resolve()}" in stdout


def test_check_initializes_default_state(user_env, capsys, monkeypatch):
    monkeypatch.setenv("INDEXTTS2_MODEL_DIR", "")
    rc, stdout, stderr = run_cli(["check"], capsys=capsys)
    assert (rc, stdout) == (2, "")
    assert "ERROR: missing required model files" in stderr
    assert cli_v2._default_model_dir().exists()
    assert cli_v2._default_model_dir().as_posix() in config_text(user_env)


def test_check_with_cli_model_dir_does_not_persist_override(user_env, tmp_path,
                                                            capsys):
    d = _make_full_model_dir(tmp_path)
    rc, stdout, stderr = run_cli(["check", "--model-dir", str(d)],
                                 capsys=capsys)
    assert rc == 0
    text = config_text(user_env)
    assert cli_v2._default_model_dir().as_posix() in text
    assert d.as_posix() not in text


def test_synth_uses_persisted_model_dir_and_runtime_prefs(user_env, tmp_path,
                                                          capsys):
    d = _make_full_model_dir(tmp_path)
    v = tmp_path / "v.wav"
    _write_wav(v)
    for args in (["config", "set", "model_dir", str(d)],
                 ["config", "set", "default_device", "tpu"],
                 ["config", "set", "use_fp16", "true"],
                 ["config", "set", "use_deepspeed", "true"],
                 ["config", "set", "use_cuda_kernel", "true"]):
        run_cli(args, capsys=capsys)
    out_path = tmp_path / "gen.wav"
    record = []
    rc, stdout, stderr = run_cli(["synth", "--text", "hi", "--voice", str(v),
                                  "--output", str(out_path)],
                                 tts_factory=make_recording_factory(record),
                                 capsys=capsys)
    assert (rc, stdout, stderr) == (0, f"Generated: {out_path}\n", "")
    init = record[0][1]
    assert init["model_dir"] == str(d.resolve())
    assert init["device"] == "tpu"
    assert init["use_fp16"] is True
    assert init["use_deepspeed"] is True
    assert init["use_cuda_kernel"] is True


def test_batch_uses_persisted_prefs_and_cli_can_disable(user_env, tmp_path,
                                                        capsys):
    d = _make_full_model_dir(tmp_path)
    v = tmp_path / "v.wav"
    _write_wav(v)
    for args in (["config", "set", "model_dir", str(d)],
                 ["config", "set", "use_fp16", "true"],
                 ["config", "set", "use_deepspeed", "true"],
                 ["config", "set", "use_cuda_kernel", "true"]):
        run_cli(args, capsys=capsys)
    bf = tmp_path / "b.jsonl"
    bf.write_text(json.dumps({"text": "hi", "voice": str(v),
                              "output": str(tmp_path / "o.wav")}) + "\n",
                  encoding="utf-8")
    record = []
    rc, stdout, stderr = run_cli(["batch", "--batch-file", str(bf)],
                                 tts_factory=make_recording_factory(record),
                                 capsys=capsys)
    assert rc == 0 and record[0][1]["use_fp16"] is True
    before = config_text(user_env)
    record2 = []
    rc, stdout, stderr = run_cli(["batch", "--batch-file", str(bf),
                                  "--no-fp16", "--no-deepspeed",
                                  "--no-cuda-kernel", "--force"],
                                 tts_factory=make_recording_factory(record2),
                                 capsys=capsys)
    assert rc == 0
    init = record2[0][1]
    assert init["use_fp16"] is False
    assert init["use_deepspeed"] is False
    assert init["use_cuda_kernel"] is False
    assert config_text(user_env) == before


def test_synth_cli_overrides_do_not_rewrite_config(user_env, tmp_path, capsys):
    cfg_dir = _make_full_model_dir(tmp_path, "cfg")
    cli_dir = _make_full_model_dir(tmp_path, "cli")
    v = tmp_path / "v.wav"
    _write_wav(v)
    run_cli(["config", "set", "model_dir", str(cfg_dir)], capsys=capsys)
    before = config_text(user_env)
    out_path = tmp_path / "gen.wav"
    record = []
    rc, stdout, stderr = run_cli(["synth", "--text", "hi", "--voice", str(v),
                                  "--output", str(out_path), "--model-dir",
                                  str(cli_dir), "--device", "tpu:0", "--fp16",
                                  "--deepspeed", "--cuda-kernel"],
                                 tts_factory=make_recording_factory(record),
                                 capsys=capsys)
    assert (rc, stdout, stderr) == (0, f"Generated: {out_path}\n", "")
    init = record[0][1]
    assert init["model_dir"] == str(cli_dir.resolve())
    assert init["device"] == "tpu:0"
    assert init["use_fp16"] is True
    assert config_text(user_env) == before


def test_synth_cli_can_disable_persisted_bools(user_env, tmp_path, capsys):
    d = _make_full_model_dir(tmp_path)
    v = tmp_path / "v.wav"
    _write_wav(v)
    for args in (["config", "set", "model_dir", str(d)],
                 ["config", "set", "use_fp16", "true"],
                 ["config", "set", "use_deepspeed", "true"],
                 ["config", "set", "use_cuda_kernel", "true"]):
        run_cli(args, capsys=capsys)
    before = config_text(user_env)
    record = []
    rc, stdout, stderr = run_cli(["synth", "--text", "hi", "--voice", str(v),
                                  "--output", str(tmp_path / "gen.wav"),
                                  "--no-fp16", "--no-deepspeed",
                                  "--no-cuda-kernel"],
                                 tts_factory=make_recording_factory(record),
                                 capsys=capsys)
    assert rc == 0
    init = record[0][1]
    assert init["use_fp16"] is False
    assert init["use_deepspeed"] is False
    assert init["use_cuda_kernel"] is False
    assert config_text(user_env) == before


# ---------------------------------------------------------------------------
# download
# ---------------------------------------------------------------------------

def _fake_snapshot(calls, model_dir_fixture):
    def snap(repo_id, local_dir):
        calls.append((repo_id, Path(local_dir)))
        d = Path(local_dir)
        for f in cli_v2.REQUIRED_MODEL_FILES:
            (d / f).write_bytes(b"x")
        for sub in cli_v2.REQUIRED_MODEL_DIRS:
            (d / sub).mkdir(parents=True, exist_ok=True)
        for f in cli_v2.REQUIRED_AUX_MODEL_FILES:
            p = d.joinpath(*f.split("/"))
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(b"x")
        for sub in cli_v2.REQUIRED_AUX_MODEL_DIRS:
            d.joinpath(*sub.split("/")).mkdir(parents=True, exist_ok=True)
    return snap


def test_download_auto_source_checks_resources(user_env, capsys, monkeypatch):
    calls, aux_calls = [], []
    monkeypatch.setattr(dl, "snapshot_download", _fake_snapshot(calls, None))
    monkeypatch.setattr(dl, "ensure_models_available",
                        lambda md: aux_calls.append(Path(md)) or {})
    rc, stdout, stderr = run_cli(["download"], capsys=capsys)
    default_dir = cli_v2._default_model_dir().resolve(strict=False)
    assert (rc, stderr) == (0, "")
    assert calls == [(cli_v2.MODEL_REPO_ID, default_dir)]
    assert aux_calls == [default_dir]
    assert f"Downloaded model resources to: {default_dir}" in stdout
    assert not cli_v2._config_path().exists()


def test_download_modelscope_persists_target_dir(user_env, tmp_path, capsys,
                                                 monkeypatch):
    calls = []
    monkeypatch.setattr(dl, "snapshot_from_modelscope",
                        _fake_snapshot(calls, None))
    monkeypatch.setattr(dl, "ensure_models_available", lambda md: {})
    d = tmp_path / "ms-models"
    rc, stdout, stderr = run_cli(["download", "--source", "modelscope",
                                  "--model-dir", str(d)], capsys=capsys)
    assert (rc, stderr) == (0, "")
    assert calls[0][0] == cli_v2.MODEL_REPO_ID
    assert f"Downloaded model resources to: {d.resolve()}" in stdout
    assert f'model_dir = "{d.resolve().as_posix()}"' in config_text(user_env)


def test_download_preserves_existing_files(user_env, tmp_path, capsys,
                                           monkeypatch):
    import huggingface_hub

    d = tmp_path / "hf-models"
    d.mkdir()
    sentinel = d / "keep.txt"
    sentinel.write_text("keep", encoding="utf-8")
    fill = _fake_snapshot([], None)
    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        lambda repo_id, local_dir: fill(repo_id, local_dir))
    monkeypatch.setattr(dl, "ensure_models_available", lambda md: {})
    rc, stdout, stderr = run_cli(["download", "--source", "huggingface",
                                  "--model-dir", str(d)], capsys=capsys)
    assert (rc, stderr) == (0, "")
    assert sentinel.read_text(encoding="utf-8") == "keep"
    assert f"Downloaded model resources to: {d.resolve()}" in stdout


def test_download_no_save_does_not_persist(user_env, tmp_path, capsys,
                                           monkeypatch):
    monkeypatch.setattr(dl, "snapshot_download", _fake_snapshot([], None))
    monkeypatch.setattr(dl, "ensure_models_available", lambda md: {})
    d = tmp_path / "models"
    rc, stdout, stderr = run_cli(["download", "--model-dir", str(d),
                                  "--no-save"], capsys=capsys)
    assert (rc, stderr) == (0, "")
    assert f"Downloaded model resources to: {d.resolve()}" in stdout
    assert not cli_v2._config_path().exists()


@pytest.mark.parametrize("source,patched,hint", [
    ("auto", "snapshot_download", "huggingface_hub modelscope"),
    ("modelscope", "snapshot_from_modelscope", "modelscope"),
])
def test_download_runtime_unavailable_when_package_missing(
        user_env, capsys, monkeypatch, source, patched, hint):
    monkeypatch.setattr(dl, patched,
                        lambda *a, **k: (_ for _ in ()).throw(
                            ImportError("missing pkg")))
    rc, stdout, stderr = run_cli(["download", "--source", source],
                                 capsys=capsys)
    assert (rc, stdout) == (3, "")
    assert (f"ERROR: runtime unavailable for {source} download source"
            in stderr)
    assert hint in stderr
    assert not cli_v2._config_path().exists()


def test_download_validates_before_persisting(user_env, tmp_path, capsys,
                                              monkeypatch):
    def partial_snap(repo_id, local_dir):
        (Path(local_dir) / "config.yaml").write_bytes(b"x")

    monkeypatch.setattr(dl, "snapshot_download", partial_snap)
    monkeypatch.setattr(dl, "ensure_models_available", lambda md: {})
    d = tmp_path / "models"
    rc, stdout, stderr = run_cli(["download", "--model-dir", str(d)],
                                 capsys=capsys)
    assert (rc, stdout) == (2, "")
    assert "ERROR: missing required model files" in stderr
    assert "bpe.model" in stderr and "qwen0.6bemo4-merge" in stderr
    assert f"Model directory: {d.resolve()}" in stderr
    assert "Missing resources:" in stderr and "rerun" in stderr
    assert not cli_v2._config_path().exists()
