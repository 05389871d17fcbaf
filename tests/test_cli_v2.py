"""CLI contract tests (model-free, via injected tts_factory) — the style of
the reference's `cli_tests/` suite (fake model dir + recorded infer kwargs)."""

import json
import os
import wave
from pathlib import Path

import numpy as np
import pytest

from indextts_tpu import cli_v2


@pytest.fixture
def user_env(tmp_path, monkeypatch):
    """Isolated XDG/home state so persisted config never leaks."""
    home = tmp_path / "home"
    home.mkdir()
    monkeypatch.setenv("HOME", str(home))
    monkeypatch.setenv("XDG_CONFIG_HOME", str(home / ".config"))
    monkeypatch.setenv("XDG_DATA_HOME", str(home / ".local" / "share"))
    monkeypatch.delenv("INDEXTTS2_MODEL_DIR", raising=False)
    return home


@pytest.fixture
def model_dir(tmp_path):
    d = tmp_path / "model"
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


def _write_wav(path, seconds=0.1, sr=22050, channels=1):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(b"\x01\x00" * int(seconds * sr) * channels)


class FakeTTS:
    calls = []

    def __init__(self, **kwargs):
        self.init_kwargs = kwargs

    def infer(self, **kwargs):
        FakeTTS.calls.append(kwargs)
        _write_wav(kwargs["output_path"])
        return kwargs["output_path"]


@pytest.fixture
def fake_factory():
    FakeTTS.calls = []
    return FakeTTS


# -- config -------------------------------------------------------------------

def test_config_path_and_set_get(user_env, capsys):
    assert cli_v2.main(["config", "path"]) == 0
    assert "config.toml" in capsys.readouterr().out
    assert cli_v2.main(["config", "set", "use_fp16", "true"]) == 0
    assert cli_v2.main(["config", "get"]) == 0
    assert "use_fp16 = true" in capsys.readouterr().out


def test_config_set_bool_rejects_garbage(user_env, capsys):
    assert cli_v2.main(["config", "set", "use_fp16", "maybe"]) == 1
    assert "must be true or false" in capsys.readouterr().err


def test_init_persists_model_dir(user_env, tmp_path, capsys):
    d = tmp_path / "mymodels"
    assert cli_v2.main(["init", "--model-dir", str(d)]) == 0
    out = capsys.readouterr().out
    assert "Model directory" in out
    assert d.exists()


# -- synth validation -----------------------------------------------------------

def test_synth_requires_one_text_source(user_env, capsys):
    assert cli_v2.main(["synth", "--voice", "v.wav", "--output", "o.wav"]) == 1
    assert "exactly one text source" in capsys.readouterr().err


def test_synth_text_and_stdin_conflict(user_env, capsys):
    rc = cli_v2.main(["synth", "--text", "hi", "--stdin",
                      "--voice", "v.wav", "--output", "o.wav"])
    assert rc == 1


def test_synth_missing_voice(user_env, capsys):
    rc = cli_v2.main(["synth", "--text", "hi", "--output", "o.wav"])
    assert rc == 2
    assert "--voice is required" in capsys.readouterr().err


def test_synth_emotion_conflicts(user_env, tmp_path, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    rc = cli_v2.main(["synth", "--text", "hi", "--voice", str(v),
                      "--emotion-audio", str(v), "--emotion-text", "sad",
                      "--output", "o.wav"])
    assert rc == 1
    assert "mutually exclusive" in capsys.readouterr().err


@pytest.mark.parametrize("vec,msg", [
    ("1,2", "exactly 8 values"),
    ("2,0,0,0,0,0,0,0", "between 0.0 and 1.0"),
    ("0.5,0.5,0,0,0,0,0,0", "sum must be <= 0.8"),
    ("a,b,c,d,e,f,g,h", "must be numeric"),
])
def test_synth_emotion_vector_validation(user_env, tmp_path, capsys, vec, msg):
    v = tmp_path / "v.wav"
    _write_wav(v)
    rc = cli_v2.main(["synth", "--text", "hi", "--voice", str(v),
                      "--emotion-vector", vec, "--output", "o.wav"])
    assert rc == 1
    assert msg in capsys.readouterr().err


def test_synth_happy_path_with_factory(user_env, model_dir, tmp_path,
                                       fake_factory, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    out = tmp_path / "out" / "gen.wav"
    rc = cli_v2.main(["synth", "--text", "hello there .", "--voice", str(v),
                      "--output", str(out), "--model-dir", str(model_dir)],
                     tts_factory=fake_factory)
    assert rc == 0
    assert out.exists()
    assert fake_factory.calls[-1]["text"] == "hello there ."
    assert "Generated:" in capsys.readouterr().out


def test_synth_emotion_kwargs_mapping(user_env, model_dir, tmp_path, fake_factory):
    v = tmp_path / "v.wav"
    _write_wav(v)
    out = tmp_path / "g.wav"
    rc = cli_v2.main(["synth", "--text", "hi", "--voice", str(v),
                      "--emotion-vector", "0.2,0,0,0,0,0,0,0.1",
                      "--emotion-weight", "0.7",
                      "--output", str(out), "--model-dir", str(model_dir)],
                     tts_factory=fake_factory)
    assert rc == 0
    call = fake_factory.calls[-1]
    assert call["emo_vector"] == [0.2, 0, 0, 0, 0, 0, 0, 0.1]
    assert call["emo_alpha"] == 0.7


def test_synth_output_exists_without_force(user_env, model_dir, tmp_path,
                                           fake_factory, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    out = tmp_path / "g.wav"
    _write_wav(out)
    rc = cli_v2.main(["synth", "--text", "hi", "--voice", str(v),
                      "--output", str(out), "--model-dir", str(model_dir)],
                     tts_factory=fake_factory)
    assert rc == 1
    assert "already exists" in capsys.readouterr().err


def test_synth_missing_model_resources(user_env, tmp_path, fake_factory, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    empty = tmp_path / "empty_model"
    empty.mkdir()
    rc = cli_v2.main(["synth", "--text", "hi", "--voice", str(v),
                      "--output", str(tmp_path / "o.wav"),
                      "--model-dir", str(empty)], tts_factory=fake_factory)
    assert rc == 2
    assert "missing required model files" in capsys.readouterr().err


# -- batch -----------------------------------------------------------------------

def _batch_file(tmp_path, rows):
    p = tmp_path / "batch.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows), encoding="utf-8")
    return p


def test_batch_dry_run_ok(user_env, model_dir, tmp_path, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    bf = _batch_file(tmp_path, [
        {"text": "a", "voice": str(v), "output": "a.wav"},
        {"text": "b", "voice": str(v), "output": "b.wav"},
    ])
    rc = cli_v2.main(["batch", "--batch-file", str(bf), "--dry-run",
                      "--model-dir", str(model_dir)])
    assert rc == 0
    assert "Batch file OK: 2 tasks" in capsys.readouterr().out


def test_batch_unknown_field(user_env, tmp_path, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    bf = _batch_file(tmp_path, [{"text": "a", "voice": str(v),
                                 "output": "a.wav", "bogus": 1}])
    rc = cli_v2.main(["batch", "--batch-file", str(bf), "--dry-run"])
    assert rc == 1
    assert "unknown fields: bogus" in capsys.readouterr().err


def test_batch_duplicate_output(user_env, tmp_path, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    bf = _batch_file(tmp_path, [
        {"text": "a", "voice": str(v), "output": "same.wav"},
        {"text": "b", "voice": str(v), "output": "same.wav"},
    ])
    rc = cli_v2.main(["batch", "--batch-file", str(bf), "--dry-run"])
    assert rc == 1
    assert "duplicate output path" in capsys.readouterr().err


def test_batch_line_numbers_one_based(user_env, tmp_path, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    bf = tmp_path / "b.jsonl"
    bf.write_text("\n" + json.dumps({"text": "a", "voice": str(v),
                                     "output": "a.wav"}) + "\nnot json\n",
                  encoding="utf-8")
    rc = cli_v2.main(["batch", "--batch-file", str(bf), "--dry-run"])
    assert rc == 1
    assert "line 3 is not valid JSON" in capsys.readouterr().err


def test_batch_silence_requires_concat(user_env, tmp_path, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    bf = _batch_file(tmp_path, [{"text": "a", "voice": str(v),
                                 "output": "a.wav", "silence_after_ms": 100}])
    rc = cli_v2.main(["batch", "--batch-file", str(bf), "--dry-run"])
    assert rc == 1
    assert "only valid with --concat" in capsys.readouterr().err


def test_batch_execute_with_factory(user_env, model_dir, tmp_path, fake_factory,
                                    capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    bf = _batch_file(tmp_path, [
        {"text": "a", "voice": str(v), "output": "out/a.wav"},
        {"text": "b", "voice": str(v), "output": "out/b.wav",
         "emotion_text": "happy", "emotion_weight": 0.5},
    ])
    rc = cli_v2.main(["batch", "--batch-file", str(bf),
                      "--model-dir", str(model_dir)], tts_factory=fake_factory)
    assert rc == 0
    assert (tmp_path / "out" / "a.wav").exists()
    assert fake_factory.calls[1]["use_emo_text"] is True
    assert fake_factory.calls[1]["emo_alpha"] == 0.5
    assert "Batch complete: 2 tasks generated" in capsys.readouterr().out


def test_batch_concat_mode(user_env, model_dir, tmp_path, fake_factory, capsys):
    v = tmp_path / "v.wav"
    _write_wav(v)
    bf = _batch_file(tmp_path, [
        {"text": "a", "voice": str(v), "silence_after_ms": 50},
        {"text": "b", "voice": str(v)},
    ])
    out = tmp_path / "all.wav"
    rc = cli_v2.main(["batch", "--batch-file", str(bf), "--concat",
                      "--output", str(out), "--model-dir", str(model_dir)],
                     tts_factory=fake_factory)
    assert rc == 0
    assert out.exists()
    with wave.open(str(out), "rb") as w:
        # two 0.1s segments + 50ms silence
        assert w.getnframes() == int(0.1 * 22050) * 2 + 22050 * 50 // 1000
    # temp dir cleaned up
    assert not [p for p in tmp_path.iterdir() if p.name.startswith(".all.wav.")]


def test_batch_concat_output_with_output_dir_conflict(user_env, tmp_path, capsys):
    rc = cli_v2.main(["batch", "--batch-file", "x.jsonl", "--concat",
                      "--output-dir", "d", "--output", "o.wav"])
    assert rc == 1
    assert "--concat cannot be used with --output-dir" in capsys.readouterr().err


# -- concat -----------------------------------------------------------------------

def test_concat_roundtrip(user_env, tmp_path, capsys):
    a, b = tmp_path / "a.wav", tmp_path / "b.wav"
    _write_wav(a, 0.05)
    _write_wav(b, 0.07)
    cf = tmp_path / "c.jsonl"
    cf.write_text(json.dumps({"audio": "a.wav", "silence_after_ms": 10}) + "\n"
                  + json.dumps({"audio": "b.wav"}), encoding="utf-8")
    out = tmp_path / "cat.wav"
    rc = cli_v2.main(["concat", "--concat-file", str(cf), "--output", str(out)])
    assert rc == 0
    with wave.open(str(out), "rb") as w:
        expect = int(0.05 * 22050) + 22050 * 10 // 1000 + int(0.07 * 22050)
        assert w.getnframes() == expect


def test_concat_format_mismatch(user_env, tmp_path, capsys):
    a, b = tmp_path / "a.wav", tmp_path / "b.wav"
    _write_wav(a, 0.05, sr=22050)
    _write_wav(b, 0.05, sr=16000)
    cf = tmp_path / "c.jsonl"
    cf.write_text(json.dumps({"audio": "a.wav"}) + "\n"
                  + json.dumps({"audio": "b.wav"}), encoding="utf-8")
    rc = cli_v2.main(["concat", "--concat-file", str(cf),
                      "--output", str(tmp_path / "o.wav")])
    assert rc == 1
    assert "does not match baseline line 1" in capsys.readouterr().err


def test_concat_output_same_as_input(user_env, tmp_path, capsys):
    a = tmp_path / "a.wav"
    _write_wav(a)
    cf = tmp_path / "c.jsonl"
    cf.write_text(json.dumps({"audio": "a.wav"}), encoding="utf-8")
    rc = cli_v2.main(["concat", "--concat-file", str(cf), "--output", str(a)])
    assert rc == 1
    assert "conflicts with --output" in capsys.readouterr().err


def test_concat_dry_run(user_env, tmp_path, capsys):
    a = tmp_path / "a.wav"
    _write_wav(a)
    cf = tmp_path / "c.jsonl"
    cf.write_text(json.dumps({"audio": "a.wav"}), encoding="utf-8")
    out = tmp_path / "o.wav"
    rc = cli_v2.main(["concat", "--concat-file", str(cf), "--output", str(out),
                      "--dry-run"])
    assert rc == 0
    assert not out.exists()
    assert "Concat file OK: 1 segments" in capsys.readouterr().out


# -- check ---------------------------------------------------------------------

def test_check_ok(user_env, model_dir, capsys):
    rc = cli_v2.main(["check", "--model-dir", str(model_dir)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "OK: required model files" in out
    assert "cpu: available" in out


def test_check_missing_dir(user_env, tmp_path, capsys):
    rc = cli_v2.main(["check", "--model-dir", str(tmp_path / "nope")])
    assert rc == 2
    assert "model directory does not exist" in capsys.readouterr().err


# -- precedence ------------------------------------------------------------------

def test_model_dir_env_precedence(user_env, model_dir, monkeypatch, tmp_path,
                                  fake_factory):
    monkeypatch.setenv("INDEXTTS2_MODEL_DIR", str(model_dir))
    v = tmp_path / "v.wav"
    _write_wav(v)
    out = tmp_path / "g.wav"
    rc = cli_v2.main(["synth", "--text", "hi", "--voice", str(v),
                      "--output", str(out)], tts_factory=fake_factory)
    assert rc == 0
    assert str(model_dir) in fake_factory.calls[-1].get("output_path", str(out)) \
        or fake_factory.calls  # factory received the env model_dir
