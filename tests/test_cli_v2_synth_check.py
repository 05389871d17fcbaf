"""Check- and synth-subcommand contract tests, porting the scenario list of
the reference `cli_tests/test_cli_v2_check.py` (47 scenarios) onto this
repo's pytest fixtures. Device scenarios are adapted to the TPU runtime:
the reference checks cuda/xpu availability; this build reports tpu/cpu.
"""

import io
from pathlib import Path

import pytest

from indextts_tpu import cli_v2
from tests.test_cli_v2 import (fake_factory, model_dir, user_env,  # noqa: F401
                               _write_wav, FakeTTS)
from tests.test_cli_v2_batch import make_recording_factory, run_cli


@pytest.fixture
def voice(tmp_path):
    v = tmp_path / "voice.wav"
    _write_wav(v)
    return v


# ---------------------------------------------------------------------------
# packaging
# ---------------------------------------------------------------------------

def test_pyproject_registers_both_cli_entry_points():
    pyproject = (Path(cli_v2.__file__).parents[1]
                 / "pyproject.toml").read_text(encoding="utf-8")
    assert 'indextts = "indextts_tpu.cli:main"' in pyproject
    assert 'indextts2 = "indextts_tpu.cli_v2:main"' in pyproject


# ---------------------------------------------------------------------------
# check
# ---------------------------------------------------------------------------

def test_check_success_reports_resources_packages_devices(user_env, model_dir,
                                                          capsys):
    rc, out, err = run_cli(["check", "--model-dir", str(model_dir),
                            "--device", "cpu"], capsys=capsys)
    assert (rc, err) == (0, "")
    assert f"Checking model directory: {model_dir}" in out
    assert "OK: model directory" in out
    assert "OK: required model files" in out
    assert "OK: python packages" in out
    assert "cpu: available" in out


def test_check_resource_error_when_model_dir_missing(user_env, tmp_path,
                                                     capsys):
    missing = tmp_path / "nope"
    rc, out, err = run_cli(["check", "--model-dir", str(missing)],
                           capsys=capsys)
    assert (rc, out) == (2, "")
    assert "ERROR: model directory does not exist" in err
    assert str(missing) in err


def test_check_resource_error_when_files_missing(user_env, tmp_path, capsys):
    partial = tmp_path / "partial"
    partial.mkdir()
    (partial / "config.yaml").write_text("x", encoding="utf-8")
    rc, out, err = run_cli(["check", "--model-dir", str(partial)],
                           capsys=capsys)
    assert (rc, out) == (2, "")
    assert "ERROR: missing required model files" in err
    for needle in ("bpe.model", "gpt.pth"):
        assert needle in err


def test_check_requires_full_key_resource_set(user_env, model_dir, capsys):
    for gone in ("feat1.pt", "feat2.pt"):
        (model_dir / gone).unlink()
    import shutil
    shutil.rmtree(model_dir / "qwen0.6bemo4-merge")
    rc, out, err = run_cli(["check", "--model-dir", str(model_dir)],
                           capsys=capsys)
    assert (rc, out) == (2, "")
    for needle in ("feat1.pt", "feat2.pt", "qwen0.6bemo4-merge"):
        assert needle in err


def test_check_requires_aux_cache_resources(user_env, model_dir, capsys):
    import shutil
    shutil.rmtree(model_dir / "hf_cache")
    rc, out, err = run_cli(["check", "--model-dir", str(model_dir)],
                           capsys=capsys)
    assert (rc, out) == (2, "")
    assert "ERROR: missing required model files" in err
    for needle in ("hf_cache/w2v-bert-2.0",
                   "hf_cache/semantic_codec_model.safetensors",
                   "hf_cache/campplus_cn_common.bin",
                   "hf_cache/bigvgan/config.json",
                   "hf_cache/bigvgan/bigvgan_generator.pt"):
        assert needle in err


def test_check_distinguishes_file_and_dir_resources(user_env, model_dir,
                                                    capsys):
    # a file where a directory is required and vice versa
    (model_dir / "gpt.pth").unlink()
    (model_dir / "gpt.pth").mkdir()
    import shutil
    shutil.rmtree(model_dir / "qwen0.6bemo4-merge")
    (model_dir / "qwen0.6bemo4-merge").write_text("x", encoding="utf-8")
    rc, out, err = run_cli(["check", "--model-dir", str(model_dir)],
                           capsys=capsys)
    assert (rc, out) == (2, "")
    assert "gpt.pth" in err and "qwen0.6bemo4-merge" in err


def test_check_runtime_error_when_package_missing(user_env, model_dir, capsys,
                                                  monkeypatch):
    import importlib
    real = importlib.import_module

    def fake_import(name, *a, **k):
        if name == "numpy":
            raise ImportError("numpy gone")
        return real(name, *a, **k)

    monkeypatch.setattr(cli_v2.importlib, "import_module", fake_import)
    rc, out, err = run_cli(["check", "--model-dir", str(model_dir)],
                           capsys=capsys)
    assert (rc, out) == (3, "")
    assert "ERROR: missing required Python packages" in err
    assert "numpy" in err


def test_check_runtime_error_when_device_unavailable(user_env, model_dir,
                                                     capsys, monkeypatch):
    monkeypatch.setattr(cli_v2, "_detect_devices",
                        lambda: {"cpu": True, "tpu": False})
    rc, out, err = run_cli(["check", "--model-dir", str(model_dir),
                            "--device", "tpu"], capsys=capsys)
    assert (rc, out) == (3, "")
    assert "ERROR: requested device is not available: tpu" in err


def test_check_runtime_error_when_device_index_unavailable(user_env, model_dir,
                                                           capsys,
                                                           monkeypatch):
    monkeypatch.setattr(cli_v2, "_detect_devices",
                        lambda: {"cpu": True, "tpu": False})
    rc, out, err = run_cli(["check", "--model-dir", str(model_dir),
                            "--device", "tpu:1"], capsys=capsys)
    assert (rc, out) == (3, "")
    assert "ERROR: requested device is not available: tpu:1" in err


# ---------------------------------------------------------------------------
# synth happy paths
# ---------------------------------------------------------------------------

def test_synth_from_inline_text(user_env, model_dir, tmp_path, voice, capsys):
    out_path = tmp_path / "gen.wav"
    record = []
    rc, out, err = run_cli(["synth", "--text", "hello world", "--voice",
                            str(voice), "--output", str(out_path),
                            "--model-dir", str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, out, err) == (0, f"Generated: {out_path}\n", "")
    assert record[1][1]["text"] == "hello world"
    assert record[1][1]["spk_audio_prompt"] == str(voice)


def test_synth_from_utf8_text_file(user_env, model_dir, tmp_path, voice,
                                   capsys):
    tf = tmp_path / "text.txt"
    tf.write_text("你好, IndexTTS2\n", encoding="utf-8")
    out_path = tmp_path / "gen.wav"
    record = []
    rc, out, err = run_cli(["synth", "--text-file", str(tf), "--voice",
                            str(voice), "--output", str(out_path),
                            "--model-dir", str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, out, err) == (0, f"Generated: {out_path}\n", "")
    assert record[1][1]["text"] == "你好, IndexTTS2"


def test_synth_from_stdin(user_env, model_dir, tmp_path, voice, capsys):
    out_path = tmp_path / "gen.wav"
    record = []
    rc = cli_v2.main(["synth", "--stdin", "--voice", str(voice), "--output",
                      str(out_path), "--model-dir", str(model_dir)],
                     tts_factory=make_recording_factory(record),
                     stdin=io.StringIO("stdin text\n"))
    cap = capsys.readouterr()
    assert (rc, cap.out, cap.err) == (0, f"Generated: {out_path}\n", "")
    assert record[1][1]["text"] == "stdin text"


def test_synth_emotion_audio_and_weight(user_env, model_dir, tmp_path, voice,
                                        capsys):
    emo = tmp_path / "emo.wav"
    _write_wav(emo)
    out_path = tmp_path / "gen.wav"
    record = []
    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--emotion-audio", str(emo), "--emotion-weight",
                            "0.75", "--output", str(out_path), "--model-dir",
                            str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, out, err) == (0, f"Generated: {out_path}\n", "")
    call = record[1][1]
    assert call["emo_audio_prompt"] == str(emo)
    assert call["emo_alpha"] == 0.75
    assert "use_emo_text" not in call and "emo_text" not in call


def test_synth_emotion_text_and_weight(user_env, model_dir, tmp_path, voice,
                                       capsys):
    out_path = tmp_path / "gen.wav"
    record = []
    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--emotion-text", "warm and calm",
                            "--emotion-weight", "0.6", "--output",
                            str(out_path), "--model-dir", str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, out, err) == (0, f"Generated: {out_path}\n", "")
    call = record[1][1]
    assert "emo_audio_prompt" not in call
    assert call["use_emo_text"] is True
    assert call["emo_text"] == "warm and calm"
    assert call["emo_alpha"] == 0.6


def test_synth_emotion_vector_and_weight(user_env, model_dir, tmp_path, voice,
                                         capsys):
    out_path = tmp_path / "gen.wav"
    record = []
    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--emotion-vector", "0,0,0.8,0,0,0,0,0",
                            "--emotion-weight", "0.7", "--output",
                            str(out_path), "--model-dir", str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, out, err) == (0, f"Generated: {out_path}\n", "")
    call = record[1][1]
    assert call["emo_vector"] == [0.0, 0.0, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0]
    assert call["emo_alpha"] == 0.7
    for absent in ("emo_audio_prompt", "use_emo_text", "emo_text"):
        assert absent not in call


def test_synth_accepts_list_style_emotion_vector(user_env, model_dir, tmp_path,
                                                 voice, capsys):
    out_path = tmp_path / "gen.wav"
    record = []
    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--emotion-vector", "[0, 0, 0.8, 0, 0, 0, 0, 0]",
                            "--output", str(out_path), "--model-dir",
                            str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert rc == 0
    call = record[1][1]
    assert call["emo_vector"] == [0.0, 0.0, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0]
    assert call["emo_alpha"] == 1.0


def test_synth_does_not_rewrite_valid_emotion_vector(user_env, model_dir,
                                                     tmp_path, voice, capsys):
    vec = [0.12, 0.03, 0.25, 0.04, 0.0, 0.11, 0.07, 0.02]
    out_path = tmp_path / "gen.wav"
    record = []
    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--emotion-vector",
                            ",".join(str(v) for v in vec),
                            "--output", str(out_path), "--model-dir",
                            str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert rc == 0
    assert record[1][1]["emo_vector"] == vec


# ---------------------------------------------------------------------------
# synth validation failures (factory must never be constructed)
# ---------------------------------------------------------------------------

def _expect_validation_failure(capsys, args, exit_code, needles,
                               stdin=None):
    record = []
    rc = cli_v2.main(args, tts_factory=make_recording_factory(record),
                     stdin=stdin)
    cap = capsys.readouterr()
    assert (rc, cap.out) == (exit_code, "")
    for n in needles:
        assert n in cap.err, (n, cap.err)
    assert record == []


def test_synth_rejects_empty_emotion_vector(user_env, model_dir, tmp_path,
                                            voice, capsys):
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--emotion-vector",
         "", "--output", str(tmp_path / "o.wav"), "--model-dir",
         str(model_dir)],
        1, ["ERROR: --emotion-vector must not be empty"])


@pytest.mark.parametrize("vec,msg", [
    ("0.1,0.2", "must contain exactly 8 values"),
    ("a,b,c,d,e,f,g,h", "entries must be numeric"),
    ("2,0,0,0,0,0,0,0", "values must be between 0.0 and 1.0"),
    ("-0.1,0,0,0,0,0,0,0", "values must be between 0.0 and 1.0"),
    ("0.5,0.5,0,0,0,0,0,0", "sum must be <= 0.8"),
    ("[]", "must not be empty"),
])
def test_synth_rejects_invalid_emotion_vector(user_env, model_dir, tmp_path,
                                              voice, capsys, vec, msg):
    # --emotion-vector=<v> form so values starting with '-' parse as the arg
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice),
         f"--emotion-vector={vec}", "--output", str(tmp_path / "o.wav"),
         "--model-dir", str(model_dir)],
        1, ["ERROR: --emotion-vector", msg])


def test_synth_rejects_vector_conflicting_with_other_sources(
        user_env, model_dir, tmp_path, voice, capsys):
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--emotion-vector",
         "0,0,0.5,0,0,0,0,0", "--emotion-text", "sad", "--output",
         str(tmp_path / "o.wav"), "--model-dir", str(model_dir)],
        1, ["--emotion-vector, --emotion-audio and --emotion-text are "
            "mutually exclusive"])


def test_synth_rejects_empty_emotion_text(user_env, model_dir, tmp_path,
                                          voice, capsys):
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--emotion-text",
         "  ", "--output", str(tmp_path / "o.wav"), "--model-dir",
         str(model_dir)],
        1, ["ERROR: --emotion-text must not be empty"])


@pytest.mark.parametrize("emo_audio", ["emo.wav", ""])
def test_synth_rejects_conflicting_emotion_sources(user_env, model_dir,
                                                   tmp_path, voice, capsys,
                                                   emo_audio):
    emo = tmp_path / "emo.wav"
    _write_wav(emo)
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--emotion-audio",
         str(emo) if emo_audio else "", "--emotion-text", "sad", "--output",
         str(tmp_path / "o.wav"), "--model-dir", str(model_dir)],
        1, ["ERROR: --emotion-audio and --emotion-text are mutually "
            "exclusive"])


def test_synth_rejects_missing_emotion_audio(user_env, model_dir, tmp_path,
                                             voice, capsys):
    missing = tmp_path / "missing_emo.wav"
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--emotion-audio",
         str(missing), "--output", str(tmp_path / "o.wav"), "--model-dir",
         str(model_dir)],
        2, ["ERROR: emotion reference audio does not exist", str(missing)])


def test_synth_rejects_non_float_emotion_weight(user_env, model_dir, tmp_path,
                                                voice, capsys):
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--emotion-weight",
         "heavy", "--output", str(tmp_path / "o.wav"), "--model-dir",
         str(model_dir)],
        1, ["ERROR: --emotion-weight must be a float"])


def test_synth_rejects_missing_text_source(user_env, model_dir, tmp_path,
                                           voice, capsys):
    _expect_validation_failure(
        capsys,
        ["synth", "--voice", str(voice), "--output",
         str(tmp_path / "o.wav"), "--model-dir", str(model_dir)],
        1, ["ERROR: provide exactly one text source"])


def test_synth_rejects_conflicting_text_sources(user_env, model_dir, tmp_path,
                                                voice, capsys):
    tf = tmp_path / "t.txt"
    tf.write_text("x", encoding="utf-8")
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--text-file", str(tf), "--voice",
         str(voice), "--output", str(tmp_path / "o.wav"), "--model-dir",
         str(model_dir)],
        1, ["ERROR: provide exactly one text source"])


def test_synth_rejects_empty_text_conflicting_with_stdin(user_env, model_dir,
                                                         tmp_path, voice,
                                                         capsys):
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "", "--stdin", "--voice", str(voice), "--output",
         str(tmp_path / "o.wav"), "--model-dir", str(model_dir)],
        1, ["ERROR: provide exactly one text source"],
        stdin=io.StringIO("x"))


def test_synth_rejects_whitespace_only_text(user_env, model_dir, tmp_path,
                                            voice, capsys):
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "   \n ", "--voice", str(voice), "--output",
         str(tmp_path / "o.wav"), "--model-dir", str(model_dir)],
        1, ["ERROR: text is empty"])


def test_synth_rejects_missing_text_file(user_env, model_dir, tmp_path, voice,
                                         capsys):
    missing = tmp_path / "missing.txt"
    _expect_validation_failure(
        capsys,
        ["synth", "--text-file", str(missing), "--voice", str(voice),
         "--output", str(tmp_path / "o.wav"), "--model-dir", str(model_dir)],
        2, ["ERROR: text file does not exist", str(missing)])


def test_synth_rejects_missing_voice_file(user_env, model_dir, tmp_path,
                                          capsys):
    missing = tmp_path / "missing_voice.wav"
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(missing), "--output",
         str(tmp_path / "o.wav"), "--model-dir", str(model_dir)],
        2, ["ERROR: voice reference audio does not exist", str(missing)])


def test_synth_rejects_missing_voice_argument(user_env, model_dir, tmp_path,
                                              capsys):
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--output", str(tmp_path / "o.wav"),
         "--model-dir", str(model_dir)],
        2, ["ERROR: --voice is required"])


def test_synth_rejects_existing_output_without_force(user_env, model_dir,
                                                     tmp_path, voice, capsys):
    existing = tmp_path / "o.wav"
    existing.write_bytes(b"old")
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--output",
         str(existing), "--model-dir", str(model_dir)],
        1, ["ERROR: output file already exists", str(existing)])


def test_synth_rejects_missing_output_argument(user_env, model_dir, tmp_path,
                                               voice, capsys):
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--model-dir",
         str(model_dir)],
        1, ["ERROR: --output is required"])


# ---------------------------------------------------------------------------
# synth output handling, runtime mapping, failure modes
# ---------------------------------------------------------------------------

def test_synth_force_allows_existing_output(user_env, model_dir, tmp_path,
                                            voice, capsys):
    existing = tmp_path / "o.wav"
    existing.write_bytes(b"old")
    record = []
    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--output", str(existing), "--force",
                            "--model-dir", str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, out, err) == (0, f"Generated: {existing}\n", "")
    assert record[1][1]["output_path"] == str(existing)


def test_synth_creates_output_parent(user_env, model_dir, tmp_path, voice,
                                     capsys):
    out_path = tmp_path / "new" / "deep" / "gen.wav"
    record = []
    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--output", str(out_path), "--model-dir",
                            str(model_dir)],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert (rc, out, err) == (0, f"Generated: {out_path}\n", "")
    assert out_path.parent.is_dir()


def test_synth_maps_runtime_options(user_env, model_dir, tmp_path, voice,
                                    capsys):
    out_path = tmp_path / "gen.wav"
    record = []
    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--output", str(out_path), "--model-dir",
                            str(model_dir), "--device", "tpu", "--fp16",
                            "--deepspeed", "--cuda-kernel", "--verbose"],
                           tts_factory=make_recording_factory(record),
                           capsys=capsys)
    assert rc == 0
    init = record[0][1]
    assert init["device"] == "tpu"
    assert init["use_fp16"] is True
    assert init["use_deepspeed"] is True
    assert init["use_cuda_kernel"] is True
    assert init["cfg_path"] == str(model_dir / "config.yaml")
    assert init["model_dir"] == str(model_dir)
    assert record[1][1]["verbose"] is True


def test_synth_inference_error_when_infer_fails(user_env, model_dir, tmp_path,
                                                voice, capsys):
    record = []

    def boom(kwargs, n):
        raise RuntimeError("boom")

    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--output", str(tmp_path / "o.wav"),
                            "--model-dir", str(model_dir)],
                           tts_factory=make_recording_factory(record, boom),
                           capsys=capsys)
    assert (rc, out) == (4, "")
    assert "ERROR: inference failed: boom" in err
    assert [r[0] for r in record] == ["init", "infer"]


def test_synth_inference_error_when_init_fails(user_env, model_dir, tmp_path,
                                               voice, capsys):
    record = []

    def factory(**kw):
        record.append(("init", kw))
        raise RuntimeError("load boom")

    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--output", str(tmp_path / "o.wav"),
                            "--model-dir", str(model_dir)],
                           tts_factory=factory, capsys=capsys)
    assert (rc, out) == (4, "")
    assert "ERROR: inference failed: load boom" in err
    assert record[0][0] == "init"


def test_synth_resource_error_when_model_dir_missing(user_env, tmp_path,
                                                     voice, capsys):
    missing = tmp_path / "nope"
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--output",
         str(tmp_path / "o.wav"), "--model-dir", str(missing)],
        2, ["ERROR: model directory does not exist", str(missing)])


def test_synth_resource_error_when_model_file_missing(user_env, tmp_path,
                                                      voice, capsys):
    partial = tmp_path / "partial"
    partial.mkdir()
    (partial / "config.yaml").write_text("x", encoding="utf-8")
    _expect_validation_failure(
        capsys,
        ["synth", "--text", "hi", "--voice", str(voice), "--output",
         str(tmp_path / "o.wav"), "--model-dir", str(partial)],
        2, ["ERROR: missing required model files", "bpe.model"])


def test_synth_runtime_error_when_import_fails(user_env, model_dir, tmp_path,
                                               voice, capsys, monkeypatch):
    monkeypatch.setattr(cli_v2, "_load_indextts2",
                        lambda *a, **k: (_ for _ in ()).throw(
                            ImportError("jax")))
    rc, out, err = run_cli(["synth", "--text", "hi", "--voice", str(voice),
                            "--output", str(tmp_path / "o.wav"),
                            "--model-dir", str(model_dir)], capsys=capsys)
    assert (rc, out) == (3, "")
    assert "ERROR: runtime unavailable: jax" in err


def test_load_indextts2_points_hf_cache_at_model_dir(user_env, model_dir,
                                                     monkeypatch):
    monkeypatch.setenv("HF_HUB_CACHE", "legacy-cache")
    loaded = cli_v2._load_indextts2(model_dir)
    import os

    assert os.environ["HF_HUB_CACHE"] == str(model_dir / "hf_cache")
    from indextts_tpu.pipeline.infer_v2 import IndexTTS2

    assert loaded is IndexTTS2


@pytest.mark.parametrize("verbose", [False, True])
def test_synth_model_stdout_gated_by_verbose(user_env, model_dir, tmp_path,
                                             voice, capsys, verbose):
    out_path = tmp_path / "gen.wav"

    class NoisyTTS:
        def __init__(self, **kw):
            print("model init noise")

        def infer(self, **kw):
            print("model infer noise")
            _write_wav(kw["output_path"])

    args = ["synth", "--text", "hi", "--voice", str(voice), "--output",
            str(out_path), "--model-dir", str(model_dir)]
    if verbose:
        args.append("--verbose")
    rc, out, err = run_cli(args, tts_factory=NoisyTTS, capsys=capsys)
    assert (rc, err) == (0, "")
    assert f"Generated: {out_path}\n" in out
    assert ("model init noise" in out) == verbose
    assert ("model infer noise" in out) == verbose
