"""Preset store tests + webui module importability (gradio absent)."""

import json
import os

import numpy as np
import pytest

from indextts_tpu.utils import presets
from indextts_tpu.utils.wav_io import write_wav


@pytest.fixture(autouse=True)
def preset_root(tmp_path):
    presets.set_presets_root(str(tmp_path / "presets"))
    yield
    presets.set_presets_root(None)


def test_preset_crud(tmp_path):
    wav = str(tmp_path / "v.wav")
    write_wav(wav, np.zeros(100, np.float32), 22050)
    presets.save_preset("My Voice!", {"emo_mode": 2, "emo_weight": 0.5,
                                      "emo_vec": [0.1] * 8},
                        prompt_audio=wav)
    assert presets.list_presets() == ["My_Voice!"]
    data = presets.load_preset("My Voice!")
    assert data["emo_mode"] == 2
    assert os.path.exists(data["prompt_audio"])
    assert data["emo_audio"] == ""
    assert presets.preset_exists("My Voice!")
    assert presets.delete_preset("My Voice!")
    assert presets.list_presets() == []
    assert presets.load_preset("My Voice!") is None


def test_safe_preset_name():
    assert presets.safe_preset_name("  a/b\\c:d  ") == "a_b_c_d"
    assert presets.safe_preset_name("...") == "untitled"
    assert presets.safe_preset_name("ok name") == "ok_name"


def test_webui_importable_and_helpers(tmp_path):
    import webui

    assert webui.I18n("zh").t("中", "en") == "中"
    assert webui.I18n("en").t("中", "en") == "en"
    # cases loader tolerates a missing file and bad lines
    assert webui.load_example_cases(str(tmp_path / "none.jsonl")) == []
    p = tmp_path / "cases.jsonl"
    p.write_text('{"prompt_audio":"a.wav","text":"hi","emo_mode":2,'
                 '"emo_vec_1":0.5}\nnot json\n', encoding="utf-8")
    cases = webui.load_example_cases(str(p))
    assert len(cases) == 1
    assert cases[0][1] == 2 and cases[0][3] == 0.5
