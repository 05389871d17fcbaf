"""Gradio WebUI for IndexTTS2 (TPU-native).

Behavioral reference: `/root/reference/webui.py` (1 221 LoC): four emotion
control modes, generation-parameter sliders bounded by the model config,
examples table from ``examples/cases.jsonl``, glossary editor, preset manager
(save/load/delete under ``outputs/presets``), live token-count check, zh/en
i18n. Gradio import is deferred so the module is importable without it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from indextts_tpu.utils import presets as preset_store

EMO_CHOICES_ALL = [
    ("与音色参考音频相同", "Same as the voice reference"),
    ("使用情感参考音频", "Use emotion reference audio"),
    ("使用情感向量控制", "Use emotion vectors"),
    ("使用情感描述文本控制", "Use emotion description text"),
]
EMO_VEC_LABELS = [
    ("喜", "Happy"), ("怒", "Angry"), ("哀", "Sad"), ("惧", "Afraid"),
    ("厌恶", "Disgusted"), ("低落", "Melancholic"), ("惊喜", "Surprised"),
    ("平静", "Calm"),
]


class I18n:
    def __init__(self, lang: str = "en"):
        self.zh = lang.startswith("zh")

    def t(self, zh: str, en: str) -> str:
        return zh if self.zh else en


def load_example_cases(path: str = "examples/cases.jsonl"):
    cases = []
    if os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    c = json.loads(line)
                except json.JSONDecodeError:
                    continue
                vec = [c.get(f"emo_vec_{i}", 0.0) for i in range(1, 9)]
                cases.append([
                    os.path.join("examples", c.get("prompt_audio", "")),
                    c.get("emo_mode", 0), c.get("text", ""),
                    *vec, c.get("emo_ref_path", None), c.get("emo_weight", 0.8),
                ])
    return cases


def build_app(tts, i18n: I18n, example_cases):
    import gradio as gr

    max_mel_tokens_limit = tts.cfg.gpt.max_mel_tokens
    emo_choices = [zh if i18n.zh else en for zh, en in EMO_CHOICES_ALL]

    def gen_single(emo_mode, prompt_audio, text, emo_ref_path, emo_weight,
                   vec1, vec2, vec3, vec4, vec5, vec6, vec7, vec8,
                   emo_text, emo_random, interval_silence,
                   max_text_tokens_per_segment,
                   do_sample, top_p, top_k, temperature, length_penalty,
                   num_beams, repetition_penalty, max_mel_tokens,
                   progress=gr.Progress()):
        if not prompt_audio:
            raise gr.Error(i18n.t("请上传音色参考音频", "Please upload a voice reference"))
        output_path = os.path.join("outputs",
                                   f"spk_{int(time.time())}.wav")
        tts.gr_progress = progress
        kwargs = dict(
            do_sample=bool(do_sample), top_p=float(top_p), top_k=int(top_k),
            temperature=float(temperature), length_penalty=float(length_penalty),
            num_beams=int(num_beams), repetition_penalty=float(repetition_penalty),
            max_mel_tokens=int(max_mel_tokens),
        )
        emo_mode_idx = emo_choices.index(emo_mode) if isinstance(emo_mode, str) else int(emo_mode)
        vec = None
        emo_audio = None
        use_emo_text = False
        if emo_mode_idx == 1:
            emo_audio = emo_ref_path
        elif emo_mode_idx == 2:
            vec = tts.normalize_emo_vec([vec1, vec2, vec3, vec4, vec5, vec6,
                                         vec7, vec8])
        elif emo_mode_idx == 3:
            use_emo_text = True
        out = tts.infer(
            spk_audio_prompt=prompt_audio, text=text, output_path=output_path,
            emo_audio_prompt=emo_audio, emo_alpha=float(emo_weight),
            emo_vector=vec, use_emo_text=use_emo_text,
            emo_text=emo_text or None, use_random=bool(emo_random),
            interval_silence=int(interval_silence), verbose=False,
            max_text_tokens_per_segment=int(max_text_tokens_per_segment),
            **kwargs)
        return gr.update(value=output_path, visible=True)

    def count_tokens(text, max_tokens):
        if tts.tokenizer is None or not text:
            return gr.update(value="")
        n = len(tts.tokenizer.tokenize(text))
        warn = "" if n <= int(max_tokens) else i18n.t(
            "（将分段合成）", " (will be split into segments)")
        return gr.update(value=f"tokens: {n}{warn}")

    with gr.Blocks(title="IndexTTS-2 (TPU)") as demo:
        gr.Markdown("## IndexTTS-2 — TPU-native zero-shot TTS")
        with gr.Row():
            prompt_audio = gr.Audio(
                label=i18n.t("音色参考音频", "Voice reference"), type="filepath")
            with gr.Column():
                text_input = gr.TextArea(
                    label=i18n.t("文本", "Text"),
                    placeholder=i18n.t("请输入目标文本", "Enter target text"))
                token_info = gr.Markdown("")
                gen_button = gr.Button(i18n.t("生成语音", "Generate"),
                                       variant="primary")
        emo_mode = gr.Radio(choices=emo_choices, value=emo_choices[0],
                            label=i18n.t("情感控制方式", "Emotion control"))
        # per-mode groups; emo_mode toggles visibility (reference webui
        # behavior: only the active mode's controls show)
        with gr.Group(visible=False) as emo_audio_group:
            emo_ref_path = gr.Audio(
                label=i18n.t("情感参考音频", "Emotion reference"), type="filepath")
        with gr.Group(visible=False) as emo_vec_group:
            vec_sliders = [
                gr.Slider(0.0, 1.2, value=0.0, step=0.05,
                          label=(zh if i18n.zh else en))
                for zh, en in EMO_VEC_LABELS
            ]
        with gr.Group(visible=False) as emo_text_group:
            emo_text = gr.Textbox(
                label=i18n.t("情感描述文本", "Emotion description text"))
        with gr.Group(visible=False) as emo_weight_group:
            emo_weight = gr.Slider(0.0, 1.0, value=0.8, step=0.01,
                                   label=i18n.t("情感权重", "Emotion weight"))
            emo_random = gr.Checkbox(
                value=False, label=i18n.t("情感随机采样", "Randomize emotion match"))

        def on_mode_change(mode):
            idx = emo_choices.index(mode) if mode in emo_choices else 0
            return (gr.update(visible=idx == 1),   # emotion reference audio
                    gr.update(visible=idx == 2),   # emotion vectors
                    gr.update(visible=idx == 3),   # emotion text
                    gr.update(visible=idx != 0))   # weight applies to 1/2/3

        emo_mode.change(on_mode_change, inputs=[emo_mode],
                        outputs=[emo_audio_group, emo_vec_group,
                                 emo_text_group, emo_weight_group])
        with gr.Accordion(i18n.t("高级生成参数设置", "Advanced settings"),
                          open=False):
            interval_silence = gr.Slider(0, 1000, value=200, step=50,
                                         label=i18n.t("分段间静音(ms)",
                                                      "Inter-segment silence (ms)"))
            max_text_tokens_per_segment = gr.Slider(
                20, tts.cfg.gpt.max_text_tokens, value=120, step=2,
                label=i18n.t("分段最大Token数", "Max tokens per segment"))
            do_sample = gr.Checkbox(value=True, label="do_sample")
            top_p = gr.Slider(0.0, 1.0, value=0.8, step=0.01, label="top_p")
            top_k = gr.Slider(0, 100, value=30, step=1, label="top_k")
            temperature = gr.Slider(0.1, 2.0, value=0.8, step=0.05,
                                    label="temperature")
            length_penalty = gr.Number(value=0.0, label="length_penalty")
            num_beams = gr.Slider(1, 10, value=3, step=1, label="num_beams")
            repetition_penalty = gr.Number(value=10.0,
                                           label="repetition_penalty")
            max_mel_tokens = gr.Slider(50, max_mel_tokens_limit, value=1500,
                                       step=10, label="max_mel_tokens")
        output_audio = gr.Audio(label=i18n.t("生成结果", "Output"),
                                visible=True)

        # preset manager
        with gr.Accordion(i18n.t("预设管理", "Presets"), open=False):
            preset_name = gr.Textbox(label=i18n.t("预设名称", "Preset name"))
            preset_dropdown = gr.Dropdown(choices=preset_store.list_presets(),
                                          label=i18n.t("已保存预设", "Saved presets"))
            with gr.Row():
                save_btn = gr.Button(i18n.t("保存", "Save"))
                load_btn = gr.Button(i18n.t("加载", "Load"))
                delete_btn = gr.Button(i18n.t("删除", "Delete"))

            def do_save(name, prompt, emo_ref, mode, weight, *vecs_and_text):
                vecs = list(vecs_and_text[:8])
                etext = vecs_and_text[8]
                if not name:
                    raise gr.Error(i18n.t("预设名称不能为空", "Name required"))
                preset_store.save_preset(
                    name, {"emo_mode": mode, "emo_weight": weight,
                           "emo_vec": vecs, "emo_text": etext},
                    prompt_audio=prompt, emo_audio=emo_ref)
                return gr.update(choices=preset_store.list_presets())

            def do_load(name):
                data = preset_store.load_preset(name) or {}
                vecs = data.get("emo_vec", [0.0] * 8)
                return [data.get("prompt_audio") or None,
                        data.get("emo_audio") or None,
                        data.get("emo_mode", emo_choices[0]),
                        data.get("emo_weight", 0.8),
                        *vecs, data.get("emo_text", "")]

            def do_delete(name):
                preset_store.delete_preset(name)
                return gr.update(choices=preset_store.list_presets())

            save_btn.click(do_save,
                           inputs=[preset_name, prompt_audio, emo_ref_path,
                                   emo_mode, emo_weight, *vec_sliders, emo_text],
                           outputs=[preset_dropdown])
            load_btn.click(do_load, inputs=[preset_dropdown],
                           outputs=[prompt_audio, emo_ref_path, emo_mode,
                                    emo_weight, *vec_sliders, emo_text])
            delete_btn.click(do_delete, inputs=[preset_dropdown],
                             outputs=[preset_dropdown])

        # glossary editor
        with gr.Accordion(i18n.t("术语词汇表", "Glossary"), open=False):
            glossary_box = gr.TextArea(
                value=json.dumps(tts.normalizer.term_glossary,
                                 ensure_ascii=False, indent=2),
                label=i18n.t("术语 (JSON)", "Terms (JSON)"))
            apply_glossary = gr.Button(i18n.t("应用", "Apply"))

            def do_glossary(text):
                try:
                    tts.normalizer.term_glossary = json.loads(text or "{}")
                    tts.normalizer.enable_glossary = True
                    return gr.update(value=text)
                except json.JSONDecodeError as e:
                    raise gr.Error(f"invalid JSON: {e}")

            apply_glossary.click(do_glossary, inputs=[glossary_box],
                                 outputs=[glossary_box])

        if example_cases:
            # rows carry every case field: prompt, mode, text, 8 emo-vec
            # values, emotion reference, weight
            rows = [[c[0], emo_choices[c[1]] if isinstance(c[1], int) else c[1],
                     c[2], *c[3:11], c[11], c[12]] for c in example_cases]
            gr.Examples(examples=rows,
                        inputs=[prompt_audio, emo_mode, text_input,
                                *vec_sliders, emo_ref_path, emo_weight])

        text_input.change(count_tokens,
                          inputs=[text_input, max_text_tokens_per_segment],
                          outputs=[token_info])
        gen_button.click(
            gen_single,
            inputs=[emo_mode, prompt_audio, text_input, emo_ref_path,
                    emo_weight, *vec_sliders, emo_text, emo_random,
                    interval_silence, max_text_tokens_per_segment, do_sample,
                    top_p, top_k, temperature, length_penalty, num_beams,
                    repetition_penalty, max_mel_tokens],
            outputs=[output_audio])
    return demo


def main():
    parser = argparse.ArgumentParser(description="IndexTTS-2 WebUI (TPU)")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--model_dir", type=str, default="checkpoints")
    parser.add_argument("--fp16", action="store_true")
    parser.add_argument("--lang", type=str, default="en", choices=("en", "zh"))
    parser.add_argument("--share", action="store_true")
    args = parser.parse_args()

    try:
        import gradio  # noqa: F401
    except ImportError:
        print("ERROR: gradio is not installed (pip install gradio)",
              file=sys.stderr)
        return 3

    # model auto-download on launch (reference webui.py:34-63): fetch any
    # missing checkpoints, then example assets for the examples table
    required = ("config.yaml", "bpe.model", "gpt.pth", "s2mel.pth")
    if any(not os.path.exists(os.path.join(args.model_dir, f))
           for f in required):
        print(f">> model files missing under {args.model_dir}; downloading...")
        try:
            from indextts_tpu.utils.download import snapshot_download

            snapshot_download("IndexTeam/IndexTTS-2", local_dir=args.model_dir)
        except Exception as e:
            print(f">> model download failed: {e!r}", file=sys.stderr)
            print(f"Please download the model to {args.model_dir} manually "
                  f"(indextts2 download).", file=sys.stderr)
            return 2
    try:
        from indextts_tpu.utils.examples_downloader import (download_examples,
                                                            examples_present)

        if not examples_present():
            download_examples()
    except Exception as e:
        print(f">> example download skipped: {e!r}")

    from indextts_tpu.pipeline.infer_v2 import IndexTTS2

    tts = IndexTTS2(cfg_path=os.path.join(args.model_dir, "config.yaml"),
                    model_dir=args.model_dir, use_fp16=args.fp16)
    i18n = I18n(args.lang)
    demo = build_app(tts, i18n, load_example_cases())
    demo.queue(20)
    demo.launch(server_name=args.host, server_port=args.port, share=args.share)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
