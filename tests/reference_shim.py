"""Import helper for golden-parity tests against the torch reference.

The reference repo (read-only at /root/reference) has optional deps that are
not installed here (munch, audiotools, argbind, librosa, deepspeed...). This
shim installs minimal stand-ins so the *model* modules import; we only ever
instantiate pure-torch modules from them to produce golden outputs. Nothing is
copied — the reference runs as-is.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def install():
    # append (not insert) so top-level names shared with our repo (webui.py,
    # bench.py, ...) resolve to ours first
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)

    import importlib.machinery

    def mod(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        # a real __spec__ keeps importlib.util.find_spec (used by
        # transformers' availability probes) happy
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    mod("munch", Munch=type("Munch", (dict,), {"__getattr__": dict.get}))

    # librosa: only filters.mel and util.normalize are reached; back the mel
    # filterbank with our own slaney implementation (itself golden-tested
    # against transformers.audio_utils).
    import numpy as _np

    from indextts_tpu.ops.mel import mel_filterbank as _our_mel_fb

    def _librosa_mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False,
                     norm="slaney", dtype=_np.float32):
        return _our_mel_fb(sr, n_fft, n_mels, fmin, fmax,
                           scale="htk" if htk else "slaney", norm=norm, dtype=dtype)

    def _librosa_normalize(S, *, norm=_np.inf, axis=0, threshold=None, fill=None):
        mag = _np.abs(S).astype(float)
        length = mag.max(axis=axis, keepdims=True)
        length[length == 0] = 1.0
        return S / length

    lib = mod("librosa")
    lib.__path__ = []  # mark as package
    mod("librosa.filters", mel=_librosa_mel)
    mod("librosa.util", normalize=_librosa_normalize)
    lib.filters = sys.modules["librosa.filters"]
    lib.util = sys.modules["librosa.util"]

    # torchaudio: only mel-scale helpers are imported by vocos.py
    import math

    def _hz_to_mel(freq, mel_scale="htk"):
        if mel_scale == "htk":
            return 2595.0 * math.log10(1.0 + freq / 700.0)
        raise NotImplementedError

    def _mel_to_hz(mel, mel_scale="htk"):
        if mel_scale == "htk":
            return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
        raise NotImplementedError

    ta = mod("torchaudio")
    ta_f = mod("torchaudio.functional")
    ta_ff = mod("torchaudio.functional.functional",
                _hz_to_mel=_hz_to_mel, _mel_to_hz=_mel_to_hz)
    ta.functional = ta_f
    ta_f.functional = ta_ff

    # the dac package drags in audiotools/argbind; length_regulator only needs
    # dac.nn.quantize.VectorQuantize (unused at inference) — stub the path.
    import torch.nn as tnn

    dac = mod("indextts.s2mel.dac")
    dac_nn = mod("indextts.s2mel.dac.nn")
    dac_q = mod("indextts.s2mel.dac.nn.quantize", VectorQuantize=tnn.Module)
    dac.nn = dac_nn
    dac_nn.quantize = dac_q

    # sentencepiece: back the processor with our pure-python implementation
    try:
        import sentencepiece  # noqa: F401
    except ImportError:
        from indextts_tpu.text.spm import PureSentencePiece

        def _spp(model_file=None, **kw):
            return PureSentencePiece.from_file(model_file)

        mod("sentencepiece", SentencePieceProcessor=_spp)

    # WeTextProcessing / wetext normalizers are absent; reference front.py
    # imports them lazily inside load(), nothing needed here.

    # tqdm is installed? if not, stub a pass-through
    try:
        import tqdm  # noqa: F401
    except ImportError:
        mod("tqdm", tqdm=lambda x, **k: x)

    # The reference vendors an older HF fork; fill names that moved/vanished
    # in the installed transformers with inert placeholders (the golden tests
    # only exercise eager module forwards, never HF generate()).
    import importlib

    def _permissive(name):
        try:
            m = importlib.import_module(name)
        except Exception:
            m = mod(name)

        def _getattr(attr, _m=m):
            cls = type(attr, (), {"__init__": lambda self, *a, **k: None})
            setattr(_m, attr, cls)
            return cls

        m.__getattr__ = _getattr
        return m

    for name in (
        "transformers.cache_utils",
        "transformers.generation.candidate_generator",
        "transformers.generation.logits_process",
        "transformers.generation.stopping_criteria",
        "transformers.generation.configuration_utils",
        "transformers.generation.beam_constraints",
        "transformers.generation.beam_search",
        "transformers.generation.streamers",
        "transformers.pytorch_utils",
        "transformers.modeling_outputs",
        "transformers.integrations.deepspeed",
        "transformers.integrations.fsdp",
        "transformers.utils.model_parallel_utils",
        "transformers.modeling_utils",
        "transformers.activations",
        "transformers.modeling_attn_mask_utils",
    ):
        _permissive(name)
