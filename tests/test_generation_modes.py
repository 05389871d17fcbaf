"""Token-parity for the auxiliary generation modes vs the EXECUTING
reference: group (diverse) beam search, contrastive search, DoLa, plus
plain beam with a nonzero length penalty (pins the transformers-4.52
generated-length normalization, an r5 behavioral correction).

The reference side drives its own vendored GenerationMixin
(`gpt/transformers_generation_utils.py`) through a tiny torch
UnifiedVoice (`gpt/model_v2.py`), reachable in production via
`inference_speech(**hf_generate_kwargs)` (`model_v2.py:698`). All modes
here are deterministic, so the comparison is exact token equality.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import reference_shim

reference_shim.install()

import jax
import jax.numpy as jnp

from indextts_tpu.engine.beam import generate_beam, generate_group_beam
from indextts_tpu.engine.decode import SamplingConfig, generate
from indextts_tpu.engine.modes import (generate_contrastive, generate_dola,
                                       resolve_dola_layers)
from indextts_tpu.models.gpt import gpt2
from indextts_tpu.models.gpt.unified_voice import prepare_prefix_embeds
from indextts_tpu.utils import convert
from tests.test_parity_gpt import TINY, _sd

torch.manual_seed(0)
N = 10  # max_new_tokens
DIMS = gpt2.GPT2Dims(TINY.layers, TINY.model_dim, TINY.heads)
TEXT = [5, 6, 7, 8]


@pytest.fixture(scope="module")
def rig():
    """(ref inference model + inputs, converted params + prefix)."""
    from indextts.gpt.model_v2 import UnifiedVoice

    cm = dict(output_size=16, linear_units=32, attention_heads=4,
              num_blocks=1, input_layer="conv2d2", perceiver_mult=2)
    m = UnifiedVoice(layers=2, model_dim=32, heads=4, max_text_tokens=30,
                     max_mel_tokens=60, number_text_tokens=40,
                     number_mel_codes=50, start_mel_token=48,
                     stop_mel_token=49, checkpointing=False,
                     condition_type="conformer_perceiver",
                     condition_module=cm,
                     emo_condition_module=dict(cm)).eval()
    m.post_init_gpt2_config(kv_cache=True)
    # the vendored generate() predates the installed transformers'
    # GenerationConfig; restore the one attribute it still reads
    m.inference_model.generation_config.forced_decoder_ids = None

    rng = np.random.default_rng(7)
    conds_np = rng.standard_normal((1, 3, 32)).astype(np.float32)
    text_t = torch.tensor([TEXT])
    input_ids, inputs_embeds, attention_mask = m.prepare_gpt_inputs(
        torch.tensor(conds_np), text_t)
    m.inference_model.store_mel_emb(inputs_embeds)

    params = convert.convert_unified_voice(_sd(m), TINY)
    P = input_ids.shape[1] - 1  # fake ids include the trailing start_mel
    emb, mask = prepare_prefix_embeds(
        params, TINY, jnp.asarray(conds_np),
        jnp.asarray([TEXT], jnp.int32), jnp.asarray([len(TEXT)]), P)
    return m, input_ids, attention_mask, params, emb, mask


def ref_gen(rig, **kw):
    m, input_ids, attention_mask, *_ = rig
    with torch.no_grad():
        out = m.inference_model.generate(
            input_ids, bos_token_id=48, pad_token_id=49, eos_token_id=49,
            attention_mask=attention_mask, max_new_tokens=N, **kw)
    toks = out[0, input_ids.shape[1]:].tolist()
    return toks + [49] * (N - len(toks))  # stop-pad like our contract


def our_gen(rig, fn, **kw):
    *_, params, emb, mask = rig
    s = SamplingConfig(do_sample=False, **kw)
    codes, _ = fn(params, TINY, DIMS, emb, mask, jax.random.PRNGKey(0), N,
                  s, jnp.float32)
    return np.asarray(codes)[0].tolist()


def test_greedy_control(rig):
    """Baseline: the rig itself round-trips (any harness bug shows here)."""
    assert our_gen(rig, generate, repetition_penalty=1.3) == \
        ref_gen(rig, do_sample=False, repetition_penalty=1.3)


def test_beam_length_penalty_parity(rig):
    """lp=1.0 plain beam — pins generated-length-only normalization and the
    candidate-max is_done rule (BeamSearchScorer, transformers 4.52)."""
    ref = ref_gen(rig, do_sample=False, num_beams=4, repetition_penalty=1.3,
                  length_penalty=1.0, num_return_sequences=1)
    ours = our_gen(rig, generate_beam, num_beams=4, repetition_penalty=1.3,
                   length_penalty=1.0)
    assert ours == ref


def test_beam_negative_length_penalty_parity(rig):
    """lp=-0.5 (favors short hyps) exercises the other sign."""
    ref = ref_gen(rig, do_sample=False, num_beams=3, repetition_penalty=1.3,
                  length_penalty=-0.5, num_return_sequences=1)
    ours = our_gen(rig, generate_beam, num_beams=3, repetition_penalty=1.3,
                   length_penalty=-0.5)
    assert ours == ref


def test_beam_min_new_tokens_parity(rig):
    """min_new_tokens in beam mode: HF's processor -inf's the stop lane on
    the POST-log_softmax scores (no renormalization) — masking raw logits
    pre-softmax boosts every beam's non-stop scores by a beam-dependent
    constant and reorders candidates (r5 review fix)."""
    ref = ref_gen(rig, do_sample=False, num_beams=4, repetition_penalty=1.3,
                  length_penalty=1.0, min_new_tokens=3,
                  num_return_sequences=1)
    ours = our_gen(rig, generate_beam, num_beams=4, repetition_penalty=1.3,
                   length_penalty=1.0, min_new_tokens=3)
    assert ours == ref


def test_group_beam_min_new_tokens_parity(rig):
    ref = ref_gen(rig, do_sample=False, num_beams=4, num_beam_groups=2,
                  diversity_penalty=1.0, repetition_penalty=1.3,
                  length_penalty=1.0, min_new_tokens=3,
                  num_return_sequences=1)
    ours = our_gen(rig, generate_group_beam, num_beams=4, num_beam_groups=2,
                   diversity_penalty=1.0, repetition_penalty=1.3,
                   length_penalty=1.0, min_new_tokens=3)
    assert ours == ref


@pytest.mark.parametrize("beams,groups,div", [(4, 2, 2.0), (4, 4, 1.0),
                                              (6, 3, 0.7)])
def test_group_beam_parity(rig, beams, groups, div):
    ref = ref_gen(rig, do_sample=False, num_beams=beams,
                  num_beam_groups=groups, diversity_penalty=div,
                  repetition_penalty=1.3, length_penalty=1.0,
                  num_return_sequences=1)
    ours = our_gen(rig, generate_group_beam, num_beams=beams,
                   num_beam_groups=groups, diversity_penalty=div,
                   repetition_penalty=1.3, length_penalty=1.0)
    assert ours == ref


def test_group_beam_g1_equals_plain(rig):
    """G=1 degenerates to standard beam search exactly."""
    plain = our_gen(rig, generate_beam, num_beams=4, repetition_penalty=1.3,
                    length_penalty=1.0)
    g1 = our_gen(rig, generate_group_beam, num_beams=4, num_beam_groups=1,
                 repetition_penalty=1.3, length_penalty=1.0)
    assert g1 == plain


@pytest.mark.parametrize("k,alpha", [(4, 0.6), (3, 0.3)])
def test_contrastive_parity(rig, k, alpha):
    ref = ref_gen(rig, do_sample=False, top_k=k, penalty_alpha=alpha,
                  repetition_penalty=1.3)
    ours = our_gen(rig, generate_contrastive, top_k=k, penalty_alpha=alpha,
                   repetition_penalty=1.3)
    assert ours == ref


def test_contrastive_alpha0_is_greedy(rig):
    """alpha=0 removes the degeneration penalty -> plain greedy."""
    ours = our_gen(rig, generate_contrastive, top_k=4, penalty_alpha=0.0,
                   repetition_penalty=1.3)
    greedy = our_gen(rig, generate, repetition_penalty=1.3)
    assert ours == greedy


@pytest.mark.parametrize("layers", [(0, 1), "low", "high"])
def test_dola_parity(rig, layers):
    ref_layers = list(layers) if isinstance(layers, tuple) else layers
    ref = ref_gen(rig, do_sample=False, dola_layers=ref_layers,
                  repetition_penalty=1.3)
    ours = our_gen(rig, generate_dola, dola_layers=layers,
                   repetition_penalty=1.3)
    assert ours == ref


def test_resolve_dola_layers_matches_hf_rule():
    """The 'low'/'high' window rule for tied-embedding models
    (reference `transformers_generation_utils.py:2585-2620`)."""
    assert resolve_dola_layers("low", 2) == (1,)
    assert resolve_dola_layers("high", 2) == (1,)
    assert resolve_dola_layers("low", 24) == tuple(range(2, 12, 2))
    assert resolve_dola_layers("high", 24) == tuple(range(12, 24, 2))
    assert resolve_dola_layers("low", 48) == tuple(range(2, 20, 2))
    assert resolve_dola_layers("high", 48) == tuple(range(28, 48, 2))
    assert resolve_dola_layers((0, 5, 99), 24) == (0, 5)
    with pytest.raises(ValueError):
        resolve_dola_layers((99,), 24)
