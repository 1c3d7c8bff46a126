"""Flat-softmax calibration hardening (VERDICT r3 #6).

Random-token calibration can keep structure-gated sharp heads dark
(ops/calibrate.py docstring): a head that only fires on a specific bigram
measures benign on random tokens and then silently saturates the flat cap at
serve time.  These tests plant such a head in the tiny model (a huge
q-direction for token B against a huge k-direction for token A, visible only
when B attends a preceding A) and verify that

  * random-token calibration passes (flat stays enabled),
  * representative-prompt calibration catches it (flat forced off),
  * the engine's first-request recalibration catches it end-to-end and
    retraces compiled executables,
  * the JF_PA_GUARD runtime score-max check trips loudly when the flat path
    runs past the cap anyway.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
from jacobiforcing_tpu.ops.calibrate import max_attn_score_exp2
from jacobiforcing_tpu.ops.pallas import paged_attention as pa
from jacobiforcing_tpu.ops import attention

A_TOK, B_TOK = 11, 13


def sharp_bigram_model(vocab=4096, mag=800.0):
    """Tiny model whose layer-0 head 0 produces an attention score of
    ~mag*cos(dist) (pre-scale) ONLY when token B_TOK attends token A_TOK:
    embed[A]=e0, embed[B]=e1 (rms_norm maps a one-hot of dim 64 to 8*e_i),
    wk[0,0]=sqrt(mag)/8, wq[1,0]=sqrt(mag)/8.  Random tokens project ~N(0,1)
    onto those directions, so random calibration stays an order below the
    flat cap while the A->B bigram scores mag*0.54*0.36 ~ 156 exp2-units."""
    cfg = ModelConfig.tiny(vocab_size=vocab)
    params = init_params(cfg, jax.random.PRNGKey(0))
    emb = np.array(params["embed"], np.float64)
    emb[A_TOK] = 0.0
    emb[A_TOK, 0] = 1.0
    emb[B_TOK] = 0.0
    emb[B_TOK, 1] = 1.0
    params["embed"] = jnp.asarray(emb, params["embed"].dtype)
    s = float(np.sqrt(mag)) / 8.0
    for name, row in (("wk", 0), ("wq", 1)):
        w = np.array(params["layers"][name], np.float64)  # [L, hidden, out]
        w[0, row, 0] = s
        params["layers"][name] = jnp.asarray(w, params["layers"][name].dtype)
    return cfg, params


def _random_ids_avoiding(vocab, T=64, B=2, seed=7):
    r = np.random.RandomState(seed)
    ids = r.randint(1, vocab, (B, T)).astype(np.int32)
    ids[(ids == A_TOK) | (ids == B_TOK)] = 17  # the unlucky-free random draw
    return ids


def test_prompt_calibration_catches_sharp_bigram_head():
    cfg, params = sharp_bigram_model()
    rope = rope_table(cfg)
    rnd = max_attn_score_exp2(params, cfg, rope, _random_ids_avoiding(cfg.vocab_size))
    assert rnd <= pa._FLAT_CAP / 2, f"random calibration should pass ({rnd})"
    prompt = np.asarray([[A_TOK, B_TOK] * 16], np.int32)
    sharp = max_attn_score_exp2(params, cfg, rope, prompt)
    assert sharp > pa._FLAT_CAP, f"bigram prompt must blow the cap ({sharp})"


def test_engine_first_request_recalibration_flips_to_online(monkeypatch):
    from jacobiforcing_tpu.config import Config
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine

    monkeypatch.setenv("JF_PA_CALIBRATE_FORCE", "1")
    monkeypatch.setenv("JF_PA_SOFTMAX", "auto")
    monkeypatch.setattr(pa, "_FLAT_BOUND", None)
    cleared = []
    # clear_caches() would force every later test in this process to
    # recompile; record the call instead (the clearing itself is JAX API
    # contract, exercised by the real engine on TPU)
    monkeypatch.setattr(jax, "clear_caches", lambda: cleared.append(1))

    cfg, params = sharp_bigram_model()
    eng = LLMEngine(
        Config(kvcache_page_size=16, max_model_len=256,
               prefill_token_buckets=(64,), eos=-1),
        model_cfg=cfg, params=params, num_kv_pages=64,
    )
    # init-time random calibration measured benign -> flat enabled
    assert eng.flat_softmax_bound is not None
    assert eng.flat_softmax_bound <= pa._FLAT_CAP / 2
    assert pa.flat_enabled()
    from jacobiforcing_tpu.config import SamplingParams

    eng.add_request([A_TOK, B_TOK] * 16, SamplingParams(max_tokens=4))
    # the first real request re-calibrated on its own prompt: worst bound
    # kept, policy flipped to online, executables invalidated
    assert eng.flat_softmax_bound > pa._FLAT_CAP
    assert not pa.flat_enabled()
    assert cleared, "decision flip must clear compiled executables"
    assert not eng._prompt_recal_pending  # runs once
    # engine still serves after the flip
    while not eng.scheduler.is_finished:
        eng.step()


def test_engine_caller_calibration_ids(monkeypatch):
    """Caller-provided representative prompts calibrate at init and disable
    the first-request recalibration pass."""
    from jacobiforcing_tpu.config import Config
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine

    monkeypatch.setenv("JF_PA_CALIBRATE_FORCE", "1")
    monkeypatch.setenv("JF_PA_SOFTMAX", "auto")
    monkeypatch.setattr(pa, "_FLAT_BOUND", None)
    cfg, params = sharp_bigram_model()
    eng = LLMEngine(
        Config(kvcache_page_size=16, max_model_len=256,
               prefill_token_buckets=(64,), eos=-1),
        model_cfg=cfg, params=params, num_kv_pages=64,
        calibration_ids=np.asarray([[A_TOK, B_TOK] * 16], np.int32),
    )
    assert eng.flat_softmax_bound > pa._FLAT_CAP
    assert not pa.flat_enabled()
    assert not eng._prompt_recal_pending


def _paged_setup(big: float):
    """B=1, T=1, NH=2, KH=1, D=128 decode shapes whose max score is
    big^2 * scale * log2e exp2-units."""
    PAGE = 16
    D = 128
    q = np.zeros((1, 1, 2, D), np.float32)
    q[..., 0] = big
    k = np.zeros((1, 2 * PAGE, D), np.float32)
    k[:, :, 0] = big
    v = np.asarray(np.random.RandomState(0).randn(1, 2 * PAGE, D), np.float32)
    bt = jnp.asarray([[0, 1]], jnp.int32)
    cache_lens = jnp.asarray([20], jnp.int32)
    positions = jnp.asarray([[19]], jnp.int32)
    scale = 1.0 / np.sqrt(D)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bt, cache_lens, positions, scale, PAGE


def test_flat_guard_trips_past_cap(monkeypatch):
    monkeypatch.setenv("JF_ATTN_IMPL", "pallas")
    monkeypatch.setenv("JF_PA_INTERPRET", "1")
    monkeypatch.setenv("JF_PA_GUARD", "1")
    monkeypatch.setenv("JF_PA_SOFTMAX", "flat")
    attention.reset_guard()

    q, k, v, bt, cl, pos, scale, PAGE = _paged_setup(big=30.0)  # ~115 units
    attention.paged_attention(q, k, v, bt, cl, pos, scale, page_size=PAGE)
    jax.effects_barrier()
    assert attention.guard_tripped()
    assert attention.guard_max_seen() > pa._FLAT_CAP


def test_flat_guard_quiet_below_cap(monkeypatch):
    monkeypatch.setenv("JF_ATTN_IMPL", "pallas")
    monkeypatch.setenv("JF_PA_INTERPRET", "1")
    monkeypatch.setenv("JF_PA_GUARD", "1")
    monkeypatch.setenv("JF_PA_SOFTMAX", "flat")
    attention.reset_guard()

    q, k, v, bt, cl, pos, scale, PAGE = _paged_setup(big=3.0)  # ~1.1 units
    out = attention.paged_attention(q, k, v, bt, cl, pos, scale, page_size=PAGE)
    jax.effects_barrier()
    assert not attention.guard_tripped()
    assert 0.0 < attention.guard_max_seen() <= pa._FLAT_CAP
    ref = attention.paged_attention_xla(
        q, k, v, bt, cl, pos, scale, page_size=PAGE
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
