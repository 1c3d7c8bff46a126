"""INT8 weight-only quantization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from jacobiforcing_tpu.config import SamplingParams
from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, greedy_tokens, logits_at
from jacobiforcing_tpu.ops.quant import mm, quantize_params, quantize_tensor
from tests.test_engine import make_engine, make_prompts


def test_quantize_roundtrip_error():
    r = np.random.RandomState(0)
    w = jnp.asarray(r.randn(4, 64, 32), jnp.float32)
    qd = quantize_tensor(w)
    assert qd["q"].dtype == jnp.int8
    deq = qd["q"].astype(jnp.float32) * qd["s"].astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(deq - w)) / jnp.max(jnp.abs(w)))
    assert rel < 0.01  # int8 symmetric: <= scale/2 per element
    x = jnp.asarray(r.randn(5, 64), jnp.float32)
    qd0 = {"q": qd["q"][0], "s": qd["s"][0]}  # per-layer slice as used in scan
    np.testing.assert_allclose(
        np.asarray(mm(x, qd0)), np.asarray(x @ deq[0]), rtol=1e-3, atol=1e-3
    )


def test_chunked_greedy_matches_full():
    cfg = ModelConfig.tiny(vocab_size=300)  # > chunk when vocab_chunk small
    params = init_params(cfg, jax.random.PRNGKey(0))
    h = jax.random.normal(jax.random.PRNGKey(1), (3, 5, cfg.hidden_size), cfg.dtype)
    full = jnp.argmax(logits_at(params, cfg, h), axis=-1).astype(jnp.int32)
    chunked = greedy_tokens(params, cfg, h, vocab_chunk=128)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_chunked_greedy_tied_embeddings():
    cfg = ModelConfig.tiny(vocab_size=300, tie_word_embeddings=True)
    params = init_params(cfg, jax.random.PRNGKey(2))
    h = jax.random.normal(jax.random.PRNGKey(3), (4, cfg.hidden_size), cfg.dtype)
    full = jnp.argmax(logits_at(params, cfg, h), axis=-1).astype(jnp.int32)
    chunked = greedy_tokens(params, cfg, h, vocab_chunk=128)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_int8_engine_generates_close_to_fp():
    """INT8 engine must run all strategies; outputs may differ slightly from
    full precision (quantization noise) but must be valid and full length."""
    prompts = make_prompts(256)[:2]
    eng = make_engine(quantization="int8")
    for sp in [
        SamplingParams(temperature=0.0, max_tokens=16),
        SamplingParams(temperature=0.0, max_tokens=16, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
        SamplingParams(temperature=0.0, max_tokens=16,
                       decode_strategy="jacobi_multiblock_rejection_recycling",
                       jacobi_block_len=8, jacobi_max_blocks=2),
    ]:
        outs = eng.generate(prompts, sp)
        for o in outs:
            assert len(o["token_ids"]) == 16
            assert all(0 <= t < 256 for t in o["token_ids"])


def test_int8_jacobi_equals_int8_ar():
    """Within the quantized model, Jacobi greedy must still equal AR greedy."""
    prompts = make_prompts(256)[:2]
    ar = make_engine(quantization="int8").generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=20)
    )
    ja = make_engine(quantization="int8").generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=20, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
    )
    for a, j in zip(ar, ja):
        assert a["token_ids"] == j["token_ids"]


def test_fp8_kv_cache():
    """fp8 KV storage: Jacobi must still equal AR exactly within the fp8
    engine (same cache dtype on both paths), and the engine runs MR too."""
    import jax.numpy as jnp

    prompts = make_prompts(256)[:2]
    ar = make_engine(kv_cache_dtype="fp8").generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=16)
    )
    eng = make_engine(kv_cache_dtype="fp8")
    assert eng.kv.k.dtype == jnp.float8_e4m3fn
    ja = eng.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=16, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
    )
    for a, j in zip(ar, ja):
        assert a["token_ids"] == j["token_ids"]
    mr = make_engine(kv_cache_dtype="fp8").generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=16,
                       decode_strategy="jacobi_multiblock_rejection_recycling",
                       jacobi_block_len=8, jacobi_max_blocks=2),
    )
    for a, m in zip(ar, mr):
        assert a["token_ids"] == m["token_ids"]


def test_chunked_token_logprob_matches_full():
    import jax.numpy as jnp
    from jacobiforcing_tpu.models.qwen import chunked_token_logprob, logits_at

    cfg = ModelConfig.tiny(vocab_size=300)
    params = init_params(cfg, jax.random.PRNGKey(0))
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.hidden_size), cfg.dtype)
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 5), 0, 300, jnp.int32)
    temp = jnp.asarray([[0.7], [1.3]])

    full = logits_at(params, cfg, h) / temp[..., None]
    want = jnp.take_along_axis(
        jax.nn.log_softmax(full, axis=-1), toks[..., None], axis=-1
    )[..., 0]
    got = chunked_token_logprob(params, cfg, h, toks, temp, vocab_chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_int4_matmul_kernel_correct():
    """Int4 dequant-matmul kernel (interpret mode) vs full-precision reference."""
    import jax.numpy as jnp
    from jacobiforcing_tpu.ops.pallas import int4_matmul as i4

    r = np.random.RandomState(0)
    K, N, M = 256, 1024, 16
    wq = jnp.asarray(r.randint(-8, 8, (K, N)), jnp.int8)
    wp = i4.pack_int4(wq)
    assert wp.shape == (K, N // 2)
    scale = jnp.asarray(np.abs(r.randn(N)) * 0.01, jnp.float32)
    x = jnp.asarray(r.randn(M, K), jnp.float32)
    ref = (x @ wq.astype(jnp.float32)) * scale

    out = i4.int4_matmul(x, wp, scale, tile_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
