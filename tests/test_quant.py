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


def test_fp8_scaled_write_roundtrip():
    """write_kv_scaled: per-row amax scales keep dequant error at the fp8
    relative precision even for magnitudes far beyond the e4m3 max (448)."""
    from jacobiforcing_tpu.ops.kv_cache import (
        alloc_kv_cache, gather_scales, gather_pages, write_kv_scaled,
    )

    r = np.random.RandomState(0)
    KH, D, page = 2, 16, 16
    kv = alloc_kv_cache(1, 4, page, KH, D, jnp.float8_e4m3fn)
    assert kv.scaled and kv.k_scale.shape == (1, KH, 64)
    # magnitudes up to ~2000: raw casting would clamp at 448
    k_new = jnp.asarray(r.randn(1, 8, KH, D) * 700, jnp.float32)
    v_new = jnp.asarray(r.randn(1, 8, KH, D) * 700, jnp.float32)
    slots = jnp.arange(8, dtype=jnp.int32)[None, :]
    k_c, v_c, ks_c, vs_c = write_kv_scaled(
        kv.k[0], kv.v[0], kv.k_scale[0], kv.v_scale[0], k_new, v_new, slots
    )
    bt = jnp.asarray([[0]], jnp.int32)
    k_back = gather_pages(k_c, bt, page).astype(jnp.float32)
    ks = gather_scales(ks_c, bt, page)
    deq = np.asarray(k_back * ks[..., None])[0, :8]  # [8, KH, D]
    orig = np.asarray(k_new)[0]
    rel = np.abs(deq - orig) / (np.abs(orig) + 1e-6)
    assert rel.max() < 0.07, rel.max()  # e4m3: 3 mantissa bits ~ 6.25% worst
    # raw cast for comparison: out-of-range e4m3fn becomes NaN (no inf) —
    # the silent corruption the per-row scales exist to prevent
    raw = np.asarray(k_new.astype(jnp.float8_e4m3fn).astype(jnp.float32))[0]
    raw_rel = np.abs(raw - orig) / (np.abs(orig) + 1e-6)
    assert (~np.isfinite(raw_rel)).any() or raw_rel.max() > 0.3


def test_fp8_scaled_attention_bounded_delta():
    """Attention over scaled-fp8 KV with out-of-range magnitudes stays within
    fp8 precision of the fp32 oracle (raw cast would not)."""
    from jacobiforcing_tpu.ops.attention import paged_attention_xla
    from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache, write_kv, write_kv_scaled

    r = np.random.RandomState(1)
    B, L, NH, KH, D, page = 2, 4, 4, 2, 32, 16
    S = 48
    kv8 = alloc_kv_cache(1, 8, page, KH, D, jnp.float8_e4m3fn)
    kv32 = alloc_kv_cache(1, 8, page, KH, D, jnp.float32)
    # K/V magnitudes ~ N(0, 600): many rows beyond the e4m3 max
    k_new = jnp.asarray(r.randn(B, S, KH, D) * 600, jnp.float32)
    v_new = jnp.asarray(r.randn(B, S, KH, D) * 600, jnp.float32)
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    slots = bt[:, 0:1] * page  # seq b starts at page bt[b,0]
    slots = (
        jnp.take_along_axis(bt, pos // page, axis=1) * page + pos % page
    )
    k8, v8, ks8, vs8 = write_kv_scaled(
        kv8.k[0], kv8.v[0], kv8.k_scale[0], kv8.v_scale[0], k_new, v_new, slots
    )
    k32, v32 = write_kv(kv32.k[0], kv32.v[0], k_new, v_new, slots)

    # small q keeps scores O(1): softmax stays smooth, so output error
    # reflects fp8 value precision rather than a saturated-argmax flip
    q = jnp.asarray(r.randn(B, L, NH, D) / 600.0, jnp.float32)
    cache_lens = jnp.asarray([S, S], jnp.int32)
    qpos = (cache_lens - L)[:, None] + jnp.arange(L)[None, :]
    scale = 1.0 / np.sqrt(D)
    ref = paged_attention_xla(q, k32, v32, bt, cache_lens, qpos, scale, page_size=page)
    out8 = paged_attention_xla(
        q, k8, v8, bt, cache_lens, qpos, scale, page_size=page,
        k_scale_l=ks8, v_scale_l=vs8,
    )
    ref_n, out_n = np.asarray(ref), np.asarray(out8)
    rel = np.abs(out_n - ref_n).max() / np.abs(ref_n).max()
    assert rel < 0.08, rel
    # raw cast (no scales) saturates and lands far off
    kraw = k_new.astype(jnp.float8_e4m3fn)
    vraw = v_new.astype(jnp.float8_e4m3fn)
    k8r, v8r = write_kv(kv8.k[0], kv8.v[0], kraw, vraw, slots)
    outraw = np.asarray(
        paged_attention_xla(q, k8r, v8r, bt, cache_lens, qpos, scale, page_size=page)
    )
    raw_rel = np.abs(outraw - ref_n).max() / np.abs(ref_n).max()
    assert not np.isfinite(raw_rel) or raw_rel > 3 * rel, (raw_rel, rel)


def test_pallas_kernel_fp8_scales_match_xla():
    """Pallas kernel with per-row fp8 dequant scales == XLA scaled path."""
    from jacobiforcing_tpu.ops.attention import paged_attention_xla
    from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache, write_kv_scaled
    from jacobiforcing_tpu.ops.pallas.paged_attention import paged_attention_pallas

    r = np.random.RandomState(2)
    B, L, NH, KH, D, page = 2, 4, 4, 2, 32, 16
    S = 37
    kv8 = alloc_kv_cache(1, 8, page, KH, D, jnp.float8_e4m3fn)
    k_new = jnp.asarray(r.randn(B, S, KH, D) * 600, jnp.float32)
    v_new = jnp.asarray(r.randn(B, S, KH, D) * 600, jnp.float32)
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    slots = jnp.take_along_axis(bt, pos // page, axis=1) * page + pos % page
    k8, v8, ks8, vs8 = write_kv_scaled(
        kv8.k[0], kv8.v[0], kv8.k_scale[0], kv8.v_scale[0], k_new, v_new, slots
    )
    q = jnp.asarray(r.randn(B, L, NH, D), jnp.float32)
    cache_lens = jnp.asarray([S, S - 7], jnp.int32)
    qpos = (cache_lens - L)[:, None] + jnp.arange(L)[None, :]
    scale = 1.0 / np.sqrt(D)
    ref = paged_attention_xla(
        q, k8, v8, bt, cache_lens, qpos, scale, page_size=page,
        k_scale_l=ks8, v_scale_l=vs8,
    )
    out = paged_attention_pallas(
        q, k8, v8, bt, cache_lens, qpos, scale, page_size=page, interpret=True,
        k_scale_l=ks8, v_scale_l=vs8,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-3, atol=3e-3)


def test_w8a8_mm_accuracy():
    """W8A8 (per-token act quant x per-channel weight quant) mm error bound."""
    r = np.random.RandomState(3)
    w = jnp.asarray(r.randn(64, 32), jnp.float32)
    x = jnp.asarray(r.randn(5, 64) * 3.0, jnp.float32)
    qd = quantize_tensor(w)
    ref = np.asarray(x @ w)
    got = np.asarray(mm(x, qd, a8=True))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel  # two int8 quantizers compose to ~1-2%


def test_w8a8_engine_all_strategies():
    """W8A8 engine runs AR/Jacobi/MR; Jacobi greedy == AR greedy within the
    quantized program (same deterministic path)."""
    prompts = make_prompts(256)[:2]
    ar = make_engine(quantization="w8a8").generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=16)
    )
    ja = make_engine(quantization="w8a8").generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=16, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
    )
    for a, j in zip(ar, ja):
        assert a["token_ids"] == j["token_ids"]
        assert len(a["token_ids"]) == 16
    mr = make_engine(quantization="w8a8").generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=16,
                       decode_strategy="jacobi_multiblock_rejection_recycling",
                       jacobi_block_len=8, jacobi_max_blocks=2),
    )
    for a, m in zip(ar, mr):
        assert a["token_ids"] == m["token_ids"]


def test_int8_kv_cache_engine_exact():
    """int8 KV storage (per-row scales): Jacobi == AR exactly within the
    int8-KV engine, and MR runs too (mirrors test_fp8_kv_cache)."""
    import jax.numpy as jnp

    prompts = make_prompts(256)[:2]
    ar = make_engine(kv_cache_dtype="int8").generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=16)
    )
    eng = make_engine(kv_cache_dtype="int8")
    assert eng.kv.k.dtype == jnp.int8 and eng.kv.scaled
    ja = eng.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=16, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
    )
    for a, j in zip(ar, ja):
        assert a["token_ids"] == j["token_ids"]
    mr = make_engine(kv_cache_dtype="int8").generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=16,
                       decode_strategy="jacobi_multiblock_rejection_recycling",
                       jacobi_block_len=8, jacobi_max_blocks=2),
    )
    for a, m in zip(ar, mr):
        assert a["token_ids"] == m["token_ids"]


def test_int8_kv_write_roundtrip_bound():
    """int8 KV rows: dequant error is bounded by half a quantization step
    (amax/254) per element — a uniform-grid bound, tighter than fp8 for
    elements near the row amax."""
    import jax.numpy as jnp
    from jacobiforcing_tpu.ops.kv_cache import (
        alloc_kv_cache, gather_pages, gather_scales, write_kv_scaled,
    )

    r = np.random.RandomState(0)
    KH, D, page = 2, 16, 16
    kv = alloc_kv_cache(1, 4, page, KH, D, jnp.int8)
    assert kv.scaled
    k_new = jnp.asarray(r.randn(1, 8, KH, D) * 700, jnp.float32)
    v_new = jnp.asarray(r.randn(1, 8, KH, D) * 700, jnp.float32)
    slots = jnp.arange(8, dtype=jnp.int32)[None, :]
    k_c, v_c, ks_c, vs_c = write_kv_scaled(
        kv.k[0], kv.v[0], kv.k_scale[0], kv.v_scale[0], k_new, v_new, slots
    )
    bt = jnp.asarray([[0]], jnp.int32)
    deq = np.asarray(
        gather_pages(k_c, bt, page).astype(jnp.float32)
        * gather_scales(ks_c, bt, page)[..., None]
    )[0, :8]
    orig = np.asarray(k_new)[0]  # [8, KH, D]
    amax = np.abs(orig).max(axis=-1, keepdims=True)
    assert (np.abs(deq - orig) <= amax / 254.0 * 1.01 + 1e-6).all()
