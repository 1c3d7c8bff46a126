"""Pallas attention kernels under a (data, model) mesh via shard_map.

GSPMD cannot partition a Pallas custom call: a model-sharded forward that
dispatched the kernel bare would force replication (all-gathering the KV
cache around every layer's attention) or fail to partition.  The dispatchers
in ops/attention.py therefore wrap the kernel in jax.shard_map — KV heads
shard over "model" (attention is shard-local, mirroring the reference's
per-rank KV-head division, inference_engine/engine/model_runner.py:529),
batch over "data".  These tests run the wrapped kernels in interpret mode on
the virtual 8-device CPU mesh (JF_ATTN_IMPL=pallas + JF_PA_INTERPRET=1) and
compare against the unsharded XLA reference path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jacobiforcing_tpu.ops.attention import (
    paged_attention,
    paged_attention_with_block,
    paged_attention_xla,
)
from jacobiforcing_tpu.parallel.mesh import make_mesh, set_serving_mesh

PAGE = 16


@pytest.fixture
def pallas_interpret_env(monkeypatch):
    monkeypatch.setenv("JF_ATTN_IMPL", "pallas")
    monkeypatch.setenv("JF_PA_INTERPRET", "1")
    yield
    set_serving_mesh(None)


def _setup(B, NH, KH, D, T, pages_per_seq, seed=0):
    r = np.random.RandomState(seed)
    num_pages = B * pages_per_seq
    q = jnp.asarray(r.randn(B, T, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    bt = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(B, pages_per_seq))
    return q, k, v, bt


@pytest.mark.parametrize("tp,dp", [(2, 1), (2, 2), (4, 1)])
def test_paged_attention_tp_matches_xla(pallas_interpret_env, tp, dp):
    mesh = make_mesh(tensor_parallel_size=tp, data_parallel_size=dp)
    set_serving_mesh(mesh)

    B, NH, KH, D, T = 4, 8, 4, 128, 4
    q, k, v, bt = _setup(B, NH, KH, D, T, pages_per_seq=5)
    cache_lens = jnp.asarray([37, 61, 80, 44], jnp.int32)
    positions = (cache_lens - T)[:, None] + jnp.arange(T)[None, :]
    scale = 1.0 / np.sqrt(D)

    ref = paged_attention_xla(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE)
    out = paged_attention(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_paged_attention_tp_inside_jit(pallas_interpret_env):
    """The dispatch must compose with jit (it is traced inside the runner's
    decode programs) — shard_map inside jit over the registered mesh."""
    mesh = make_mesh(tensor_parallel_size=2, data_parallel_size=2)
    set_serving_mesh(mesh)

    B, NH, KH, D, T = 4, 8, 4, 128, 4
    q, k, v, bt = _setup(B, NH, KH, D, T, pages_per_seq=5, seed=3)
    cache_lens = jnp.asarray([33, 50, 75, 66], jnp.int32)
    positions = (cache_lens - T)[:, None] + jnp.arange(T)[None, :]
    scale = 0.1

    @jax.jit
    def step(q, k, v, bt, cl, pos):
        return paged_attention(q, k, v, bt, cl, pos, scale, page_size=PAGE)

    ref = paged_attention_xla(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE)
    out = step(q, k, v, bt, cache_lens, positions)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_spec_attention_tp_matches_xla(pallas_interpret_env):
    mesh = make_mesh(tensor_parallel_size=2, data_parallel_size=2)
    set_serving_mesh(mesh)

    r = np.random.RandomState(7)
    B, KH, G, D, T = 4, 4, 2, 128, 6
    NH = KH * G
    q, k, v, bt = _setup(B, NH, KH, D, T, pages_per_seq=4, seed=7)
    cache_lens = jnp.asarray([30, 55, 41, 64], jnp.int32)
    k_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    v_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    intra = jnp.asarray(np.tril(np.ones((T, T), bool))[None].repeat(B, 0))
    scale = 1.0 / np.sqrt(D)

    set_serving_mesh(None)  # XLA reference path, unsharded
    import os

    os.environ["JF_ATTN_IMPL"] = "xla"
    ref = paged_attention_with_block(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale, page_size=PAGE)
    os.environ["JF_ATTN_IMPL"] = "pallas"
    set_serving_mesh(mesh)
    out = paged_attention_with_block(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale, page_size=PAGE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_engine_tp_pallas_jacobi_equals_ar(pallas_interpret_env):
    """Full engine decode over a TP mesh with the Pallas kernel (interpret
    mode): greedy Jacobi must match greedy AR token-for-token — the
    reference's cross-mode criterion (test_jacobi_decoding_greedy.py:313-360)
    — through the shard_map'd kernel end to end."""
    from jacobiforcing_tpu.config import Config, SamplingParams
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine
    from jacobiforcing_tpu.models.qwen import ModelConfig, init_params

    # Kernel-feasible tiny model: head_dim=128 (lane-aligned), fp32 (the
    # kernel takes bf16/f32; fp64 tie-stability is not needed because AR and
    # Jacobi run the *same* kernel, so argmax ties resolve identically).
    mc = ModelConfig.tiny(head_dim=128, dtype=jnp.float32)
    params = init_params(mc, jax.random.PRNGKey(11))
    cfg = Config(
        kvcache_page_size=PAGE, max_model_len=256, jacobi_chunk_tokens=16,
        prefill_token_buckets=(32, 64), eos=-1,
    )
    mesh = make_mesh(tensor_parallel_size=2)

    r = np.random.RandomState(4)
    prompts = [r.randint(1, 256, size=n).tolist() for n in (5, 9)]

    outs = {}
    for strat in ("autoregressive", "jacobi"):
        eng = LLMEngine(cfg, model_cfg=mc, params=params, num_kv_pages=64,
                        mesh=mesh)
        sp = SamplingParams(
            temperature=0.0, max_tokens=12, decode_strategy=strat,
            jacobi_block_len=8, jacobi_max_blocks=1,
        )
        outs[strat] = eng.generate(prompts, sp)
        eng.exit()
    for a, j in zip(outs["autoregressive"], outs["jacobi"]):
        assert a["token_ids"] == j["token_ids"]
        assert len(a["token_ids"]) == 12


def test_tp_fallback_when_shapes_dont_divide(pallas_interpret_env):
    """KH not divisible by tp (or B by dp) falls back to the XLA path rather
    than crashing in shard_map."""
    mesh = make_mesh(tensor_parallel_size=4, data_parallel_size=2)
    set_serving_mesh(mesh)

    B, NH, KH, D, T = 3, 6, 3, 128, 4  # KH=3 % tp=4 != 0; B=3 % dp=2 != 0
    q, k, v, bt = _setup(B, NH, KH, D, T, pages_per_seq=3, seed=5)
    cache_lens = jnp.asarray([20, 33, 44], jnp.int32)
    positions = (cache_lens - T)[:, None] + jnp.arange(T)[None, :]

    ref = paged_attention_xla(
        q, k, v, bt, cache_lens, positions, 0.2, page_size=PAGE)
    out = paged_attention(
        q, k, v, bt, cache_lens, positions, 0.2, page_size=PAGE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_spec_attention_tp_scaled_kv(pallas_interpret_env):
    """Scaled-KV (fp8/int8 per-row dequant) MR spec kernel under the mesh:
    the shard_map path must carry the scale planes over the "model" axis."""
    mesh = make_mesh(tensor_parallel_size=2, data_parallel_size=2)

    r = np.random.RandomState(11)
    B, KH, G, D, T = 4, 4, 2, 128, 6
    NH = KH * G
    q, k, v, bt = _setup(B, NH, KH, D, T, pages_per_seq=4, seed=11)
    num_slots = k.shape[1]
    ks = jnp.asarray(0.5 + r.rand(KH, num_slots), jnp.float32)
    vs = jnp.asarray(0.5 + r.rand(KH, num_slots), jnp.float32)
    cache_lens = jnp.asarray([30, 55, 41, 64], jnp.int32)
    k_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    v_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    intra = jnp.asarray(np.tril(np.ones((T, T), bool))[None].repeat(B, 0))
    scale = 1.0 / np.sqrt(D)

    import os

    set_serving_mesh(None)  # XLA reference path, unsharded
    os.environ["JF_ATTN_IMPL"] = "xla"
    ref = paged_attention_with_block(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale, page_size=PAGE,
        k_scale_l=ks, v_scale_l=vs)
    os.environ["JF_ATTN_IMPL"] = "pallas"
    set_serving_mesh(mesh)
    out = paged_attention_with_block(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale, page_size=PAGE,
        k_scale_l=ks, v_scale_l=vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
