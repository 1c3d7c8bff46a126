"""Tensor-parallel engine tests on the virtual 8-device CPU mesh.

The TP decode path must produce the same tokens as single-device (the
reference's TP is exercised only implicitly — SURVEY.md §4 calls for real
multi-device tests, which JAX makes cheap)."""

import numpy as np
import jax
import pytest

from jacobiforcing_tpu.config import Config, SamplingParams
from jacobiforcing_tpu.engine.llm_engine import LLMEngine
from jacobiforcing_tpu.models.qwen import ModelConfig, init_params
from jacobiforcing_tpu.parallel.mesh import make_mesh
from tests.test_engine import make_engine, make_prompts, PAGE


def make_tp_engine(tp=2, num_pages=128, seed=0, **cfg_kw):
    mc = ModelConfig.tiny()  # heads=4, kv_heads=2
    params = init_params(mc, jax.random.PRNGKey(seed))
    defaults = dict(
        kvcache_page_size=PAGE, max_model_len=256, jacobi_chunk_tokens=32,
        prefill_token_buckets=(32, 64, 128, 256), eos=-1,
    )
    defaults.update(cfg_kw)
    cfg = Config(**defaults)
    mesh = make_mesh(tensor_parallel_size=tp)
    return LLMEngine(cfg, model_cfg=mc, params=params, num_kv_pages=num_pages, mesh=mesh)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_tp_jacobi_matches_single_device():
    prompts = make_prompts(256)[:2]
    sp = SamplingParams(temperature=0.0, max_tokens=20, decode_strategy="jacobi",
                        jacobi_block_len=8, jacobi_max_blocks=1)
    single = make_engine().generate(prompts, sp)
    tp = make_tp_engine(tp=2).generate(prompts, sp)
    for s, t in zip(single, tp):
        assert s["token_ids"] == t["token_ids"]


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_tp_ar_and_mr():
    prompts = make_prompts(256)[:1]
    sp_ar = SamplingParams(temperature=0.0, max_tokens=16)
    assert (
        make_tp_engine(tp=2).generate(prompts, sp_ar)[0]["token_ids"]
        == make_engine().generate(prompts, sp_ar)[0]["token_ids"]
    )
    sp_mr = SamplingParams(
        temperature=0.0, max_tokens=16,
        decode_strategy="jacobi_multiblock_rejection_recycling",
        jacobi_block_len=8, jacobi_max_blocks=2,
    )
    assert (
        make_tp_engine(tp=2).generate(prompts, sp_mr)[0]["token_ids"]
        == make_engine().generate(prompts, sp_mr)[0]["token_ids"]
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >= 2 devices")
def test_kv_cache_actually_sharded():
    eng = make_tp_engine(tp=2)
    shard_shapes = {s.data.shape for s in eng.kv.k.addressable_shards}
    # head axis (dim 1, size 2) split across 2 devices
    full = eng.kv.k.shape
    assert any(s[1] == full[1] // 2 for s in shard_shapes)
