"""modeling-layer API, legacy CLLM trainer, SFT data prep tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from jacobiforcing_tpu import modeling
from jacobiforcing_tpu.config import SamplingParams
from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
from tests.test_engine import make_engine, make_prompts


def test_modeling_greedy_matches_engine():
    mc = ModelConfig.tiny()
    params = init_params(mc, jax.random.PRNGKey(0))
    prompts = make_prompts(256)[:1]
    eng_out = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=20,
                                decode_strategy="jacobi", jacobi_block_len=8,
                                jacobi_max_blocks=1),
    )
    out, stats = modeling.jacobi_generate_greedy(
        params, mc, prompts[0], n_token_seq_len=8, max_new_tokens=20,
        page_size=16,
    )
    assert out[:20] == eng_out[0]["token_ids"]
    assert stats["tokens_per_forward"] >= 1.0


def test_modeling_multiblock_matches_ar():
    mc = ModelConfig.tiny()
    params = init_params(mc, jax.random.PRNGKey(0))
    prompts = make_prompts(256)[:1]
    ar = make_engine().generate(prompts, SamplingParams(temperature=0.0, max_tokens=20))
    out, stats = modeling.jacobi_generate_multiblock(
        params, mc, prompts[0], n_token_seq_len=8, K=2, r=0.8,
        max_new_tokens=20, page_size=16,
    )
    assert out[:20] == ar[0]["token_ids"]


def test_legacy_cllm_trainer():
    from jacobiforcing_tpu.data.collect import collect_trajectories
    from jacobiforcing_tpu.train.legacy_cllm import (
        make_legacy_train_step, prepare_legacy_sample,
    )

    eng = make_engine(num_pages=256)
    rows = collect_trajectories(eng, make_prompts(256)[:2], block_len=8,
                                max_tokens=16, temperature=0.0)
    cfg = ModelConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)
    opt = optax.adamw(1e-4)
    step = make_legacy_train_step(cfg, opt)
    opt_state = opt.init(params)
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(3):
        for row in rows:
            batch = {k: jnp.asarray(v) for k, v in
                     prepare_legacy_sample(row, rng, seq_bucket=64).items()}
            params, opt_state, m = step(params, opt_state, rope, batch)
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sft_data_prep():
    from jacobiforcing_tpu.data.sft import make_sft_rows, sft_batch
    from jacobiforcing_tpu.train.sft import make_sft_train_step, sft_loss
    from jacobiforcing_tpu.parallel.mesh import make_mesh

    rows_in = [
        {"data_id": "d0", "prompt_ids": [1, 2], "teacher_output_ids": [1, 2, 9, 8, 7]},
        {"data_id": "d0", "prompt_ids": [1, 2], "teacher_output_ids": [1, 2, 9, 8, 7]},
        {"data_id": "d1", "prompt_ids": [3], "teacher_output_ids": [3, 5, 5]},
    ]
    sft_rows = make_sft_rows(rows_in)
    assert len(sft_rows) == 2  # deduped by data_id
    batch = sft_batch(sft_rows, seq_bucket=16)
    assert batch["input_ids"].shape == (2, 16)
    # prompt + pad masked
    assert batch["loss_mask"][0, :2].sum() == 0 and batch["loss_mask"][0, 2:5].sum() == 3

    cfg = ModelConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)
    mesh = make_mesh(tensor_parallel_size=2, data_parallel_size=2)
    init_fn, step = make_sft_train_step(cfg, mesh)
    params, opt_state = init_fn(params)
    with mesh:
        params, opt_state, loss = step(
            params, opt_state, rope,
            jnp.asarray(batch["input_ids"]), jnp.asarray(batch["loss_mask"]),
        )
    assert np.isfinite(float(loss))
