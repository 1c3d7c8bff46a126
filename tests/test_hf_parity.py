"""HF numerical-parity tests: our Qwen reimplementation vs transformers.

The reference never reimplements Qwen — its decoding monkeypatches HF's own
forward (modeling/cllm2_qwen2_modeling_kv_terminate_on_eos_improved.py:68-138),
so its numerics are correct by construction.  We reimplement the whole model
(models/qwen.py), so this test is the ground-truth anchor: build a tiny RANDOM
HF Qwen2 and Qwen3 checkpoint with `transformers`, load it through
utils/loader.py, and assert logit parity (prefill positions AND incremental
paged-KV decode) against Qwen2ForCausalLM / Qwen3ForCausalLM.  A RoPE,
qk-norm, bias, head_dim, or tie-embedding convention slip fails here even
though every framework-vs-itself exact-match test would still pass.

Both sides run in float64 (HF internals still do fp32 RMSNorm/RoPE, as do we),
so agreement is limited by fp32 ~1e-6; tolerances are set accordingly.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jacobiforcing_tpu.models.qwen import forward_dense, logits_at, rope_table
from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache
from jacobiforcing_tpu.utils.loader import load_checkpoint
from jacobiforcing_tpu.engine import runner

from helpers import contiguous_block_tables

PAGE = 16


def _make_hf_checkpoint(tmp_path, family: str, tie: bool, seed: int = 0):
    import torch
    from transformers import (
        Qwen2Config,
        Qwen2ForCausalLM,
        Qwen3Config,
        Qwen3ForCausalLM,
    )

    torch.manual_seed(seed)
    if family == "qwen2":
        hf_cfg = Qwen2Config(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=1024,
            rope_theta=10000.0,
            rms_norm_eps=1e-6,
            tie_word_embeddings=tie,
        )
        model = Qwen2ForCausalLM(hf_cfg)
    else:
        # head_dim 32 != hidden/heads (16) on purpose: stresses the explicit
        # head_dim convention Qwen3 introduces.
        hf_cfg = Qwen3Config(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=32,
            max_position_embeddings=1024,
            rope_theta=10000.0,
            rms_norm_eps=1e-6,
            tie_word_embeddings=tie,
        )
        model = Qwen3ForCausalLM(hf_cfg)
    # non-degenerate weights: HF init gives tiny normals; rescale so logit
    # gaps are far above fp32 noise
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 2:
                p.mul_(3.0)
    model.eval()
    path = str(tmp_path / f"hf_{family}_{'tied' if tie else 'untied'}")
    model.save_pretrained(path, safe_serialization=True)
    return model.double(), path


def _hf_logits(model, ids_np: np.ndarray) -> np.ndarray:
    import torch

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids_np).long())
    return out.logits.numpy()


@pytest.mark.parametrize(
    "family,tie",
    [("qwen2", False), ("qwen2", True), ("qwen3", False), ("qwen3", True)],
)
def test_dense_logit_parity(tmp_path, family, tie):
    """forward_dense (training path) matches HF at every prefill position."""
    model, path = _make_hf_checkpoint(tmp_path, family, tie)
    cfg, params = load_checkpoint(path, dtype=jnp.float64)
    assert cfg.qkv_bias == (family == "qwen2")
    assert cfg.qk_norm == (family == "qwen3")
    assert cfg.tie_word_embeddings == tie
    if family == "qwen3":
        assert cfg.head_dim == 32

    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 21)).astype(np.int32)
    pos = np.broadcast_to(np.arange(21, dtype=np.int32), ids.shape)

    rope = rope_table(cfg)
    hidden = forward_dense(params, cfg, jnp.asarray(ids), jnp.asarray(pos), rope)
    ours = np.asarray(logits_at(params, cfg, hidden))
    theirs = _hf_logits(model, ids)

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
    # and greedy choices agree exactly at every position
    np.testing.assert_array_equal(
        np.argmax(ours, axis=-1), np.argmax(theirs, axis=-1)
    )


@pytest.mark.parametrize("family", ["qwen2", "qwen3"])
def test_paged_decode_parity(tmp_path, family):
    """Paged-KV prefill + incremental AR decode matches HF full-context logits."""
    model, path = _make_hf_checkpoint(tmp_path, family, tie=False)
    cfg, params = load_checkpoint(path, dtype=jnp.float64)
    rope = rope_table(cfg)

    prompts = [[5, 9, 2, 77, 31, 8, 100], [200, 3, 14, 15, 9]]
    B = len(prompts)
    max_new = 24
    pages_per_seq = (max(len(p) for p in prompts) + max_new) // PAGE + 1
    kv = alloc_kv_cache(
        cfg.num_layers, B * pages_per_seq, PAGE, cfg.num_kv_heads, cfg.head_dim,
        jnp.float64,
    )
    bt = contiguous_block_tables(B, pages_per_seq, B * pages_per_seq)

    lens = np.array([len(p) for p in prompts], np.int32)
    T = int(lens.max())
    ids = np.zeros((B, T), np.int32)
    for i, p in enumerate(prompts):
        ids[i, : len(p)] = p
    lens_j = jnp.asarray(lens)
    kv, last_logits, _ = runner.prefill(
        params, cfg, rope, jnp.asarray(ids), jnp.zeros((B,), jnp.int32),
        lens_j, lens_j, kv, jnp.asarray(bt), n_out=1,
    )

    # HF oracle: greedy continuation per sequence, logits at each step
    seqs = [list(p) for p in prompts]
    next_tok = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
    for b in range(B):
        hf_log = _hf_logits(model, np.asarray([seqs[b]], np.int64))[0, -1]
        np.testing.assert_allclose(
            np.asarray(last_logits)[b], hf_log, rtol=2e-4, atol=2e-4
        )
        assert int(next_tok[b]) == int(np.argmax(hf_log))

    seq_lens = lens_j + 1
    temperature = jnp.zeros((B,), jnp.float32)
    active = jnp.ones((B,), bool)
    key = jax.random.PRNGKey(0)
    for b in range(B):
        seqs[b].append(int(next_tok[b]))
    for _ in range(max_new - 1):
        kv, next_tok = runner.ar_decode_step(
            params, cfg, rope, kv, next_tok, seq_lens, jnp.asarray(bt),
            active, temperature, key,
        )
        seq_lens = seq_lens + 1
        for b in range(B):
            seqs[b].append(int(next_tok[b]))

    # token-exact greedy match vs HF generate (no sampling, no EOS stop)
    import torch

    for b in range(B):
        inp = torch.tensor([prompts[b]], dtype=torch.long)
        with torch.no_grad():
            out = model.generate(
                inp, max_new_tokens=max_new, do_sample=False,
                eos_token_id=None, pad_token_id=0,
            )
        hf_tokens = out[0, len(prompts[b]):].tolist()
        assert seqs[b][len(prompts[b]):] == hf_tokens, (
            f"seq {b}: ours={seqs[b][len(prompts[b]):]} hf={hf_tokens}"
        )
