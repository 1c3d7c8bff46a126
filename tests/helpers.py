"""Shared test helpers: tiny model + naive host-side paging + reference drivers."""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache
from jacobiforcing_tpu.engine import runner

PAGE = 16


def tiny_setup(seed=0, vocab=128, num_pages=64, **cfg_kw):
    cfg = ModelConfig.tiny(vocab_size=vocab, **cfg_kw)
    params = init_params(cfg, jax.random.PRNGKey(seed))
    rope = rope_table(cfg)
    kv = alloc_kv_cache(cfg.num_layers, num_pages, PAGE, cfg.num_kv_heads, cfg.head_dim, cfg.dtype)
    return cfg, params, rope, kv


def contiguous_block_tables(B: int, pages_per_seq: int, num_pages: int) -> np.ndarray:
    """Assign each sequence a contiguous run of pages (no sharing)."""
    assert B * pages_per_seq <= num_pages
    bt = np.full((B, pages_per_seq), -1, np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq, dtype=np.int32)
    return bt


def pad_batch(prompts: List[List[int]], extra: int = 0, pad_id: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    lens = np.array([len(p) for p in prompts], np.int32)
    T = int(lens.max()) + extra
    ids = np.full((len(prompts), T), pad_id, np.int32)
    for i, p in enumerate(prompts):
        ids[i, : len(p)] = p
    return ids, lens


def ar_generate_greedy(cfg, params, rope, kv, prompts, max_new, block_tables):
    """Oracle: batched greedy AR decoding (reference: ar_inference_baseline.py)."""
    B = len(prompts)
    ids, lens = pad_batch(prompts)
    lens_j = jnp.asarray(lens)
    kv, last_logits, _ = runner.prefill(
        params, cfg, rope, jnp.asarray(ids), jnp.zeros((B,), jnp.int32),
        lens_j, lens_j, kv, jnp.asarray(block_tables), n_out=1,
    )
    next_tok = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
    out = [[int(next_tok[b])] for b in range(B)]
    seq_lens = jnp.asarray(lens) + 1
    temperature = jnp.zeros((B,), jnp.float32)
    active = jnp.ones((B,), bool)
    key = jax.random.PRNGKey(0)
    for _ in range(max_new - 1):
        kv, next_tok = runner.ar_decode_step(
            params, cfg, rope, kv, next_tok, seq_lens, jnp.asarray(block_tables),
            active, temperature, key,
        )
        seq_lens = seq_lens + 1
        for b in range(B):
            out[b].append(int(next_tok[b]))
    return out, kv


def jacobi_generate_greedy(
    cfg, params, rope, kv, prompts, max_new, block_tables, L=8,
    eos_token_id=-1, chunk_budget=None, max_iters=512, seed=0,
):
    """Drive the device-side Jacobi loop over chunks; returns per-seq tokens + stats."""
    B = len(prompts)
    capacity = np.full((B,), block_tables.shape[1] * PAGE, np.int32)
    ids, lens = pad_batch(prompts, extra=L)
    # Append random bootstrap draft to each prompt row (reference
    # model_runner.py:796-801): positions P..P+L-1.
    rng = np.random.RandomState(seed)
    for b in range(B):
        ids[b, lens[b] : lens[b] + L] = rng.randint(0, cfg.vocab_size, L)
    total_lens = jnp.asarray(lens + L)
    kv, _, prefill_draft = runner.prefill(
        params, cfg, rope, jnp.asarray(ids), jnp.zeros((B,), jnp.int32),
        total_lens, jnp.asarray(lens), kv, jnp.asarray(block_tables), n_out=L,
    )

    cap_tokens = block_tables.shape[1] * PAGE + L + 1
    tokens = np.zeros((B, cap_tokens), np.int32)
    for b in range(B):
        tokens[b, : lens[b]] = prompts[b]
    tokens = jnp.asarray(tokens)
    cur_len = jnp.asarray(lens)

    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    last_toks = jnp.asarray([p[-1] for p in prompts], jnp.int32)
    draft = runner.make_first_draft(prefill_draft, last_toks, L, sub, cfg.vocab_size)

    eos = jnp.zeros((B,), bool)
    iters = jnp.zeros((B,), jnp.int32)
    max_new_arr = jnp.full((B,), max_new, jnp.int32)
    chunk_budget = chunk_budget or max_new
    produced = jnp.zeros((B,), jnp.int32)

    while True:
        res = runner.jacobi_chunk_greedy(
            params, cfg, rope, kv, tokens, cur_len, draft, eos, iters,
            jnp.asarray(block_tables), jnp.asarray(capacity),
            jnp.asarray(lens, jnp.int32) + max_new_arr, key,  # absolute len_limit
            eos_token_id, jnp.full((B,), max_iters, jnp.int32),
            chunk_budget=chunk_budget,
        )
        kv, tokens, cur_len = res["kv"], res["tokens"], res["cur_len"]
        draft, eos, iters = res["draft"], res["eos"], res["iters"]
        produced = produced + res["generated"]
        key, _ = jax.random.split(key)
        done = np.asarray(eos) | (np.asarray(produced) >= max_new) | (
            np.asarray(iters) >= max_iters
        )
        if done.all():
            break

    toks_np = np.asarray(tokens)
    cur_np = np.asarray(cur_len)
    outs = []
    for b in range(B):
        gen = toks_np[b, lens[b] : cur_np[b]].tolist()
        outs.append(gen[:max_new] if eos_token_id < 0 else gen)
    stats = {"iters": np.asarray(iters), "generated": np.asarray(produced)}
    return outs, stats
