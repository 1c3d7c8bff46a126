"""Standalone single-sequence Jacobi decoding API.

Functional equivalent of the reference's HF-monkeypatch layer (modeling/):
  * `jacobi_generate_greedy`  <-> `jacobi_forward_greedy` driven in a loop
    (modeling/cllm2_qwen2_modeling_kv_terminate_on_eos_improved.py:34-276 +
    the per-prompt driver loop of jacobi_forcing_inference_humaneval.py:102-186);
  * `jacobi_generate_multiblock` <-> `jacobi_forward_greedy_multiblock`
    (modeling/..._multiblock_lookahead_unified.py:140-740).

Where the reference monkeypatches methods onto a HF model and manages a
DynamicCache across calls, here each call owns a private paged KV cache and
runs the device-resident decode loops directly — no engine/scheduler needed.
Returns (token_ids, stats) like the reference drivers' per-example records.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from jacobiforcing_tpu.engine import runner
from jacobiforcing_tpu.engine.multiblock import jacobi_chunk_multiblock
from jacobiforcing_tpu.models.qwen import ModelConfig, rope_table
from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache


def _setup(cfg, params, prompt, max_new, L, page_size, kv_dtype):
    rope = rope_table(cfg)
    cap = len(prompt) + max_new + 2 * L + 1
    n_pages = (cap + page_size - 1) // page_size
    kv = alloc_kv_cache(
        cfg.num_layers, n_pages, page_size, cfg.num_kv_heads, cfg.head_dim,
        kv_dtype or cfg.dtype,
    )
    bt = jnp.asarray(np.arange(n_pages, dtype=np.int32)[None, :])
    return rope, kv, bt, n_pages * page_size, cap


def jacobi_generate_greedy(
    params: Dict[str, Any],
    cfg: ModelConfig,
    prompt_ids: List[int],
    *,
    n_token_seq_len: int = 64,
    max_new_tokens: int = 512,
    eos_token_id: int = -1,
    max_iterations: int = 1024,
    page_size: int = 256,
    kv_dtype=None,
    seed: int = 0,
) -> Tuple[List[int], Dict[str, float]]:
    """Single-block greedy Jacobi generation for one prompt."""
    L = n_token_seq_len
    rope, kv, bt, capacity, cap = _setup(
        cfg, params, prompt_ids, max_new_tokens, L, page_size, kv_dtype
    )
    P = len(prompt_ids)
    rng = np.random.RandomState(seed)
    ids = np.zeros((1, P + L), np.int32)
    ids[0, :P] = prompt_ids
    ids[0, P:] = rng.randint(0, cfg.vocab_size, L)
    kv, _, pf = runner.prefill(
        params, cfg, rope, jnp.asarray(ids), jnp.zeros((1,), jnp.int32),
        jnp.asarray([P + L]), jnp.asarray([P]), kv, bt, n_out=L,
    )
    tokens = np.zeros((1, cap), np.int32)
    tokens[0, :P] = prompt_ids
    draft = runner.make_first_draft(
        pf, jnp.asarray([prompt_ids[-1]], jnp.int32), L,
        jax.random.PRNGKey(seed), cfg.vocab_size,
    )
    res = runner.jacobi_chunk_greedy(
        params, cfg, rope, kv, jnp.asarray(tokens), jnp.asarray([P], jnp.int32),
        draft, jnp.zeros((1,), bool), jnp.zeros((1,), jnp.int32), bt,
        jnp.asarray([capacity], jnp.int32),
        jnp.asarray([P + max_new_tokens], jnp.int32),  # absolute len_limit
        jax.random.PRNGKey(seed + 1), eos_token_id,
        jnp.full((1,), max_iterations, jnp.int32),
        chunk_budget=max_new_tokens,
    )
    out = np.asarray(res["tokens"])[0, P : int(res["cur_len"][0])].tolist()
    iters = int(res["iters"][0])
    stats = {
        "iterations": iters,
        "tokens_per_forward": len(out) / max(iters, 1),
        "eos": bool(res["eos"][0]),
    }
    return out, stats


def jacobi_generate_multiblock(
    params: Dict[str, Any],
    cfg: ModelConfig,
    prompt_ids: List[int],
    *,
    n_token_seq_len: int = 64,
    K: int = 2,
    r: float = 0.85,
    lookahead_start_ratio: float = 0.0,
    n_gram_pool_size: int = 4,
    max_new_tokens: int = 512,
    eos_token_id: int = -1,
    pad_token_id: int = 0,
    max_iterations: int = 1024,
    page_size: int = 256,
    kv_dtype=None,
    seed: int = 0,
) -> Tuple[List[int], Dict[str, float]]:
    """Multiblock + rejection-recycling generation for one prompt."""
    N = n_token_seq_len
    C = max(1, n_gram_pool_size)
    W = 2 * N
    rope, kv, bt, capacity, cap = _setup(
        cfg, params, prompt_ids, max_new_tokens, N * max(K, 1), page_size, kv_dtype
    )
    P = len(prompt_ids)
    rng = np.random.RandomState(seed)
    ids = np.zeros((1, P + N), np.int32)
    ids[0, :P] = prompt_ids
    ids[0, P:] = rng.randint(0, cfg.vocab_size, N)
    kv, _, pf = runner.prefill(
        params, cfg, rope, jnp.asarray(ids), jnp.zeros((1,), jnp.int32),
        jnp.asarray([P + N]), jnp.asarray([P]), kv, bt, n_out=N,
    )
    pf = np.asarray(pf)[0]
    tokens = np.zeros((1, cap), np.int32)
    tokens[0, :P] = prompt_ids
    blk_draft = np.zeros((1, K, N), np.int32)
    blk_draft[0, 0] = pf[:N]
    res = jacobi_chunk_multiblock(
        params, cfg, rope, kv, jnp.asarray(tokens),
        jnp.asarray([P], jnp.int32),
        jnp.asarray(blk_draft),
        jnp.asarray([[N] + [0] * (K - 1)], jnp.int32),
        jnp.zeros((1, K), jnp.int32), jnp.zeros((1, K, N), jnp.int32),
        jnp.asarray([[P] + [0] * (K - 1)], jnp.int32),
        jnp.asarray([[True] + [False] * (K - 1)]),
        jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
        jnp.zeros((1, C, W), jnp.int32), jnp.zeros((1, C), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.asarray([pf[0]], jnp.int32),
        jnp.zeros((1,), bool), jnp.zeros((1,), jnp.int32), bt,
        jnp.asarray([capacity], jnp.int32), jnp.asarray([max_new_tokens], jnp.int32),
        eos_token_id, pad_token_id,
        jnp.asarray([int(math.ceil(r * N))], jnp.int32),
        jnp.asarray([int(math.ceil(lookahead_start_ratio * N))], jnp.int32),
        jnp.asarray([max_iterations], jnp.int32),
        N=N, K=K, C=C, W=W, chunk_budget=max_new_tokens,
    )
    out = np.asarray(res["tokens"])[0, P : int(res["cur_len"][0])].tolist()
    iters = int(res["iters"][0])
    stats = {
        "iterations": iters,
        "tokens_per_forward": len(out) / max(iters, 1),
        "eos": bool(res["eos"][0]),
    }
    return out, stats
