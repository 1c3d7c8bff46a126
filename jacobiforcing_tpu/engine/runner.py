"""Device-side decode programs: prefill, AR decode, and the Jacobi fixed-point loop.

This is the TPU-native replacement for the reference's ModelRunner + JacobiDecoder
pair (inference_engine/engine/model_runner.py:155-1659,
inference_engine/engine/jacobi_decoding.py:47-724).  The key inversion: the
reference runs an unbounded host Python loop that broadcasts one forward per
Jacobi iteration to NCCL workers; here the ENTIRE fixed-point iteration is one
jitted `lax.while_loop` over fixed-shape state — the host only admits/retires
requests between bounded decode segments ("chunks").

CUDA-graph-per-(B, L) capture (model_runner.py:1596-1658) becomes XLA executable
caching keyed by the static argument bucket — jit gives this for free.

Semantics preserved from the reference greedy decoder
(jacobi_decoding.py:253-445):
  * draft[0] is the seed = last committed token, re-forwarded each iteration at
    position S-1 (this also repairs the stale KV slot an AR-fallback commit
    leaves behind);
  * accept length = 1 + number of leading exact matches of draft[1:] vs the
    greedy predictions (jacobi_decoding.py:287-293);
  * EOS inside the accepted prefix caps the commit (jacobi_decoding.py:597-602);
  * zero acceptance commits greedy[0] — the AR fallback guaranteeing >= 1
    token/iteration (jacobi_decoding.py:619-631);
  * next draft = greedy continuation from the first mismatch, random-padded
    (jacobi_decoding.py:673-709);
  * rejected-tail "KV trim" = nothing: validity is the cache_lens counter
    (block_manager.py:534-565 trim_kv_only_fast semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from jacobiforcing_tpu.models.qwen import (
    ModelConfig,
    forward,
    logits_at,
)
from jacobiforcing_tpu.ops.kv_cache import KVCache
from jacobiforcing_tpu.ops.sampling import sample


# ---------------------------------------------------------------------------
# Prefill (with optional Jacobi draft bootstrap)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "n_out"), donate_argnames=("kv",))
def prefill(
    params: Dict[str, Any],
    cfg: ModelConfig,
    rope,
    input_ids: jax.Array,  # [B, T]: [uncached prompt suffix, bootstrap-draft, pad]
    start_pos: jax.Array,  # [B] absolute position of input_ids[:, 0]
    total_lens: jax.Array,  # [B] absolute length incl. draft (= prompt+L or prompt)
    prompt_lens: jax.Array,  # [B] absolute prompt length
    kv: KVCache,
    block_tables: jax.Array,  # [B, P]
    *,
    n_out: int = 1,
) -> Tuple[KVCache, jax.Array, jax.Array]:
    """Forward padded prompt suffixes (plus an appended random draft) once.

    Re-designs the reference's `_jacobi_prefill_with_drafting`
    (model_runner.py:777-963): the random draft is forwarded with the prompt in
    the same pass; greedy predictions at the `n_out` positions starting at
    prompt_len-1 become the bootstrap draft; the draft's KV needs no trim — the
    caller simply records cache length = prompt_len and the first Jacobi
    iteration overwrites those slots.  `start_pos > 0` supports prefix-cache
    hits (reference block_manager.py:135-168): only the uncached suffix is
    forwarded against the shared cached pages.

    Returns (kv, last_prompt_logits [B, V] fp32, prefill_draft [B, n_out]).
    `last_prompt_logits` is the prediction at the final prompt token (used for
    AR sampling); `prefill_draft[:, 0]` equals its argmax.
    """
    B, T = input_ids.shape
    positions = start_pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    write_mask = positions < total_lens[:, None]
    positions = jnp.minimum(positions, cfg.max_position - 1)
    h, kv = forward(
        params, cfg, input_ids, positions, kv, block_tables,
        cache_lens=total_lens, rope=rope, write_mask=write_mask,
    )
    # Gather hidden at absolute positions prompt_len-1 .. prompt_len+n_out-2
    # (each predicts the NEXT position: the true next token, then the draft).
    gather_abs = prompt_lens[:, None] - 1 + jnp.arange(n_out, dtype=jnp.int32)[None, :]
    gather_rel = jnp.clip(gather_abs - start_pos[:, None], 0, T - 1)
    h_sel = jnp.take_along_axis(h, gather_rel[:, :, None], axis=1)  # [B, n_out, H]
    logits = logits_at(params, cfg, h_sel)  # [B, n_out, V] fp32
    draft = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, n_out]
    return kv, logits[:, 0, :], draft


# ---------------------------------------------------------------------------
# AR decode
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("kv",))
def ar_decode_step(
    params: Dict[str, Any],
    cfg: ModelConfig,
    rope,
    kv: KVCache,
    last_tokens: jax.Array,  # [B] the most recently committed token
    seq_lens: jax.Array,  # [B] committed length (last token NOT yet in KV)
    block_tables: jax.Array,
    active: jax.Array,  # [B] bool
    temperature: jax.Array,  # [B] fp32; 0 = greedy
    key: jax.Array,
) -> Tuple[KVCache, jax.Array]:
    """One AR decode step: forward token at position S-1, sample the next.

    Reference: prepare_decode + run_model + Sampler
    (model_runner.py:714-768, 1543-1550; layers/sampler.py:10-24).
    """
    B = last_tokens.shape[0]
    positions = (seq_lens - 1)[:, None]
    h, kv = forward(
        params, cfg, last_tokens[:, None], positions, kv, block_tables,
        cache_lens=seq_lens, rope=rope,
        write_mask=active[:, None],
    )
    logits = logits_at(params, cfg, h[:, 0, :])  # [B, V]
    t = jnp.maximum(temperature, 1e-6)
    shaped = logits / t[:, None]
    next_tokens = sample(shaped, key, temperature)
    return kv, next_tokens


# ---------------------------------------------------------------------------
# Jacobi greedy decode: one device-resident chunk
# ---------------------------------------------------------------------------


class JacobiState(NamedTuple):
    """while_loop carry — all fixed shape."""

    kv: KVCache
    tokens: jax.Array  # [B, cap_tokens] committed tokens
    cur_len: jax.Array  # [B] committed length
    draft: jax.Array  # [B, L]; draft[:,0] = seed
    eos: jax.Array  # [B] bool
    generated: jax.Array  # [B] tokens committed during this chunk
    iters: jax.Array  # [B] Jacobi iterations consumed (lifetime of request)
    key: jax.Array


def _jacobi_cond(chunk_budget, max_iters, state: JacobiState, max_new, capacity):
    L = state.draft.shape[1]
    can_fit = (state.cur_len - 1 + L) <= capacity
    active = (
        (~state.eos)
        & (state.generated < jnp.minimum(chunk_budget, max_new))
        & (state.iters < max_iters)
        & can_fit
        & (state.cur_len + L < state.tokens.shape[1])
    )
    return active


@partial(
    jax.jit,
    static_argnames=("cfg", "chunk_budget", "max_iters"),
    donate_argnames=("kv", "tokens"),
)
def jacobi_chunk_greedy(
    params: Dict[str, Any],
    cfg: ModelConfig,
    rope,
    kv: KVCache,
    tokens: jax.Array,  # [B, cap_tokens]
    cur_len: jax.Array,  # [B]
    draft: jax.Array,  # [B, L]
    eos: jax.Array,  # [B] bool (already finished rows are inert)
    iters: jax.Array,  # [B] iterations consumed so far for each request
    block_tables: jax.Array,  # [B, P]
    capacity: jax.Array,  # [B] = allocated pages * page_size
    max_new: jax.Array,  # [B] remaining token budget for this chunk's requests
    key: jax.Array,
    eos_token_id: int | jax.Array,
    *,
    chunk_budget: int,
    max_iters: int,
) -> Dict[str, jax.Array]:
    """Run greedy Jacobi iterations on-device until every row is done/stalled.

    One call == what the reference calls `generate_chunk_batch`
    (jacobi_decoding.py:447-724) bounded additionally by `chunk_budget` so the
    host scheduler can admit/retire between segments.
    """
    B, L = draft.shape
    eos_token_id = jnp.asarray(eos_token_id, jnp.int32)
    state = JacobiState(
        kv=kv,
        tokens=tokens,
        cur_len=cur_len,
        draft=draft,
        eos=eos,
        generated=jnp.zeros((B,), jnp.int32),
        iters=iters,
        key=key,
    )

    def cond(state: JacobiState):
        return jnp.any(_jacobi_cond(chunk_budget, max_iters, state, max_new, capacity))

    def body(state: JacobiState) -> JacobiState:
        active = _jacobi_cond(chunk_budget, max_iters, state, max_new, capacity)
        positions = (state.cur_len - 1)[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
        cache_lens = state.cur_len - 1 + L

        h, kv = forward(
            params, cfg, state.draft, positions, state.kv, block_tables,
            cache_lens=cache_lens, rope=rope, write_mask=active[:, None].repeat(L, 1),
        )
        logits = logits_at(params, cfg, h)  # [B, L, V] fp32
        greedy_full = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, L]

        # ---- verify (jacobi_decoding.py:253-293) ----
        spec = state.draft[:, 1:]  # [B, L-1]
        mismatch = spec != greedy_full[:, : L - 1]
        nm = jnp.sum(jnp.cumsum(mismatch, axis=-1) == 0, axis=-1)
        acc_len = nm.astype(jnp.int32) + 1  # [B] in 1..L

        # ---- EOS cap inside accepted prefix (jacobi_decoding.py:597-602) ----
        j = jnp.arange(L - 1, dtype=jnp.int32)[None, :]
        is_eos = (spec == eos_token_id) & (eos_token_id >= 0)
        eos_in_acc = is_eos & (j < (acc_len - 1)[:, None])
        any_eos = jnp.any(eos_in_acc, axis=-1)
        first_eos = jnp.argmax(eos_in_acc, axis=-1).astype(jnp.int32)
        acc_len = jnp.where(any_eos, first_eos + 2, acc_len)

        # ---- AR fallback (jacobi_decoding.py:619-631) ----
        fallback = acc_len == 1
        fb_tok = greedy_full[:, 0]
        fb_eos = fallback & (fb_tok == eos_token_id) & (eos_token_id >= 0)
        new_eos = state.eos | (active & (any_eos | fb_eos))

        count = jnp.where(fallback, 1, acc_len - 1)  # tokens committed
        commit = jnp.where(fallback[:, None], fb_tok[:, None], spec)  # [B, L-1]

        # ---- commit into the token buffer ----
        tok_idx = state.cur_len[:, None] + j
        valid = (j < count[:, None]) & active[:, None]
        tok_idx = jnp.where(valid, tok_idx, state.tokens.shape[1])  # OOB -> drop
        tokens = state.tokens.at[jnp.arange(B)[:, None], tok_idx].set(
            commit, mode="drop"
        )

        count = jnp.where(active, count, 0)
        cur_len = state.cur_len + count
        generated = state.generated + count
        new_iters = state.iters + active.astype(jnp.int32)

        # ---- next draft (jacobi_decoding.py:673-709) ----
        key, sub = jax.random.split(state.key)
        seed = tokens[jnp.arange(B), jnp.maximum(cur_len - 1, 0)]
        start = jnp.where(fallback, 1, acc_len - 1)  # [B]
        src = start[:, None] + j  # [B, L-1] indices into greedy_full
        in_range = src < L
        cont = jnp.take_along_axis(greedy_full, jnp.clip(src, 0, L - 1), axis=1)
        rand = jax.random.randint(sub, (B, L - 1), 0, cfg.vocab_size, jnp.int32)
        new_spec = jnp.where(in_range, cont, rand)
        new_draft = jnp.concatenate([seed[:, None], new_spec], axis=1)
        new_draft = jnp.where(active[:, None], new_draft, state.draft)

        return JacobiState(
            kv=kv,
            tokens=tokens,
            cur_len=cur_len,
            draft=new_draft,
            eos=new_eos,
            generated=generated,
            iters=new_iters,
            key=key,
        )

    state = lax.while_loop(cond, body, state)
    return {
        "kv": state.kv,
        "tokens": state.tokens,
        "cur_len": state.cur_len,
        "draft": state.draft,
        "eos": state.eos,
        "generated": state.generated,
        "iters": state.iters,
    }


def make_first_draft(
    prefill_draft: jax.Array,  # [B, >=1] greedy predictions from prefill
    last_tokens: jax.Array,  # [B] last committed (prompt) token
    L: int,
    key: jax.Array,
    vocab_size: int,
) -> jax.Array:
    """Build the first Jacobi draft from the prefill bootstrap
    (reference: jacobi_decoding.py:332-347)."""
    B, n = prefill_draft.shape
    parts = [last_tokens[:, None], prefill_draft[:, : L - 1]]
    have = 1 + min(n, L - 1)
    if have < L:
        rand = jax.random.randint(key, (B, L - have), 0, vocab_size, jnp.int32)
        parts.append(rand)
    return jnp.concatenate(parts, axis=1)
