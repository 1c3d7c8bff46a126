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
    greedy_tokens,
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



def _commit_window(tokens_in_len, state, L, chunk_budget, chunk_iters):
    """Compact readback window: the tokens a chunk committed all lie in
    [cur_len_at_entry, cur_len_at_entry + W) with a STATIC bound W, so the
    host reads a [B, W] slice instead of the full [B, cap] buffer (264-528 KB
    per chunk over a ~40 us/KB tunnel).  Returns (window [B, W], start [B])."""
    cap = state.tokens.shape[1]
    if chunk_iters > 0:
        W = chunk_iters * (L - 1) + 1
    else:
        W = chunk_budget + L
    W = min(W, cap)
    start = jnp.minimum(tokens_in_len, jnp.int32(cap - W))
    window = jax.vmap(
        lambda row, st: lax.dynamic_slice(row, (st,), (W,))
    )(state.tokens, start)
    return window, start


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


def _jacobi_cond(chunk_budget, max_iters, state: JacobiState, len_limit, capacity):
    # max_iters: per-seq LIFETIME iteration budgets [B] (dynamic — must match
    # the scheduler's per-request retirement bound or a stalled row livelocks)
    # chunk_budget None = iteration-budget chunking: rows are not token-capped
    # within the chunk (the while cond bounds device TRIPS instead), so no row
    # idles waiting for slower rows to consume a token budget.
    # len_limit is ABSOLUTE (prompt_len + max_tokens), not remaining-from-now:
    # every non-chunk-relative input is then invariant across chunk calls, so
    # the engine can redispatch a chunk from carried device state without a
    # host round trip (the speculative-dispatch fast path in llm_engine).
    L = state.draft.shape[1]
    can_fit = (state.cur_len - 1 + L) <= capacity
    under_limit = state.cur_len < len_limit
    if chunk_budget is not None:
        under_limit &= state.generated < chunk_budget
    active = (
        (~state.eos)
        & under_limit
        & (state.iters < max_iters)
        & can_fit
        & (state.cur_len + L < state.tokens.shape[1])
    )
    return active


@partial(
    jax.jit,
    static_argnames=("cfg", "chunk_budget", "chunk_iters"),
    # kv is donated (in-place paged-cache update); tokens is NOT: the engine's
    # speculative host pipeline dispatches chunk k+1 from chunk k's output
    # handles BEFORE reading chunk k back, so the outputs must stay alive
    # across the next dispatch (donating tokens would delete the buffer).
    donate_argnames=("kv",),
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
    len_limit: jax.Array,  # [B] absolute token-count limit (prompt + max_tokens)
    key: jax.Array,
    eos_token_id: int | jax.Array,
    max_iters: jax.Array,  # [B] per-request lifetime iteration budgets
    *,
    chunk_budget: int,
    chunk_iters: int = 0,
) -> Dict[str, jax.Array]:
    """Run greedy Jacobi iterations on-device until every row is done/stalled.

    One call == what the reference calls `generate_chunk_batch`
    (jacobi_decoding.py:447-724) bounded additionally by `chunk_budget` so the
    host scheduler can admit/retire between segments.

    chunk_iters > 0 switches to ITERATION-budget chunking: the loop runs a
    fixed number of device trips and every unfinished row participates in
    every trip (the per-row token budget is dropped; max_new/capacity still
    bound each row).  Token-budget chunking makes fast rows idle once they
    hit the budget while slow rows grind on — measured batch occupancy 0.45
    at B=8 with TPF-variance ~2-4; trip-budget chunking removes that idle
    entirely, trading it for variable tokens-per-chunk at the host boundary.
    """
    B, L = draft.shape
    eos_token_id = jnp.asarray(eos_token_id, jnp.int32)
    budget = None if chunk_iters > 0 else chunk_budget
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
        go = jnp.any(_jacobi_cond(budget, max_iters, state, len_limit, capacity))
        if chunk_iters > 0:
            # all active rows step together, so the max lifetime-iteration
            # delta counts this chunk's device trips
            go &= jnp.max(state.iters - iters) < chunk_iters
        return go

    def body(state: JacobiState) -> JacobiState:
        active = _jacobi_cond(budget, max_iters, state, len_limit, capacity)
        positions = (state.cur_len - 1)[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
        cache_lens = state.cur_len - 1 + L

        h, kv = forward(
            params, cfg, state.draft, positions, state.kv, block_tables,
            cache_lens=cache_lens, rope=rope, write_mask=active[:, None].repeat(L, 1),
        )
        # chunked argmax: greedy decode never materializes [B, L, V] logits
        greedy_full = greedy_tokens(params, cfg, h)  # [B, L]

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
    window, win_start = _commit_window(cur_len, state, L, chunk_budget, chunk_iters)
    return {
        "kv": state.kv,
        "tokens": state.tokens,
        "cur_len": state.cur_len,
        "draft": state.draft,
        "eos": state.eos,
        "generated": state.generated,
        "iters": state.iters,
        "new_tokens": window,
        "win_start": win_start,
    }


# ---------------------------------------------------------------------------
# Jacobi non-greedy (rejection-sampling) decode chunk
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("cfg", "chunk_budget", "chunk_iters", "top_k", "use_top_p"),
    donate_argnames=("kv",),  # tokens not donated: see jacobi_chunk_greedy
)
def jacobi_chunk_nongreedy(
    params: Dict[str, Any],
    cfg: ModelConfig,
    rope,
    kv: KVCache,
    tokens: jax.Array,  # [B, cap_tokens]
    cur_len: jax.Array,  # [B]
    draft: jax.Array,  # [B, L]
    eos: jax.Array,  # [B] bool
    iters: jax.Array,  # [B]
    block_tables: jax.Array,
    capacity: jax.Array,
    len_limit: jax.Array,  # [B] absolute token-count limit
    temperature: jax.Array,  # [B] > 0
    top_p: jax.Array,  # [B] (ignored unless use_top_p)
    key: jax.Array,
    eos_token_id: int | jax.Array,
    max_iters: jax.Array,  # [B] per-request lifetime iteration budgets
    *,
    chunk_budget: int,
    chunk_iters: int = 0,
    top_k: int = -1,
    use_top_p: bool = False,
) -> Dict[str, jax.Array]:
    """Device-resident Jacobi decoding with speculative-decoding-style
    stochastic verification under a delta proposal.

    Reference: JacobiDecoderNonGreedy._verify_block_rejection_sampling
    (jacobi_decoding_nongreedy.py:299-354):
      * accept drafted token x_t with probability p_t(x_t) (delta proposal);
      * at the first rejection sample a bonus token from p_t conditioned on
        != x_t (the delta-proposal residual), then stop the block;
      * >= 1 token is committed per iteration;
      * the next draft is the GREEDY continuation from the commit point
        (jacobi_decoding_nongreedy.py:444-467), random-padded.

    chunk_iters > 0 switches to ITERATION-budget chunking, same semantics as
    jacobi_chunk_greedy: a fixed number of device trips with every unfinished
    row participating (no per-row token budget inside the chunk) — the
    occupancy fix the greedy path got in round 3 applies identically here.
    """
    B, L = draft.shape
    eos_token_id = jnp.asarray(eos_token_id, jnp.int32)
    budget = None if chunk_iters > 0 else chunk_budget
    state = JacobiState(
        kv=kv, tokens=tokens, cur_len=cur_len, draft=draft, eos=eos,
        generated=jnp.zeros((B,), jnp.int32), iters=iters, key=key,
    )

    def cond(state: JacobiState):
        go = jnp.any(_jacobi_cond(budget, max_iters, state, len_limit, capacity))
        if chunk_iters > 0:
            go &= jnp.max(state.iters - iters) < chunk_iters
        return go

    def body(state: JacobiState) -> JacobiState:
        from jacobiforcing_tpu.ops.sampling import target_probs

        active = _jacobi_cond(budget, max_iters, state, len_limit, capacity)
        positions = (state.cur_len - 1)[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
        cache_lens = state.cur_len - 1 + L

        h, kv = forward(
            params, cfg, state.draft, positions, state.kv, block_tables,
            cache_lens=cache_lens, rope=rope, write_mask=active[:, None].repeat(L, 1),
        )
        key, k_u, k_bonus, k_pad = jax.random.split(state.key, 4)
        spec = state.draft[:, 1:]  # [B, L-1] proposed tokens

        # ---- stochastic verify ----
        if top_k <= 0 and not use_top_p:
            # memory-light path: acceptance only needs p(drafted token) —
            # chunked logsumexp, no [B, L, V] logits/probs materialization
            from jacobiforcing_tpu.models.qwen import chunked_token_logprob

            p_x = jnp.exp(
                chunked_token_logprob(
                    params, cfg, h[:, : L - 1, :], spec, temperature[:, None]
                )
            )
            greedy_full = greedy_tokens(params, cfg, h)
        else:
            logits = logits_at(params, cfg, h)  # [B, L, V] fp32
            greedy_full = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            probs = target_probs(
                logits[:, : L - 1, :], temperature[:, None],
                top_k=top_k, top_p=top_p[:, None] if use_top_p else None,
            )  # [B, L-1, V]
            p_x = jnp.take_along_axis(probs, spec[..., None], axis=-1)[..., 0]

        u = jax.random.uniform(k_u, (B, L - 1))
        accept = u < p_x
        n_acc = jnp.sum(
            jnp.cumprod(accept.astype(jnp.int32), axis=-1), axis=-1
        ).astype(jnp.int32)
        rejected = n_acc < (L - 1)

        # bonus ~ p_t(. | != proposed) at the rejection position
        t_rej = jnp.minimum(n_acc, L - 2)
        proposed_rej = jnp.take_along_axis(spec, t_rej[:, None], axis=1)[:, 0]
        if top_k <= 0 and not use_top_p:
            # full distribution needed only at ONE position per row
            h_rej = jnp.take_along_axis(h, t_rej[:, None, None], axis=1)[:, 0]
            logp = logits_at(params, cfg, h_rej) / jnp.maximum(
                temperature, 1e-6
            )[:, None]
        else:
            probs_rej = jnp.take_along_axis(
                probs, t_rej[:, None, None], axis=1
            )[:, 0, :]  # [B, V]
            logp = jnp.log(jnp.maximum(probs_rej, 1e-30))
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(k_bonus, logp.shape) + 1e-10) + 1e-10)
        z = logp + gumbel
        z = z.at[jnp.arange(B), proposed_rej].set(-jnp.inf)
        bonus = jnp.argmax(z, axis=-1).astype(jnp.int32)

        j = jnp.arange(L - 1, dtype=jnp.int32)[None, :]
        commit = jnp.where(
            (j == n_acc[:, None]) & rejected[:, None], bonus[:, None], spec
        )
        count = n_acc + rejected.astype(jnp.int32)  # >= 1

        # ---- EOS cap over committed tokens ----
        is_eos = (commit == eos_token_id) & (eos_token_id >= 0)
        eos_in = is_eos & (j < count[:, None])
        any_eos = jnp.any(eos_in, axis=-1)
        first_eos = jnp.argmax(eos_in, axis=-1).astype(jnp.int32)
        count = jnp.where(any_eos, first_eos + 1, count)
        new_eos = state.eos | (active & any_eos)

        # ---- commit ----
        tok_idx = state.cur_len[:, None] + j
        valid = (j < count[:, None]) & active[:, None]
        tok_idx = jnp.where(valid, tok_idx, state.tokens.shape[1])
        tokens = state.tokens.at[jnp.arange(B)[:, None], tok_idx].set(commit, mode="drop")

        count = jnp.where(active, count, 0)
        cur_len = state.cur_len + count
        generated = state.generated + count
        new_iters = state.iters + active.astype(jnp.int32)

        # ---- next draft: greedy continuation from acc_len-1 = count ----
        seed = tokens[jnp.arange(B), jnp.maximum(cur_len - 1, 0)]
        src = count[:, None] + j
        in_range = src < L
        cont = jnp.take_along_axis(greedy_full, jnp.clip(src, 0, L - 1), axis=1)
        rand = jax.random.randint(k_pad, (B, L - 1), 0, cfg.vocab_size, jnp.int32)
        new_spec = jnp.where(in_range, cont, rand)
        new_draft = jnp.concatenate([seed[:, None], new_spec], axis=1)
        new_draft = jnp.where(active[:, None], new_draft, state.draft)

        return JacobiState(
            kv=kv, tokens=tokens, cur_len=cur_len, draft=new_draft, eos=new_eos,
            generated=generated, iters=new_iters, key=key,
        )

    state = lax.while_loop(cond, body, state)
    window, win_start = _commit_window(cur_len, state, L, chunk_budget, chunk_iters)
    return {
        "kv": state.kv,
        "tokens": state.tokens,
        "cur_len": state.cur_len,
        "draft": state.draft,
        "eos": state.eos,
        "generated": state.generated,
        "iters": state.iters,
        "new_tokens": window,
        "win_start": win_start,
    }


# ---------------------------------------------------------------------------
# On-policy rollout: one n-token block with full trajectory recording
# ---------------------------------------------------------------------------


class OnPolicyState(NamedTuple):
    kv: KVCache
    tokens: jax.Array  # [B, cap]
    cur_len: jax.Array  # [B]
    block_tokens: jax.Array  # [B, L] current block vector (committed + draft + pad)
    accepted: jax.Array  # [B] committed count within the block
    stopped: jax.Array  # [B] bool: stop token committed
    traj: jax.Array  # [B, L+1, L] snapshots (0 = init, i = after iteration i)
    it: jax.Array  # [B] iterations used in this block
    fwds: jax.Array  # [B]
    key: jax.Array


@partial(
    jax.jit,
    static_argnames=("cfg", "top_k", "use_top_p", "greedy_mode", "accept_threshold"),
    donate_argnames=("kv", "tokens"),
)
def jacobi_onpolicy_block(
    params: Dict[str, Any],
    cfg: ModelConfig,
    rope,
    kv: KVCache,
    tokens: jax.Array,  # [B, cap]
    cur_len: jax.Array,  # [B]
    block_init: jax.Array,  # [B, L] initial draft (prompt-sampled) + pads
    gen_len: jax.Array,  # [B] = min(L, remaining token budget)
    active_in: jax.Array,  # [B] bool: row participates
    block_tables: jax.Array,
    capacity: jax.Array,
    temperature: jax.Array,  # [B] > 0
    top_p: jax.Array,
    key: jax.Array,
    stop_tokens: jax.Array,  # [n_stop] int32 (pad with -1)
    pad_token_id: int | jax.Array,
    *,
    top_k: int = -1,
    use_top_p: bool = False,
    greedy_mode: bool = False,
    accept_threshold: float = 0.0,
) -> Dict[str, jax.Array]:
    """Run ONE Jacobi block to completion, recording every intermediate block
    state — the on-policy trajectory collector.

    With greedy_mode=True this is instead the GREEDY trajectory collector of
    the reference data pipeline (get_jacobi_forward_trajectory_greedy,
    generate_trajectory/generation/qwen2_modeling_jacobi_forcing_greedy.py:276-462):
    exact-match acceptance, AR fallback committing argmax[0] on zero
    acceptance, and greedy-continuation tail refresh — every intermediate
    block state (accepted prefix + refreshed tail) recorded per iteration.

    Reference: JacobiDecoderNonGreedyOnPolicy._run_one_block
    (jacobi_decoding_nongreedy_on_policy.py:330-492):
      * block vector of fixed length L; only gen_len positions generate, the
        tail is pad;
      * per iteration: forward [seed + undecided suffix], RS-verify (accept
        w.p. p(x), bonus from p(.|!=x) at first rejection), commit >= 1;
      * next drafts for undecided positions are SAMPLED from the current probs
        (on_policy.py:465-478), overflow positions random;
      * a committed stop token caps the block and pads its tail;
      * trajectory records the block vector after every iteration (init first).
    """
    B, L = block_init.shape
    pad_token_id = jnp.asarray(pad_token_id, jnp.int32)
    jT = jnp.arange(L, dtype=jnp.int32)[None, :]

    traj0 = jnp.zeros((B, L + 1, L), jnp.int32).at[:, 0, :].set(block_init)
    state = OnPolicyState(
        kv=kv, tokens=tokens, cur_len=cur_len, block_tokens=block_init,
        accepted=jnp.zeros((B,), jnp.int32), stopped=~active_in, traj=traj0,
        it=jnp.zeros((B,), jnp.int32), fwds=jnp.zeros((B,), jnp.int32), key=key,
    )

    def row_active(state: OnPolicyState):
        can_fit = (state.cur_len + L) <= capacity
        return (
            (~state.stopped)
            & (state.accepted < gen_len)
            & can_fit
            & (state.cur_len + L < state.tokens.shape[1])
        )

    def cond(state: OnPolicyState):
        return jnp.any(row_active(state))

    def body(state: OnPolicyState) -> OnPolicyState:
        from jacobiforcing_tpu.ops.sampling import target_probs

        active = row_active(state)
        remaining = jnp.clip(gen_len - state.accepted, 1, L)  # [B]
        seed = state.tokens[jnp.arange(B), jnp.maximum(state.cur_len - 1, 0)]
        src = state.accepted[:, None] + jT
        proposed = jnp.take_along_axis(
            state.block_tokens, jnp.clip(src, 0, L - 1), axis=1
        )  # [B, L]
        draft = jnp.concatenate([seed[:, None], proposed], axis=1)  # [B, L+1]

        positions = (state.cur_len - 1)[:, None] + jnp.arange(L + 1, dtype=jnp.int32)[None, :]
        write_mask = (jnp.arange(L + 1, dtype=jnp.int32)[None, :] <= remaining[:, None]) & active[:, None]
        cache_lens = state.cur_len + remaining

        h, kv = forward(
            params, cfg, draft, positions, state.kv, block_tables,
            cache_lens=cache_lens, rope=rope, write_mask=write_mask,
        )
        logits = logits_at(params, cfg, h[:, :L, :])  # [B, L, V]

        key, k_u, k_bonus, k_samp, k_pad = jax.random.split(state.key, 5)
        greedy_full = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, L]
        if greedy_mode:
            accept = (proposed == greedy_full) & (jT < remaining[:, None])
            n_acc = jnp.sum(
                jnp.cumprod(accept.astype(jnp.int32), axis=-1), axis=-1
            ).astype(jnp.int32)
            # AR fallback: zero acceptance commits argmax[0]
            # (qwen2_modeling_jacobi_forcing_greedy.py AR fallback semantics)
            fallback = n_acc == 0
            commit = jnp.where(
                (jT == 0) & fallback[:, None], greedy_full[:, :1], proposed
            )
            count = jnp.maximum(n_acc, 1)
            samp = greedy_full  # tail refresh = greedy continuation
        else:
            probs = target_probs(
                logits, temperature[:, None],
                top_k=top_k, top_p=top_p[:, None] if use_top_p else None,
            )  # [B, L, V]
            p_x = jnp.take_along_axis(probs, proposed[..., None], axis=-1)[..., 0]
            if accept_threshold > 0.0:
                # deterministic probability-threshold acceptance (reference
                # nongreedy collector, ..._nongreedy_blk32.py:281-338): keep
                # the prefix with p(x) >= threshold; on zero acceptance sample
                # ONE token from the full p (no exclusion), no bonus otherwise
                accept = (p_x >= accept_threshold) & (jT < remaining[:, None])
            else:
                u = jax.random.uniform(k_u, (B, L))
                accept = (u < p_x) & (jT < remaining[:, None])
            n_acc = jnp.sum(
                jnp.cumprod(accept.astype(jnp.int32), axis=-1), axis=-1
            ).astype(jnp.int32)
            rejected = n_acc < remaining

            t_rej = jnp.minimum(n_acc, remaining - 1)
            probs_rej = jnp.take_along_axis(probs, t_rej[:, None, None], axis=1)[:, 0, :]
            proposed_rej = jnp.take_along_axis(proposed, t_rej[:, None], axis=1)[:, 0]
            logp = jnp.log(jnp.maximum(probs_rej, 1e-30))
            gumbel = -jnp.log(-jnp.log(jax.random.uniform(k_bonus, logp.shape) + 1e-10) + 1e-10)
            z = logp + gumbel
            if accept_threshold <= 0.0:
                # RS residual excludes the rejected proposal
                z = z.at[jnp.arange(B), proposed_rej].set(-jnp.inf)
            bonus = jnp.argmax(z, axis=-1).astype(jnp.int32)

            if accept_threshold > 0.0:
                fallback = (n_acc == 0) & (remaining > 0)
                commit = jnp.where((jT == 0) & fallback[:, None], bonus[:, None], proposed)
                count = jnp.maximum(n_acc, 1)
            else:
                commit = jnp.where((jT == n_acc[:, None]) & rejected[:, None], bonus[:, None], proposed)
                count = n_acc + rejected.astype(jnp.int32)  # >= 1

        # stop-token cap (multi-stop set, on_policy.py stop handling)
        is_stop = jnp.any(
            commit[:, :, None] == stop_tokens[None, None, :], axis=-1
        ) & (stop_tokens.max() >= 0)
        stop_in = is_stop & (jT < count[:, None])
        any_stop = jnp.any(stop_in, axis=-1)
        first_stop = jnp.argmax(stop_in, axis=-1).astype(jnp.int32)
        count = jnp.where(any_stop, first_stop + 1, count)
        stopped = state.stopped | (active & any_stop)

        # commit into the running sequence
        tok_idx = state.cur_len[:, None] + jT
        valid = (jT < count[:, None]) & active[:, None]
        tok_idx = jnp.where(valid, tok_idx, state.tokens.shape[1])
        tokens = state.tokens.at[jnp.arange(B)[:, None], tok_idx].set(commit, mode="drop")
        count = jnp.where(active, count, 0)
        cur_len = state.cur_len + count

        # commit into the block vector at [accepted, accepted+count)
        blk_idx = state.accepted[:, None] + jT
        blk_idx = jnp.where(valid, blk_idx, L)
        bt1 = state.block_tokens.at[jnp.arange(B)[:, None], blk_idx].set(commit, mode="drop")
        accepted = jnp.minimum(gen_len, state.accepted + count)

        if not greedy_mode:
            # sampled next drafts for undecided positions (on_policy.py:465-478)
            gs = -jnp.log(-jnp.log(jax.random.uniform(k_samp, probs.shape) + 1e-10) + 1e-10)
            samp = jnp.argmax(jnp.log(jnp.maximum(probs, 1e-30)) + gs, axis=-1).astype(jnp.int32)
        rand = jax.random.randint(k_pad, (B, L), 0, cfg.vocab_size, jnp.int32)
        # block position q >= accepted: local sample index = count + (q - accepted)
        sample_idx = count[:, None] + (jT - accepted[:, None])
        in_logits = (sample_idx >= 0) & (sample_idx < remaining[:, None])
        samp_at = jnp.take_along_axis(samp, jnp.clip(sample_idx, 0, L - 1), axis=1)
        draft_val = jnp.where(in_logits, samp_at, rand)

        new_bt = jnp.where(
            jT < accepted[:, None],
            bt1,
            jnp.where(
                stopped[:, None] | (jT >= gen_len[:, None]), pad_token_id, draft_val
            ),
        )
        new_bt = jnp.where(active[:, None], new_bt, state.block_tokens)

        it = state.it + active.astype(jnp.int32)
        fwds = state.fwds + active.astype(jnp.int32)
        snap_idx = jnp.where(active, it, L + 1)  # OOB -> drop for inactive
        traj = state.traj.at[jnp.arange(B), snap_idx, :].set(new_bt, mode="drop")

        return OnPolicyState(
            kv=kv, tokens=tokens, cur_len=cur_len, block_tokens=new_bt,
            accepted=accepted, stopped=stopped, traj=traj, it=it, fwds=fwds, key=key,
        )

    state = lax.while_loop(cond, body, state)
    return {
        "kv": state.kv,
        "tokens": state.tokens,
        "cur_len": state.cur_len,
        "block_tokens": state.block_tokens,
        "accepted": state.accepted,
        "stopped": state.stopped,
        "traj": state.traj,
        "iters": state.it,
        "fwds": state.fwds,
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
