"""Multiblock Jacobi decoding with rejection recycling (MR) — device-resident,
BATCHED.

TPU re-design of the reference's HF-monkeypatch MR decoder
(modeling/cllm2_qwen2_modeling_kv_terminate_on_eos_improved_multiblock_lookahead_unified.py:140-740).
The reference's host-driven state machine (dynamic-length drafts, KV
batch-expansion for candidates, per-iteration KV trims) becomes one jitted
`lax.while_loop` over fixed-shape state:

  * K block slots in a ring: slot = (draft[N], draft_len, acc, acc_toks[N],
    base_position, active).  RA = oldest active slot; spawn appends at the
    ring tail when the newest block's acceptance crosses ceil(r*N)
    (reference :629-653); on RA completion the next slot is promoted with its
    acceptance RESET and draft rebuilt [last_next | packed[1:]]
    (reference :656-713) — promotion re-verifies, which is what makes pseudo
    conditioning correctness-safe;
  * candidates from the n-gram pool ride the SEQUENCE axis of one forward
    (tree-attention segments) instead of a batch-expanded KV: each of
    1+C alternative segments attends committed KV + itself causally; pseudo
    segments attend committed KV + the RA segment + earlier pseudos + itself
    (`forward_spec` writes nothing; the winning segment's K/V is scattered
    into the paged cache afterwards);
  * the n-gram pool (deque maxlen=pool in the reference, :562-587) is a fixed
    [C, W] ring buffer; per rejected iteration it receives the global
    block-concat and the rejected greedy tail; candidates splice a pool entry
    from the first position matching the next token, padded with the current
    draft (reference _build_candidates :63-91), skipping the newest entry.

BATCHING (beyond the reference, whose engine rejects MR outright and whose HF
path is single-sequence): per-sequence block/pool state carries a leading
batch axis; segment assembly and verification are vmapped; the shared paged
KV cache and token buffers are updated with batched scatters; finished or
stalled rows are gated inert so mixed-progress batches decode together.

Deviations from the reference (documented intentional fixes):
  * pseudo-block verification uses the same aligned greedy[i] -> seg[i+1]
    convention as the RA span (the reference's pseudo spans are off by one via
    the `cursor = 1` offset, :339-344 — benign there because promotion resets
    acceptance, but we keep verification consistent);
  * segments carry their SEMANTIC positions (block base + offset) instead of
    cache-append positions (reference cache_position, :436-440);
  * when RA completes with no pseudo alive, a fresh RA starts in place
    ([last_next | PAD...]) instead of returning to the host per block.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from jacobiforcing_tpu.models.qwen import ModelConfig, forward_spec, greedy_tokens
from jacobiforcing_tpu.ops.kv_cache import KVCache, quantize_rows


class MBState(NamedTuple):
    kv: KVCache
    tokens: jax.Array  # [B, cap]
    cur_len: jax.Array  # [B] committed length
    blk_draft: jax.Array  # [B, K, N]
    blk_dlen: jax.Array  # [B, K]
    blk_acc: jax.Array  # [B, K]
    blk_acc_toks: jax.Array  # [B, K, N]
    blk_base: jax.Array  # [B, K] absolute start position of each block
    blk_active: jax.Array  # [B, K] bool
    ra: jax.Array  # [B] slot index
    n_active: jax.Array  # [B]
    pool: jax.Array  # [B, C, W]
    pool_len: jax.Array  # [B, C]
    pool_next: jax.Array  # [B] ring index
    last_next: jax.Array  # [B] token
    eos: jax.Array  # [B] bool
    iters: jax.Array  # [B]
    generated: jax.Array  # [B]
    tiers: jax.Array  # [3] int32: iterations served by full/no-cand/RA-only


def _compact(tokens: jax.Array, valid: jax.Array):
    """Stable-compact valid tokens to the front (pool global-concat entries —
    the reference strips PADs, :404-406)."""
    n = tokens.shape[0]
    key = jnp.where(valid, jnp.arange(n), n + jnp.arange(n))
    order = jnp.argsort(key)
    return jnp.take(tokens, order), jnp.sum(valid.astype(jnp.int32)).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("cfg", "N", "K", "C", "W", "chunk_budget", "chunk_iters"),
    donate_argnames=("kv", "tokens"),
)
def jacobi_chunk_multiblock(
    params: Dict[str, Any],
    cfg: ModelConfig,
    rope,
    kv: KVCache,
    tokens: jax.Array,  # [B, cap]
    cur_len: jax.Array,  # [B]
    blk_draft: jax.Array,  # [B, K, N]
    blk_dlen: jax.Array,
    blk_acc: jax.Array,
    blk_acc_toks: jax.Array,
    blk_base: jax.Array,
    blk_active: jax.Array,
    ra: jax.Array,
    n_active: jax.Array,
    pool: jax.Array,  # [B, C, W]
    pool_len: jax.Array,
    pool_next: jax.Array,
    last_next: jax.Array,
    eos_in: jax.Array,  # [B] bool
    iters: jax.Array,  # [B]
    block_tables: jax.Array,  # [B, P_pages]
    capacity: jax.Array,  # [B]
    max_new: jax.Array,  # [B]
    eos_token_id,
    pad_token_id,
    spawn_threshold,  # [B] int: ceil(r * N)
    lookahead_start,  # [B] int: ceil(lookahead_start_ratio * N)
    max_iters,  # [B] per-request lifetime iteration budgets
    *,
    N: int,
    K: int,
    C: int,  # candidate slots (= n-gram pool size)
    W: int,  # pool entry width
    chunk_budget: int,
    chunk_iters: int = 0,
) -> Dict[str, jax.Array]:
    B = cur_len.shape[0]
    S = 1 + C + (K - 1)  # segments: RA, C candidates, K-1 pseudos
    T = S * N
    jN = jnp.arange(N, dtype=jnp.int32)
    eos_token_id = jnp.asarray(eos_token_id, jnp.int32)
    pad_token_id = jnp.asarray(pad_token_id, jnp.int32)

    state = MBState(
        kv=kv, tokens=tokens, cur_len=cur_len, blk_draft=blk_draft,
        blk_dlen=blk_dlen, blk_acc=blk_acc, blk_acc_toks=blk_acc_toks,
        blk_base=blk_base, blk_active=blk_active, ra=ra, n_active=n_active,
        pool=pool, pool_len=pool_len, pool_next=pool_next,
        last_next=last_next, eos=eos_in, iters=iters,
        generated=jnp.zeros((B,), jnp.int32),
        tiers=jnp.zeros((3,), jnp.int32),
    )

    # intra-segment visibility is sequence-independent: same-seg causal;
    # pseudos see the RA segment + earlier pseudos fully
    seg_of = jnp.repeat(jnp.arange(S, dtype=jnp.int32), N)
    idx_in = jnp.tile(jN, S)
    qs, ks = seg_of[:, None], seg_of[None, :]
    qi, ki = idx_in[:, None], idx_in[None, :]
    sees = ((qs == ks) & (ki <= qi)) | (
        (qs > C) & ((ks == 0) | ((ks > C) & (ks < qs)))
    )  # [T, T]

    # chunk_iters > 0: ITERATION-budget chunking — fixed device-trip count,
    # no per-row token budget (same occupancy semantics as the greedy and
    # nongreedy chunk programs; MR's TPF variance across rows is even larger,
    # so token-budget chunks idle fast rows harder here).
    budget = max_new if chunk_iters > 0 else jnp.minimum(chunk_budget, max_new)

    def alive_fn(st: MBState) -> jax.Array:
        return (
            (~st.eos)
            & (st.iters < max_iters)
            & (st.generated < budget)
            & (st.cur_len + N <= capacity)
            & (st.cur_len + N < st.tokens.shape[1])
        )

    def cond(st: MBState):
        go = jnp.any(alive_fn(st))
        if chunk_iters > 0:
            go &= jnp.max(st.iters - iters) < chunk_iters
        return go

    # ---------------- per-sequence segment assembly ----------------
    def assemble_seq(blk_draft, blk_dlen, blk_acc, blk_acc_toks, blk_base,
                     blk_active, ra_i, n_act, pool, pool_len, pool_next,
                     la_start):
        ra_draft = blk_draft[ra_i]
        ra_dlen = blk_dlen[ra_i]
        nxt0 = ra_draft[0]
        newest_pool = (pool_next - 1) % C

        def build_cand(p):
            entry = pool[p]
            elen = pool_len[p]
            hit = (entry == nxt0) & (jnp.arange(W) < elen)
            has = jnp.any(hit)
            pos = jnp.argmax(hit).astype(jnp.int32)
            src = pos + jN
            in_entry = src < elen
            vals = jnp.take(entry, jnp.clip(src, 0, W - 1))
            cand = jnp.where(in_entry, vals, ra_draft)  # pad with current draft
            valid = (
                has
                & (p != newest_pool)
                & (elen > 0)
                & (blk_acc[ra_i] >= la_start)
                & (ra_dlen > 1)
            )
            return cand, valid

        cands, cand_valid = jax.vmap(build_cand)(jnp.arange(C))

        def build_pseudo(o):
            b = (ra_i + o) % K
            a = blk_acc[b]
            tok = jnp.where(jN < a, blk_acc_toks[b], blk_draft[b][jnp.clip(jN - a, 0, N - 1)])
            vlen = jnp.minimum(a + blk_dlen[b], N)
            active = blk_active[b] & (o < n_act)
            return tok, vlen, blk_base[b], active

        ps_tok, ps_vlen, ps_base, ps_active = jax.vmap(build_pseudo)(
            jnp.arange(1, K, dtype=jnp.int32)
        )

        seg_tokens = jnp.concatenate([ra_draft[None], cands, ps_tok], axis=0)
        seg_vlen = jnp.concatenate([ra_dlen[None], jnp.full((C,), ra_dlen), ps_vlen])
        seg_active = jnp.concatenate([jnp.ones((1,), bool), cand_valid, ps_active])
        ra_start = blk_base[ra_i] + blk_acc[ra_i]
        seg_start = jnp.concatenate([ra_start[None], jnp.full((C,), ra_start), ps_base])
        seg_pos = seg_start[:, None] + jN[None, :]
        tok_valid = (jN[None, :] < seg_vlen[:, None]) & seg_active[:, None]
        return seg_tokens, seg_vlen, seg_active, seg_pos, tok_valid

    # ---------------- per-sequence verify + state update ----------------
    def update_seq(seg_tokens, seg_vlen, seg_active, greedy, blk_draft,
                   blk_dlen, blk_acc, blk_acc_toks, blk_base, blk_active,
                   ra_i, n_act, pool, pool_len, pool_next, spawn_thr):
        def seg_acc(tok, g, vlen, shift):
            t_tok = jnp.take(tok, jnp.clip(shift + jN, 0, N - 1))
            t_g = jnp.take(g, jnp.clip(shift + jN, 0, N - 1))
            tlen = vlen - shift
            mis = (t_tok[1:] != t_g[:-1]) | (jN[1:] >= tlen)
            acc = 1 + jnp.sum(jnp.cumsum(mis) == 0).astype(jnp.int32)
            return jnp.clip(acc, 0, jnp.maximum(tlen, 0)), t_tok, t_g, tlen

        shifts = jnp.concatenate([
            jnp.zeros((1 + C,), jnp.int32),
            jax.vmap(lambda o: blk_acc[(ra_i + o) % K])(jnp.arange(1, K, dtype=jnp.int32)),
        ])
        acc_all, t_toks, t_gs, t_lens = jax.vmap(seg_acc)(
            seg_tokens, greedy, seg_vlen, shifts
        )
        acc_all = jnp.where(seg_active & (t_lens > 0), acc_all, 0)

        # RA winner among RA + candidates
        w = jnp.argmax(acc_all[: 1 + C]).astype(jnp.int32)
        acc_w = acc_all[w]
        tw, gw, tlen_w = t_toks[w], t_gs[w], t_lens[w]

        # EOS cap inside accepted region (reference :512-529)
        is_eos = (tw == eos_token_id) & (eos_token_id >= 0) & (jN < acc_w)
        any_eos = jnp.any(is_eos)
        first_eos = jnp.argmax(is_eos).astype(jnp.int32)
        acc_w = jnp.where(any_eos, first_eos + 1, acc_w)
        eos_hit = any_eos

        rejected = acc_w < tlen_w
        nxt = jnp.where(
            rejected, gw[jnp.maximum(acc_w - 1, 0)], gw[jnp.maximum(tlen_w - 1, 0)]
        )

        # RA block update
        commit_ok = jN < acc_w
        a_old = blk_acc[ra_i]
        acc_toks_ra = blk_acc_toks[ra_i].at[
            jnp.where(commit_ok, a_old + jN, N)
        ].set(tw, mode="drop")
        new_dlen_ra = jnp.where(rejected & ~eos_hit, tlen_w - acc_w, 0)
        nd_src = jnp.clip(acc_w + jN - 1, 0, N - 1)
        nd = jnp.where(jN == 0, nxt, jnp.take(gw, nd_src))
        nd = jnp.where(jN < new_dlen_ra, nd, pad_token_id)

        blk_draft2 = blk_draft.at[ra_i].set(nd)
        blk_dlen2 = blk_dlen.at[ra_i].set(new_dlen_ra)
        blk_acc2 = blk_acc.at[ra_i].set(a_old + acc_w)
        blk_acc_toks2 = blk_acc_toks.at[ra_i].set(acc_toks_ra)

        nxt_eos = (~eos_hit) & (eos_token_id >= 0) & (nxt == eos_token_id)
        eos_out = eos_hit | nxt_eos

        # ---- pseudo updates ----
        def upd_pseudo(o, carry):
            bd, bl, ba, bat = carry
            b = (ra_i + o) % K
            seg = 1 + C + o - 1
            active = seg_active[seg]
            acc_p = acc_all[seg]
            tp, gp, tlp = t_toks[seg], t_gs[seg], t_lens[seg]
            a_p = blk_acc[b]
            new_acc_toks = bat[b].at[
                jnp.where((jN < acc_p) & active, a_p + jN, N)
            ].set(tp, mode="drop")
            rej_p = acc_p < tlp
            nxt_p = jnp.where(rej_p, gp[jnp.maximum(acc_p - 1, 0)], gp[jnp.maximum(tlp - 1, 0)])
            ndl = jnp.where(rej_p, tlp - acc_p, 0)
            nd_p = jnp.where(jN == 0, nxt_p, jnp.take(gp, jnp.clip(acc_p + jN - 1, 0, N - 1)))
            nd_p = jnp.where(jN < ndl, nd_p, pad_token_id)
            bd = bd.at[b].set(jnp.where(active, nd_p, bd[b]))
            bl = bl.at[b].set(jnp.where(active, ndl, bl[b]))
            ba = ba.at[b].set(jnp.where(active, a_p + acc_p, ba[b]))
            bat = bat.at[b].set(jnp.where(active, new_acc_toks, bat[b]))
            return bd, bl, ba, bat

        if K > 1:
            blk_draft2, blk_dlen2, blk_acc2, blk_acc_toks2 = lax.fori_loop(
                1, K, upd_pseudo, (blk_draft2, blk_dlen2, blk_acc2, blk_acc_toks2)
            )

        # ---- n-gram pool append (rejected RA only, reference :562-575) ----
        def pool_append(pool, pool_len, pool_next, entry, elen, do):
            idx = jnp.where(do, pool_next % C, C)
            pool = pool.at[idx].set(entry, mode="drop")
            pool_len = pool_len.at[idx].set(elen, mode="drop")
            return pool, pool_len, pool_next + do.astype(jnp.int32)

        def blk_piece(o):
            b = (ra_i + o) % K
            a = blk_acc2[b]
            tok = jnp.where(jN < a, blk_acc_toks2[b], blk_draft2[b][jnp.clip(jN - a, 0, N - 1)])
            valid = (jN < jnp.minimum(a + blk_dlen2[b], N)) & (
                (o == 0) | (blk_active[(ra_i + o) % K] & (o < n_act))
            )
            return tok, valid

        pieces_tok, pieces_valid = jax.vmap(blk_piece)(
            jnp.arange(min(K, W // N), dtype=jnp.int32)
        )
        flat_tok = pieces_tok.reshape(-1)[:W]
        flat_val = pieces_valid.reshape(-1)[:W]
        if flat_tok.shape[0] < W:  # K == 1: single block narrower than W
            padn = W - flat_tok.shape[0]
            flat_tok = jnp.concatenate([flat_tok, jnp.zeros((padn,), jnp.int32)])
            flat_val = jnp.concatenate([flat_val, jnp.zeros((padn,), bool)])
        concat_entry, concat_len = _compact(flat_tok, flat_val)
        do_pool = rejected & ~eos_out
        pool2, pool_len2, pool_next2 = pool_append(
            pool, pool_len, pool_next, concat_entry, concat_len,
            do_pool & (concat_len > 0),
        )
        tail_len = jnp.maximum(tlen_w - 1 - acc_w, 0)
        tail = jnp.take(gw, jnp.clip(acc_w + jnp.arange(W), 0, N - 1))
        tail = jnp.where(jnp.arange(W) < tail_len, tail, pad_token_id)
        pool2, pool_len2, pool_next2 = pool_append(
            pool2, pool_len2, pool_next2, tail, tail_len, do_pool & (tail_len > 0)
        )

        # ---- spawn (reference :629-653) ----
        newest = (ra_i + n_act - 1) % K
        can_spawn = (blk_acc2[newest] >= spawn_thr) & (n_act < K) & (~eos_out)
        new_slot = (ra_i + n_act) % K
        spawn_draft = jnp.where(jN < new_dlen_ra, nd, pad_token_id)
        blk_draft2 = blk_draft2.at[new_slot].set(
            jnp.where(can_spawn, spawn_draft, blk_draft2[new_slot]))
        blk_dlen2 = blk_dlen2.at[new_slot].set(
            jnp.where(can_spawn, N, blk_dlen2[new_slot]))
        blk_acc2 = blk_acc2.at[new_slot].set(
            jnp.where(can_spawn, 0, blk_acc2[new_slot]))
        blk_acc_toks2 = blk_acc_toks2.at[new_slot].set(
            jnp.where(can_spawn, jnp.zeros((N,), jnp.int32), blk_acc_toks2[new_slot]))
        blk_base2 = blk_base.at[new_slot].set(
            jnp.where(can_spawn, blk_base[newest] + N, blk_base[new_slot]))
        blk_active2 = blk_active.at[new_slot].set(
            jnp.where(can_spawn, True, blk_active[new_slot]))
        n_act2 = n_act + can_spawn.astype(jnp.int32)

        # ---- promotion on RA completion (reference :656-713) ----
        complete = (blk_acc2[ra_i] >= N) & (~eos_out)
        has_pseudo = n_act2 > 1
        b2 = (ra_i + 1) % K
        a_b2 = blk_acc2[b2]
        packed_b2 = jnp.where(
            jN < a_b2, blk_acc_toks2[b2], blk_draft2[b2][jnp.clip(jN - a_b2, 0, N - 1)]
        )
        promo_draft = jnp.where(jN == 0, nxt, jnp.take(packed_b2, jnp.clip(jN, 0, N - 1)))
        fresh_draft = jnp.where(jN == 0, nxt, pad_token_id)
        prom = complete & has_pseudo
        fresh = complete & ~has_pseudo

        blk_active2 = blk_active2.at[ra_i].set(jnp.where(prom, False, blk_active2[ra_i]))
        blk_draft2 = blk_draft2.at[b2].set(jnp.where(prom, promo_draft, blk_draft2[b2]))
        blk_dlen2 = blk_dlen2.at[b2].set(jnp.where(prom, N, blk_dlen2[b2]))
        blk_acc2 = blk_acc2.at[b2].set(jnp.where(prom, 0, blk_acc2[b2]))
        blk_acc_toks2 = blk_acc_toks2.at[b2].set(
            jnp.where(prom, jnp.zeros((N,), jnp.int32), blk_acc_toks2[b2]))
        blk_draft2 = blk_draft2.at[ra_i].set(jnp.where(fresh, fresh_draft, blk_draft2[ra_i]))
        blk_dlen2 = blk_dlen2.at[ra_i].set(jnp.where(fresh, N, blk_dlen2[ra_i]))
        blk_acc2 = blk_acc2.at[ra_i].set(jnp.where(fresh, 0, blk_acc2[ra_i]))
        blk_acc_toks2 = blk_acc_toks2.at[ra_i].set(
            jnp.where(fresh, jnp.zeros((N,), jnp.int32), blk_acc_toks2[ra_i]))
        blk_base2 = blk_base2.at[ra_i].set(
            jnp.where(fresh, blk_base2[ra_i] + N, blk_base2[ra_i]))
        ra2 = jnp.where(prom, b2, ra_i)
        n_act2 = jnp.where(prom, n_act2 - 1, n_act2)

        return dict(
            blk_draft=blk_draft2, blk_dlen=blk_dlen2, blk_acc=blk_acc2,
            blk_acc_toks=blk_acc_toks2, blk_base=blk_base2,
            blk_active=blk_active2, ra=ra2, n_active=n_act2, pool=pool2,
            pool_len=pool_len2, pool_next=pool_next2, last_next=nxt,
            eos_hit=eos_out, nxt_eos=nxt_eos, w=w, acc_w=acc_w, tw=tw,
        )

    def body(st: MBState) -> MBState:
        alive = alive_fn(st)

        seg_tokens, seg_vlen, seg_active, seg_pos, tok_valid = jax.vmap(
            assemble_seq
        )(st.blk_draft, st.blk_dlen, st.blk_acc, st.blk_acc_toks, st.blk_base,
          st.blk_active, st.ra, st.n_active, st.pool, st.pool_len,
          st.pool_next, lookahead_start)
        # Dead rows' state is frozen (gated below), but their stale candidate
        # / pseudo flags must not steer the batch-global tier choice or a
        # draining batch stays pinned to the expensive full forward; zeroing
        # their segments is free — every update to a dead row is discarded.
        seg_active = seg_active & alive[:, None]
        tok_valid = tok_valid & alive[:, None, None]

        out_tokens = jnp.where(tok_valid, seg_tokens, 0).reshape(B, T)
        out_pos = seg_pos.reshape(B, T)
        tv = tok_valid.reshape(B, T)
        intra = sees[None] & tv[:, :, None] & tv[:, None, :]

        def full_fwd(_):
            h, k_new, v_new = forward_spec(
                params, cfg, out_tokens, out_pos, st.kv, block_tables,
                st.cur_len, intra, rope,
            )
            return greedy_tokens(params, cfg, h).reshape(B, S, N), k_new, v_new

        def ra_only_fwd(_):
            # compute-skipping: no candidate/pseudo segment is live anywhere
            # in the batch, so forward only the RA block (T -> N tokens);
            # pad outputs to the full shapes (zero rows are masked by
            # seg_active downstream and never committed — commit rows come
            # from winner w, which is the RA segment here)
            h, k_n, v_n = forward_spec(
                params, cfg, out_tokens[:, :N], out_pos[:, :N], st.kv,
                block_tables, st.cur_len, intra[:, :N, :N], rope,
            )
            g = greedy_tokens(params, cfg, h)  # [B, N]
            greedy = jnp.zeros((B, S, N), jnp.int32).at[:, 0].set(g)
            Lyr = k_n.shape[0]
            k_new = jnp.zeros((Lyr, B, T) + k_n.shape[3:], k_n.dtype)
            v_new = jnp.zeros_like(k_new)
            return greedy, k_new.at[:, :, :N].set(k_n), v_new.at[:, :, :N].set(v_n)

        def no_cand_fwd(_):
            # middle tier: pseudos live but the n-gram pool missed — forward
            # [RA | pseudos] only (T -> K*N tokens).  Segment order keeps RA
            # first, so slicing rows [:N] + [(1+C)*N:] of the full layout
            # preserves the tree mask semantics.
            ps = (1 + C) * N  # pseudo rows start here in the full layout
            Tm = K * N
            sel_tok = jnp.concatenate([out_tokens[:, :N], out_tokens[:, ps:]], axis=1)
            sel_pos = jnp.concatenate([out_pos[:, :N], out_pos[:, ps:]], axis=1)
            m = jnp.concatenate([
                jnp.concatenate([intra[:, :N, :N], intra[:, :N, ps:]], axis=2),
                jnp.concatenate([intra[:, ps:, :N], intra[:, ps:, ps:]], axis=2),
            ], axis=1)  # [B, Tm, Tm]
            h, k_n, v_n = forward_spec(
                params, cfg, sel_tok, sel_pos, st.kv, block_tables,
                st.cur_len, m, rope,
            )
            g = greedy_tokens(params, cfg, h).reshape(B, K, N)
            greedy = jnp.zeros((B, S, N), jnp.int32)
            greedy = greedy.at[:, 0].set(g[:, 0]).at[:, 1 + C:].set(g[:, 1:])
            Lyr = k_n.shape[0]
            k_new = jnp.zeros((Lyr, B, T) + k_n.shape[3:], k_n.dtype)
            v_new = jnp.zeros_like(k_new)
            k_new = k_new.at[:, :, :N].set(k_n[:, :, :N]).at[:, :, ps:].set(k_n[:, :, N:])
            v_new = v_new.at[:, :, :N].set(v_n[:, :, :N]).at[:, :, ps:].set(v_n[:, :, N:])
            return greedy, k_new, v_new

        tier = jnp.int32(0)  # 0=full, 1=no-cand, 2=RA-only
        if S > 1:
            any_cand = jnp.any(seg_active[:, 1 : 1 + C])
            any_pseudo = jnp.any(seg_active[:, 1 + C :]) if K > 1 else jnp.bool_(False)
            if K > 1 and C > 0:
                tier = jnp.where(any_cand, 0, jnp.where(any_pseudo, 1, 2))
                greedy, k_new, v_new = lax.cond(
                    any_cand, full_fwd,
                    lambda _: lax.cond(any_pseudo, no_cand_fwd, ra_only_fwd, None),
                    None,
                )
            else:
                ra_only = ~jnp.any(seg_active[:, 1:])
                tier = jnp.where(ra_only, 2, 0)
                greedy, k_new, v_new = lax.cond(ra_only, ra_only_fwd, full_fwd, None)
        else:
            greedy, k_new, v_new = full_fwd(None)
        tiers2 = st.tiers.at[tier].add(1)

        upd = jax.vmap(update_seq)(
            seg_tokens, seg_vlen, seg_active, greedy, st.blk_draft,
            st.blk_dlen, st.blk_acc, st.blk_acc_toks, st.blk_base,
            st.blk_active, st.ra, st.n_active, st.pool, st.pool_len,
            st.pool_next, spawn_threshold,
        )
        acc_w = jnp.where(alive, upd["acc_w"], 0)  # [B]
        tw = upd["tw"]  # [B, N]
        w = upd["w"]  # [B]

        # ---- shared commits: token buffers + paged KV ----
        jB = jnp.arange(B)
        commit_ok = (jN[None, :] < acc_w[:, None]) & alive[:, None]
        tok_idx = jnp.where(
            commit_ok, st.cur_len[:, None] + jN[None, :], st.tokens.shape[1]
        )
        tokens2 = st.tokens.at[jB[:, None], tok_idx].set(tw, mode="drop")

        page = st.kv.page_size
        pos_c = st.cur_len[:, None] + jN[None, :]
        page_idx = jnp.take_along_axis(
            block_tables, jnp.clip(pos_c // page, 0, block_tables.shape[1] - 1),
            axis=1,
        )
        slots = jnp.where(
            commit_ok & (page_idx >= 0), page_idx * page + pos_c % page,
            st.kv.num_slots,
        )  # [B, N]
        rows = w[:, None] * N + jN[None, :]  # [B, N] winner rows within out
        # stash [Lyr, B, T, KH, D] -> winner rows [Lyr, B, N, KH, D] -> head-major flat
        kw = jnp.take_along_axis(k_new, rows[None, :, :, None, None], axis=2)
        vw = jnp.take_along_axis(v_new, rows[None, :, :, None, None], axis=2)
        Lyr, _, _, KH, D = kw.shape
        kw = kw.transpose(0, 3, 1, 2, 4).reshape(Lyr, KH, B * N, D)
        vw = vw.transpose(0, 3, 1, 2, 4).reshape(Lyr, KH, B * N, D)
        flat_slots = slots.reshape(B * N)
        new_ks, new_vs = st.kv.k_scale, st.kv.v_scale
        if st.kv.scaled:  # fp8 KV: per-row quantization + scale scatter
            kw, ksw = quantize_rows(kw, st.kv.k.dtype)
            vw, vsw = quantize_rows(vw, st.kv.v.dtype)
            new_ks = new_ks.at[:, :, flat_slots].set(ksw, mode="drop")
            new_vs = new_vs.at[:, :, flat_slots].set(vsw, mode="drop")
        else:
            kw = kw.astype(st.kv.k.dtype)
            vw = vw.astype(st.kv.v.dtype)
        new_k = st.kv.k.at[:, :, flat_slots].set(kw, mode="drop")
        new_v = st.kv.v.at[:, :, flat_slots].set(vw, mode="drop")
        kv2 = KVCache(new_k, new_v, page, new_ks, new_vs)

        cur_len2 = st.cur_len + acc_w
        generated2 = st.generated + acc_w

        # nxt itself is EOS -> commit it and stop (reference :598-612)
        nxt_eos = upd["nxt_eos"] & alive
        tok_pos = jnp.where(nxt_eos, cur_len2, st.tokens.shape[1])
        tokens2 = tokens2.at[jB, tok_pos].set(upd["last_next"], mode="drop")
        cur_len2 = cur_len2 + nxt_eos.astype(jnp.int32)
        generated2 = generated2 + nxt_eos.astype(jnp.int32)
        eos2 = st.eos | (alive & (upd["eos_hit"] | nxt_eos))

        def gate(new, old):
            a = alive.reshape((B,) + (1,) * (new.ndim - 1))
            return jnp.where(a, new, old)

        return MBState(
            kv=kv2, tokens=tokens2,
            cur_len=jnp.where(alive, cur_len2, st.cur_len),
            blk_draft=gate(upd["blk_draft"], st.blk_draft),
            blk_dlen=gate(upd["blk_dlen"], st.blk_dlen),
            blk_acc=gate(upd["blk_acc"], st.blk_acc),
            blk_acc_toks=gate(upd["blk_acc_toks"], st.blk_acc_toks),
            blk_base=gate(upd["blk_base"], st.blk_base),
            blk_active=gate(upd["blk_active"], st.blk_active),
            ra=jnp.where(alive, upd["ra"], st.ra),
            n_active=jnp.where(alive, upd["n_active"], st.n_active),
            pool=gate(upd["pool"], st.pool),
            pool_len=gate(upd["pool_len"], st.pool_len),
            pool_next=jnp.where(alive, upd["pool_next"], st.pool_next),
            last_next=jnp.where(alive, upd["last_next"], st.last_next),
            eos=eos2,
            iters=st.iters + alive.astype(jnp.int32),
            generated=jnp.where(alive, generated2, st.generated),
            tiers=tiers2,
        )

    st = lax.while_loop(cond, body, state)
    return {
        "kv": st.kv, "tokens": st.tokens, "cur_len": st.cur_len,
        "blk_draft": st.blk_draft, "blk_dlen": st.blk_dlen,
        "blk_acc": st.blk_acc, "blk_acc_toks": st.blk_acc_toks,
        "blk_base": st.blk_base, "blk_active": st.blk_active,
        "ra": st.ra, "n_active": st.n_active, "pool": st.pool,
        "pool_len": st.pool_len, "pool_next": st.pool_next,
        "last_next": st.last_next, "eos": st.eos, "iters": st.iters,
        "generated": st.generated, "tiers": st.tiers,
    }
