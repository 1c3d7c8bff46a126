"""Multiblock Jacobi decoding with rejection recycling (MR) — device-resident.

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
    [P, W] ring buffer; per rejected iteration it receives the global
    block-concat and the rejected greedy tail; candidates splice a pool entry
    from the first position matching the next token, padded with the current
    draft (reference _build_candidates :63-91), skipping the newest entry.

Deviations from the reference (documented intentional fixes):
  * pseudo-block verification uses the same aligned greedy[i] -> seg[i+1]
    convention as the RA span (the reference's pseudo spans are off by one via
    the `cursor = 1` offset, :339-344 — benign there because promotion resets
    acceptance, but we keep verification consistent);
  * segments carry their SEMANTIC positions (block base + offset) instead of
    cache-append positions (reference cache_position, :436-440) — better RoPE
    alignment for lookahead drafts, same correctness;
  * when RA completes with no pseudo alive, a fresh RA starts in place
    ([last_next | PAD...]) instead of returning to the host per block.

Engine-side support for MR is itself an extension: the reference serving
engine declares this strategy unsupported (model_runner.py:1468-1473) and only
the HF path implements it.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from jacobiforcing_tpu.models.qwen import ModelConfig, forward_spec, greedy_tokens
from jacobiforcing_tpu.ops.kv_cache import KVCache


class MBState(NamedTuple):
    kv: KVCache
    tokens: jax.Array  # [cap]
    cur_len: jax.Array  # scalar: committed length
    blk_draft: jax.Array  # [K, N]
    blk_dlen: jax.Array  # [K]
    blk_acc: jax.Array  # [K]
    blk_acc_toks: jax.Array  # [K, N]
    blk_base: jax.Array  # [K] absolute start position of each block
    blk_active: jax.Array  # [K] bool
    ra: jax.Array  # scalar slot index
    n_active: jax.Array  # scalar
    pool: jax.Array  # [P, W]
    pool_len: jax.Array  # [P]
    pool_next: jax.Array  # scalar ring index
    last_next: jax.Array  # scalar token
    eos: jax.Array  # scalar bool
    iters: jax.Array
    generated: jax.Array


def _compact(tokens: jax.Array, valid: jax.Array) -> jax.Array:
    """Stable-compact valid tokens to the front (pool global-concat entries —
    the reference strips PADs, :404-406)."""
    n = tokens.shape[0]
    key = jnp.where(valid, jnp.arange(n), n + jnp.arange(n))
    order = jnp.argsort(key)
    return jnp.take(tokens, order), jnp.sum(valid.astype(jnp.int32)).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("cfg", "N", "K", "C", "W", "chunk_budget"),
    donate_argnames=("kv", "tokens"),
)
def jacobi_chunk_multiblock(
    params: Dict[str, Any],
    cfg: ModelConfig,
    rope,
    kv: KVCache,
    tokens: jax.Array,  # [cap]
    cur_len: jax.Array,  # scalar
    blk_draft: jax.Array,  # [K, N]
    blk_dlen: jax.Array,
    blk_acc: jax.Array,
    blk_acc_toks: jax.Array,
    blk_base: jax.Array,
    blk_active: jax.Array,
    ra: jax.Array,
    n_active: jax.Array,
    pool: jax.Array,  # [C, W]
    pool_len: jax.Array,
    pool_next: jax.Array,
    last_next: jax.Array,
    eos_in: jax.Array,  # scalar bool
    iters: jax.Array,
    block_tables: jax.Array,  # [1, P_pages]
    capacity: jax.Array,  # scalar
    max_new: jax.Array,  # scalar
    eos_token_id,
    pad_token_id,
    spawn_threshold,  # scalar int: ceil(r * N)
    lookahead_start,  # scalar int: ceil(lookahead_start_ratio * N)
    max_iters,  # scalar: per-request lifetime iteration budget (dynamic)
    *,
    N: int,
    K: int,
    C: int,  # candidate slots (= n-gram pool size)
    W: int,  # pool entry width
    chunk_budget: int,
) -> Dict[str, jax.Array]:
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
        generated=jnp.asarray(0, jnp.int32),
    )

    def cond(st: MBState):
        return (
            (~st.eos)
            & (st.iters < max_iters)
            & (st.generated < jnp.minimum(chunk_budget, max_new))
            & (st.cur_len + N <= capacity)
            & (st.cur_len + N < st.tokens.shape[0])
        )

    def body(st: MBState) -> MBState:
        ra_i = st.ra
        ra_draft = st.blk_draft[ra_i]
        ra_dlen = st.blk_dlen[ra_i]
        nxt0 = ra_draft[0]
        newest_pool = (st.pool_next - 1) % C

        # ---- candidate segments from the n-gram pool ----
        def build_cand(p):
            entry = st.pool[p]
            elen = st.pool_len[p]
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
                & (st.blk_acc[ra_i] >= lookahead_start)
                & (ra_dlen > 1)
            )
            return cand, valid

        cands, cand_valid = jax.vmap(build_cand)(jnp.arange(C))  # [C,N], [C]

        # ---- pseudo segments: packed [acc_toks | draft] ----
        def build_pseudo(o):
            b = (ra_i + o) % K
            a = st.blk_acc[b]
            tok = jnp.where(jN < a, st.blk_acc_toks[b], st.blk_draft[b][jnp.clip(jN - a, 0, N - 1)])
            vlen = jnp.minimum(a + st.blk_dlen[b], N)
            active = st.blk_active[b] & (o < st.n_active)
            return tok, vlen, st.blk_base[b], active

        ps_tok, ps_vlen, ps_base, ps_active = jax.vmap(build_pseudo)(
            jnp.arange(1, K, dtype=jnp.int32)
        )  # [K-1, ...]

        seg_tokens = jnp.concatenate(
            [ra_draft[None], cands, ps_tok], axis=0
        )  # [S, N]
        seg_vlen = jnp.concatenate(
            [ra_dlen[None], jnp.full((C,), ra_dlen), ps_vlen]
        )
        seg_active = jnp.concatenate(
            [jnp.ones((1,), bool), cand_valid, ps_active]
        )
        ra_start = st.blk_base[ra_i] + st.blk_acc[ra_i]
        seg_start = jnp.concatenate(
            [ra_start[None], jnp.full((C,), ra_start), ps_base]
        )
        seg_pos = seg_start[:, None] + jN[None, :]  # [S, N]

        tok_valid = (jN[None, :] < seg_vlen[:, None]) & seg_active[:, None]
        out_tokens = jnp.where(tok_valid, seg_tokens, 0).reshape(T)
        out_pos = seg_pos.reshape(T)
        tv = tok_valid.reshape(T)

        # ---- intra mask: same-seg causal; pseudos see RA + earlier pseudos ----
        seg_of = jnp.repeat(jnp.arange(S, dtype=jnp.int32), N)
        idx_in = jnp.tile(jN, S)
        qs, ks = seg_of[:, None], seg_of[None, :]
        qi, ki = idx_in[:, None], idx_in[None, :]
        same = (qs == ks) & (ki <= qi)
        q_pseudo = qs > C
        k_pseudo = ks > C
        sees = same | (q_pseudo & ((ks == 0) | (k_pseudo & (ks < qs))))
        intra = sees & tv[:, None] & tv[None, :]

        h, k_new, v_new = forward_spec(
            params, cfg, out_tokens[None], out_pos[None], st.kv, block_tables,
            st.cur_len[None], intra[None], rope,
        )
        greedy = greedy_tokens(params, cfg, h[0]).reshape(S, N)  # chunked argmax

        # ---- verify: acc = 1 + leading matches of seg[i+1] vs greedy[i] ----
        def seg_acc(tok, g, vlen, shift):
            # acceptance over the tail starting at `shift` (0 for RA/cands,
            # blk_acc for pseudos whose packed prefix is already accepted)
            t_tok = jnp.take(tok, jnp.clip(shift + jN, 0, N - 1))
            t_g = jnp.take(g, jnp.clip(shift + jN, 0, N - 1))
            tlen = vlen - shift
            mis = (t_tok[1:] != t_g[:-1]) | (jN[1:] >= tlen)
            acc = 1 + jnp.sum(jnp.cumsum(mis) == 0).astype(jnp.int32)
            return jnp.clip(acc, 0, jnp.maximum(tlen, 0)), t_tok, t_g, tlen

        shifts = jnp.concatenate([
            jnp.zeros((1 + C,), jnp.int32),
            jax.vmap(lambda o: st.blk_acc[(ra_i + o) % K])(jnp.arange(1, K, dtype=jnp.int32)),
        ])
        acc_all, t_toks, t_gs, t_lens = jax.vmap(seg_acc)(
            seg_tokens, greedy, seg_vlen, shifts
        )
        acc_all = jnp.where(seg_active & (t_lens > 0), acc_all, 0)

        # ---- RA winner among RA + candidates ----
        w = jnp.argmax(acc_all[: 1 + C]).astype(jnp.int32)
        acc_w = acc_all[w]
        tw, gw, tlen_w = t_toks[w], t_gs[w], t_lens[w]

        # EOS cap inside accepted region (reference :512-529)
        is_eos = (tw == eos_token_id) & (eos_token_id >= 0) & (jN < acc_w)
        any_eos = jnp.any(is_eos)
        first_eos = jnp.argmax(is_eos).astype(jnp.int32)
        acc_w = jnp.where(any_eos, first_eos + 1, acc_w)
        eos_hit = any_eos

        # ---- commit winner tokens + K/V ----
        commit_ok = jN < acc_w
        tok_idx = jnp.where(commit_ok, st.cur_len + jN, st.tokens.shape[0])
        tokens2 = st.tokens.at[tok_idx].set(tw, mode="drop")

        page = st.kv.page_size
        pos_c = st.cur_len + jN
        page_idx = jnp.take(
            block_tables[0], jnp.clip(pos_c // page, 0, block_tables.shape[1] - 1)
        )
        slots = jnp.where(commit_ok & (page_idx >= 0), page_idx * page + pos_c % page,
                          st.kv.num_slots)
        rows = w * N + jN
        # stash [Lyr, 1, T, KH, D] -> winner rows [Lyr, N, KH, D] -> head-major
        kw = k_new[:, 0, rows].transpose(0, 2, 1, 3).astype(st.kv.k.dtype)  # [Lyr, KH, N, D]
        vw = v_new[:, 0, rows].transpose(0, 2, 1, 3).astype(st.kv.v.dtype)
        new_k = st.kv.k.at[:, :, slots].set(kw, mode="drop")
        new_v = st.kv.v.at[:, :, slots].set(vw, mode="drop")
        kv2 = KVCache(new_k, new_v, page)

        cur_len2 = st.cur_len + acc_w
        generated2 = st.generated + acc_w

        rejected = acc_w < tlen_w
        nxt = jnp.where(
            rejected, gw[jnp.maximum(acc_w - 1, 0)], gw[jnp.maximum(tlen_w - 1, 0)]
        )

        # RA block update
        a_old = st.blk_acc[ra_i]
        acc_toks_ra = st.blk_acc_toks[ra_i].at[
            jnp.where(commit_ok, a_old + jN, N)
        ].set(tw, mode="drop")
        new_dlen_ra = jnp.where(rejected & ~eos_hit, tlen_w - acc_w, 0)
        nd_src = jnp.clip(acc_w + jN - 1, 0, N - 1)
        nd = jnp.where(jN == 0, nxt, jnp.take(gw, nd_src))
        nd = jnp.where(jN < new_dlen_ra, nd, pad_token_id)

        blk_draft2 = st.blk_draft.at[ra_i].set(nd)
        blk_dlen2 = st.blk_dlen.at[ra_i].set(new_dlen_ra)
        blk_acc2 = st.blk_acc.at[ra_i].set(a_old + acc_w)
        blk_acc_toks2 = st.blk_acc_toks.at[ra_i].set(acc_toks_ra)

        # nxt itself is EOS -> commit it and stop (reference :598-612)
        nxt_eos = (~eos_hit) & (eos_token_id >= 0) & (nxt == eos_token_id)
        tokens2 = jnp.where(
            nxt_eos,
            tokens2.at[jnp.minimum(cur_len2, tokens2.shape[0] - 1)].set(nxt),
            tokens2,
        )
        cur_len2 = cur_len2 + nxt_eos.astype(jnp.int32)
        generated2 = generated2 + nxt_eos.astype(jnp.int32)
        eos2 = st.eos | eos_hit | nxt_eos

        # ---- pseudo updates ----
        def upd_pseudo(o, carry):
            bd, bl, ba, bat = carry
            b = (ra_i + o) % K
            seg = 1 + C + o - 1
            active = ps_active[o - 1]
            acc_p = acc_all[seg]
            tp, gp, tlp = t_toks[seg], t_gs[seg], t_lens[seg]
            a_p = st.blk_acc[b]
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

        blk_draft2, blk_dlen2, blk_acc2, blk_acc_toks2 = lax.fori_loop(
            1, K, upd_pseudo, (blk_draft2, blk_dlen2, blk_acc2, blk_acc_toks2)
        ) if K > 1 else (blk_draft2, blk_dlen2, blk_acc2, blk_acc_toks2)

        # ---- n-gram pool append (rejected RA only, reference :562-575) ----
        def pool_append(pool, pool_len, pool_next, entry, elen, do):
            idx = jnp.where(do, pool_next % C, C)
            pool = pool.at[idx].set(entry, mode="drop")
            pool_len = pool_len.at[idx].set(elen, mode="drop")
            return pool, pool_len, pool_next + do.astype(jnp.int32)

        # entry 1: global concat of all blocks' [acc|draft], compacted
        def blk_piece(o):
            b = (ra_i + o) % K
            a = blk_acc2[b]
            tok = jnp.where(jN < a, blk_acc_toks2[b], blk_draft2[b][jnp.clip(jN - a, 0, N - 1)])
            valid = (jN < jnp.minimum(a + blk_dlen2[b], N)) & (
                (o == 0) | (st.blk_active[(ra_i + o) % K] & (o < st.n_active))
            )
            return tok, valid

        pieces_tok, pieces_valid = jax.vmap(blk_piece)(jnp.arange(min(K, W // N), dtype=jnp.int32))
        flat_tok = pieces_tok.reshape(-1)[:W]
        flat_val = pieces_valid.reshape(-1)[:W]
        if flat_tok.shape[0] < W:  # K == 1: single block narrower than W
            padn = W - flat_tok.shape[0]
            flat_tok = jnp.concatenate([flat_tok, jnp.zeros((padn,), jnp.int32)])
            flat_val = jnp.concatenate([flat_val, jnp.zeros((padn,), bool)])
        concat_entry, concat_len = _compact(flat_tok, flat_val)
        do_pool = rejected & ~eos2
        pool2, pool_len2, pool_next2 = pool_append(
            st.pool, st.pool_len, st.pool_next, concat_entry, concat_len,
            do_pool & (concat_len > 0),
        )
        # entry 2: RA rejected greedy tail gw[acc_w : tlen_w - 1]
        tail_len = jnp.maximum(tlen_w - 1 - acc_w, 0)
        tail = jnp.take(gw, jnp.clip(acc_w + jnp.arange(W), 0, N - 1))
        tail = jnp.where(jnp.arange(W) < tail_len, tail, pad_token_id)
        pool2, pool_len2, pool_next2 = pool_append(
            pool2, pool_len2, pool_next2, tail, tail_len, do_pool & (tail_len > 0)
        )

        # ---- spawn (reference :629-653) ----
        newest = (ra_i + st.n_active - 1) % K
        can_spawn = (
            (blk_acc2[newest] >= spawn_threshold) & (st.n_active < K) & (~eos2)
        )
        new_slot = (ra_i + st.n_active) % K
        spawn_draft = jnp.where(jN < new_dlen_ra, nd, pad_token_id)
        blk_draft2 = blk_draft2.at[new_slot].set(
            jnp.where(can_spawn, spawn_draft, blk_draft2[new_slot])
        )
        blk_dlen2 = blk_dlen2.at[new_slot].set(
            jnp.where(can_spawn, N, blk_dlen2[new_slot])
        )
        blk_acc2 = blk_acc2.at[new_slot].set(
            jnp.where(can_spawn, 0, blk_acc2[new_slot])
        )
        blk_acc_toks2 = blk_acc_toks2.at[new_slot].set(
            jnp.where(can_spawn, jnp.zeros((N,), jnp.int32), blk_acc_toks2[new_slot])
        )
        blk_base2 = st.blk_base.at[new_slot].set(
            jnp.where(can_spawn, st.blk_base[newest] + N, st.blk_base[new_slot])
        )
        blk_active2 = st.blk_active.at[new_slot].set(
            jnp.where(can_spawn, True, st.blk_active[new_slot])
        )
        n_active2 = st.n_active + can_spawn.astype(jnp.int32)

        # ---- promotion on RA completion (reference :656-713) ----
        complete = (blk_acc2[ra_i] >= N) & (~eos2)
        has_pseudo = n_active2 > 1
        b2 = (ra_i + 1) % K

        # promoted draft = [last_next | packed(acc+tail)[1:]], acceptance reset
        a_b2 = blk_acc2[b2]
        packed_b2 = jnp.where(
            jN < a_b2, blk_acc_toks2[b2], blk_draft2[b2][jnp.clip(jN - a_b2, 0, N - 1)]
        )
        promo_draft = jnp.where(
            jN == 0, nxt, jnp.take(packed_b2, jnp.clip(jN, 0, N - 1))
        )
        # fresh-RA draft when no pseudo exists
        fresh_draft = jnp.where(jN == 0, nxt, pad_token_id)

        prom = complete & has_pseudo
        fresh = complete & ~has_pseudo

        blk_active2 = blk_active2.at[ra_i].set(
            jnp.where(prom, False, blk_active2[ra_i])
        )
        blk_draft2 = blk_draft2.at[b2].set(jnp.where(prom, promo_draft, blk_draft2[b2]))
        blk_dlen2 = blk_dlen2.at[b2].set(jnp.where(prom, N, blk_dlen2[b2]))
        blk_acc2 = blk_acc2.at[b2].set(jnp.where(prom, 0, blk_acc2[b2]))
        blk_acc_toks2 = blk_acc_toks2.at[b2].set(
            jnp.where(prom, jnp.zeros((N,), jnp.int32), blk_acc_toks2[b2])
        )
        # fresh RA in place
        blk_draft2 = blk_draft2.at[ra_i].set(jnp.where(fresh, fresh_draft, blk_draft2[ra_i]))
        blk_dlen2 = blk_dlen2.at[ra_i].set(jnp.where(fresh, N, blk_dlen2[ra_i]))
        blk_acc2 = blk_acc2.at[ra_i].set(jnp.where(fresh, 0, blk_acc2[ra_i]))
        blk_acc_toks2 = blk_acc_toks2.at[ra_i].set(
            jnp.where(fresh, jnp.zeros((N,), jnp.int32), blk_acc_toks2[ra_i])
        )
        blk_base2 = blk_base2.at[ra_i].set(
            jnp.where(fresh, blk_base2[ra_i] + N, blk_base2[ra_i])
        )
        ra2 = jnp.where(prom, b2, ra_i)
        n_active2 = jnp.where(prom, n_active2 - 1, n_active2)

        return MBState(
            kv=kv2, tokens=tokens2, cur_len=cur_len2, blk_draft=blk_draft2,
            blk_dlen=blk_dlen2, blk_acc=blk_acc2, blk_acc_toks=blk_acc_toks2,
            blk_base=blk_base2, blk_active=blk_active2, ra=ra2,
            n_active=n_active2, pool=pool2, pool_len=pool_len2,
            pool_next=pool_next2, last_next=nxt, eos=eos2,
            iters=st.iters + 1, generated=generated2,
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
        "generated": st.generated,
    }
