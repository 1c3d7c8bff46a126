"""Pallas TPU kernel for speculative (multiblock/MR) attention.

Replaces the XLA fallback of `ops.attention.paged_attention_with_block`, which
gathers ALL committed pages dense ([B, P*page, KH, D] materialized) and builds
[B, KH, G, T, S] score tensors — at 4k context that is hundreds of MB of HBM
traffic per layer.  Here the committed pages stream through the same
double-buffered DMA + online-softmax loop as the decode kernel
(ops/pallas/paged_attention.py), and the in-flight segment block (RA draft +
candidates + pseudos, `forward_spec`) is a VMEM operand appended as one extra
online-softmax step under the tree-segment visibility mask.

Reference analog: the fused forward over `out = [lookback, RA draft, pseudo
tails]` with KV batch expansion
(modeling/..._multiblock_lookahead_unified.py:317-463); the TPU version keeps
candidates on the sequence axis and never writes speculative KV.

Committed-phase masking: every in-flight query position is >= the committed
length, so the only mask is `key_abs < cache_len` (no causal term).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jacobiforcing_tpu.ops.pallas.paged_attention import (
    _FLAT_CAP, _NBUF, _PP, _flat_ok, _flat_p, _pick_pp, flat_enabled,
)

_NEG_INF = -1e30

# Max query rows resident per program: the [rows, tile] f32 score block plus
# q/acc dominate scoped VMEM; 2048 rows fits the v5e 16M limit (2304 measured
# to need 18.28M).  Query sets beyond this are tiled over head-group slices
# (grid axis 2), each tile re-streaming the committed pages — acceptable
# because the full-tier MR forward is rare and the page stream is ~MBs.
_MAX_ROWS = int(os.environ.get("JF_SPEC_MAXROWS", "2048"))


def groups_per_tile(G: int, T: int) -> int:
    """Largest divisor of G whose query slice (gpt*T rows) fits VMEM; 0 if
    even a single group doesn't fit."""
    for d in range(G, 0, -1):
        if G % d == 0 and d * T <= _MAX_ROWS:
            return d
    return 0


def _kernel(
    # scalar prefetch
    bt_ref,  # [B, P] int32
    clen_ref,  # [B] int32 committed KV length
    # inputs
    q_ref,  # [G*T, D] VMEM
    k_hbm,  # [KH, num_slots, D] HBM
    v_hbm,
    ks_ref,  # [1, S_pad] f32 VMEM gathered K dequant scales (or None)
    vs_ref,
    kblk_ref,  # [T, D] VMEM: this (b, h)'s in-flight K
    vblk_ref,
    mask_ref,  # [T, T] int8 VMEM: intra-block visibility (1 = attend)
    # outputs
    o_ref,  # [G*T, D] VMEM
    # scratch
    kbuf, vbuf,  # [NBUF, TILE, D]
    sem,  # [NBUF, 2*pp]
    acc,  # [rows, D] f32
    *softmax_scratch,  # flat: p_sum [rows, TILE], l_i; online: m_i, l_i
    page: int,
    T: int,
    G: int,
    scaled: bool = False,
    flat: bool = None,
    pp: int = None,
):
    if pp is None:
        pp = _PP
    if flat is None:
        flat = flat_enabled()
    if flat:
        p_sum, l_i = softmax_scratch
    else:
        m_i, l_i = softmax_scratch
    b = pl.program_id(0)
    h = pl.program_id(1)
    clen = clen_ref[b]
    npages = lax.div(clen + jnp.int32(page - 1), jnp.int32(page))
    GL, D = q_ref.shape

    tile = pp * page
    ntiles = lax.div(npages + jnp.int32(pp - 1), jnp.int32(pp))

    def tile_dmas(slot, t):
        # Unconditional fetch of pp pages; indices past the end clamp to the
        # last valid page (key_abs >= clen there, so the mask kills them) —
        # branch-free scalar control, no buffer zeroing needed.  page_id
        # clamps at 0: -1 padding entries would fault the DMA engine.
        out = []
        for j in range(pp):
            p = jnp.minimum(pp * t + jnp.int32(j), npages - 1)
            page_id = jnp.maximum(bt_ref[b, p], 0)
            base = pl.multiple_of(page_id * page, page)
            off = j * page
            out.append(pltpu.make_async_copy(
                k_hbm.at[h, pl.ds(base, page)],
                kbuf.at[slot, pl.ds(off, page)], sem.at[slot, 2 * j],
            ))
            out.append(pltpu.make_async_copy(
                v_hbm.at[h, pl.ds(base, page)],
                vbuf.at[slot, pl.ds(off, page)], sem.at[slot, 2 * j + 1],
            ))
        return out

    for t0 in range(_NBUF):
        @pl.when(t0 < ntiles)
        def _():
            for dma in tile_dmas(t0, jnp.int32(t0)):
                dma.start()

    acc[...] = jnp.zeros_like(acc)
    l_i[...] = jnp.zeros_like(l_i)
    if flat:
        p_sum[...] = jnp.zeros_like(p_sum)
    else:
        m_i[...] = jnp.full_like(m_i, _NEG_INF)

    q = q_ref[...]  # [G*T, D], pre-scaled by scale*log2e (exp2 domain)

    def body(t, _):
        slot = lax.rem(t, jnp.int32(_NBUF))
        for dma in tile_dmas(slot, t):
            dma.wait()
        k = kbuf[slot].astype(q.dtype)
        v = vbuf[slot].astype(q.dtype)
        s = lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if scaled:
            # dequant K folded into the scores, V into the probabilities —
            # identical algebra to the decode kernel (paged_attention.py):
            # (q . k_q) * ks == q . (k_q * ks); p @ (v_q*vs) == (p*vs) @ v_q
            s = s * ks_ref[:, pl.ds(t * tile, tile)]  # [1, TILE] broadcast

        def fold_vs(p_ij):
            if scaled:
                return (p_ij * vs_ref[:, pl.ds(t * tile, tile)]).astype(q.dtype)
            return p_ij.astype(q.dtype)

        if flat:
            def update(sv):
                # same flat exp2 softmax as the decode kernel (see
                # paged_attention._SOFTMAX): no running max, denominator as an
                # elementwise partial sum reduced once after the loop
                p_ij = _flat_p(sv)
                p_sum[...] += p_ij
                acc[...] += lax.dot_general(
                    fold_vs(p_ij), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            def update(sv):
                m_new = jnp.maximum(m_i[...], jnp.max(sv, axis=1, keepdims=True))
                alpha = jnp.exp2(m_i[...] - m_new)
                p_ij = jnp.exp2(sv - m_new)
                l_i[...] = alpha * l_i[...] + jnp.sum(p_ij, axis=1, keepdims=True)
                acc[...] = acc[...] * alpha + lax.dot_general(
                    fold_vs(p_ij), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_i[...] = m_new

        # every committed key is visible to every in-flight query, so only the
        # ragged tail tile needs the length mask
        is_full = (t + 1) * tile <= clen

        @pl.when(is_full)
        def _():
            update(s)

        @pl.when(~is_full)
        def _():
            key_abs = t * tile + lax.broadcasted_iota(jnp.int32, (GL, tile), 1)
            update(jnp.where(key_abs < clen, s, _NEG_INF))

        @pl.when(t + _NBUF < ntiles)
        def _():
            for dma in tile_dmas(slot, t + _NBUF):
                dma.start()

        return 0

    lax.fori_loop(jnp.int32(0), ntiles, body, 0)
    if flat:
        # one cross-lane reduction for the whole committed phase
        l_i[...] = jnp.sum(p_sum[...], axis=1, keepdims=True)

    # ---- in-flight block phase: one more softmax step ----
    kb = kblk_ref[...].astype(q.dtype)  # [T, D]
    vb = vblk_ref[...].astype(q.dtype)
    mask = mask_ref[...]  # [T, T] int8
    for g in range(G):  # static unroll: each query-head slice shares the mask
        rows = pl.ds(g * T, T)
        qg = q_ref[rows, :]
        s = lax.dot_general(
            qg, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, T]; scale*log2e folded into q -> exp2 domain
        s = jnp.where(mask != 0, s, _NEG_INF)
        if flat:
            p_ij = _flat_p(s)
            l_i[rows, :] += jnp.sum(p_ij, axis=1, keepdims=True)
            acc[rows, :] += lax.dot_general(
                p_ij.astype(q.dtype), vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_old = m_i[rows, :]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_old - m_new)
            p_ij = jnp.exp2(s - m_new)
            l_i[rows, :] = alpha * l_i[rows, :] + jnp.sum(p_ij, axis=1, keepdims=True)
            acc[rows, :] = acc[rows, :] * alpha + lax.dot_general(
                p_ij.astype(q.dtype), vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_i[rows, :] = m_new

    o_ref[...] = (acc[...] / jnp.maximum(l_i[...], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "page_size", "interpret", "softmax")
)
def spec_attention_pallas(
    q: jax.Array,  # [B, T, NH, D]
    k_cache_l: jax.Array,  # [KH, num_slots, D]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [B, P]
    cache_lens: jax.Array,  # [B]
    k_new: jax.Array,  # [B, T, KH, D] in-flight block K (not in cache)
    v_new: jax.Array,
    intra_mask: jax.Array,  # [B, T, T] bool
    scale: float,
    *,
    page_size: int,
    k_scale_l: jax.Array = None,  # [KH, num_slots] f32 dequant rows (fp8/int8 KV)
    v_scale_l: jax.Array = None,
    interpret: bool = False,
    softmax: str = None,  # None/"auto" = calibrated policy; "flat"/"online"
) -> jax.Array:
    scale = float(scale)
    B, T, NH, D = q.shape
    KH = k_cache_l.shape[0]
    G = NH // KH
    GT = G * T
    gpt = groups_per_tile(G, T)
    if gpt == 0:
        raise ValueError(f"spec kernel: T={T} query rows exceed VMEM cap")
    # Pad the head-group axis when a slightly larger group count tiles into
    # FEWER grid slices: every slice re-streams the full committed page
    # stream, so G=7 (Qwen 7B GQA) at T=384 forces gpt=1 = SEVEN re-streams,
    # while padding to Gp=8 gives gpt=4 = two re-streams for 1/8 wasted
    # query rows (zero rows; outputs sliced off — zero q scores uniformly,
    # so no NaN risk in either softmax path).  probe_mr_decompose measured
    # committed-KV attention at 7.2 of the MR full tier's 28.4 ms/iter at
    # B=1/4k; re-streaming is the dominant term of that 7.2.
    #
    # Cost gate (round-5 advisor fix): the padded rows ride through BOTH the
    # committed stream's score/pv matmuls and the block phase, and the probe
    # decomposition showed those matmuls are compute-bound at MR row counts —
    # so unbounded padding (e.g. G=3 -> 4 = +33% rows to save one re-stream)
    # can be net-negative.  Cap the wasted-row fraction at 25%: G=7 -> 8
    # (+14%, 7 streams -> 2) passes; G=3 -> 4 does not.
    # JF_SPEC_NO_GPAD=1 disables padding entirely (A/B probes).
    Gp, slices = G, G // gpt
    if os.environ.get("JF_SPEC_NO_GPAD", "0") != "1":
        for cand in range(G + 1, 2 * G + 1):
            g2 = groups_per_tile(cand, T)
            if g2 and cand // g2 < slices and (cand - G) * 4 <= G:
                Gp, gpt, slices = cand, g2, cand // g2
    GTp = Gp * T
    rows = gpt * T  # query rows per program
    scaled = k_scale_l is not None

    import math as _math

    qr = q.reshape(B, T, KH, G, D).transpose(0, 2, 3, 1, 4)  # [B,KH,G,T,D]
    if Gp != G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, Gp - G), (0, 0), (0, 0)))
    qr = qr.reshape(B, KH, GTp, D)
    # fold the softmax scale + exp->exp2 conversion into q once
    qr = (qr.astype(jnp.float32) * (scale * _math.log2(_math.e))).astype(q.dtype)
    kb = k_new.transpose(0, 2, 1, 3)  # [B, KH, T, D]
    vb = v_new.transpose(0, 2, 1, 3)
    mask8 = intra_mask.astype(jnp.int8)
    pp = _pick_pp(B, block_tables.shape[1], page_size)
    kv_isz = k_cache_l.dtype.itemsize
    if pp > 2 and not _flat_ok(rows, pp * page_size, D, kv_isz, q.dtype.itemsize):
        pp = 2
    from jacobiforcing_tpu.ops.pallas.paged_attention import _resolve_flat

    flat = _resolve_flat(softmax) and _flat_ok(
        rows, pp * page_size, D, kv_isz, q.dtype.itemsize
    )

    in_specs = [
        pl.BlockSpec((1, 1, rows, D), lambda b, h, g, *_: (b, h, g, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [block_tables.astype(jnp.int32), cache_lens.astype(jnp.int32),
            qr, k_cache_l, v_cache_l]
    if scaled:
        from jacobiforcing_tpu.ops.kv_cache import gather_scales

        P = block_tables.shape[1]
        # pad the gathered plane to whole tiles (tail pages read the clamped
        # last page; the cache-length mask already kills those columns)
        S_pad = ((P + pp - 1) // pp) * pp * page_size

        def gather_plane(scale_l):
            g = gather_scales(scale_l, block_tables, page_size)  # [B, S, KH]
            g = g.transpose(0, 2, 1)  # [B, KH, S]
            g = jnp.pad(g, ((0, 0), (0, 0), (0, S_pad - g.shape[-1])))
            return g[:, :, None, :]  # [B, KH, 1, S_pad]

        args += [gather_plane(k_scale_l), gather_plane(v_scale_l)]
        in_specs += [
            pl.BlockSpec((1, 1, 1, S_pad), lambda b, h, g, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, S_pad), lambda b, h, g, *_: (b, h, 0, 0)),
        ]
    args += [kb, vb, mask8]
    in_specs += [
        pl.BlockSpec((1, 1, T, D), lambda b, h, g, *_: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, T, D), lambda b, h, g, *_: (b, h, 0, 0)),
        pl.BlockSpec((1, T, T), lambda b, h, g, *_: (b, 0, 0)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KH, Gp // gpt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, rows, D), lambda b, h, g, *_: (b, h, g, 0)),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, pp * page_size, D), k_cache_l.dtype),
            pltpu.VMEM((_NBUF, pp * page_size, D), v_cache_l.dtype),
            pltpu.SemaphoreType.DMA((_NBUF, 2 * pp)),
            pltpu.VMEM((rows, D), jnp.float32),
        ] + (
            [pltpu.VMEM((rows, pp * page_size), jnp.float32)]
            if flat
            else [pltpu.VMEM((rows, 1), jnp.float32)]
        ) + [
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
    )

    def _squeeze(bt, clen, q_ref, k_hbm, v_hbm, *rest):
        if scaled:
            ks_ref, vs_ref, kb_ref, vb_ref, m_ref, o_ref = rest[:6]
            scr = rest[6:]
            ks, vs = ks_ref.at[0, 0], vs_ref.at[0, 0]
        else:
            kb_ref, vb_ref, m_ref, o_ref = rest[:4]
            scr = rest[4:]
            ks = vs = None
        _kernel(
            bt, clen, q_ref.at[0, 0], k_hbm, v_hbm, ks, vs, kb_ref.at[0, 0],
            vb_ref.at[0, 0], m_ref.at[0], o_ref.at[0, 0], *scr,
            page=page_size, T=T, G=gpt, scaled=scaled, flat=flat, pp=pp,
        )

    out = pl.pallas_call(
        _squeeze,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, GTp, D), q.dtype),
        interpret=interpret,
    )(*args)

    if Gp != G:
        out = out[:, :, :GT]
    return out.reshape(B, KH, G, T, D).transpose(0, 3, 1, 2, 4).reshape(B, T, NH, D)
