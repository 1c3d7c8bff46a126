"""Pallas TPU paged-attention kernel.

Native-device replacement for the reference's flash_attn_with_kvcache /
flash_attn_varlen_func call sites and Triton KV scatter/gather kernels
(inference_engine/layers/attention.py:10-157).  One kernel serves all three
decode contexts (prefill with consecutive positions, 1-token AR decode, B x L
Jacobi blocks) — the bit-stability property the reference gets from reusing
one flash kernel.

Design (see /opt/skills/guides/pallas_guide.md):
  * grid = (B, KH): one program per (sequence, kv head); the G = NH/KH query
    heads of that kv head are processed together as a [G*L, D] q tile on the
    MXU;
  * block tables and per-seq lengths ride scalar prefetch
    (PrefetchScalarGridSpec) so the kernel can compute page addresses;
  * KV pages stay in HBM; the kernel DMAs one [page, D] K and V slice per
    page with double buffering, overlapping DMA with the flash-attention
    online-softmax update;
  * `cache_lens` masks the ragged tail (dead slots are never read -> the
    trim_kv_only_fast contract, reference block_manager.py:534-565);
  * causal masking uses q_start[b] + (row mod L) as the absolute query
    position — all call sites use consecutive positions;
  * fp8 KV: per-row dequant scales (ops/kv_cache.py quantize_rows) are
    pre-gathered per sequence OUTSIDE the kernel (the [B, KH, S] fp32 planes
    are ~3% of the page bytes) and staged via block specs; the kernel folds
    the K scale into the score columns and the V scale into the softmax
    probabilities, so both MXU matmuls consume the narrow-cast pages directly
    (no [page, D] dequant pass, and no sublane-misaligned scale DMAs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    bt_ref,  # [B, P] int32 page ids
    clen_ref,  # [B] int32 valid KV length
    qstart_ref,  # [B] int32 absolute position of query row i=0
    # inputs
    q_ref,  # [GL, D] VMEM (this program's q tile)
    k_hbm,  # [KH, num_slots, D] HBM
    v_hbm,
    ks_ref,  # [1, S] f32 VMEM: this sequence's gathered K scales (or None)
    vs_ref,
    # outputs
    o_ref,  # [GL, D] VMEM
    # scratch
    kbuf, vbuf,  # [NBUF, TILE, D] VMEM
    sem,  # DMA sems [NBUF, 4]
    acc, m_i, l_i,  # [GL, D] f32, [GL, 1] f32, [GL, 1] f32
    *,
    page: int,
    L: int,
    scale: float,
    scaled: bool,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    clen = clen_ref[b]
    qstart = qstart_ref[b]
    npages = lax.div(clen + jnp.int32(page - 1), jnp.int32(page))
    GL, D = q_ref.shape

    NBUF = 4  # DMA pipeline depth (buffers of PAIRS of pages)
    tile = 2 * page  # two pages per loop iteration: halves per-byte VPU/
    # control overhead (softmax passes, masks, semaphores) at the same DMA size
    ntiles = lax.div(npages + jnp.int32(1), jnp.int32(2))

    def kv_dma(slot, t, half):
        p = 2 * t + half
        page_id = bt_ref[b, p]
        base = pl.multiple_of(page_id * page, page)
        off = half * page
        return (
            pltpu.make_async_copy(
                k_hbm.at[h, pl.ds(base, page)],
                kbuf.at[slot, pl.ds(off, page)], sem.at[slot, 2 * half],
            ),
            pltpu.make_async_copy(
                v_hbm.at[h, pl.ds(base, page)],
                vbuf.at[slot, pl.ds(off, page)], sem.at[slot, 2 * half + 1],
            ),
        )

    def start_tile(slot, t):
        for dma in kv_dma(slot, t, 0):
            dma.start()

        @pl.when(2 * t + 1 < npages)
        def _():
            for dma in kv_dma(slot, t, 1):
                dma.start()

    def wait_tile(slot, t):
        for dma in kv_dma(slot, t, 0):
            dma.wait()

        @pl.when(2 * t + 1 < npages)
        def _():
            for dma in kv_dma(slot, t, 1):
                dma.wait()

    # zero the buffers once: an un-fetched second half (odd page count) must
    # hold finite values — masked scores give exp(-inf)=0, but 0 * NaN in the
    # PV matmul would poison the output.  Later slot reuse leaves stale-but-
    # finite K/V data, which masks safely.
    kbuf[...] = jnp.zeros_like(kbuf)
    vbuf[...] = jnp.zeros_like(vbuf)

    # warm up: fill the pipeline
    for t0 in range(NBUF):
        @pl.when(t0 < ntiles)
        def _():
            start_tile(t0, jnp.int32(t0))

    acc[...] = jnp.zeros_like(acc)
    m_i[...] = jnp.full_like(m_i, _NEG_INF)
    l_i[...] = jnp.zeros_like(l_i)

    q = q_ref[...]  # [GL, D] native dtype: MXU runs bf16 at full rate
    row = lax.broadcasted_iota(jnp.int32, (GL, 1), 0)
    qpos = qstart + lax.rem(row, jnp.int32(L))  # [GL, 1] absolute query positions

    def body(t, _):
        slot = lax.rem(t, jnp.int32(NBUF))
        wait_tile(slot, t)

        k = kbuf[slot].astype(q.dtype)  # [TILE, D] (cast covers f8/int8 KV)
        v = vbuf[slot].astype(q.dtype)
        s = lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [GL, TILE] f32 accumulation from native-dtype inputs
        if scaled:
            # dequant K folded into the scores: column j scales by its key
            # row's scale ((q . k_q) * ks == q . (k_q * ks))
            s = s * ks_ref[:, pl.ds(t * tile, tile)]  # [1, TILE] broadcast
        key_abs = t * tile + lax.broadcasted_iota(jnp.int32, (GL, tile), 1)
        # the second half masks itself out when its page was never fetched
        # (key_abs >= clen there)
        mask = (key_abs <= qpos) & (key_abs < clen)
        s = jnp.where(mask, s, _NEG_INF)

        m_new = jnp.maximum(m_i[...], jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_i[...] - m_new)
        p_ij = jnp.exp(s - m_new)
        l_new = alpha * l_i[...] + jnp.sum(p_ij, axis=1, keepdims=True)
        if scaled:
            # dequant V folded into the probabilities:
            # p @ (v_q * vs) == (p * vs) @ v_q  (l_new uses the true p)
            pv = (p_ij * vs_ref[:, pl.ds(t * tile, tile)]).astype(q.dtype)
        else:
            pv = p_ij.astype(q.dtype)
        acc[...] = acc[...] * alpha + lax.dot_general(
            pv, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_i[...] = m_new
        l_i[...] = l_new

        # refill the slot we just consumed (pipeline depth NBUF-1 behind it)
        @pl.when(t + NBUF < ntiles)
        def _():
            start_tile(slot, t + NBUF)

        return 0

    lax.fori_loop(jnp.int32(0), ntiles, body, 0)
    o_ref[...] = (acc[...] / jnp.maximum(l_i[...], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "page_size", "interpret")
)
def paged_attention_pallas(
    q: jax.Array,  # [B, L, NH, D]
    k_cache_l: jax.Array,  # [KH, num_slots, D]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [B, P]
    cache_lens: jax.Array,  # [B]
    positions: jax.Array,  # [B, L] consecutive absolute positions
    scale: float,  # static
    *,
    page_size: int,
    interpret: bool = False,
    k_scale_l=None,  # [KH, num_slots] fp32 (fp8 KV row scales)
    v_scale_l=None,
) -> jax.Array:
    scale = float(scale)
    B, L, NH, D = q.shape
    KH = k_cache_l.shape[0]  # head-major cache: [KH, num_slots, D]
    G = NH // KH
    GL = G * L
    scaled = k_scale_l is not None

    # [B, L, KH, G, D] -> [B, KH, G*L, D] with row r = g*L + i
    qr = q.reshape(B, L, KH, G, D).transpose(0, 2, 3, 1, 4).reshape(B, KH, GL, D)
    q_start = positions[:, 0].astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((1, 1, GL, D), lambda b, h, *_: (b, h, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [block_tables.astype(jnp.int32), cache_lens.astype(jnp.int32),
            q_start, qr, k_cache_l, v_cache_l]
    if scaled:
        from jacobiforcing_tpu.ops.kv_cache import gather_scales

        P = block_tables.shape[1]
        # pad the gathered plane to whole tiles (odd page counts read the
        # clamped tail, which the causal/len mask already zeroes); the dummy
        # axis makes the block's trailing dims (1, S) equal the array's, which
        # the Mosaic block-shape rules require
        S_pad = ((P + 1) // 2) * 2 * page_size
        def gather_plane(scale_l):
            g = gather_scales(scale_l, block_tables, page_size)  # [B, S, KH]
            g = g.transpose(0, 2, 1)  # [B, KH, S]
            g = jnp.pad(g, ((0, 0), (0, 0), (0, S_pad - g.shape[-1])))
            return g[:, :, None, :]  # [B, KH, 1, S_pad]
        args += [gather_plane(k_scale_l), gather_plane(v_scale_l)]
        in_specs += [
            pl.BlockSpec((1, 1, 1, S_pad), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, S_pad), lambda b, h, *_: (b, h, 0, 0)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, KH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, GL, D), lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((4, 2 * page_size, D), k_cache_l.dtype),
            pltpu.VMEM((4, 2 * page_size, D), v_cache_l.dtype),
            pltpu.SemaphoreType.DMA((4, 4)),
            pltpu.VMEM((GL, D), jnp.float32),
            pltpu.VMEM((GL, 1), jnp.float32),
            pltpu.VMEM((GL, 1), jnp.float32),
        ],
    )

    def _squeeze_kernel(bt, clen, qs, *rest):
        if scaled:
            q_ref, k_hbm, v_hbm, ks_ref, vs_ref, o_ref = rest[:6]
            scratch = rest[6:]
            ks2, vs2 = ks_ref.at[0, 0], vs_ref.at[0, 0]  # [1, S]
        else:
            q_ref, k_hbm, v_hbm, o_ref = rest[:4]
            scratch = rest[4:]
            ks2 = vs2 = None
        _kernel(
            bt, clen, qs, q_ref.at[0, 0], k_hbm, v_hbm, ks2, vs2,
            o_ref.at[0, 0], *scratch,
            page=page_size, L=L, scale=scale, scaled=scaled,
        )

    out = pl.pallas_call(
        _squeeze_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, GL, D), q.dtype),
        interpret=interpret,
    )(*args)

    # [B, KH, G*L, D] -> [B, L, NH, D]
    return out.reshape(B, KH, G, L, D).transpose(0, 3, 1, 2, 4).reshape(B, L, NH, D)
