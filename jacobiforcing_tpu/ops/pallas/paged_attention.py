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
    position — all call sites use consecutive positions.
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
    k_hbm,  # [num_slots, KH, D] HBM
    v_hbm,
    # outputs
    o_ref,  # [GL, D] VMEM
    # scratch
    kbuf, vbuf,  # [2, PAGE, D] VMEM
    sem,  # DMA sems [2, 2]
    acc, m_i, l_i,  # [GL, D] f32, [GL, 1] f32, [GL, 1] f32
    *,
    page: int,
    L: int,
    scale: float,
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
        key_abs = t * tile + lax.broadcasted_iota(jnp.int32, (GL, tile), 1)
        # the second half masks itself out when its page was never fetched
        # (key_abs >= clen there)
        mask = (key_abs <= qpos) & (key_abs < clen)
        s = jnp.where(mask, s, _NEG_INF)

        m_new = jnp.maximum(m_i[...], jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_i[...] - m_new)
        p_ij = jnp.exp(s - m_new)
        l_new = alpha * l_i[...] + jnp.sum(p_ij, axis=1, keepdims=True)
        acc[...] = acc[...] * alpha + lax.dot_general(
            p_ij.astype(q.dtype), v,
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
    k_cache_l: jax.Array,  # [num_slots, KH, D]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [B, P]
    cache_lens: jax.Array,  # [B]
    positions: jax.Array,  # [B, L] consecutive absolute positions
    scale: float,  # static
    *,
    page_size: int,
    interpret: bool = False,
) -> jax.Array:
    scale = float(scale)
    B, L, NH, D = q.shape
    KH = k_cache_l.shape[0]  # head-major cache: [KH, num_slots, D]
    G = NH // KH
    GL = G * L

    # [B, L, KH, G, D] -> [B, KH, G*L, D] with row r = g*L + i
    qr = q.reshape(B, L, KH, G, D).transpose(0, 2, 3, 1, 4).reshape(B, KH, GL, D)
    q_start = positions[:, 0].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, KH),
        in_specs=[
            pl.BlockSpec((1, 1, GL, D), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
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

    def _squeeze_kernel(bt, clen, qs, q_ref, k_hbm, v_hbm, o_ref, *scratch):
        # q_ref/o_ref blocks come in as [1, 1, GL, D]
        _kernel_views(bt, clen, qs, q_ref, k_hbm, v_hbm, o_ref, *scratch,
                      page=page_size, L=L, scale=scale)

    out = pl.pallas_call(
        _squeeze_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, GL, D), q.dtype),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), cache_lens.astype(jnp.int32), q_start, qr,
      k_cache_l, v_cache_l)

    # [B, KH, G*L, D] -> [B, L, NH, D]
    return out.reshape(B, KH, G, L, D).transpose(0, 3, 1, 2, 4).reshape(B, L, NH, D)


def _kernel_views(bt, clen, qs, q_ref, k_hbm, v_hbm, o_ref, *scratch, page, L, scale):
    q2 = q_ref.at[0, 0]
    o2 = o_ref.at[0, 0]
    _kernel(bt, clen, qs, q2, k_hbm, v_hbm, o2, *scratch, page=page, L=L, scale=scale)
