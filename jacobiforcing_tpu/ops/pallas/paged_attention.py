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
  * KV pages stay in HBM; the kernel DMAs PAGES_PER_TILE [page, D] K and V
    slices per loop iteration with double buffering, overlapping DMA with the
    flash-attention online-softmax update;
  * `cache_lens` masks the ragged tail (dead slots are never read -> the
    trim_kv_only_fast contract, reference block_manager.py:534-565);
  * causal masking uses q_start[b] + (row mod L) as the absolute query
    position — all call sites use consecutive positions;
  * VPU economy (the loop is VPU-bound, not HBM-bound): q is pre-scaled by
    softmax_scale * log2(e) so the kernel does exp2 with no per-score scale
    multiply; tiles entirely inside the causal/valid region take a fast path
    with no iota/compare/select; tail pages past the sequence are fetched as
    clamped duplicates of the last valid page instead of zero-filling the
    buffers (dead keys are masked, so values only need to be finite);
  * fp8 KV: per-row dequant scales (ops/kv_cache.py quantize_rows) are
    pre-gathered per sequence OUTSIDE the kernel (the [B, KH, S] fp32 planes
    are ~3% of the page bytes) and staged via block specs; the kernel folds
    the K scale into the score columns and the V scale into the softmax
    probabilities, so both MXU matmuls consume the narrow-cast pages directly
    (no [page, D] dequant pass, and no sublane-misaligned scale DMAs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
import os as _os

# Tile/pipeline geometry, sweepable via env (scripts/probe_attn_kernel.py).
# Pages per loop tile is chosen STATICALLY per compiled shape (_pick_pp): B
# and the block-table width P are static under jit, and the flat-softmax
# probe sweep (scripts/probe_attn_fixed_cost.py) shows 4-page tiles win
# 6-10% once the KV stream is long enough to amortize the wider masked tail
# tile (B>=4 from 1k ctx; B=1 only at 8k), while 2-page tiles win up to 55%
# at short contexts.  JF_PA_PP forces a fixed value.
_PP_ENV = _os.environ.get("JF_PA_PP")
_NBUF = int(_os.environ.get("JF_PA_NBUF", "3"))  # DMA pipeline depth
# Back-compat default for probes that read module state directly.
_PP = int(_PP_ENV) if _PP_ENV else 2
# Intra-tile ILP split (flat softmax only): process each DMA tile as SPLIT
# independent column chunks, each with its own score -> exp2 -> pv chain, so
# Mosaic can overlap chunk c+1's score matmul (MXU) with chunk c's exp2/sum
# (VPU).  The monolithic per-tile chain serializes the units: measured
# 1.0 us/512-key tile vs ~0.3 MXU + ~0.2 VPU roofs.  1 = off.
# Round-3 sweep (scripts/probe_attn_kernel.py, same-day A/B): SPLIT=4 wins
# wherever the per-head kernel runs — B=8/4k 0.406 -> 0.367 ms (-10%),
# B=8/512 -5%, B=16/512 -4%.  NOTE (ADVICE r3): at the swept tile=512
# geometry SPLIT=8 fails the tile % (SPLIT*128) == 0 guard below and
# silently runs UNSPLIT, so the round-3 "SPLIT=8 adds nothing" point
# measured the split-off path; an 8-way split needs tile >= 1024 (pp=4) and
# is unmeasured.  The B<=2 fused-heads path has no split (its loop already
# interleaves heads).
_SPLIT = int(_os.environ.get("JF_PA_SPLIT", "4"))


def _pick_pp(B: int, P: int, page_size: int) -> int:
    if _PP_ENV:
        return int(_PP_ENV)
    slots = P * page_size
    return 4 if (slots >= 8192 or (B >= 4 and slots >= 1024)) else 2

# Max G*T query rows a single program keeps resident in VMEM (measured on
# v5e: 2048 rows of D=128 fit; 14336 does not).  Larger query sets take the
# query-tiled prefill path (_prefill_tiled).  Module-level so tests can lower
# it to exercise the tiled path at CPU-interpretable sizes.
MAX_Q_ROWS = int(_os.environ.get("JF_PA_MAXROWS", "2048"))

# Softmax strategy (probe_attn_fixed_cost.py: the tile loop is VPU-bound at
# 1.39 us/tile vs a 0.77 us/tile DMA+dot skeleton, and the gap is the online-
# softmax bookkeeping — two cross-lane reductions over [GL, tile] f32 plus
# the alpha rescale).
#   "flat"   scores ride the exp2 domain already (scale*log2e is folded into
#            q), so exp2 needs no running max for safety as long as every
#            score stays below the 100-exp2-unit cap (= 69 nats) AND every
#            row's max stays above the f32 underflow floor — true for models
#            with ordinary logit ranges, verified per model by calibration
#            (see below).  The denominator accumulates as an elementwise
#            [rows, tile] f32 partial sum and cross-lane-reduces ONCE per
#            program.  (An MXU variant — dotting each tile's probabilities
#            with a resident [tile, 128] ones block — was tried and measured
#            SLOWER on v5e: at D=128 the extra [GL,tile]@[tile,128] pass
#            doubles the MXU work per tile, 74 -> 135 us at B=1/8k.  Folding
#            a ones column into v has the same cost: any extra column is a
#            full 128-lane MXU tile.  The VPU partial-sum add vectorizes and
#            overlaps the dots; the single final reduction is per program,
#            not per tile.)
#   "online" safe rescaling online softmax (flash-attention update); used for
#            models whose measured logit range exceeds the flat-safe bound.
#
# SELECTION IS CALIBRATED, NOT ASSUMED (round-3 finding): the in-repo TRAINED
# checkpoint measures max |score| = 520 exp2-units (scripts/
# probe_w8a8_and_flatcap.py) — sharp-attention heads (induction/copy heads)
# blow far past the 100-unit cap, where flat saturates (all p -> 2^100) and
# can even underflow whole rows.  Policy (JF_PA_SOFTMAX):
#   "auto" (default): flat iff a calibration bound has been recorded via
#       set_flat_softmax_bound() and it is <= _FLAT_CAP/2 (2x runtime margin);
#       otherwise online.  LLMEngine calibrates at init (before any compile);
#       bench.py calibrates its random-weight model the same way.
#   "flat" / "online": force.  Calibration must happen before the first
#       compile of a shape — the choice is baked into each cached executable.
_SOFTMAX = _os.environ.get("JF_PA_SOFTMAX", "auto")
_FLAT_CAP = 100.0  # exp2-domain score clamp: 2^100 * 512 keys << f32 max

_FLAT_BOUND = None  # calibrated max |score| in exp2 units (None = unknown)


def set_flat_softmax_bound(bound: float) -> None:
    """Record a measured upper bound on |attention score| (exp2 domain) for
    the model about to be served; drives the "auto" softmax policy."""
    global _FLAT_BOUND
    _FLAT_BOUND = float(bound)


def get_flat_softmax_bound():
    return _FLAT_BOUND


def flat_enabled() -> bool:
    """Whether the flat (no-running-max) softmax is safe for the current
    model.  Evaluated at trace time — calibrate before compiling."""
    mode = _os.environ.get("JF_PA_SOFTMAX", _SOFTMAX)
    if mode == "flat":
        return True
    if mode == "online":
        return False
    return _FLAT_BOUND is not None and _FLAT_BOUND <= _FLAT_CAP / 2


def _resolve_flat(softmax) -> bool:
    """Resolve an explicit softmax choice ("flat"/"online") or fall back to
    the calibrated policy.  Kernels take `softmax` as a STATIC argument so
    different choices never collide in the jit cache."""
    if softmax in (None, "auto"):
        return flat_enabled()
    return softmax == "flat"


def _flat_p(sv):
    """exp2 of a flat-softmax score tile (round-5 clamp elision).

    The _FLAT_CAP clamp only guards FORCED-flat runs without a calibrated
    bound: whenever "auto" enabled flat, calibration PROVED every score
    <= cap/2, so min() is the identity — and it is one of the ~4 VPU
    elementwise passes per [rows, tile] element in a loop the fixed-cost
    probe measured as VPU-bound (probe_attn_fixed_cost).  Masked entries
    are -1e30 -> exp2 underflows to exactly 0 on both paths.  Trace-time
    decision, same contract as flat_enabled(): calibrate before compiling.
    """
    if _FLAT_BOUND is not None and _FLAT_BOUND <= _FLAT_CAP / 2:
        return jnp.exp2(sv)
    return jnp.exp2(jnp.minimum(sv, _FLAT_CAP))


def _flat_ok(rows: int, tile: int, D: int, kv_itemsize: int, q_itemsize: int) -> bool:
    """Whether the flat-softmax p_sum scratch fits scoped VMEM (16M on v5e).

    Rough per-program estimate: DMA buffers + acc + p_sum + the [rows, tile]
    f32 score temporary + q/out blocks, with headroom for Mosaic's own
    temporaries.  Oversized cases (f32 caches at prefill scale) fall back to
    the online-softmax kernel.
    """
    scoped = (
        2 * _NBUF * tile * D * kv_itemsize  # kbuf + vbuf
        + rows * D * 4                      # acc
        + rows * tile * 4 * 2               # p_sum + score temporary
        + 2 * rows * D * q_itemsize         # q + out blocks
    )
    return scoped <= 11 * 2**20


def _scratch_shapes(
    GL: int, D: int, tile: int, kv_dtype, flat: bool, pp: int = None,
    q_dtype=jnp.bfloat16,
):
    """VMEM scratch for one program: accumulator + softmax-denominator state.

    Shared with scripts/probe_attn_fixed_cost.py so probes mirror the real
    kernel's scratch layout.
    """
    if pp is None:
        pp = _PP
    base = [
        pltpu.VMEM((_NBUF, tile, D), kv_dtype),
        pltpu.VMEM((_NBUF, tile, D), kv_dtype),
        pltpu.SemaphoreType.DMA((_NBUF, 2 * pp)),
        pltpu.VMEM((GL, D), jnp.float32),  # acc
    ]
    if flat:
        base = base + [pltpu.VMEM((GL, tile), jnp.float32)]  # p_sum
    else:
        base = base + [
            pltpu.VMEM((GL, 1), jnp.float32),  # m_i
            pltpu.VMEM((GL, 1), jnp.float32),  # l_i
        ]
    return base


# NOTE (round 4): a cross-program persistent DMA ring for the per-head grid
# (each program's epilogue prefetching the next (b, h) program's first tiles,
# SMEM-carried ring state) was implemented, interpret-parity-clean, and
# bit-exact on-chip when it completed — but deadlocked NONDETERMINISTICALLY
# under back-to-back grid passes (lax.scan; ~1/3 of runs at some geometries),
# while host-synced sequential dispatches never hung.  The minimal semantics
# probe (scripts/probe_ring_minimal.py) shows cross-program DMA start/wait
# itself works, so the race is in the interaction with Mosaic's own pipeline
# machinery across kernel invocations.  The ring was removed in favor of the
# fused-heads streaming path below, which gets the same fill amortization
# with only within-program DMA semantics and measures faster than the ring
# did (B=8/4k L=32: ring 362 us vs fused+split 217 us).


def _kernel(
    # scalar prefetch
    bt_ref,  # [B, P] int32 page ids
    clen_ref,  # [B] int32 valid KV length
    qstart_ref,  # [B] int32 absolute position of query row i=0
    # inputs
    q_ref,  # [GL, D] VMEM (this program's q tile, pre-scaled by scale*log2e)
    k_hbm,  # [KH, num_slots, D] HBM
    v_hbm,
    ks_ref,  # [1, S] f32 VMEM: this sequence's gathered K scales (or None)
    vs_ref,
    # outputs
    o_ref,  # [GL, D] VMEM
    # scratch
    kbuf, vbuf,  # [NBUF, TILE, D] VMEM
    sem,  # DMA sems [NBUF, 2*PP]
    acc,  # [GL, D] f32
    *softmax_scratch,  # flat: p_sum [GL, TILE] f32; online: m_i, l_i [GL, 1]
    page: int,
    L: int,
    scaled: bool,
    tiled: bool = False,
    flat: bool = None,
    pp: int = None,
):
    if pp is None:
        pp = _PP
    if flat is None:
        flat = flat_enabled()
    if flat:
        (p_sum,) = softmax_scratch
    else:
        m_i, l_i = softmax_scratch
    b = pl.program_id(0)
    h = pl.program_id(1)
    clen = clen_ref[b]
    qstart = qstart_ref[b]
    if tiled:
        # Query-tiled prefill: program qt handles query rows [qt*L, (qt+1)*L).
        qstart = qstart + pl.program_id(2) * jnp.int32(L)
    # Causal bound: no query row in this tile sees keys at positions
    # >= qstart + L, so the KV stream stops there (for decode tiles this
    # equals clen; for early prefill tiles it cuts the loop short).
    kv_limit = jnp.minimum(clen, qstart + jnp.int32(L))
    npages = lax.div(kv_limit + jnp.int32(page - 1), jnp.int32(page))
    GL, D = q_ref.shape

    tile = pp * page
    ntiles = lax.div(npages + jnp.int32(pp - 1), jnp.int32(pp))

    def tile_dmas(slot, t):
        # Unconditional fetch of pp pages; page indices past the end clamp to
        # the last valid page (their key_abs >= clen, so the mask kills them).
        # Unconditional DMAs keep the scalar-core control flow branch-free and
        # remove the need to zero the buffers (duplicate data is finite).
        # page_id clamps at 0: batch-bucket padding rows and block-table tails
        # hold -1, and a negative DMA offset faults the chip (crashes the TPU
        # worker process — hit by any batch smaller than its bucket).
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

    # warm up: fill the pipeline
    for t0 in range(_NBUF):
        @pl.when(t0 < ntiles)
        def _():
            for dma in tile_dmas(jnp.int32(t0), jnp.int32(t0)):
                dma.start()

    acc[...] = jnp.zeros_like(acc)
    if flat:
        p_sum[...] = jnp.zeros_like(p_sum)
    else:
        m_i[...] = jnp.full_like(m_i, _NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)

    q = q_ref[...]  # [GL, D] native dtype: MXU runs bf16 at full rate
    row = lax.broadcasted_iota(jnp.int32, (GL, 1), 0)
    qpos = qstart + lax.rem(row, jnp.int32(L))  # [GL, 1] absolute query positions

    # Intra-tile ILP split: only the flat path qualifies (the online-softmax
    # m_i/alpha chain is sequential across columns) and chunk widths must be
    # whole lanes.
    nsplit = _SPLIT if (flat and _SPLIT > 1 and tile % (_SPLIT * 128) == 0) else 1

    def body(t, _):
        slot = lax.rem(t, jnp.int32(_NBUF))
        for dma in tile_dmas(slot, t):
            dma.wait()

        if nsplit > 1:
            CW = tile // nsplit
            is_full = ((t + 1) * tile <= qstart + 1) & ((t + 1) * tile <= clen)

            def chunk_scores():
                out = []
                for c in range(nsplit):
                    kc = kbuf[slot, pl.ds(c * CW, CW)].astype(q.dtype)
                    sc = lax.dot_general(
                        q, kc,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [GL, CW] f32, exp2 domain
                    if scaled:
                        sc = sc * ks_ref[:, pl.ds(t * tile + c * CW, CW)]
                    out.append(sc)
                return out

            def update_chunks(svs):
                # per-chunk exp2/p_sum (VPU) interleaves with the next
                # chunk's pv matmul (MXU); one acc store at the end
                parts = []
                for c, sv in enumerate(svs):
                    p_ij = _flat_p(sv)
                    p_sum[:, c * CW : (c + 1) * CW] += p_ij
                    if scaled:
                        pv = (
                            p_ij * vs_ref[:, pl.ds(t * tile + c * CW, CW)]
                        ).astype(q.dtype)
                    else:
                        pv = p_ij.astype(q.dtype)
                    vc = vbuf[slot, pl.ds(c * CW, CW)].astype(q.dtype)
                    parts.append(lax.dot_general(
                        pv, vc,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ))
                total = parts[0]
                for p in parts[1:]:
                    total = total + p
                acc[...] += total

            @pl.when(is_full)
            def _():
                update_chunks(chunk_scores())

            @pl.when(~is_full)
            def _():
                svs = chunk_scores()
                masked = []
                for c, sv in enumerate(svs):
                    key_abs = (
                        t * tile + c * CW
                        + lax.broadcasted_iota(jnp.int32, (GL, CW), 1)
                    )
                    mask = (key_abs <= qpos) & (key_abs < clen)
                    masked.append(jnp.where(mask, sv, _NEG_INF))
                update_chunks(masked)

            @pl.when(t + _NBUF < ntiles)
            def _():
                for dma in tile_dmas(slot, t + _NBUF):
                    dma.start()

            return 0

        k = kbuf[slot].astype(q.dtype)  # [TILE, D] (cast covers f8/int8 KV)
        v = vbuf[slot].astype(q.dtype)
        s = lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [GL, TILE] f32; scale*log2e is folded into q -> exp2 domain
        if scaled:
            # dequant K folded into the scores: column j scales by its key
            # row's scale ((q . k_q) * ks == q . (k_q * ks))
            s = s * ks_ref[:, pl.ds(t * tile, tile)]  # [1, TILE] broadcast

        if flat:
            def update(sv):
                # masked scores are -1e30 -> exp2 underflows to exactly 0
                p_ij = _flat_p(sv)
                p_sum[...] += p_ij
                if scaled:
                    # dequant V folded into the probabilities:
                    # p @ (v_q * vs) == (p * vs) @ v_q  (p_sum uses true p)
                    pv = (p_ij * vs_ref[:, pl.ds(t * tile, tile)]).astype(q.dtype)
                else:
                    pv = p_ij.astype(q.dtype)
                acc[...] += lax.dot_general(
                    pv, v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            def update(sv):
                m_new = jnp.maximum(m_i[...], jnp.max(sv, axis=1, keepdims=True))
                alpha = jnp.exp2(m_i[...] - m_new)
                p_ij = jnp.exp2(sv - m_new)
                l_i[...] = alpha * l_i[...] + jnp.sum(p_ij, axis=1, keepdims=True)
                if scaled:
                    pv = (p_ij * vs_ref[:, pl.ds(t * tile, tile)]).astype(q.dtype)
                else:
                    pv = p_ij.astype(q.dtype)
                acc[...] = acc[...] * alpha + lax.dot_general(
                    pv, v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_i[...] = m_new

        # A tile whose last key (t+1)*tile-1 is visible to every query row
        # (<= min qpos = qstart) and within the live KV needs no mask at all —
        # that is every tile except the last ~L/tile ones, so the masked path
        # runs O(1) times per program.
        is_full = ((t + 1) * tile <= qstart + 1) & ((t + 1) * tile <= clen)

        @pl.when(is_full)
        def _():
            update(s)

        @pl.when(~is_full)
        def _():
            key_abs = t * tile + lax.broadcasted_iota(jnp.int32, (GL, tile), 1)
            mask = (key_abs <= qpos) & (key_abs < clen)
            update(jnp.where(mask, s, _NEG_INF))

        # refill the slot we just consumed (pipeline depth NBUF-1 behind it)
        @pl.when(t + _NBUF < ntiles)
        def _():
            for dma in tile_dmas(slot, t + _NBUF):
                dma.start()

        return 0

    lax.fori_loop(jnp.int32(0), ntiles, body, 0)

    if flat:
        # one cross-lane reduction for the whole program
        l = jnp.sum(p_sum[...], axis=1, keepdims=True)
    else:
        l = l_i[...]
    o_ref[...] = (acc[...] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _kernel_fused(
    # scalar prefetch
    bt_ref,  # [B, P] int32 page ids
    clen_ref,  # [B] int32 valid KV length
    qstart_ref,  # [B] int32 absolute position of query row i=0
    # inputs
    q_ref,  # [KH, GL, D] VMEM (all kv heads' q tiles, pre-scaled)
    k_hbm,  # [KH, num_slots, D] HBM
    v_hbm,
    ks_ref,  # [KH, 1, S] f32 VMEM gathered K scales (or None)
    vs_ref,
    # outputs
    o_ref,  # [KH, GL, D] VMEM
    # scratch
    kbuf, vbuf,  # [NBUF, TILE, D] VMEM
    sem,  # DMA sems [NBUF, 2*PP]
    acc,  # [GL, D] f32 (current head only)
    *softmax_scratch,  # flat: p_sum [GL, TILE]; online: m_i, l_i [GL, 1]
    page: int,
    L: int,
    scaled: bool,
    flat: bool = None,
    pp: int = None,
):
    """Fused-heads decode kernel: one program per sequence, all KH kv heads.

    The (B, KH) grid pays a pipeline fill + program prologue per (b, h); at
    small B x short context (a few KV tiles per head) that fixed cost
    dominates.  Here the loop runs over the flattened (head, tile) stream, so
    the DMA pipeline crosses head boundaries without draining — heads are
    processed sequentially with single-head accumulators reset at each head's
    first tile and written out at its last.  Same g-major row layout as
    `_kernel` (row r = g*L + i), so the dispatcher glue is shared.
    """
    if pp is None:
        pp = _PP
    if flat is None:
        flat = flat_enabled()
    if flat:
        (p_sum,) = softmax_scratch
    else:
        m_i, l_i = softmax_scratch
    b = pl.program_id(0)
    clen = clen_ref[b]
    qstart = qstart_ref[b]
    kv_limit = jnp.minimum(clen, qstart + jnp.int32(L))
    npages = lax.div(kv_limit + jnp.int32(page - 1), jnp.int32(page))
    KH, GL, D = q_ref.shape

    tile = pp * page
    ntiles = lax.div(npages + jnp.int32(pp - 1), jnp.int32(pp))
    total = jnp.int32(KH) * ntiles

    def tile_dmas(slot, t):
        # flattened stream: t -> (head, tile-in-head); same clamped
        # branch-free fetch as _kernel (page ids past the end duplicate the
        # last valid page; -1 padding rows clamp to 0)
        h = lax.div(t, ntiles)
        tt = t - h * ntiles
        out = []
        for j in range(pp):
            p = jnp.minimum(pp * tt + jnp.int32(j), npages - 1)
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
        @pl.when(t0 < total)
        def _():
            for dma in tile_dmas(jnp.int32(t0), jnp.int32(t0)):
                dma.start()

    row = lax.broadcasted_iota(jnp.int32, (GL, 1), 0)
    qpos = qstart + lax.rem(row, jnp.int32(L))

    # Intra-tile ILP split, same rule as _kernel: flat path only (the online
    # m_i/alpha chain is sequential across columns), whole-lane chunks.
    nsplit = _SPLIT if (flat and _SPLIT > 1 and tile % (_SPLIT * 128) == 0) else 1

    def body(t, _):
        h = lax.div(t, ntiles)
        tt = t - h * ntiles
        slot = lax.rem(t, jnp.int32(_NBUF))
        for dma in tile_dmas(slot, t):
            dma.wait()

        @pl.when(tt == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)
            if flat:
                p_sum[...] = jnp.zeros_like(p_sum)
            else:
                m_i[...] = jnp.full_like(m_i, _NEG_INF)
                l_i[...] = jnp.zeros_like(l_i)

        q = q_ref[pl.ds(h, 1)].reshape(GL, D)
        is_full = ((tt + 1) * tile <= qstart + 1) & ((tt + 1) * tile <= clen)

        if nsplit > 1:
            # per-chunk score -> exp2/p_sum -> pv chains so Mosaic overlaps
            # chunk c+1's score matmul (MXU) with chunk c's exp2/sum (VPU)
            CW = tile // nsplit

            def chunk_scores():
                out = []
                for c in range(nsplit):
                    kc = kbuf[slot, pl.ds(c * CW, CW)].astype(q.dtype)
                    sc = lax.dot_general(
                        q, kc,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [GL, CW] f32, exp2 domain
                    if scaled:
                        sc = sc * ks_ref[
                            pl.ds(h, 1), :, pl.ds(tt * tile + c * CW, CW)
                        ].reshape(1, CW)
                    out.append(sc)
                return out

            def update_chunks(svs):
                parts = []
                for c, sv in enumerate(svs):
                    p_ij = _flat_p(sv)
                    p_sum[:, c * CW : (c + 1) * CW] += p_ij
                    if scaled:
                        pv = (
                            p_ij
                            * vs_ref[
                                pl.ds(h, 1), :, pl.ds(tt * tile + c * CW, CW)
                            ].reshape(1, CW)
                        ).astype(q.dtype)
                    else:
                        pv = p_ij.astype(q.dtype)
                    vc = vbuf[slot, pl.ds(c * CW, CW)].astype(q.dtype)
                    parts.append(lax.dot_general(
                        pv, vc,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ))
                total_pv = parts[0]
                for p in parts[1:]:
                    total_pv = total_pv + p
                acc[...] += total_pv

            @pl.when(is_full)
            def _():
                update_chunks(chunk_scores())

            @pl.when(~is_full)
            def _():
                svs = chunk_scores()
                masked = []
                for c, sv in enumerate(svs):
                    key_abs = (
                        tt * tile + c * CW
                        + lax.broadcasted_iota(jnp.int32, (GL, CW), 1)
                    )
                    mask = (key_abs <= qpos) & (key_abs < clen)
                    masked.append(jnp.where(mask, sv, _NEG_INF))
                update_chunks(masked)
        else:
            k = kbuf[slot].astype(q.dtype)
            v = vbuf[slot].astype(q.dtype)
            s = lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [GL, TILE] f32, exp2 domain
            if scaled:
                s = s * ks_ref[pl.ds(h, 1), :, pl.ds(tt * tile, tile)].reshape(
                    1, tile
                )

            if flat:
                def update(sv):
                    p_ij = _flat_p(sv)
                    p_sum[...] += p_ij
                    if scaled:
                        pv = (
                            p_ij
                            * vs_ref[pl.ds(h, 1), :, pl.ds(tt * tile, tile)]
                            .reshape(1, tile)
                        ).astype(q.dtype)
                    else:
                        pv = p_ij.astype(q.dtype)
                    acc[...] += lax.dot_general(
                        pv, v,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            else:
                def update(sv):
                    m_new = jnp.maximum(m_i[...], jnp.max(sv, axis=1, keepdims=True))
                    alpha = jnp.exp2(m_i[...] - m_new)
                    p_ij = jnp.exp2(sv - m_new)
                    l_i[...] = alpha * l_i[...] + jnp.sum(p_ij, axis=1, keepdims=True)
                    if scaled:
                        pv = (
                            p_ij
                            * vs_ref[pl.ds(h, 1), :, pl.ds(tt * tile, tile)]
                            .reshape(1, tile)
                        ).astype(q.dtype)
                    else:
                        pv = p_ij.astype(q.dtype)
                    acc[...] = acc[...] * alpha + lax.dot_general(
                        pv, v,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    m_i[...] = m_new

            @pl.when(is_full)
            def _():
                update(s)

            @pl.when(~is_full)
            def _():
                key_abs = tt * tile + lax.broadcasted_iota(jnp.int32, (GL, tile), 1)
                mask = (key_abs <= qpos) & (key_abs < clen)
                update(jnp.where(mask, s, _NEG_INF))

        @pl.when(t + _NBUF < total)
        def _():
            for dma in tile_dmas(lax.rem(t + _NBUF, jnp.int32(_NBUF)), t + _NBUF):
                dma.start()

        @pl.when(tt == ntiles - 1)
        def _():
            if flat:
                l = jnp.sum(p_sum[...], axis=1, keepdims=True)
            else:
                l = l_i[...]
            o_ref[pl.ds(h, 1)] = (
                (acc[...] / jnp.maximum(l, 1e-30))
                .astype(o_ref.dtype)
                .reshape(1, GL, D)
            )

        return 0

    lax.fori_loop(jnp.int32(0), total, body, 0)


@functools.partial(
    jax.jit, static_argnames=("scale", "page_size", "interpret", "softmax")
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
    softmax: str = None,  # None/"auto" = calibrated policy; "flat"/"online"
) -> jax.Array:
    scale = float(scale)
    B, L, NH, D = q.shape
    KH = k_cache_l.shape[0]  # head-major cache: [KH, num_slots, D]
    G = NH // KH
    GL = G * L
    scaled = k_scale_l is not None

    if GL > MAX_Q_ROWS:
        # Prefill-scale T: tile the queries over a third grid axis so VMEM
        # holds only G*QT rows per program (flash-attention query tiling).
        return _prefill_tiled(
            q, k_cache_l, v_cache_l, block_tables, cache_lens, positions,
            scale, page_size=page_size, interpret=interpret,
            k_scale_l=k_scale_l, v_scale_l=v_scale_l, softmax=softmax,
        )

    # [B, L, KH, G, D] -> [B, KH, G*L, D] with row r = g*L + i.  Fold the
    # softmax scale and the exp->exp2 conversion into q once (f32 multiply
    # before the cast back) so the kernel's score pass is a bare matmul.
    qr = q.reshape(B, L, KH, G, D).transpose(0, 2, 3, 1, 4).reshape(B, KH, GL, D)
    qr = (qr.astype(jnp.float32) * (scale * math.log2(math.e))).astype(q.dtype)
    q_start = positions[:, 0].astype(jnp.int32)
    pp = _pick_pp(B, block_tables.shape[1], page_size)
    # Scaled (fp8/int8) KV keeps the exact online softmax: the dequant fold
    # makes pre-scale scores data-dependent in magnitude, and the flat cap
    # corrupts softmax whenever any exp2-domain score exceeds it (the fp8
    # stress test drives +-48-magnitude values straight through that).
    flat = (
        _resolve_flat(softmax)
        and not scaled
        and _flat_ok(
            GL, pp * page_size, D, k_cache_l.dtype.itemsize, q.dtype.itemsize
        )
    )

    # Fused-heads streaming path: all KH heads in one program per sequence,
    # the DMA pipeline crossing head boundaries without draining.  Round 2
    # gated this to B*KH <= 8 off a pre-split measurement ("at B >= 4
    # per-head wins"); the round-4 same-day A/B with the intra-tile split
    # added to the fused loop reversed that everywhere it fits (L=32:
    # B=8/1k 178 -> 123 us, B=16/1k 269 -> 212, B=8/4k 386 -> 217 = 2.7x
    # HBM roof; L=64: B=1/8k 105 -> 90 us), so the fused stream is now the
    # default whenever all heads' q rows fit in VMEM; the per-head (B, KH)
    # grid remains for KH*GL > MAX_Q_ROWS (e.g. L=128 blocks at G=7).
    fused = (
        B * KH <= int(_os.environ.get("JF_PA_FUSEH_MAX", "1024"))
        and KH * GL <= MAX_Q_ROWS
        # Mosaic can only slice the head axis of the [KH, GL, D] q block when
        # the GL (sublane) dim is tile-aligned: GL % 8, or a sub-8 power of
        # two (packed sub-tiles).  GL=7 (Qwen-7B GQA at L=1, i.e. AR decode)
        # fails with "Slice shape along dimension 2 must be aligned to
        # tiling (8), but is 7" — found round 5 via the MR re-entry forward;
        # unaligned GL falls back to the per-head (B, KH) grid, the shipped
        # AR path of rounds 1-3.
        and (GL % 8 == 0 or GL in (1, 2, 4))
        and _os.environ.get("JF_PA_FUSEH", "1") != "0"
    )

    in_specs = [
        pl.BlockSpec((1, KH, GL, D), lambda b, *_: (b, 0, 0, 0))
        if fused
        else pl.BlockSpec((1, 1, GL, D), lambda b, h, *_: (b, h, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [block_tables.astype(jnp.int32), cache_lens.astype(jnp.int32),
            q_start, qr, k_cache_l, v_cache_l]
    if scaled:
        from jacobiforcing_tpu.ops.kv_cache import gather_scales

        P = block_tables.shape[1]
        # pad the gathered plane to whole tiles (tail pages read the clamped
        # last page, which the causal/len mask already zeroes); the dummy
        # axis makes the block's trailing dims (1, S) equal the array's, which
        # the Mosaic block-shape rules require
        S_pad = ((P + pp - 1) // pp) * pp * page_size
        def gather_plane(scale_l):
            g = gather_scales(scale_l, block_tables, page_size)  # [B, S, KH]
            g = g.transpose(0, 2, 1)  # [B, KH, S]
            g = jnp.pad(g, ((0, 0), (0, 0), (0, S_pad - g.shape[-1])))
            return g[:, :, None, :]  # [B, KH, 1, S_pad]
        args += [gather_plane(k_scale_l), gather_plane(v_scale_l)]
        if fused:
            in_specs += [
                pl.BlockSpec((1, KH, 1, S_pad), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, KH, 1, S_pad), lambda b, *_: (b, 0, 0, 0)),
            ]
        else:
            in_specs += [
                pl.BlockSpec((1, 1, 1, S_pad), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, 1, S_pad), lambda b, h, *_: (b, h, 0, 0)),
            ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,) if fused else (B, KH),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, KH, GL, D), lambda b, *_: (b, 0, 0, 0))
            if fused
            else pl.BlockSpec((1, 1, GL, D), lambda b, h, *_: (b, h, 0, 0))
        ),
        scratch_shapes=_scratch_shapes(
            GL, D, pp * page_size, k_cache_l.dtype, flat, pp=pp,
            q_dtype=q.dtype,
        ),
    )

    def _squeeze_kernel(bt, clen, qs, *rest):
        if scaled:
            q_ref, k_hbm, v_hbm, ks_ref, vs_ref, o_ref = rest[:6]
            scratch = rest[6:]
        else:
            q_ref, k_hbm, v_hbm, o_ref = rest[:4]
            scratch = rest[4:]
            ks_ref = vs_ref = None
        if fused:
            _kernel_fused(
                bt, clen, qs, q_ref.at[0], k_hbm, v_hbm,
                ks_ref.at[0] if scaled else None,
                vs_ref.at[0] if scaled else None,
                o_ref.at[0], *scratch,
                page=page_size, L=L, scaled=scaled, pp=pp, flat=flat,
            )
        else:
            _kernel(
                bt, clen, qs, q_ref.at[0, 0], k_hbm, v_hbm,
                ks_ref.at[0, 0] if scaled else None,
                vs_ref.at[0, 0] if scaled else None,
                o_ref.at[0, 0], *scratch,
                page=page_size, L=L, scaled=scaled, pp=pp, flat=flat,
            )

    out = pl.pallas_call(
        _squeeze_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, GL, D), q.dtype),
        interpret=interpret,
    )(*args)

    # [B, KH, G*L, D] -> [B, L, NH, D]
    return out.reshape(B, KH, G, L, D).transpose(0, 3, 1, 2, 4).reshape(B, L, NH, D)


def _prefill_tiled(
    q: jax.Array,  # [B, T, NH, D] prefill-scale T (G*T > MAX_Q_ROWS)
    k_cache_l: jax.Array,  # [KH, num_slots, D]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [B, P]
    cache_lens: jax.Array,  # [B]
    positions: jax.Array,  # [B, T] consecutive
    scale: float,
    *,
    page_size: int,
    interpret: bool = False,
    k_scale_l=None,
    v_scale_l=None,
    softmax: str = None,
) -> jax.Array:
    """Query-tiled flash prefill over the paged cache.

    Same online-softmax loop as the decode kernel, with a third grid axis
    tiling the T queries into QT-row chunks so each program holds only G*QT
    rows in VMEM.  Program (b, h, qt) covers absolute query positions
    [qstart_b + qt*QT, qstart_b + (qt+1)*QT); its KV stream is causally
    bounded at qstart + QT, so early tiles run short loops (total KV traffic
    ~ T^2/2 keys per kv head — the flash-attention prefill schedule).

    Replaces the XLA fallback for context (a) of the reference's three
    flash-attn call sites (inference_engine/layers/attention.py:142-151,
    varlen prefill with prefix-cache block tables), which materializes dense
    [KH, G, T, S] score tensors at prefill scale.
    """
    B, T, NH, D = q.shape
    KH = k_cache_l.shape[0]
    G = NH // KH
    QT = max(128, (MAX_Q_ROWS // G) // 128 * 128)
    nqt = -(-T // QT)
    T_pad = nqt * QT
    GQT = G * QT
    scaled = k_scale_l is not None

    # [B, T, NH, D] -> [B, KH, nqt, G*QT, D], row r = g*QT + i within a tile.
    qr = q.reshape(B, T, KH, G, D).transpose(0, 2, 3, 1, 4)  # [B, KH, G, T, D]
    qr = jnp.pad(qr, ((0, 0), (0, 0), (0, 0), (0, T_pad - T), (0, 0)))
    qr = qr.reshape(B, KH, G, nqt, QT, D).transpose(0, 1, 3, 2, 4, 5)
    qr = qr.reshape(B, KH, nqt, GQT, D)
    qr = (qr.astype(jnp.float32) * (scale * math.log2(math.e))).astype(q.dtype)
    q_start = positions[:, 0].astype(jnp.int32)
    # 2-page tiles: prefill-scale query rows make the [GQT, tile] f32 score
    # and p_sum blocks the VMEM bottleneck, and the long per-program KV
    # stream is MXU-bound anyway
    pp = 2
    flat = (
        _resolve_flat(softmax)
        and not scaled  # see the decode dispatcher: scaled KV stays online
        and _flat_ok(
            GQT, pp * page_size, D, k_cache_l.dtype.itemsize, q.dtype.itemsize
        )
    )

    in_specs = [
        pl.BlockSpec((1, 1, 1, GQT, D), lambda b, h, t, *_: (b, h, t, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [block_tables.astype(jnp.int32), cache_lens.astype(jnp.int32),
            q_start, qr, k_cache_l, v_cache_l]
    if scaled:
        from jacobiforcing_tpu.ops.kv_cache import gather_scales

        P = block_tables.shape[1]
        S_pad = ((P + pp - 1) // pp) * pp * page_size

        def gather_plane(scale_l):
            g = gather_scales(scale_l, block_tables, page_size)  # [B, S, KH]
            g = g.transpose(0, 2, 1)
            g = jnp.pad(g, ((0, 0), (0, 0), (0, S_pad - g.shape[-1])))
            return g[:, :, None, :]  # [B, KH, 1, S_pad]

        args += [gather_plane(k_scale_l), gather_plane(v_scale_l)]
        in_specs += [
            pl.BlockSpec((1, 1, 1, S_pad), lambda b, h, t, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, S_pad), lambda b, h, t, *_: (b, h, 0, 0)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, KH, nqt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 1, GQT, D), lambda b, h, t, *_: (b, h, t, 0, 0)),
        scratch_shapes=_scratch_shapes(
            GQT, D, pp * page_size, k_cache_l.dtype, flat, pp=pp, q_dtype=q.dtype
        ),
    )

    def _squeeze_kernel(bt, clen, qs, *rest):
        if scaled:
            q_ref, k_hbm, v_hbm, ks_ref, vs_ref, o_ref = rest[:6]
            scratch = rest[6:]
            ks2, vs2 = ks_ref.at[0, 0], vs_ref.at[0, 0]
        else:
            q_ref, k_hbm, v_hbm, o_ref = rest[:4]
            scratch = rest[4:]
            ks2 = vs2 = None
        _kernel(
            bt, clen, qs, q_ref.at[0, 0, 0], k_hbm, v_hbm, ks2, vs2,
            o_ref.at[0, 0, 0], *scratch,
            page=page_size, L=QT, scaled=scaled, tiled=True, pp=pp, flat=flat,
        )

    out = pl.pallas_call(
        _squeeze_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, nqt, GQT, D), q.dtype),
        interpret=interpret,
    )(*args)

    # [B, KH, nqt, G*QT, D] -> [B, T, NH, D]
    out = out.reshape(B, KH, nqt, G, QT, D).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, KH, G, T_pad, D)[:, :, :, :T]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, NH, D)
