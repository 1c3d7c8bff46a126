"""Paged causal attention — the single attention path for all decode contexts.

Replaces the reference's three flash-attn call sites
(inference_engine/layers/attention.py:104-157):

  (a) varlen prefill (optionally with prefix-cache block tables),
  (b) B x L Jacobi query blocks against paged KV with `cache_seqlens`
      semantics (stale tail slots ignored WITHOUT zeroing),
  (c) 1-token decode,

with ONE function: queries [B, T, H, D] at absolute `positions` attend to the
paged cache through `block_tables`, masked by `key_pos <= query_pos` and
`key_pos < cache_lens`.  Using the same kernel for AR decode and Jacobi blocks
makes greedy argmax bit-stable across the two paths — the exact-match
correctness criterion of the reference test
(inference_engine/tests/test_jacobi_decoding_greedy.py:313-360).

Two implementations:
  * `paged_attention_xla` — gather pages + masked softmax; correctness
    reference, runs everywhere (CPU tests).
  * `paged_attention_pallas` — Pallas TPU kernel (ops/pallas/), reads KV pages
    from HBM with double-buffered DMA; used on TPU when enabled.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from jacobiforcing_tpu.ops.kv_cache import gather_pages, gather_scales

_NEG_INF = -1e30

# ---------------------------------------------------------------------------
# Debug-mode flat-softmax guard (JF_PA_GUARD=1): whenever the Pallas path
# runs with the FLAT softmax, also compute the masked exp2-domain score max
# in XLA and flag (loudly, via host callback) any score past the flat cap —
# a mis-calibrated model fails visibly instead of silently distorting
# (`exp2(min(s, cap))` saturates above the cap).  Costs roughly a second
# attention pass; debug only.
_GUARD_STATE = {"tripped": False, "max_seen": 0.0}


def _guard_enabled() -> bool:
    return os.environ.get("JF_PA_GUARD", "0") == "1"


def guard_tripped() -> bool:
    return _GUARD_STATE["tripped"]


def guard_max_seen() -> float:
    return _GUARD_STATE["max_seen"]


def reset_guard() -> None:
    _GUARD_STATE["tripped"] = False
    _GUARD_STATE["max_seen"] = 0.0


def _guard_cb(mx) -> None:
    import sys

    from jacobiforcing_tpu.ops.pallas.paged_attention import _FLAT_CAP

    mx = float(mx)
    _GUARD_STATE["max_seen"] = max(_GUARD_STATE["max_seen"], mx)
    if mx > _FLAT_CAP and not _GUARD_STATE["tripped"]:
        _GUARD_STATE["tripped"] = True
        print(
            f"[JF_PA_GUARD] flat-softmax cap EXCEEDED: max attention score"
            f" {mx:.1f} exp2-units > cap {_FLAT_CAP:.0f} — flat-path outputs"
            f" are distorted; recalibrate (ops/calibrate.py) or set"
            f" JF_PA_SOFTMAX=online",
            file=sys.stderr, flush=True,
        )


def _emit_flat_guard(scores_exp2: jax.Array, mask: jax.Array) -> None:
    """scores_exp2: any-rank score tensor already in exp2 units; mask:
    broadcastable validity mask."""
    mx = jnp.max(jnp.where(mask, scores_exp2, -jnp.inf))
    jax.debug.callback(_guard_cb, mx)


def kernel_feasible(q, k_cache_l, page_size: int, max_rows: int | None = 2048) -> bool:
    """Whether the Pallas decode/spec kernels can serve this shape.

    Constraints: lane-aligned head_dim, sublane-aligned page, bf16/f32 q, and
    (when `max_rows` is set) a bounded query tile — the spec kernel keeps all
    G*T query rows (plus a [G*T, tile] score block) resident in VMEM, which
    fits for decode blocks (L <= 128) but OOMs at prefill scale (measured on
    v5e: G*T = 14336 needs 21.75M scoped VMEM vs the 16M limit).  The paged
    decode kernel has no row cap: prefill-scale query sets take its
    query-tiled path (ops/pallas/paged_attention._prefill_tiled), so callers
    pass max_rows=None for it.
    """
    B, T, NH, D = q.shape
    KH = k_cache_l.shape[0]
    return (
        D % 128 == 0
        and page_size % 16 == 0
        and q.dtype in (jnp.bfloat16, jnp.float32)
        and (max_rows is None or (NH // KH) * T <= max_rows)
    )


def _interpret() -> bool:
    """JF_PA_INTERPRET=1 runs the kernels in Pallas interpret mode (CPU mesh
    tests force the Pallas path with JF_ATTN_IMPL=pallas + this)."""
    return os.environ.get("JF_PA_INTERPRET", "0") == "1"


def _serving_mesh_for(q, k_cache_l):
    """(mesh, xla_fallback): how the kernel dispatch must handle the
    registered serving mesh.

    GSPMD cannot partition a Pallas custom call, so under a (data, model)
    mesh the dispatchers wrap the kernel in jax.shard_map: KV heads shard
    over "model" (attention is shard-local — the reference divides KV heads
    per rank, model_runner.py:529), batch shards over "data".  Returns
    (None, False) when no sharded mesh is registered (bare kernel is fine),
    (mesh, False) when the shapes divide its axes (shard_map the kernel),
    and (None, True) when a sharded mesh is registered but the shapes don't
    divide — the caller MUST use the partitionable XLA path."""
    from jacobiforcing_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, get_serving_mesh

    mesh = get_serving_mesh()
    if mesh is None:
        return None, False
    dp = mesh.shape.get(DATA_AXIS, 1)
    tp = mesh.shape.get(MODEL_AXIS, 1)
    if dp == 1 and tp == 1:
        return None, False
    B = q.shape[0]
    KH = k_cache_l.shape[0]
    if KH % tp != 0 or B % dp != 0:
        return None, True
    return mesh, False


def _tp_specs(mesh):
    from jax.sharding import PartitionSpec as P

    from jacobiforcing_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    d = DATA_AXIS if mesh.shape.get(DATA_AXIS, 1) > 1 else None
    m = MODEL_AXIS if mesh.shape.get(MODEL_AXIS, 1) > 1 else None
    return {
        "q": P(d, None, m, None),  # [B, T, NH, D] heads over model
        "cache": P(m, None, None),  # [KH, slots, D]
        "scale": P(m, None),  # [KH, slots]
        "bt": P(d, None),  # [B, P]
        "len": P(d,),  # [B]
        "mask": P(d, None, None),  # [B, T, T]
        "knew": P(d, None, m, None),  # [B, T, KH, D]
    }


def _gather_dequant(cache_l, scale_l, block_tables, page_size, dtype):
    """Gather pages; apply per-row fp8 dequant scales when present."""
    x = gather_pages(cache_l, block_tables, page_size).astype(dtype)  # [B,S,KH,D]
    if scale_l is not None:
        s = gather_scales(scale_l, block_tables, page_size)  # [B, S, KH]
        x = x * s[..., None].astype(dtype)
    return x


def _guard_decode_scores(
    q, k_cache_l, block_tables, cache_lens, positions, scale, page_size,
    k_scale_l,
):
    import math

    B, T, NH, D = q.shape
    KH = k_cache_l.shape[0]
    G = NH // KH
    k = _gather_dequant(k_cache_l, k_scale_l, block_tables, page_size, jnp.float32)
    S = k.shape[1]
    qg = q.astype(jnp.float32).reshape(B, T, KH, G, D).transpose(0, 2, 3, 1, 4)
    s = jnp.einsum("bhgtd,bhsd->bhgts", qg, k.transpose(0, 2, 1, 3)) * (
        scale * math.log2(math.e)
    )
    key_pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = key_pos < cache_lens[:, None]
    causal = key_pos[:, None, :] <= positions[:, :, None]
    mask = (valid[:, None, :] & causal)[:, None, None, :, :]
    _emit_flat_guard(s, mask)


def _guard_spec_scores(
    q, k_cache_l, block_tables, cache_lens, k_new, intra_mask, scale,
    page_size, k_scale_l,
):
    import math

    B, T, NH, D = q.shape
    KH = k_cache_l.shape[0]
    G = NH // KH
    e = scale * math.log2(math.e)
    k = _gather_dequant(k_cache_l, k_scale_l, block_tables, page_size, jnp.float32)
    S = k.shape[1]
    qg = q.astype(jnp.float32).reshape(B, T, KH, G, D).transpose(0, 2, 3, 1, 4)
    sc = jnp.einsum("bhgtd,bhsd->bhgts", qg, k.transpose(0, 2, 1, 3)) * e
    valid_c = (
        jnp.arange(S, dtype=jnp.int32)[None, :] < cache_lens[:, None]
    )[:, None, None, None, :]
    sb = jnp.einsum("bhgtd,bshd->bhgts", qg, k_new.astype(jnp.float32)) * e
    mx = jnp.maximum(
        jnp.max(jnp.where(valid_c, sc, -jnp.inf)),
        jnp.max(jnp.where(intra_mask[:, None, None, :, :], sb, -jnp.inf)),
    )
    jax.debug.callback(_guard_cb, mx)


def paged_attention_xla(
    q: jax.Array,  # [B, T, NH, D]
    k_cache_l: jax.Array,  # [KH, num_slots, D]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [B, P]
    cache_lens: jax.Array,  # [B] valid KV length (incl. this call's tokens)
    positions: jax.Array,  # [B, T] absolute query positions
    scale: float,
    *,
    page_size: int,
    k_scale_l: Optional[jax.Array] = None,  # [KH, num_slots] fp8 dequant rows
    v_scale_l: Optional[jax.Array] = None,
) -> jax.Array:
    B, T, NH, D = q.shape
    KH = k_cache_l.shape[0]
    groups = NH // KH

    # Cast to the query dtype: keeps the scan carry dtype-stable even when the
    # KV cache runs at a different precision (e.g. int8/fp8 KV later).
    k = _gather_dequant(k_cache_l, k_scale_l, block_tables, page_size, q.dtype)
    v = _gather_dequant(v_cache_l, v_scale_l, block_tables, page_size, q.dtype)
    S = k.shape[1]

    # [B, KH, G, T, D] x [B, KH, S, D] -> [B, KH, G, T, S]
    acc = jnp.promote_types(q.dtype, jnp.float32)
    qg = q.reshape(B, T, KH, groups, D).transpose(0, 2, 3, 1, 4)
    kt = k.transpose(0, 2, 1, 3)  # [B, KH, S, D]
    scores = jnp.einsum(
        "bhgtd,bhsd->bhgts", qg, kt, preferred_element_type=acc
    ) * scale

    key_pos = jnp.arange(S, dtype=jnp.int32)[None, :]  # key j sits at position j
    valid = key_pos < cache_lens[:, None]  # [B, S]
    causal = key_pos[:, None, :] <= positions[:, :, None]  # [B, T, S]
    mask = (valid[:, None, :] & causal)[:, None, None, :, :]  # [B,1,1,T,S]
    scores = jnp.where(mask, scores, _NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    vt = v.transpose(0, 2, 1, 3)  # [B, KH, S, D]
    out = jnp.einsum("bhgts,bhsd->bhgtd", probs, vt)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, NH, D)


def paged_attention_with_block(
    q: jax.Array,  # [B, T, NH, D]
    k_cache_l: jax.Array,  # [KH, num_slots, D]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [B, P]
    cache_lens: jax.Array,  # [B] committed KV length (all attended)
    k_new: jax.Array,  # [B, T, KH, D] in-flight block K (NOT written to cache)
    v_new: jax.Array,
    intra_mask: jax.Array,  # [B, T, T] bool: q attends in-flight key?
    scale: float,
    *,
    page_size: int,
    k_scale_l: Optional[jax.Array] = None,
    v_scale_l: Optional[jax.Array] = None,
) -> jax.Array:
    """Speculative attention: committed paged KV (read-only) + in-flight block
    KV under an arbitrary intra-block mask, one softmax over both.

    TPU replacement for the reference's KV batch-expansion speculative
    verification (modeling/...unified.py:93-137 _resize_dynamic_cache_batch +
    forward-then-trim): candidate/pseudo tokens never touch the cache; the
    winner's K/V (returned by forward_spec) is scattered in afterwards.

    On TPU an online-softmax Pallas kernel streams the committed pages
    (ops/pallas/spec_attention.py) instead of the dense gather below;
    fp8/int8-KV per-row scales are folded into the kernel's scores and
    probabilities exactly as in the decode kernel.
    """
    impl = os.environ.get("JF_ATTN_IMPL", "auto")
    # no row cap here: the spec kernel tiles oversized query sets over
    # head-group slices (spec_attention.groups_per_tile); only a single
    # group's T exceeding the VMEM budget forces the dense path
    from jacobiforcing_tpu.ops.pallas.spec_attention import groups_per_tile

    only_t = os.environ.get("JF_SPEC_ONLY_T")  # debug: kernel only for these T
    kernel_ok = (
        kernel_feasible(q, k_cache_l, page_size, max_rows=None)
        and groups_per_tile(q.shape[2] // k_cache_l.shape[0], q.shape[1]) > 0
        and (only_t is None or str(q.shape[1]) in only_t.split(","))
    )
    if impl in ("auto", "pallas") and kernel_ok:
        if impl == "pallas" or jax.default_backend() not in ("cpu",):
            import functools

            from jacobiforcing_tpu.ops.pallas.paged_attention import (
                flat_enabled,
            )
            from jacobiforcing_tpu.ops.pallas.spec_attention import (
                spec_attention_pallas,
            )

            scaled = k_scale_l is not None
            use_flat = flat_enabled()
            local = functools.partial(
                spec_attention_pallas, scale=scale, page_size=page_size,
                interpret=_interpret(),
                softmax="flat" if use_flat else "online",
            )
            if use_flat and not scaled and _guard_enabled():
                _guard_spec_scores(
                    q, k_cache_l, block_tables, cache_lens, k_new,
                    intra_mask, scale, page_size, k_scale_l,
                )
            mesh, xla_fallback = _serving_mesh_for(q, k_cache_l)
            if mesh is not None:
                sp = _tp_specs(mesh)
                in_specs = [sp["q"], sp["cache"], sp["cache"], sp["bt"],
                            sp["len"], sp["knew"], sp["knew"], sp["mask"]]
                args = [q, k_cache_l, v_cache_l, block_tables, cache_lens,
                        k_new, v_new, intra_mask]
                if scaled:
                    local = functools.partial(
                        lambda *a, _f=local: _f(
                            *a[:8], k_scale_l=a[8], v_scale_l=a[9]
                        )
                    )
                    in_specs += [sp["scale"], sp["scale"]]
                    args += [k_scale_l, v_scale_l]
                return jax.shard_map(
                    local, mesh=mesh, in_specs=tuple(in_specs),
                    out_specs=sp["q"], check_vma=False,
                )(*args)
            if not xla_fallback:
                return local(
                    q, k_cache_l, v_cache_l, block_tables, cache_lens,
                    k_new, v_new, intra_mask,
                    k_scale_l=k_scale_l, v_scale_l=v_scale_l,
                )
    B, T, NH, D = q.shape
    KH = k_cache_l.shape[0]
    groups = NH // KH
    acc = jnp.promote_types(q.dtype, jnp.float32)

    kc = _gather_dequant(k_cache_l, k_scale_l, block_tables, page_size, q.dtype)
    vc = _gather_dequant(v_cache_l, v_scale_l, block_tables, page_size, q.dtype)
    S = kc.shape[1]

    qg = q.reshape(B, T, KH, groups, D).transpose(0, 2, 3, 1, 4)  # [B,KH,G,T,D]
    sc_cache = jnp.einsum(
        "bhgtd,bshd->bhgts", qg, kc, preferred_element_type=acc
    ) * scale
    key_pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid_c = (key_pos < cache_lens[:, None])[:, None, None, None, :]
    sc_cache = jnp.where(valid_c, sc_cache, _NEG_INF)

    sc_blk = jnp.einsum(
        "bhgtd,bshd->bhgts", qg, k_new.astype(q.dtype), preferred_element_type=acc
    ) * scale
    sc_blk = jnp.where(intra_mask[:, None, None, :, :], sc_blk, _NEG_INF)

    sc = jnp.concatenate([sc_cache, sc_blk], axis=-1)
    probs = jax.nn.softmax(sc, axis=-1).astype(q.dtype)
    p_cache, p_blk = probs[..., :S], probs[..., S:]
    out = jnp.einsum("bhgts,bshd->bhgtd", p_cache, vc) + jnp.einsum(
        "bhgts,bshd->bhgtd", p_blk, v_new.astype(q.dtype)
    )
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, NH, D)


def paged_attention(
    q,
    k_cache_l,
    v_cache_l,
    block_tables,
    cache_lens,
    positions,
    scale,
    *,
    page_size: int,
    impl: Optional[str] = None,
    k_scale_l: Optional[jax.Array] = None,
    v_scale_l: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatch between the XLA reference path and the Pallas TPU kernel."""
    impl = impl or os.environ.get("JF_ATTN_IMPL", "auto")
    if impl == "xla":
        return paged_attention_xla(
            q, k_cache_l, v_cache_l, block_tables, cache_lens, positions, scale,
            page_size=page_size, k_scale_l=k_scale_l, v_scale_l=v_scale_l,
        )
    kernel_ok = kernel_feasible(q, k_cache_l, page_size, max_rows=None)
    if impl in ("auto", "pallas") and kernel_ok:
        try:
            # auto: with the fused-heads variant for small grids
            # (ops/pallas/paged_attention._kernel_fused), the kernel beats or
            # ties the XLA gather path at every measured (B, ctx) on v5e —
            # including B=1 at short contexts, the regime the gather path
            # previously won (0.107 vs 0.087 ms at B=1/1k, 0.365 vs 0.200 at
            # B=2/4k) — so on-device it dispatches unconditionally when the
            # shape is feasible.  Prefill-scale query sets (G*T beyond the
            # VMEM row cap) route to the query-tiled flash path.
            if impl == "pallas" or jax.default_backend() not in ("cpu",):
                import functools

                from jacobiforcing_tpu.ops.pallas.paged_attention import (
                    flat_enabled,
                    paged_attention_pallas,
                )

                use_flat = flat_enabled()
                local = functools.partial(
                    paged_attention_pallas, scale=scale, page_size=page_size,
                    interpret=_interpret(),
                    # resolve the calibrated softmax policy HERE (dispatch is
                    # re-traced per runner bucket) so the jitted kernel's
                    # cache is keyed by the explicit static choice
                    softmax="flat" if use_flat else "online",
                )
                if use_flat and k_scale_l is None and _guard_enabled():
                    _guard_decode_scores(
                        q, k_cache_l, block_tables, cache_lens, positions,
                        scale, page_size, k_scale_l,
                    )
                mesh, xla_fallback = _serving_mesh_for(q, k_cache_l)
                if mesh is not None:
                    sp = _tp_specs(mesh)
                    if k_scale_l is not None:
                        return jax.shard_map(
                            lambda q_, k_, v_, bt_, cl_, po_, ks_, vs_: local(
                                q_, k_, v_, bt_, cl_, po_,
                                k_scale_l=ks_, v_scale_l=vs_,
                            ),
                            mesh=mesh,
                            in_specs=(sp["q"], sp["cache"], sp["cache"],
                                      sp["bt"], sp["len"], sp["bt"],
                                      sp["scale"], sp["scale"]),
                            out_specs=sp["q"], check_vma=False,
                        )(q, k_cache_l, v_cache_l, block_tables, cache_lens,
                          positions, k_scale_l, v_scale_l)
                    return jax.shard_map(
                        local, mesh=mesh,
                        in_specs=(sp["q"], sp["cache"], sp["cache"],
                                  sp["bt"], sp["len"], sp["bt"]),
                        out_specs=sp["q"], check_vma=False,
                    )(q, k_cache_l, v_cache_l, block_tables, cache_lens,
                      positions)
                if not xla_fallback:
                    return local(
                        q, k_cache_l, v_cache_l, block_tables, cache_lens,
                        positions, k_scale_l=k_scale_l, v_scale_l=v_scale_l,
                    )
        except NotImplementedError:
            pass
    return paged_attention_xla(
        q, k_cache_l, v_cache_l, block_tables, cache_lens, positions, scale,
        page_size=page_size, k_scale_l=k_scale_l, v_scale_l=v_scale_l,
    )
