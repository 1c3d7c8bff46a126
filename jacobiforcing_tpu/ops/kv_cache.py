"""Paged KV cache as a JAX pytree.

TPU-native replacement for the reference's paged cache + Triton scatter/gather
kernels (inference_engine/layers/attention.py:10-75, model_runner.py:523-648):

  * storage is a flat slot array `[layers, num_pages * page_size, KH, D]` so a
    page is just a contiguous slot range; block tables translate an absolute
    token position into a flat slot;
  * `write_kv` is a vectorized scatter with `mode="drop"` — invalid slots
    (padding rows, inactive sequences) are encoded as `num_slots` (out of
    bounds) and silently dropped, replacing the Triton kernel's `slot == -1`
    skip (attention.py:22-24);
  * there is no "clear"/"trim" op at all: the valid prefix of a sequence's KV
    is defined by its `cache_lens` counter, exactly the contract of the
    reference's hot path `trim_kv_only_fast` (block_manager.py:534-565);
  * narrow storage dtypes (fp8 e4m3) carry PER-ROW (per token, per kv-head)
    fp32 scales in `k_scale`/`v_scale` — written rows are normalized to the
    fp8 dynamic range, so |K|,|V| beyond the e4m3 max (448) no longer saturate
    silently.  The reference has no KV quantization; this is a TPU-side
    extension (HBM capacity doubling).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

# Per-dtype max representable magnitude; rows are scaled so amax maps here.
FP8_MAX = 448.0  # float8_e4m3fn max normal value
INT8_MAX = 127.0

_SCALED_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8)


def needs_row_scales(dtype) -> bool:
    return jnp.dtype(dtype) in (jnp.dtype(d) for d in _SCALED_DTYPES)


class KVCache(NamedTuple):
    """Paged KV storage for all layers.

    k, v: [num_layers, num_kv_heads, num_pages * page_size, head_dim]
    k_scale, v_scale: [num_layers, num_kv_heads, num_pages * page_size] fp32
        per-row dequant scales (None unless the storage dtype is fp8).

    Head-major layout: a page of one kv head is a contiguous [page, head_dim]
    HBM slab, which the Pallas kernel DMAs directly (slicing the head axis of
    a head-minor layout would violate TPU (sublane, lane) tiling).
    """

    k: jax.Array
    v: jax.Array
    page_size: int = 256
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def num_slots(self) -> int:
        return self.k.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k.shape[2] // self.page_size

    @property
    def scaled(self) -> bool:
        return self.k_scale is not None


# Register page_size as static metadata so KVCache works as a jit arg.
jax.tree_util.register_pytree_node(
    KVCache,
    lambda c: ((c.k, c.v, c.k_scale, c.v_scale), c.page_size),
    lambda page_size, kv: KVCache(kv[0], kv[1], page_size, kv[2], kv[3]),
)


def alloc_kv_cache(
    num_layers: int,
    num_pages: int,
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    shape = (num_layers, num_kv_heads, num_pages * page_size, head_dim)
    k_scale = v_scale = None
    if needs_row_scales(dtype):
        k_scale = jnp.ones(shape[:3], jnp.float32)
        v_scale = jnp.ones(shape[:3], jnp.float32)
    return KVCache(
        jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), page_size,
        k_scale, v_scale,
    )


def quantize_rows(x: jax.Array, cache_dtype) -> Tuple[jax.Array, jax.Array]:
    """Per-row (last-axis) amax scaling into a narrow dtype (fp8 or int8).

    x: [..., D] -> (q [..., D] cache_dtype, scale [...] fp32) with
    dequant(q) = q.astype(f32) * scale[..., None]."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    if jnp.dtype(cache_dtype) == jnp.dtype(jnp.int8):
        scale = jnp.maximum(amax / INT8_MAX, 1e-12)
        q = jnp.clip(jnp.rint(xf / scale[..., None]), -INT8_MAX, INT8_MAX)
        return q.astype(cache_dtype), scale
    scale = jnp.maximum(amax / FP8_MAX, 1e-12)
    return (xf / scale[..., None]).astype(cache_dtype), scale


def write_kv(
    k_cache: jax.Array,  # [KH, num_slots, D] (single layer)
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, T, KH, D]
    v_new: jax.Array,
    slots: jax.Array,  # [B, T] int32 flat slots; OOB (>= num_slots) = skip
) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V rows into the flat paged cache (one layer)."""
    flat_slots = slots.reshape(-1)
    kh, d = k_new.shape[-2], k_new.shape[-1]
    k_rows = k_new.reshape(-1, kh, d).transpose(1, 0, 2).astype(k_cache.dtype)
    v_rows = v_new.reshape(-1, kh, d).transpose(1, 0, 2).astype(v_cache.dtype)
    k_cache = k_cache.at[:, flat_slots].set(k_rows, mode="drop", unique_indices=False)
    v_cache = v_cache.at[:, flat_slots].set(v_rows, mode="drop", unique_indices=False)
    return k_cache, v_cache


def write_kv_scaled(
    k_cache: jax.Array,  # [KH, num_slots, D] fp8 (single layer)
    v_cache: jax.Array,
    ks_cache: jax.Array,  # [KH, num_slots] fp32
    vs_cache: jax.Array,
    k_new: jax.Array,  # [B, T, KH, D] compute dtype
    v_new: jax.Array,
    slots: jax.Array,  # [B, T]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """write_kv with per-row amax quantization + scale scatter (fp8 cache)."""
    flat_slots = slots.reshape(-1)
    kh, d = k_new.shape[-2], k_new.shape[-1]
    kq, ks = quantize_rows(k_new, k_cache.dtype)
    vq, vs = quantize_rows(v_new, v_cache.dtype)
    k_rows = kq.reshape(-1, kh, d).transpose(1, 0, 2)
    v_rows = vq.reshape(-1, kh, d).transpose(1, 0, 2)
    ks_rows = ks.reshape(-1, kh).T  # [KH, B*T]
    vs_rows = vs.reshape(-1, kh).T
    k_cache = k_cache.at[:, flat_slots].set(k_rows, mode="drop", unique_indices=False)
    v_cache = v_cache.at[:, flat_slots].set(v_rows, mode="drop", unique_indices=False)
    ks_cache = ks_cache.at[:, flat_slots].set(ks_rows, mode="drop", unique_indices=False)
    vs_cache = vs_cache.at[:, flat_slots].set(vs_rows, mode="drop", unique_indices=False)
    return k_cache, v_cache, ks_cache, vs_cache


def gather_pages(
    cache_l: jax.Array,  # [KH, num_slots, D] (single layer)
    block_tables: jax.Array,  # [B, P] int32 (-1 = unused page)
    page_size: int,
) -> jax.Array:
    """Gather each sequence's pages into contiguous [B, S_max, KH, D].

    Reference analog: Triton load_kvcache_kernel (attention.py:43-75).  Used by
    the XLA (non-Pallas) attention path; the Pallas kernel reads pages from HBM
    directly instead.
    """
    B, P = block_tables.shape
    slot_idx = (
        jnp.maximum(block_tables, 0)[:, :, None] * page_size
        + jnp.arange(page_size)[None, None, :]
    ).reshape(B, P * page_size)
    return cache_l[:, slot_idx].transpose(1, 2, 0, 3)  # [B, S_max, KH, D]


def gather_scales(
    scale_l: jax.Array,  # [KH, num_slots] (single layer)
    block_tables: jax.Array,  # [B, P]
    page_size: int,
) -> jax.Array:
    """Gather per-row dequant scales into [B, S_max, KH]."""
    B, P = block_tables.shape
    slot_idx = (
        jnp.maximum(block_tables, 0)[:, :, None] * page_size
        + jnp.arange(page_size)[None, None, :]
    ).reshape(B, P * page_size)
    return scale_l[:, slot_idx].transpose(1, 2, 0)  # [B, S_max, KH]
