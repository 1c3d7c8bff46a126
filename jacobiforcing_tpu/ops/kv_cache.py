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
    reference's hot path `trim_kv_only_fast` (block_manager.py:534-565).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class KVCache(NamedTuple):
    """Paged KV storage for all layers.

    k, v: [num_layers, num_kv_heads, num_pages * page_size, head_dim]

    Head-major layout: a page of one kv head is a contiguous [page, head_dim]
    HBM slab, which the Pallas kernel DMAs directly (slicing the head axis of
    a head-minor layout would violate TPU (sublane, lane) tiling).
    """

    k: jax.Array
    v: jax.Array
    page_size: int = 256

    @property
    def num_slots(self) -> int:
        return self.k.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k.shape[2] // self.page_size


# Register page_size as static metadata so KVCache works as a jit arg.
jax.tree_util.register_pytree_node(
    KVCache,
    lambda c: ((c.k, c.v), c.page_size),
    lambda page_size, kv: KVCache(kv[0], kv[1], page_size),
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
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), page_size)


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
