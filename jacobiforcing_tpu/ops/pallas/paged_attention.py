"""Pallas TPU paged-attention kernel (placeholder dispatch for round 1 slice).

Will implement the HBM-resident paged KV attention with scalar-prefetched
block tables (PrefetchScalarGridSpec) and double-buffered page DMA — the
Pallas analog of flash_attn_with_kvcache over a paged cache
(reference: inference_engine/layers/attention.py:104-157).

Until the kernel lands, raise NotImplementedError so the dispatcher falls back
to the XLA gather path (ops/attention.py).
"""

from __future__ import annotations


def paged_attention_pallas(*args, **kwargs):
    raise NotImplementedError("Pallas paged attention kernel not yet enabled")
