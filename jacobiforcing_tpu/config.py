"""Engine configuration and per-request sampling parameters.

TPU-native re-design of the reference's `inference_engine/config.py:6-52` and
`inference_engine/sampling_params.py:4-38`.  Differences from the reference:

  * no GPU-memory-fraction autotuning — KV capacity is an explicit page budget
    (`num_kv_pages`), sized for HBM by the engine at startup;
  * static compile buckets (`batch_buckets`, `page_buckets`) replace CUDA-graph
    capture lists (reference model_runner.py:1552-1658) — each bucket maps to
    one cached XLA executable;
  * `mesh_shape` declares the (data, model) device mesh used for sharding
    instead of `tensor_parallel_size` + NCCL world size.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


DEFAULT_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


@dataclass
class Config:
    """Engine-level configuration (reference: inference_engine/config.py:6-52)."""

    model: str = ""
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 256
    max_model_len: int = 8192
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    eos: int = -1
    pad: int = -1
    # Extra stop tokens for on-policy rollouts (reference on_policy.py defaults
    # to Qwen's {151643 <|endoftext|>, 151645 <|im_end|>}).
    stop_token_ids: tuple = ()
    # Paged KV cache. The reference requires block_size % 256 == 0
    # (config.py:52); on TPU smaller pages give better paging granularity while
    # the Pallas kernel still reads full pages, so we default to 256 but allow
    # any multiple of 16.
    kvcache_page_size: int = 256
    num_kv_pages: int = -1  # -1 = size from available HBM at startup
    hbm_utilization: float = 0.9
    # Explicit per-chip HBM capacity override (bytes) for backends whose
    # memory_stats() is unavailable; 0 = infer from the device kind
    # (v5e 16GB / v4 32GB / v5p 95GB / v6e 32GB), falling back to 16GB.
    hbm_bytes: int = 0

    # Jacobi decoding knobs (reference config.py:23-30, README.md:224).
    jacobi_enabled: bool = True
    jacobi_block_len: int = 64
    jacobi_max_blocks: int = 2
    jacobi_spawn_ratio: float = 0.8
    jacobi_lookahead_start_ratio: float = 0.0
    jacobi_n_gram_pool_size: int = 4
    jacobi_max_iterations: int = 128
    # Measured MR auto-policy (engine/mr_policy.py): the reference's MR
    # defaults are GPU-tuned (candidate rows ride free on idle SMs); on TPU
    # the full candidate tier measures 2.17x wall per iteration at B=1/4k
    # for ~1.18x TPF — net-losing — while whether it pays is workload-
    # dependent.  When enabled, MR requests are served by whichever of
    # {full MR, MR-without-candidates, single-block Jacobi} measures the
    # highest tokens/s online (all three are greedy and commit identical
    # tokens, so the arm choice never changes the output stream).  Disable
    # to force the requested MR configuration unconditionally.
    jacobi_mr_auto_policy: bool = True
    jacobi_mr_probe_chunks: int = 4
    jacobi_mr_reprobe_every: int = 256
    # Fourth policy arm: the TRUE single-block program (sliding window, no MR
    # glue or block-boundary restarts) with exact MR<->single state handoffs
    # (engine/mr_policy.py docstring).  This is what makes "MR never loses":
    # the RA-only arm still pays MR's fixed per-iteration state-machine cost
    # and its fresh-block cold drafts (measured 0.63x single-block on the
    # trained demo, assets/mr_steady_r4.json).
    jacobi_mr_single_arm: bool = True

    # Compile bucketing: each (batch bucket, seq bucket) pair is one cached XLA
    # executable — the TPU analog of per-(B, L) CUDA graphs
    # (reference model_runner.py:1596-1658).
    batch_buckets: tuple = DEFAULT_BATCH_BUCKETS
    prefill_token_buckets: tuple = (256, 512, 1024, 2048, 4096, 8192)
    # Tokens committed per device-side Jacobi segment before control returns to
    # the host scheduler (admission/retirement).  Larger = fewer host syncs.
    jacobi_chunk_tokens: int = 256
    # > 0: iteration-budget chunking for the greedy Jacobi path — each device
    # segment runs exactly this many while-loop trips and EVERY unfinished row
    # participates in every trip (no per-row token budget inside the chunk).
    # Removes the batch-occupancy loss of token-budget chunking under
    # tokens-per-forward variance (measured 0.45 -> ~1.0 at B=8); tokens
    # committed per chunk become variable (<= chunk_iters * block_len).
    jacobi_chunk_iters: int = 0
    # Speculative host pipeline: dispatch Jacobi chunk k+1 from chunk k's
    # device output handles BEFORE reading chunk k back, so the host<->device
    # round trip (~30 ms over a tunneled backend) overlaps chunk k+1's device
    # execution instead of idling the chip.  Exactness-preserving: every
    # finish condition (EOS / token limit / iteration budget / KV capacity)
    # is mirrored in-kernel, so a pending chunk's rows for already-finished
    # sequences are inert; commits (and finish detection) lag one chunk.
    jacobi_async_host: bool = True

    enforce_eager: bool = False
    seed: int = 0
    # Persistent XLA compilation cache: the warmup grid (~25 executables,
    # 20-40s each at 7B dims) compiles once per machine, not once per process
    # (TPU analog of reference CUDA-graph capture-at-init being free on
    # restart).  Directory defaults to ~/.cache/jacobiforcing_tpu/xla_cache;
    # disable with compilation_cache=False or JF_COMPILE_CACHE=0.
    compilation_cache: bool = True
    compilation_cache_dir: str = ""
    # "" | "int8" | "w8a8" — quantization applied at engine load.
    # int8: weight-only (halves HBM weight traffic; the small-batch decode
    # regime; fits Qwen2.5-7B on one 16GB v5e chip).
    # w8a8: int8 weights + per-token int8 activations on the int8 MXU —
    # ~1.6x faster batched Jacobi forwards (B>=8), standard dynamic-quant
    # accuracy tradeoff.
    quantization: str = ""
    # "" (model dtype) | "fp8" (float8_e4m3) | "int8" — KV cache storage
    # dtype; halves KV HBM so the page pool holds 2x the context (build plan
    # step 4c: "INT8/FP8 ... and INT8 KV").  Both carry per-row dequant
    # scales; int8 rounds to 8-bit integers (uniform grid, tighter error for
    # near-amax rows), fp8 keeps e4m3's wider dynamic range within a row.
    kv_cache_dtype: str = ""

    # Resolved at engine init.
    model_path: str = field(default="", repr=False)

    def __post_init__(self):
        assert self.kvcache_page_size % 16 == 0
        if self.model:
            self.model_path = resolve_checkpoint_dir(self.model)


def resolve_checkpoint_dir(model_path: str) -> str:
    """Auto-select the latest `checkpoint-*` subdir if present.

    Mirrors the DeepSpeed-checkpoint auto-detection of the reference
    (inference_engine/config.py:31-41).
    """
    if os.path.isdir(model_path):
        ckpts = [
            d
            for d in os.listdir(model_path)
            if d.startswith("checkpoint-") and os.path.isdir(os.path.join(model_path, d))
        ]
        if ckpts:
            latest = max(ckpts, key=lambda x: int(x.split("-")[1]))
            return os.path.join(model_path, latest)
    return model_path


@dataclass
class SamplingParams:
    """Per-request sampling parameters (reference: sampling_params.py:4-38)."""

    temperature: float = 1.0
    top_k: int = -1
    top_p: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False

    # "autoregressive" | "jacobi" | "jacobi_multiblock_rejection_recycling"
    decode_strategy: str = "autoregressive"

    jacobi_block_len: int = 64
    jacobi_max_blocks: int = 2
    jacobi_spawn_ratio: float = 0.8
    jacobi_lookahead_start_ratio: float = 0.0
    jacobi_n_gram_pool_size: int = 4
    jacobi_max_iterations: int = 128

    # Emit training rollout records instead of plain generations
    # (reference: jacobi_decoding_nongreedy_on_policy.py).
    jacobi_on_policy: bool = False
    # On-policy collection acceptance: 0 = rejection sampling; > 0 accepts a
    # drafted token deterministically when p(x) >= threshold (the reference's
    # nongreedy trajectory collector, qwen2_modeling_..._nongreedy_blk32.py:130).
    jacobi_accept_threshold: float = 0.0

    def __post_init__(self):
        assert self.temperature >= 0.0
        if self.jacobi_on_policy:
            assert self.temperature > 0.0, "on-policy rollouts require temperature > 0"

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0
