"""Block-sparse (splash) attention for the consistency-training mask.

The FlexAttention-BlockMask analog (reference
soft_flexattn_cllm_trainer.py:220-286, create_block_mask(_compile=True)): the
packed [prompt][k_0][last_0]... layout's visibility rules as a COMPUTABLE
splash-attention mask, so 16k-token training packs run in block-sparse flash
attention (fwd+bwd) instead of a dense [L, L] score matrix.

Uses jax's TPU splash-attention kernels (the in-tree Pallas library — the
same relationship the reference has to the external flash-attn/FlexAttention
kernels).  Like the reference, kernels are compiled per (L, prompt_len, T)
and cached (trainer:32-34) — bucket prompt lengths to bound compiles.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as sk,
)
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_mask as sm,
)


class JacobiTrainingMask(sm._ComputableMask):
    """Visibility of the packed k_j/last_j layout, computed from indices.

    Mirrors jacobiforcing_tpu.train.consistency.build_train_mask (tested for
    equality against it): prompt causal; k_j sees prompt + previous last_* +
    itself causally (+ previous k_* for multiblock, window-restricted for
    window); last_j sees prompt + previous last_* + itself causally.
    """

    def __init__(self, L: int, prompt_len: int, T: int, seq_len: int, N: int,
                 variant: str = "single", window_size: int = 4,
                 shard_count: int = 1):
        self._key = (L, prompt_len, T, seq_len, N, variant, window_size)
        P, var, W = prompt_len, variant, window_size

        def mask_function(q, k):
            # operator-only (no np.* calls): evaluated on BOTH numpy index
            # grids (block sparsity computation) and traced arrays (partial
            # blocks inside the kernel)
            rel_q, rel_k = q - P, k - P
            bq = rel_q // N  # floor division: negative for prompt positions
            bk = rel_k // N
            is_p_q, is_p_k = q < P, k < P
            is_k_q = (~is_p_q) & (bq % 2 == 0)
            is_l_q = (~is_p_q) & (bq % 2 == 1)
            is_k_k = (~is_p_k) & (bk % 2 == 0)
            is_l_k = (~is_p_k) & (bk % 2 == 1)
            # j indices; negative/out-of-range values are gated by is_* flags
            # and the `valid` clause below
            j_q = bq // 2
            j_k = bk // 2

            prev_last = is_l_k & (bk < 2 * j_q)
            mask_prompt = is_p_q & (k <= q)
            same_k = is_k_q & is_k_k & (bq == bk)
            same_l = is_l_q & is_l_k & (bq == bk)
            vis_k = is_p_k | prev_last | (same_k & (k <= q))
            if var in ("multiblock", "window"):
                prev_k = is_k_k & (bk < 2 * j_q)
                if var == "window":
                    prev_k = prev_k & (j_k // W == j_q // W)
                vis_k = vis_k | prev_k
            mask_kj = is_k_q & vis_k
            mask_lj = is_l_q & (is_p_k | prev_last | (same_l & (k <= q)))
            valid = (q < seq_len) & (k < seq_len) & (bq < 2 * T) & (
                (bk < 2 * T) | is_p_k
            )
            return (mask_prompt | mask_kj | mask_lj) & valid

        super().__init__(shape=(L, L), mask_function=mask_function,
                         shard_count=shard_count)

    def __eq__(self, other):
        return isinstance(other, JacobiTrainingMask) and self._key == other._key

    def __hash__(self):
        return hash((type(self), self._key))


def make_train_attention_kernel(L: int, prompt_len: int, T: int, seq_len: int,
                                N: int, variant: str, window_size: int,
                                num_heads: int, interpret: bool):
    """Build the splash kernel for one layout.

    NOT cached across traces: the kernel object lazily materializes mask-info
    arrays on first use, and caching one built inside a jit/scan trace leaks
    tracers.  Callers build it once per traced forward (XLA's jit cache
    amortizes the per-compile cost)."""
    mask = JacobiTrainingMask(L, prompt_len, T, seq_len, N, variant, window_size)
    mh = sm.MultiHeadMask([mask] * num_heads)
    bq = min(512, L)
    bkv = min(512, L)
    block_sizes = sk.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkv,
        block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
        block_q_dq=bq, block_kv_dq=bkv,
    )
    return sk.make_splash_mha_single_device(
        mh, block_sizes=block_sizes, interpret=interpret
    )


def splash_train_attention(
    q: jax.Array,  # [T_seq, NH, D]
    k: jax.Array,  # [T_seq, KH, D]
    v: jax.Array,
    kernel=None,
    *,
    prompt_len: int,
    T_pairs: int,
    seq_len: int,
    N: int,
    variant: str = "single",
    window_size: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Block-sparse attention over the training layout; differentiable."""
    L, NH, D = q.shape
    KH = k.shape[1]
    groups = NH // KH
    if kernel is None:
        kernel = make_train_attention_kernel(
            L, prompt_len, T_pairs, seq_len, N, variant, window_size, NH, interpret
        )
    scale = 1.0 / math.sqrt(D)
    qh = (q * scale).transpose(1, 0, 2)  # [NH, L, D]
    kh = jnp.repeat(k.transpose(1, 0, 2), groups, axis=0)  # GQA -> MHA
    vh = jnp.repeat(v.transpose(1, 0, 2), groups, axis=0)
    out = kernel(qh, kh, vh)  # [NH, L, D]
    return out.transpose(1, 0, 2)
