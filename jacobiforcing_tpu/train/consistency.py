"""Jacobi-Forcing consistency trainer: AR + progressive-consistency loss over
packed noise-scheduled trajectory sequences.

TPU-native re-design of the reference CllmTrainer
(JacobiForcing/train/soft_flexattn_cllm_trainer.py:15-570) and its multiblock /
windowed variants (soft_flexattn_cllm_trainer_multiblock.py,
…_multiblock_window.py):

  * packed layout `[prompt][k_0][last_0]...[k_{T-1}][last_{T-1}]`, each block of
    length N (_index_layout, trainer:156-161);
  * the FlexAttention BlockMask (trainer:220-286) becomes a vectorized boolean
    mask computed on device from (prompt_len, T) — prompt causal; k_j sees
    prompt + all previous last_* + itself causally; last_j likewise; the
    multiblock variant lets k_j also see previous k_*; the windowed variant
    restricts that to k_* within the same window of `window_size` pairs
    (…_multiblock_window.py:219-316 — note the reference file accidentally
    shadows its windowed mask with a duplicate method; we implement the
    *intended* windowed semantics per SURVEY.md §2.4);
  * shared RoPE positions: k_j and last_j occupy the same positions
    (trainer:163-186);
  * AR loss: next-token CE over prompt + each last_j with inter-block bridge
    pairs, EOS-truncated, PAD->-100, x10 weight (trainer:379-502; multiblock
    variant uses x1);
  * consistency loss: soft CE between student logits at k_j offsets and
    detached teacher logits at matching last_j offsets, keeping only offsets
    >= the first k/l divergence, masking PADs/duplicate prefixes, scaled by
    T_soft^2 / T (trainer:504-551).

Host-side index preparation (`prepare_sample`) produces fixed-shape padded
index arrays so each (L-bucket, pair-bucket) is one compiled executable.
Full [L, L] masks and gathered-position logits keep this exact at research
scale; the block-sparse Pallas attention path replaces the dense mask for
16k-token production packing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from jacobiforcing_tpu.models.qwen import (
    ModelConfig,
    forward_dense,
    logits_at,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training hyper-parameters (hashable jit arg)."""

    N: int = 32  # n_token_seq_len, block length
    variant: str = "single"  # "single" | "multiblock" | "window"
    window_size: int = 4
    ar_weight: float = 10.0  # reference uses x10 (single) / x1 (multiblock)
    distill_temperature: float = 1.0
    max_pairs: int = 32  # T bucket
    seq_bucket: int = 1024  # L bucket
    ar_pair_bucket: int = 1024
    cons_pair_bucket: int = 1024
    # "dense" = [L, L] mask attention (research scale);
    # "splash" = block-sparse flash attention (16k production packs) —
    # compiles per (prompt_len, T, seq_len) like the reference's FlexAttention
    # blockmask cache (trainer:32-34); bucket prompt lengths.
    attn_impl: str = "dense"
    splash_interpret: bool = False  # interpret-mode kernels (CPU tests)
    remat: bool = False  # gradient checkpointing over layers


# ---------------------------------------------------------------------------
# Device-side mask + positions
# ---------------------------------------------------------------------------


def build_train_mask(
    L: int,
    prompt_len: jax.Array,  # scalar int32
    T: jax.Array,  # scalar int32, number of (k, last) pairs
    seq_len: jax.Array,  # scalar int32, actual packed length (< L allows padding)
    N: int,
    variant: str = "single",
    window_size: int = 4,
) -> jax.Array:
    """[L, L] bool mask (True = attend), reference mask_mod trainer:228-280."""
    q = jnp.arange(L, dtype=jnp.int32)[:, None]
    k = jnp.arange(L, dtype=jnp.int32)[None, :]
    P = prompt_len
    rel_q, rel_k = q - P, k - P
    bq = jnp.where(rel_q >= 0, rel_q // N, -1)
    bk = jnp.where(rel_k >= 0, rel_k // N, -1)
    is_prompt_q, is_prompt_k = q < P, k < P
    is_k_q = (~is_prompt_q) & (bq % 2 == 0)
    is_last_q = (~is_prompt_q) & (bq % 2 == 1)
    is_k_k = (~is_prompt_k) & (bk % 2 == 0)
    is_last_k = (~is_prompt_k) & (bk % 2 == 1)
    j_q = jnp.clip(jnp.where(bq >= 0, bq // 2, 0), 0, jnp.maximum(T - 1, 0))
    j_k = jnp.where(bk >= 0, bk // 2, 0)

    k_in_prev_last = is_last_k & (bk < 2 * j_q)
    mask_prompt = is_prompt_q & (k <= q)
    same_k_block = is_k_q & is_k_k & (bq == bk)
    same_last_block = is_last_q & is_last_k & (bq == bk)

    vis_k = is_prompt_k | k_in_prev_last | (same_k_block & (k <= q))
    if variant in ("multiblock", "window"):
        # k_j additionally sees previous k_* (multiblock trainer diff :243-268)
        k_in_prev_k = is_k_k & (bk < 2 * j_q)
        if variant == "window":
            # ...only within the same window of `window_size` pairs
            k_in_prev_k = k_in_prev_k & (j_k // window_size == j_q // window_size)
        vis_k = vis_k | k_in_prev_k
    mask_kj = is_k_q & vis_k
    mask_lastj = is_last_q & (
        is_prompt_k | k_in_prev_last | (same_last_block & (k <= q))
    )

    mask = mask_prompt | mask_kj | mask_lastj
    valid = (q < seq_len) & (k < seq_len) & (bq < 2 * T) & ((bk < 2 * T) | is_prompt_k)
    return mask & valid


def shared_position_ids(
    L: int, prompt_len: jax.Array, N: int
) -> jax.Array:
    """[L] RoPE positions; k_j and last_j share positions (trainer:163-186)."""
    idx = jnp.arange(L, dtype=jnp.int32)
    rel = idx - prompt_len
    b = jnp.maximum(rel, 0) // N
    pos_pair = prompt_len + (b // 2) * N + jnp.maximum(rel, 0) % N
    return jnp.where(rel < 0, idx, pos_pair)


# ---------------------------------------------------------------------------
# Host-side sample preparation
# ---------------------------------------------------------------------------


def prepare_sample(
    input_ids: List[int],
    prompt_len: int,
    T: int,
    tc: TrainConfig,
    eos_id: int = -1,
    pad_id: int = 0,
) -> Dict[str, np.ndarray]:
    """Build fixed-shape index arrays for one packed row.

    Mirrors the reference's pair construction exactly:
      * METHOD 1 post-EOS PAD flip on the final last block (trainer:334)
      * AR pairs: prompt, bridge (prompt/last_{j-1} -> last_j[0]), in-last-block
        pairs EOS-truncated (trainer:379-460)
      * consistency pairs: k_j/last_j offsets from first divergence, with
        PAD + duplicate-prefix loss mask (trainer:66-154, 504-540)
    """
    N = tc.N
    ids = np.asarray(input_ids, np.int32).copy()
    L_actual = prompt_len + 2 * T * N
    assert len(ids) == L_actual, (len(ids), L_actual)
    k_starts = [prompt_len + 2 * j * N for j in range(T)]
    l_starts = [prompt_len + (2 * j + 1) * N for j in range(T)]

    # METHOD 1: PAD tokens after the first EOS in the FINAL last block
    if eos_id >= 0 and T > 0:
        blk = ids[l_starts[-1] : l_starts[-1] + N]
        epos = np.flatnonzero(blk == eos_id)
        if epos.size:
            blk[epos[0] + 1 :] = pad_id
            ids[l_starts[-1] : l_starts[-1] + N] = blk

    # ---- AR pairs ----
    ar_p: List[int] = []
    ar_t: List[int] = []

    def add_pairs(s: int, e: int):
        ar_p.extend(range(s, e - 1))
        ar_t.extend(range(s + 1, e))

    add_pairs(0, prompt_len)
    for j in range(T):
        ls = l_starts[j]
        logit_pos = prompt_len - 1 if j == 0 else l_starts[j - 1] + N - 1
        ar_p.append(logit_pos)
        ar_t.append(ls)
        block = ids[ls : ls + N]
        end = N
        if eos_id >= 0:
            epos = np.flatnonzero(block == eos_id)
            if epos.size:
                end = min(end, int(epos[0]) + 1)
        add_pairs(ls, ls + end)

    ar_targets = ids[ar_t]
    ar_valid = ar_targets != pad_id

    # ---- consistency pairs ----
    cons_s: List[int] = []
    cons_t: List[int] = []
    offs = np.arange(N - 1)
    for j in range(T):
        ks, ls = k_starts[j], l_starts[j]
        kb = ids[ks : ks + N]
        lb = ids[ls : ls + N]
        diff = kb[: N - 1] != lb[: N - 1]
        if diff.any():
            first_diff = int(np.flatnonzero(diff)[0])
            keep = offs >= first_diff
        else:
            keep = np.zeros(N - 1, bool)
        # PAD mask on the student side (dup-prefix already excluded by keep)
        keep &= ids[ks + offs] != pad_id
        cons_s.extend((ks + offs[keep]).tolist())
        cons_t.extend((ls + offs[keep]).tolist())

    def pad_to(arr, n, fill):
        out = np.full((n,), fill, np.int32)
        out[: min(len(arr), n)] = np.asarray(arr[:n], np.int32)
        return out

    ids_padded = np.full((tc.seq_bucket,), pad_id, np.int32)
    ids_padded[:L_actual] = ids
    Ka, Kc = tc.ar_pair_bucket, tc.cons_pair_bucket
    return {
        "input_ids": ids_padded,
        "prompt_len": np.int32(prompt_len),
        "T": np.int32(T),
        "seq_len": np.int32(L_actual),
        "ar_p": pad_to(ar_p, Ka, 0),
        "ar_t": pad_to(ar_targets, Ka, pad_id),
        "ar_valid": pad_to(ar_valid.astype(np.int32), Ka, 0),
        "cons_s": pad_to(cons_s, Kc, 0),
        "cons_t": pad_to(cons_t, Kc, 0),
        "cons_valid": pad_to(np.ones(len(cons_s), np.int32), Kc, 0),
    }


# ---------------------------------------------------------------------------
# Loss + train step
# ---------------------------------------------------------------------------


def consistency_losses(
    params: Dict[str, Any],
    cfg: ModelConfig,
    tc: TrainConfig,
    rope,
    batch: Dict[str, jax.Array],
    static_layout: Optional[Tuple[int, int, int]] = None,  # (prompt_len, T, seq_len)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Forward one packed sample (bs=1 like the reference) and compute losses."""
    ids = batch["input_ids"][None, :]  # [1, L]
    L = ids.shape[1]
    pos = shared_position_ids(L, batch["prompt_len"], tc.N)[None]
    if tc.attn_impl == "splash":
        assert static_layout is not None, "splash attention needs a static layout"
        p_len, t_pairs, seq_len = static_layout
        spec = (p_len, t_pairs, seq_len, tc.N, tc.variant, tc.window_size,
                tc.splash_interpret)
        h = forward_dense(params, cfg, ids, pos, rope, splash_spec=spec,
                          remat=tc.remat)[0]
    else:
        mask = build_train_mask(
            L, batch["prompt_len"], batch["T"], batch["seq_len"], tc.N,
            tc.variant, tc.window_size,
        )[None]
        h = forward_dense(params, cfg, ids, pos, rope, mask, remat=tc.remat)[0]

    # AR loss (x ar_weight)
    h_ar = h[batch["ar_p"]]  # [Ka, H]
    ar_logits = logits_at(params, cfg, h_ar)
    logp = jax.nn.log_softmax(ar_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, batch["ar_t"][:, None].astype(jnp.int32), axis=-1)[:, 0]
    w = batch["ar_valid"].astype(nll.dtype)
    loss_ar = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0) * tc.ar_weight

    # consistency loss: student k_j offsets vs detached teacher last_j offsets
    Ts = tc.distill_temperature
    h_s = h[batch["cons_s"]]
    h_t = jax.lax.stop_gradient(h[batch["cons_t"]])
    s_logits = logits_at(params, cfg, h_s) / Ts
    t_logits = jax.lax.stop_gradient(logits_at(params, cfg, h_t)) / Ts
    t_prob = jax.nn.softmax(t_logits, axis=-1)
    s_logp = jax.nn.log_softmax(s_logits, axis=-1)
    ent = -jnp.sum(t_prob * s_logp, axis=-1)  # [Kc]
    cw = batch["cons_valid"].astype(ent.dtype)
    denom = jnp.maximum(jnp.sum(cw), 1.0)
    loss_cons = jnp.sum(ent * cw) / denom
    loss_cons = loss_cons * (Ts * Ts) / jnp.maximum(batch["T"].astype(ent.dtype), 1.0)
    loss_cons = jnp.where(jnp.sum(cw) > 0, loss_cons, 0.0)

    total = loss_ar + loss_cons
    return total, {"loss_ar": loss_ar, "loss_consistency": loss_cons}


def make_train_step(
    cfg: ModelConfig,
    tc: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
):
    """Jitted (params, opt_state, rope, batch[, static_layout]) ->
    (params, opt_state, metrics).  `static_layout` is required (and triggers a
    compile per distinct value) only with tc.attn_impl == "splash".

    With `mesh=None`, `batch` is ONE packed sample (prepare_sample output,
    no leading batch dim).  With a mesh, every `batch` leaf carries a leading
    global batch dim B (B % mesh.shape["data"] == 0): samples are sharded over
    the "data" axis and the loss is the mean over B, so XLA compiles the
    cross-device gradient psum — the data parallelism the reference gets from
    torchrun ranks + DeepSpeed ZeRO-3
    (scripts/train/train_jacobi_forcing_coder_n32.sh:10-38).  Works with
    fsdp-sharded params (shard_params(..., fsdp=True)): ZeRO-3-style param +
    optimizer-state sharding composes with the batch sharding."""

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

        def batched_loss(p, rope, batch, static_layout):
            totals, metrics = jax.vmap(
                lambda b: consistency_losses(p, cfg, tc, rope, b, static_layout)
            )(batch)
            return jnp.mean(totals), jax.tree.map(jnp.mean, metrics)

        @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
        def dp_step(params, opt_state, rope, batch, static_layout=None):
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
            (loss, metrics), grads = jax.value_and_grad(
                batched_loss, has_aux=True
            )(params, rope, batch, static_layout)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["loss"] = loss
            return params, opt_state, metrics

        return dp_step

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
    def step(params, opt_state, rope, batch, static_layout=None):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: consistency_losses(p, cfg, tc, rope, batch, static_layout),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return step
