"""Attention-logit calibration for the flat-softmax policy.

The flat (no-running-max) softmax in the Pallas decode/spec kernels is exact
only while every attention score stays within the exp2-domain cap
(paged_attention._FLAT_CAP = 100, i.e. 69 nats).  That is NOT a universal
property of trained models: the in-repo Jacobi-Forcing demo checkpoint
measures max |score| = 520 exp2-units — sharp induction/copy heads produce
logits far beyond the cap (scripts/probe_w8a8_and_flatcap.py).

`max_attn_score_exp2` runs a short instrumented dense forward and returns the
max |score*log2e| over all layers/heads/positions; `LLMEngine` calls it at
init (before any decode-path compile) and records the bound via
`paged_attention.set_flat_softmax_bound`, which drives the "auto" softmax
policy: flat for measured-benign models, online-softmax otherwise.

Calibration inputs default to random tokens; callers with representative
prompts should pass them — structured input can light up sharp heads that
random tokens keep dark (the demo checkpoint still measures >300 exp2-units
on random tokens, so random calibration catches the known-bad case).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def max_attn_score_exp2(
    params,
    cfg,
    rope,
    ids: Optional[np.ndarray] = None,
    *,
    T: int = 128,
    B: int = 2,
    seed: int = 0,
) -> float:
    """Max |attention score| in the exp2 domain over a calibration forward.

    Mirrors models/qwen.forward_dense's layer body (dense causal attention,
    no KV cache) but returns the score maximum instead of logits.
    """
    from jacobiforcing_tpu.models.qwen import apply_rope, rms_norm, _make_mm

    if ids is None:
        rng = np.random.RandomState(seed)
        ids = rng.randint(1, cfg.vocab_size, (B, T)).astype(np.int32)
    ids = jnp.asarray(ids, jnp.int32)
    B, T = ids.shape
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
    cos_t, sin_t = rope
    cos, sin = cos_t[pos], sin_t[pos]
    mask = (
        jnp.arange(T, dtype=jnp.int32)[None, :, None]
        >= jnp.arange(T, dtype=jnp.int32)[None, None, :]
    )
    exp2_scale = (cfg.head_dim ** -0.5) * math.log2(math.e)
    G = cfg.num_heads // cfg.num_kv_heads
    mm_ = _make_mm(cfg)

    # params ride as a jit ARGUMENT: a closure would bake multi-GB weights
    # into the lowered module as constants (7.6 GB at 7B dims — minutes of
    # lowering + duplicated HBM).
    @jax.jit
    def run(params, ids):
        lp = params["layers"]
        x = params["embed"].astype(cfg.dtype)[ids]

        def layer_body(carry, w):
            h, mx = carry
            hn = rms_norm(h, w["ln1"], cfg.rms_norm_eps)
            q = mm_(hn, w["wq"])
            kk = mm_(hn, w["wk"])
            vv = mm_(hn, w["wv"])
            if cfg.qkv_bias:
                q, kk, vv = q + w["bq"], kk + w["bk"], vv + w["bv"]
            q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
            kk = kk.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
            vv = vv.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
            if cfg.qk_norm:
                q = rms_norm(q, w["q_norm"], cfg.rms_norm_eps)
                kk = rms_norm(kk, w["k_norm"], cfg.rms_norm_eps)
            q = apply_rope(q, cos, sin)
            kk = apply_rope(kk, cos, sin)
            qg = q.reshape(B, T, cfg.num_kv_heads, G, cfg.head_dim)
            s = jnp.einsum(
                "bthgd,bshd->bhgts", qg, kk,
                preferred_element_type=jnp.float32,
            ) * exp2_scale
            sm = jnp.where(mask[:, None, None], jnp.abs(s), 0.0)
            mx = jnp.maximum(mx, jnp.max(sm))
            # finish the layer (softmax in nat domain, as forward_dense does)
            probs = jax.nn.softmax(
                jnp.where(mask[:, None, None], s / math.log2(math.e), -1e30),
                axis=-1,
            ).astype(q.dtype)
            o = jnp.einsum("bhgts,bshd->bthgd", probs, vv)
            o = mm_(o.reshape(B, T, -1), w["wo"])
            h = h + o
            hn2 = rms_norm(h, w["ln2"], cfg.rms_norm_eps)
            mlp = mm_(
                jax.nn.silu(mm_(hn2, w["w_gate"])) * mm_(hn2, w["w_up"]),
                w["w_down"],
            )
            return (h + mlp, mx), ()

        (_, mx), _ = jax.lax.scan(layer_body, (x, jnp.float32(0.0)), lp)
        return mx

    return float(np.asarray(run(params, ids)))


def calibrate_flat_softmax(params, cfg, rope, ids=None, **kw) -> float:
    """Measure and record the flat-softmax bound; returns the bound."""
    from jacobiforcing_tpu.ops.pallas.paged_attention import (
        set_flat_softmax_bound,
    )

    bound = max_attn_score_exp2(params, cfg, rope, ids, **kw)
    set_flat_softmax_bound(bound)
    return bound
