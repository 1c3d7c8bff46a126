"""Weight-only INT8 quantization for serving.

The build-plan step 4c (SURVEY.md §7): fused dequant+matmul for weight-only
serving.  Weights are stored symmetric per-output-channel int8; matmuls
compute `(x @ w_q) * scale` so the int8->compute-dtype cast fuses into the
MXU feed and HBM weight traffic halves vs bf16 — the dominant cost of
small-batch decoding.  The reference has no quantization path; this is a
TPU-native extension targeted at fitting Qwen2.5-7B on one 16GB v5e chip.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_tensor(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0  # [..., 1, out]
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.bfloat16)}


def quantize_params(params: Dict[str, Any], include_lm_head: bool = True) -> Dict[str, Any]:
    """Quantize the layer-stacked linear weights (+ lm_head); norms, biases and
    the embedding table stay in the model dtype."""
    out = dict(params)
    layers = dict(params["layers"])
    for k in QUANT_KEYS:
        if k in layers:
            layers[k] = quantize_tensor(layers[k])
    out["layers"] = layers
    if include_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_tensor(params["lm_head"])
    return out


def init_quantized_params(cfg, key: jax.Array) -> Dict[str, Any]:
    """Random-init parameters DIRECTLY in int8 (benchmarking large configs
    without the transient full-precision copy that would blow HBM)."""
    from jacobiforcing_tpu.models.qwen import init_params

    ks = jax.random.split(key, 16)
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    qs, kvs = cfg.q_size, cfg.kv_size
    dt = cfg.dtype

    def qrand(k, shape):
        fan_in = shape[-2]
        q = jax.random.randint(k, shape, -127, 128, jnp.int8)
        s = jnp.full(shape[:-2] + (1, shape[-1]), (1.0 / fan_in**0.5) / 127.0, jnp.bfloat16)
        return {"q": q, "s": s}

    layers: Dict[str, Any] = {
        "ln1": jnp.ones((L, H), dt),
        "ln2": jnp.ones((L, H), dt),
        "wq": qrand(ks[0], (L, H, qs)),
        "wk": qrand(ks[1], (L, H, kvs)),
        "wv": qrand(ks[2], (L, H, kvs)),
        "wo": qrand(ks[3], (L, qs, H)),
        "w_gate": qrand(ks[4], (L, H, I)),
        "w_up": qrand(ks[5], (L, H, I)),
        "w_down": qrand(ks[6], (L, I, H)),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((L, qs), dt)
        layers["bk"] = jnp.zeros((L, kvs), dt)
        layers["bv"] = jnp.zeros((L, kvs), dt)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, cfg.head_dim), dt)
        layers["k_norm"] = jnp.ones((L, cfg.head_dim), dt)
    params: Dict[str, Any] = {
        "embed": (jax.random.normal(ks[7], (cfg.vocab_size, H), jnp.float32) * 0.02).astype(dt),
        "layers": layers,
        "final_norm": jnp.ones((H,), dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = qrand(ks[8], (H, cfg.vocab_size))
    return params


def mm(x: jax.Array, w, a8: bool = False) -> jax.Array:
    """x @ w for plain or quantized weights.

    a8=False: weight-only — int8 weights cast into the bf16 MXU feed (halves
    HBM weight traffic; the small-batch decode regime).
    a8=True (W8A8): activations are quantized per token (symmetric amax/127)
    and the matmul runs int8 x int8 on the MXU at twice the bf16 rate — the
    large-batch regime where Jacobi blocks make decode compute-bound
    (measured 51.3 -> 32.0 ms per B=8, L=64 Jacobi forward on 7B/v5e).
    Epilogue applies (per-token act scale) x (per-channel weight scale) in
    fp32.  Standard dynamic-quant recipe; greedy AR==Jacobi exactness is
    preserved because both paths run the identical quantized program.
    """
    if isinstance(w, dict):
        if a8:
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            sx = jnp.maximum(amax / 127.0, 1e-8)
            xq = jnp.round(xf / sx).astype(jnp.int8)
            y = jnp.dot(xq, w["q"], preferred_element_type=jnp.int32)
            return (
                y.astype(jnp.float32) * sx * w["s"].astype(jnp.float32)[..., 0, :]
            ).astype(x.dtype)
        y = jnp.dot(x, w["q"].astype(x.dtype), preferred_element_type=x.dtype)
        return y * w["s"].astype(x.dtype)[..., 0, :]
    return x @ w


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w
