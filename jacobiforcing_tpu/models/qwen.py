"""Qwen2.5 / Qwen3 decoder in functional JAX with a paged KV cache.

TPU-first re-design of the reference model stack
(inference_engine/models/qwen3.py:14-215 + inference_engine/layers/*):

  * pure functions over a parameter pytree — no Module state; `jit`/`pjit`
    shard via NamedSharding on the param arrays themselves;
  * per-layer weights are STACKED along a leading layer axis and the decoder
    runs as one `lax.scan` — one compiled layer body instead of N unrolled
    layers, which keeps Jacobi-loop compile times low;
  * the KV cache is a flat paged array `[layers, kv_heads, num_pages*page, hd]`
    (head-major so a page is a contiguous per-head HBM slab for the Pallas
    kernel) indexed through per-sequence block tables; "trimming" KV
    (reference block_manager.py:534-565 `trim_kv_only_fast`) is a pure
    length-counter decrement — stale slots are masked in attention and
    overwritten later;
  * ONE attention implementation serves prefill, AR decode (L=1) and Jacobi
    blocks (L=n) so greedy argmax is bit-stable across paths — the property
    the reference gets by reusing flash_attn_with_kvcache for both
    (inference_engine/layers/attention.py:98-157).

Supports both Qwen2-style checkpoints (qkv bias, no qk-norm) and Qwen3-style
(no bias, per-head q/k RMSNorm) via `ModelConfig` flags — mirroring the
reference's `qkv_bias` switch (qwen3.py:67-69, 131).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from jacobiforcing_tpu.ops.attention import paged_attention
from jacobiforcing_tpu.ops.kv_cache import KVCache, write_kv, write_kv_scaled
from jacobiforcing_tpu.ops.quant import mm as _mm_raw


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model hyper-parameters (hashable: usable as a jit static arg)."""

    vocab_size: int = 151936
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    max_position: int = 32768
    qkv_bias: bool = True  # Qwen2-style; False => Qwen3-style qk-norm
    qk_norm: bool = False
    tie_word_embeddings: bool = False
    # W8A8 serving: per-token activation quant + int8 MXU matmuls (ops/quant.mm
    # a8 path).  Static so each jit specializes; engine sets it for
    # quantization="w8a8".
    act_quant: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @staticmethod
    def tiny(vocab_size: int = 256, **kw) -> "ModelConfig":
        """A CPU-testable toy config."""
        defaults = dict(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            max_position=1024,
            qkv_bias=True,
            qk_norm=False,
            # fp64 on CPU test runs (x64 enabled in tests/conftest.py): makes
            # greedy argmax immune to cross-shape reassociation noise on a
            # random model whose top-2 logit gaps can be ~1e-3.
            dtype=jnp.float64,
        )
        defaults.update(kw)
        return ModelConfig(**defaults)

    @staticmethod
    def from_hf_config(hf: Dict[str, Any]) -> "ModelConfig":
        """Build from an HF config.json dict (Qwen2/Qwen3 families)."""
        mt = hf.get("model_type", "qwen2")
        qkv_bias = hf.get("attention_bias", mt == "qwen2")
        head_dim = hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
        return ModelConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            head_dim=head_dim,
            rope_theta=hf.get("rope_theta", 1_000_000.0),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            max_position=hf.get("max_position_embeddings", 32768),
            qkv_bias=qkv_bias,
            qk_norm=(not qkv_bias) or mt == "qwen3",
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
        )


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def init_params(cfg: ModelConfig, key: jax.Array) -> Dict[str, Any]:
    """Random-init a parameter pytree (layer-stacked). For tests/benchmarks."""
    k = iter(jax.random.split(key, 16))
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    qs, kvs, D = cfg.q_size, cfg.kv_size, cfg.head_dim
    dt = cfg.dtype

    def dense(key, shape, scale=None):
        scale = scale or (1.0 / math.sqrt(shape[-2]))
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dt)

    layers = {
        "ln1": jnp.ones((L, H), dt),
        "ln2": jnp.ones((L, H), dt),
        "wq": dense(next(k), (L, H, qs)),
        "wk": dense(next(k), (L, H, kvs)),
        "wv": dense(next(k), (L, H, kvs)),
        "wo": dense(next(k), (L, qs, H)),
        "w_gate": dense(next(k), (L, H, I)),
        "w_up": dense(next(k), (L, H, I)),
        "w_down": dense(next(k), (L, I, H)),
    }
    if cfg.qkv_bias:
        layers["bq"] = jnp.zeros((L, qs), dt)
        layers["bk"] = jnp.zeros((L, kvs), dt)
        layers["bv"] = jnp.zeros((L, kvs), dt)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, D), dt)
        layers["k_norm"] = jnp.ones((L, D), dt)

    params = {
        "embed": dense(next(k), (cfg.vocab_size, H), scale=0.02),
        "layers": layers,
        "final_norm": jnp.ones((H,), dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(next(k), (H, cfg.vocab_size))
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _make_mm(cfg: "ModelConfig"):
    """Linear op bound to the config's activation-quant mode (static)."""
    if cfg.act_quant:
        return partial(_mm_raw, a8=True)
    return _mm_raw


def acc_dtype(dtype) -> Any:
    """Accumulation dtype: fp32, or fp64 when the model itself runs in fp64
    (CPU tests use fp64 so cross-shape reassociation noise cannot flip argmax
    near-ties of a tiny random model)."""
    return jnp.promote_types(dtype, jnp.float32)


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """RMSNorm in fp32+ (reference: layers/layernorm.py:16-40)."""
    xf = x.astype(acc_dtype(x.dtype))
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * lax.rsqrt(var + eps)
    return (out * w.astype(xf.dtype)).astype(x.dtype)


def rope_table(cfg: ModelConfig) -> Tuple[jax.Array, jax.Array]:
    """Precompute RoPE cos/sin [max_position, head_dim//2] in fp32
    (reference: layers/rotary_embedding.py:17-61)."""
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    t = jnp.arange(cfg.max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [P, half]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE. x: [..., T, n_heads, head_dim]; cos/sin: [..., T, half].

    Matches HF Qwen (non-interleaved): x1 = x[..., :half], x2 = x[..., half:].
    """
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    ad = acc_dtype(x.dtype)
    xf1, xf2 = x1.astype(ad), x2.astype(ad)
    o1 = xf1 * c - xf2 * s
    o2 = xf2 * c + xf1 * s
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, T] int32
    positions: jax.Array,  # [B, T] int32 (absolute; padding rows may repeat)
    kv_cache: KVCache,  # paged cache for all layers
    block_tables: jax.Array,  # [B, max_pages] int32 page ids (-1 = unused)
    cache_lens: jax.Array,  # [B] int32: #valid KV tokens INCLUDING this call's
    rope: Tuple[jax.Array, jax.Array],
    *,
    write_mask: Optional[jax.Array] = None,  # [B, T] bool: write KV for token?
) -> Tuple[jax.Array, KVCache]:
    """One forward pass over T tokens per sequence against the paged cache.

    Serves all three contexts of the reference attention layer
    (inference_engine/layers/attention.py:94-157):
      prefill        T = padded prompt len, positions 0..P-1
      AR decode      T = 1, position S-1
      Jacobi block   T = L, positions S-1..S+L-2

    Returns (hidden [B, T, H], updated kv_cache). Logits are computed
    separately (`logits_at`) so callers can gather positions first.
    """
    B, T = input_ids.shape
    page = kv_cache.page_size

    x = params["embed"].astype(cfg.dtype)[input_ids]  # [B, T, H]

    cos_t, sin_t = rope
    cos = cos_t[positions]  # [B, T, half] fp32
    sin = sin_t[positions]

    # Slot mapping: absolute position -> flat cache slot via block table.
    page_idx = jnp.take_along_axis(
        block_tables, jnp.clip(positions // page, 0, block_tables.shape[1] - 1), axis=1
    )  # [B, T]
    slots = page_idx * page + positions % page  # [B, T]
    if write_mask is not None:
        # Out-of-range slot => dropped by scatter (mode="drop").
        slots = jnp.where(write_mask, slots, kv_cache.num_slots)
    slots = jnp.where(page_idx < 0, kv_cache.num_slots, slots)

    lp = params["layers"]
    scale = 1.0 / math.sqrt(cfg.head_dim)
    mm_ = _make_mm(cfg)
    scaled = kv_cache.scaled  # fp8 KV with per-row dequant scales

    def layer_body(carry, xs):
        h = carry
        if scaled:
            w, k_cache_l, v_cache_l, ks_l, vs_l = xs
        else:
            w, k_cache_l, v_cache_l = xs
            ks_l = vs_l = None
        # h: [B, T, H]
        hn = rms_norm(h, w["ln1"], cfg.rms_norm_eps)
        q = mm_(hn, w["wq"])
        kk = mm_(hn, w["wk"])
        vv = mm_(hn, w["wv"])
        if cfg.qkv_bias:
            q = q + w["bq"]
            kk = kk + w["bk"]
            vv = vv + w["bv"]
        q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
        kk = kk.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        vv = vv.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = rms_norm(q, w["q_norm"], cfg.rms_norm_eps)
            kk = rms_norm(kk, w["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)

        if scaled:
            k_cache_l, v_cache_l, ks_l, vs_l = write_kv_scaled(
                k_cache_l, v_cache_l, ks_l, vs_l, kk, vv, slots
            )
        else:
            k_cache_l, v_cache_l = write_kv(k_cache_l, v_cache_l, kk, vv, slots)

        o = paged_attention(
            q,
            k_cache_l,
            v_cache_l,
            block_tables,
            cache_lens,
            positions,
            scale,
            page_size=page,
            k_scale_l=ks_l,
            v_scale_l=vs_l,
        )  # [B, T, NH, D]

        o = mm_(o.reshape(B, T, cfg.q_size), w["wo"])
        h = h + o
        hn = rms_norm(h, w["ln2"], cfg.rms_norm_eps)
        g = mm_(hn, w["w_gate"])
        u = mm_(hn, w["w_up"])
        mlp = mm_(jax.nn.silu(g.astype(acc_dtype(g.dtype))).astype(u.dtype) * u, w["w_down"])
        h = h + mlp
        if scaled:
            return h, (k_cache_l, v_cache_l, ks_l, vs_l)
        return h, (k_cache_l, v_cache_l)

    if scaled:
        xs = (lp, kv_cache.k, kv_cache.v, kv_cache.k_scale, kv_cache.v_scale)
        h, (new_k, new_v, new_ks, new_vs) = lax.scan(layer_body, x, xs)
    else:
        h, (new_k, new_v) = lax.scan(layer_body, x, (lp, kv_cache.k, kv_cache.v))
        new_ks = new_vs = None
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return h, KVCache(k=new_k, v=new_v, page_size=page,
                      k_scale=new_ks, v_scale=new_vs)


def forward_spec(
    params: Dict[str, Any],
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, T] speculative token block (RA/cands/pseudos)
    positions: jax.Array,  # [B, T] semantic positions per token
    kv_cache: KVCache,
    block_tables: jax.Array,
    cache_lens: jax.Array,  # [B] committed KV length
    intra_mask: jax.Array,  # [B, T, T] visibility within the block
    rope: Tuple[jax.Array, jax.Array],
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Speculative forward: reads committed paged KV, writes NOTHING.

    Returns (hidden [B,T,H], k_new [layers,B,T,KH,D], v_new [...]) so the
    caller can scatter only the verified winner's K/V into the cache — the TPU
    analog of the reference's forward-then-trim over a batch-expanded
    DynamicCache (modeling/...unified.py:429-464, 616-626).
    """
    from jacobiforcing_tpu.ops.attention import paged_attention_with_block

    B, T = input_ids.shape
    x = params["embed"].astype(cfg.dtype)[input_ids]
    cos_t, sin_t = rope
    cos = cos_t[jnp.minimum(positions, cfg.max_position - 1)]
    sin = sin_t[jnp.minimum(positions, cfg.max_position - 1)]
    lp = params["layers"]
    scale = 1.0 / math.sqrt(cfg.head_dim)
    mm_ = _make_mm(cfg)
    scaled = kv_cache.scaled

    def layer_body(h, xs):
        if scaled:
            w, k_cache_l, v_cache_l, ks_l, vs_l = xs
        else:
            w, k_cache_l, v_cache_l = xs
            ks_l = vs_l = None
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

        kk_attn, vv_attn = kk, vv
        if scaled:
            # fake-quantize the in-flight block so speculative verification
            # sees EXACTLY the values a commit would store (fp8 round-trip) —
            # keeps MR greedy bit-identical to the AR/Jacobi cache path
            from jacobiforcing_tpu.ops.kv_cache import quantize_rows

            kq, kss = quantize_rows(kk, kv_cache.k.dtype)
            vq, vss = quantize_rows(vv, kv_cache.v.dtype)
            kk_attn = kq.astype(kk.dtype) * kss[..., None].astype(kk.dtype)
            vv_attn = vq.astype(vv.dtype) * vss[..., None].astype(vv.dtype)

        o = paged_attention_with_block(
            q, k_cache_l, v_cache_l, block_tables, cache_lens,
            kk_attn, vv_attn, intra_mask, scale, page_size=kv_cache.page_size,
            k_scale_l=ks_l, v_scale_l=vs_l,
        )
        o = mm_(o.reshape(B, T, cfg.q_size), w["wo"])
        h = h + o
        hn = rms_norm(h, w["ln2"], cfg.rms_norm_eps)
        g = mm_(hn, w["w_gate"])
        u = mm_(hn, w["w_up"])
        mlp = mm_(jax.nn.silu(g.astype(acc_dtype(g.dtype))).astype(u.dtype) * u, w["w_down"])
        return h + mlp, (kk, vv)

    xs = (lp, kv_cache.k, kv_cache.v)
    if scaled:
        xs = xs + (kv_cache.k_scale, kv_cache.v_scale)
    h, (k_new, v_new) = lax.scan(layer_body, x, xs)
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return h, k_new, v_new


def forward_dense(
    params: Dict[str, Any],
    cfg: ModelConfig,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T] (shared RoPE positions for k_j/last_j packing)
    rope: Tuple[jax.Array, jax.Array],
    attn_mask: Optional[jax.Array] = None,  # [B, T, T] bool, True = visible
    splash_spec: Optional[tuple] = None,  # static layout -> block-sparse kernel
    remat: bool = False,  # rematerialize layer activations on backward
) -> jax.Array:
    """Training-path forward: dense attention, no KV cache.

    `attn_mask` carries the packed-trajectory block mask of the consistency
    trainer (reference: soft_flexattn_cllm_trainer.py:220-286, FlexAttention
    create_block_mask); None = plain causal.  With `splash_spec` =
    (prompt_len, T_pairs, seq_len, N, variant, window, interpret) the mask is
    instead realized as a block-sparse splash-attention kernel (bs must be 1).
    Returns hidden [B, T, H].
    """
    B, T = input_ids.shape
    x = params["embed"].astype(cfg.dtype)[input_ids]
    cos_t, sin_t = rope
    cos = cos_t[positions]
    sin = sin_t[positions]
    if attn_mask is None:
        attn_mask = (
            jnp.arange(T, dtype=jnp.int32)[None, :, None]
            >= jnp.arange(T, dtype=jnp.int32)[None, None, :]
        )  # [1, T, T] causal (broadcasts over B)
    lp = params["layers"]
    scale = 1.0 / math.sqrt(cfg.head_dim)
    mm_ = _make_mm(cfg)
    groups = cfg.num_heads // cfg.num_kv_heads

    _splash = _splash_kernel = None
    if splash_spec is not None:
        from jacobiforcing_tpu.ops.pallas.train_attention import (
            make_train_attention_kernel,
            splash_train_attention as _splash,
        )

        p_len, t_pairs, seq_len, n_blk, variant, window, interp = splash_spec
        assert B == 1, "splash training attention packs one sequence per step"
        # built once per trace, OUTSIDE the layer scan (a cached kernel built
        # inside the scan body leaks tracers)
        _splash_kernel = make_train_attention_kernel(
            T, p_len, t_pairs, seq_len, n_blk, variant, window,
            cfg.num_heads, interp,
        )

    def layer_body(h, w):
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

        acc = acc_dtype(q.dtype)
        if splash_spec is not None:
            o = _splash(
                q[0], kk[0], vv[0], _splash_kernel,
                prompt_len=p_len, T_pairs=t_pairs, seq_len=seq_len, N=n_blk,
                variant=variant, window_size=window, interpret=interp,
            )[None]
        else:
            qg = q.reshape(B, T, cfg.num_kv_heads, groups, cfg.head_dim)
            scores = jnp.einsum("bthgd,bshd->bhgts", qg, kk, preferred_element_type=acc)
            scores = scores * scale
            mask = attn_mask[:, None, None, :, :]
            scores = jnp.where(mask, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            o = jnp.einsum("bhgts,bshd->bthgd", probs, vv)
        o = mm_(o.reshape(B, T, cfg.q_size), w["wo"])
        h = h + o
        hn = rms_norm(h, w["ln2"], cfg.rms_norm_eps)
        g = mm_(hn, w["w_gate"])
        u = mm_(hn, w["w_up"])
        mlp = mm_(jax.nn.silu(g.astype(acc)).astype(u.dtype) * u, w["w_down"])
        return h + mlp, None

    body = layer_body
    if remat:
        # trade FLOPs for memory: recompute each layer's activations in the
        # backward pass (the ZeRO-3 + gradient-checkpointing training regime
        # of the reference, scripts/train/train_jacobi_forcing_coder_n32.sh)
        body = jax.checkpoint(layer_body, prevent_cse=False)
    h, _ = lax.scan(body, x, lp)
    return rms_norm(h, params["final_norm"], cfg.rms_norm_eps)


def _act_quantize(hidden: jax.Array):
    """Per-row symmetric int8 activation quantization (the W8A8 recipe of
    ops/quant.mm, shared by the lm-head paths so act_quant configs run the
    head's matmuls on the int8 MXU instead of dequantizing the int8 head
    weights into the bf16 feed)."""
    hf = hidden.astype(jnp.float32)
    amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-8)
    return jnp.round(hf / sx).astype(jnp.int8), sx


def _head_logits(cfg, wq, ws, hidden, hq, acc):
    """Logits for one (possibly full) vocab slice of an int8 lm_head.

    hq = (xq, sx) from _act_quantize when cfg.act_quant, else None.
    """
    if hq is not None:
        xq, sx = hq
        y = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
        return y.astype(acc) * sx.astype(acc) * ws.astype(acc)[..., 0, :]
    y = jnp.dot(hidden, wq.astype(cfg.dtype), preferred_element_type=acc)
    return y * ws.astype(y.dtype)[..., 0, :]


def logits_at(params: Dict[str, Any], cfg: ModelConfig, hidden: jax.Array) -> jax.Array:
    """LM head over a (already gathered) hidden slice; fp32 logits.

    Reference: ParallelLMHead (inference_engine/layers/embed_head.py:56-66).
    """
    w = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    if cfg.tie_word_embeddings:
        w = w.T
    if isinstance(w, dict):  # int8 lm_head (weight-only or int8 MXU)
        hq = _act_quantize(hidden) if cfg.act_quant else None
        return _head_logits(cfg, w["q"], w["s"], hidden, hq, acc_dtype(cfg.dtype))
    return jnp.dot(
        hidden, w.astype(cfg.dtype), preferred_element_type=acc_dtype(cfg.dtype)
    )


def chunked_token_logprob(
    params,
    cfg,
    hidden: jax.Array,  # [..., H]
    tokens: jax.Array,  # [...] token whose log-prob is needed
    temperature: jax.Array,  # [...] > 0 (broadcast)
    *,
    vocab_chunk: int = 32768,
) -> jax.Array:
    """log p(token | hidden) at `temperature` WITHOUT materializing [..., V]
    logits: scans vocab chunks keeping an online logsumexp + the target
    token's logit.  Memory-efficient verify for the rejection-sampling
    decoder (the acceptance probability only needs p(drafted token))."""
    w = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    tied = cfg.tie_word_embeddings
    V = cfg.vocab_size
    acc = acc_dtype(cfg.dtype)
    t = jnp.maximum(temperature.astype(acc), 1e-6)
    if V <= vocab_chunk:
        logits = logits_at(params, cfg, hidden) / t[..., None]
        lse = jax.nn.logsumexp(logits, axis=-1)
        lx = jnp.take_along_axis(logits, tokens[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return lx - lse

    n_chunks = (V + vocab_chunk - 1) // vocab_chunk
    hq = _act_quantize(hidden) if (isinstance(w, dict) and cfg.act_quant) else None

    def body(carry, c):
        m, s, lx = carry
        start = jnp.minimum(c * vocab_chunk, V - vocab_chunk)
        if isinstance(w, dict):
            wq = lax.dynamic_slice_in_dim(w["q"], start, vocab_chunk, axis=-1)
            ws = lax.dynamic_slice_in_dim(w["s"], start, vocab_chunk, axis=-1)
            logits = _head_logits(cfg, wq, ws, hidden, hq, acc)
        else:
            if tied:
                wc = lax.dynamic_slice_in_dim(w, start, vocab_chunk, axis=0).T
            else:
                wc = lax.dynamic_slice_in_dim(w, start, vocab_chunk, axis=-1)
            logits = jnp.dot(hidden, wc.astype(cfg.dtype), preferred_element_type=acc)
        logits = logits / t[..., None]
        # exclude clamp-overlap duplicates and out-of-vocab columns
        col = start + jnp.arange(vocab_chunk, dtype=jnp.int32)
        ok = (col >= c * vocab_chunk) & (col < V)
        logits = jnp.where(ok, logits, -jnp.inf)
        cm = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m, cm)
        scale_old = jnp.exp(m - m_new)
        s_new = s * scale_old + jnp.sum(jnp.exp(logits - m_new[..., None]), axis=-1)
        # gather by UNCLAMPED chunk ownership (the clamp-overlap columns are
        # -inf-masked in this chunk; their owner chunk already gathered them)
        in_chunk = (tokens >= c * vocab_chunk) & (tokens < (c + 1) * vocab_chunk) & (tokens < V)
        idx = jnp.clip(tokens - start, 0, vocab_chunk - 1).astype(jnp.int32)
        val = jnp.take_along_axis(logits, idx[..., None], axis=-1)[..., 0]
        lx = jnp.where(in_chunk, val, lx)
        return (m_new, s_new, lx), None

    shape = hidden.shape[:-1]
    init = (
        jnp.full(shape, -jnp.inf, acc),
        jnp.zeros(shape, acc),
        jnp.full(shape, -jnp.inf, acc),
    )
    (m, s, lx), _ = lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.int32))
    return lx - (m + jnp.log(jnp.maximum(s, 1e-30)))


def greedy_tokens(
    params, cfg, hidden: jax.Array, *, vocab_chunk: int = 32768
) -> jax.Array:
    """argmax(lm_head(hidden)) over vocab CHUNKS.

    Avoids materializing the full [.., T, V] logits (e.g. 311MB fp32 at
    B=8, L=64, V=152k per Jacobi iteration): scan over vocab slices keeping a
    running (max, argmax).  Weights are still read exactly once.
    """
    w = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    tied = cfg.tie_word_embeddings
    V = cfg.vocab_size
    if V <= vocab_chunk:
        return jnp.argmax(logits_at(params, cfg, hidden), axis=-1).astype(jnp.int32)

    n_chunks = (V + vocab_chunk - 1) // vocab_chunk
    acc = acc_dtype(cfg.dtype)
    hq = _act_quantize(hidden) if (isinstance(w, dict) and cfg.act_quant) else None

    def body(carry, c):
        best, best_idx = carry
        # clamp so the final partial chunk overlaps the previous one instead of
        # reading out of bounds (indices stay true columns; max is idempotent)
        start = jnp.minimum(c * vocab_chunk, V - vocab_chunk)
        if isinstance(w, dict):
            wq = lax.dynamic_slice_in_dim(w["q"], start, vocab_chunk, axis=-1)
            ws = lax.dynamic_slice_in_dim(w["s"], start, vocab_chunk, axis=-1)
            logits = _head_logits(cfg, wq, ws, hidden, hq, acc)
        else:
            if tied:
                wc = lax.dynamic_slice_in_dim(w, start, vocab_chunk, axis=0).T
            else:
                wc = lax.dynamic_slice_in_dim(w, start, vocab_chunk, axis=-1)
            logits = jnp.dot(hidden, wc.astype(cfg.dtype), preferred_element_type=acc)
        # mask columns beyond V (dynamic_slice clamps -> duplicated tail cols)
        col = start + jnp.arange(vocab_chunk, dtype=jnp.int32)
        logits = jnp.where(col < V, logits, -jnp.inf)
        cmax = jnp.max(logits, axis=-1)
        cidx = start + jnp.argmax(logits, axis=-1).astype(jnp.int32)
        take = cmax > best
        return (jnp.where(take, cmax, best), jnp.where(take, cidx, best_idx)), None

    init = (
        jnp.full(hidden.shape[:-1], -jnp.inf, acc),
        jnp.zeros(hidden.shape[:-1], jnp.int32),
    )
    (best, best_idx), _ = lax.scan(
        body, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return best_idx
