"""Checkpoint loading: HF safetensors -> layer-stacked JAX param pytree.

Re-design of the reference weight loader (inference_engine/utils/loader.py:12-47
+ packed_modules_mapping, models/qwen3.py:186-192): instead of routing
q/k/v -> qkv_proj shards through per-param weight_loader callbacks, we map each
HF tensor name into the stacked pytree layout of `models.qwen.init_params`
(per-layer weights stacked on a leading axis, linear weights transposed to
[in, out] for x @ W).

Also exports `save_checkpoint` (HF-layout safetensors) so tests can round-trip
without network access.  The DeepSpeed ZeRO->HF merge tool
(generate_trajectory/data/tool_merge_ds_ckpts.py:1-45) has no analog here:
train/trainer.py checkpoints the full unsharded pytree via flax serialization,
and `save_checkpoint` emits the HF layout directly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from jacobiforcing_tpu.models.qwen import ModelConfig


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor from safetensors torch loader
        import torch

        if x.dtype == torch.bfloat16:
            return x.detach().float().numpy().astype(jnp.bfloat16)
        return x.detach().numpy()
    return np.asarray(x)


def load_checkpoint(path: str, dtype=jnp.bfloat16) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Load config.json + *.safetensors from an HF checkpoint dir."""
    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = ModelConfig.from_hf_config(hf_cfg)
    cfg = ModelConfig(**{**cfg.__dict__, "dtype": dtype})

    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors in {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    params = assemble_params(cfg, tensors, dtype)
    return cfg, params


def assemble_params(cfg: ModelConfig, tensors: Dict[str, np.ndarray], dtype) -> Dict[str, Any]:
    """Map HF Qwen2/Qwen3 tensor names into the stacked pytree."""

    def get(name: str) -> np.ndarray:
        t = tensors[name]
        return np.asarray(t)

    def lin(name: str) -> np.ndarray:  # HF [out, in] -> [in, out]
        return get(name).T

    L = cfg.num_layers
    pre = "model.layers.{}."
    stack = lambda f: np.stack([f(pre.format(i)) for i in range(L)])

    layers: Dict[str, Any] = {
        "ln1": stack(lambda p: get(p + "input_layernorm.weight")),
        "ln2": stack(lambda p: get(p + "post_attention_layernorm.weight")),
        "wq": stack(lambda p: lin(p + "self_attn.q_proj.weight")),
        "wk": stack(lambda p: lin(p + "self_attn.k_proj.weight")),
        "wv": stack(lambda p: lin(p + "self_attn.v_proj.weight")),
        "wo": stack(lambda p: lin(p + "self_attn.o_proj.weight")),
        "w_gate": stack(lambda p: lin(p + "mlp.gate_proj.weight")),
        "w_up": stack(lambda p: lin(p + "mlp.up_proj.weight")),
        "w_down": stack(lambda p: lin(p + "mlp.down_proj.weight")),
    }
    if cfg.qkv_bias:
        layers["bq"] = stack(lambda p: get(p + "self_attn.q_proj.bias"))
        layers["bk"] = stack(lambda p: get(p + "self_attn.k_proj.bias"))
        layers["bv"] = stack(lambda p: get(p + "self_attn.v_proj.bias"))
    if cfg.qk_norm:
        layers["q_norm"] = stack(lambda p: get(p + "self_attn.q_norm.weight"))
        layers["k_norm"] = stack(lambda p: get(p + "self_attn.k_norm.weight"))

    params: Dict[str, Any] = {
        "embed": get("model.embed_tokens.weight"),
        "layers": layers,
        "final_norm": get("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        if "lm_head.weight" in tensors:
            params["lm_head"] = lin("lm_head.weight")
        else:
            params["lm_head"] = get("model.embed_tokens.weight").T

    return {
        k: jnp.asarray(v, dtype) if not isinstance(v, dict)
        else {kk: jnp.asarray(vv, dtype) for kk, vv in v.items()}
        for k, v in params.items()
    }


def save_checkpoint(path: str, cfg: ModelConfig, params: Dict[str, Any]) -> None:
    """Write HF-layout config.json + model.safetensors (for tests/round-trip)."""
    os.makedirs(path, exist_ok=True)
    hf_cfg = {
        "model_type": "qwen2" if cfg.qkv_bias else "qwen3",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "max_position_embeddings": cfg.max_position,
        "attention_bias": cfg.qkv_bias,
        "tie_word_embeddings": cfg.tie_word_embeddings,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f)

    tensors: Dict[str, np.ndarray] = {}
    lp = params["layers"]

    def unstack(key, name, transpose):
        arr = np.asarray(lp[key], np.float32)
        for i in range(cfg.num_layers):
            t = arr[i].T if transpose else arr[i]
            tensors[f"model.layers.{i}.{name}"] = np.ascontiguousarray(t)

    unstack("ln1", "input_layernorm.weight", False)
    unstack("ln2", "post_attention_layernorm.weight", False)
    unstack("wq", "self_attn.q_proj.weight", True)
    unstack("wk", "self_attn.k_proj.weight", True)
    unstack("wv", "self_attn.v_proj.weight", True)
    unstack("wo", "self_attn.o_proj.weight", True)
    unstack("w_gate", "mlp.gate_proj.weight", True)
    unstack("w_up", "mlp.up_proj.weight", True)
    unstack("w_down", "mlp.down_proj.weight", True)
    if cfg.qkv_bias:
        unstack("bq", "self_attn.q_proj.bias", False)
        unstack("bk", "self_attn.k_proj.bias", False)
        unstack("bv", "self_attn.v_proj.bias", False)
    if cfg.qk_norm:
        unstack("q_norm", "self_attn.q_norm.weight", False)
        unstack("k_norm", "self_attn.k_norm.weight", False)
    tensors["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
    tensors["model.norm.weight"] = np.asarray(params["final_norm"], np.float32)
    if not cfg.tie_word_embeddings:
        tensors["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params["lm_head"], np.float32).T
        )

    from safetensors.numpy import save_file

    save_file(tensors, os.path.join(path, "model.safetensors"))
