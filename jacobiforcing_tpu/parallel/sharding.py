"""PartitionSpecs for model params, KV cache, and decode state.

Declarative equivalent of the reference's Megatron-style TP layer classes
(inference_engine/layers/linear.py:12-153, embed_head.py:9-66):

  * qkv / gate_up projections: column-parallel -> output dim over "model"
    (ColumnParallelLinear / QKVParallelLinear semantics);
  * o_proj / down_proj: row-parallel -> input dim over "model"; XLA inserts
    the psum the reference does by hand (linear.py:149-153);
  * embeddings + lm_head: vocab-parallel over "model" (embed_head.py:9-66);
  * KV cache: kv-heads over "model" (model_runner.py:529 divides KV heads per
    rank) — attention is fully local to each model shard;
  * batch dims of decode state over "data".

`fsdp` (ZeRO-3-style param sharding along "data", reference ds_config.json)
is layered on top for training by also sharding the leading layer-stack axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jacobiforcing_tpu.models.qwen import ModelConfig


def param_specs(cfg: ModelConfig, *, fsdp: bool = False) -> Dict[str, Any]:
    """PartitionSpec pytree matching `init_params` structure.

    With fsdp=True the large 3D layer stacks additionally shard their
    hidden-size axis over "data" (ZeRO-3 / FSDP analog for training).
    """
    d = "data" if fsdp else None
    layers = {
        "ln1": P(None, None),
        "ln2": P(None, None),
        "wq": P(None, d, "model"),
        "wk": P(None, d, "model"),
        "wv": P(None, d, "model"),
        "wo": P(None, "model", d),
        "w_gate": P(None, d, "model"),
        "w_up": P(None, d, "model"),
        "w_down": P(None, "model", d),
    }
    if cfg.qkv_bias:
        layers["bq"] = P(None, "model")
        layers["bk"] = P(None, "model")
        layers["bv"] = P(None, "model")
    if cfg.qk_norm:
        layers["q_norm"] = P(None, None)
        layers["k_norm"] = P(None, None)
    specs = {
        "embed": P("model", d),
        "layers": layers,
        "final_norm": P(None),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(d, "model")
    return specs


def kv_cache_spec() -> Any:
    """KV pages sharded over kv-heads on the model axis.

    k/v: [layers, kv_heads, slots, head_dim] -> P(None, "model", None, None).
    """
    from jacobiforcing_tpu.ops.kv_cache import KVCache

    return KVCache(
        k=P(None, "model", None, None), v=P(None, "model", None, None), page_size=0,
        # fp8 per-row dequant scales [layers, kv_heads, slots] follow the heads
        k_scale=P(None, "model", None), v_scale=P(None, "model", None),
    )


def decode_state_specs() -> Dict[str, Any]:
    """Batch-major decode state shards over "data"."""
    return {
        "tokens": P("data", None),
        "cur_len": P("data"),
        "draft": P("data", None),
        "block_tables": P("data", None),
    }


def shard_params(params: Dict[str, Any], cfg: ModelConfig, mesh: Mesh, *, fsdp=False):
    """device_put the param pytree with its NamedShardings.

    Handles int8 weight-only leaves ({"q": int8, "s": scale}): q follows the
    weight spec, the per-out-channel scale follows the spec's output axis.
    """
    specs = param_specs(cfg, fsdp=fsdp)

    def put(x, s):
        if isinstance(x, dict) and "q" in x:  # quantized leaf
            parts = list(s) + [None] * (x["q"].ndim - len(s))
            s_scale = P(*(parts[:-2] + [None, parts[-1]]))
            return {
                "q": jax.device_put(x["q"], NamedSharding(mesh, s)),
                "s": jax.device_put(x["s"], NamedSharding(mesh, s_scale)),
            }
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(
        put, params, specs, is_leaf=lambda x: isinstance(x, dict) and "q" in x
    )
