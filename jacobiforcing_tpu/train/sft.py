"""SFT baseline trainer: plain next-token CE on packed rows.

Reference: JacobiForcing/train/baseline_sft_train.py:24-198 (the fairness
baseline).  Also serves as the minimal mesh-sharded train step exercised by
`__graft_entry__.dryrun_multichip` — params sharded over ("data" fsdp,
"model" tp), batch over "data", AdamW state sharded like params (ZeRO
analog of the reference's DeepSpeed ZeRO-3 setup, scripts/train/ds_config.json).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jacobiforcing_tpu.models.qwen import ModelConfig, forward_dense, logits_at
from jacobiforcing_tpu.parallel.sharding import param_specs


def sft_loss(
    params: Dict[str, Any],
    cfg: ModelConfig,
    rope,
    input_ids: jax.Array,  # [B, T]
    loss_mask: jax.Array,  # [B, T] float; 0 masks pad/prompt positions
) -> jax.Array:
    """Mean next-token cross-entropy over masked positions
    (labels = input shifted; PAD -> masked, reference baseline_sft_train.py)."""
    B, T = input_ids.shape
    positions = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(B, axis=0)
    h = forward_dense(params, cfg, input_ids, positions, rope)
    logits = logits_at(params, cfg, h[:, :-1, :])  # [B, T-1, V]
    targets = input_ids[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    m = loss_mask[:, 1:]
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """AdamW beta=(0.9, 0.95), the reference's training setup
    (soft_flexattn_train_cllm.py AdamW + cosine)."""
    return optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay)


def make_sft_train_step(cfg: ModelConfig, mesh: Mesh, optimizer=None):
    """Build (init_fn, step_fn) jitted over the mesh.

    step_fn(params, opt_state, rope, batch) -> (params, opt_state, loss)
    """
    optimizer = optimizer or make_optimizer()
    pspecs = param_specs(cfg, fsdp=False)

    def init_fn(params):
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspecs
        )
        return params, optimizer.init(params)

    dp = mesh.shape.get("data", 1)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, rope, input_ids, loss_mask):
        if input_ids.shape[0] % dp == 0:
            # data-parallel batch sharding (a non-divisible batch would crash
            # the SPMD partitioner; leave it replicated instead)
            input_ids = jax.lax.with_sharding_constraint(
                input_ids, NamedSharding(mesh, P("data", None))
            )
        loss, grads = jax.value_and_grad(sft_loss)(
            params, cfg, rope, input_ids, loss_mask
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn
