"""Token sampling ops (reference: inference_engine/layers/sampler.py:10-24).

Greedy argmax or Gumbel-max sampling with optional temperature / top-k / top-p
target shaping (reference: jacobi_decoding_nongreedy.py:64-123).  Plain jitted
JAX — XLA fuses these into the surrounding lm_head matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def shape_logits(
    logits: jax.Array,  # [..., V] fp32
    temperature: jax.Array,  # [...] broadcastable; 0 => greedy handled by caller
    top_k: int = -1,
    top_p: float = 1.0,
) -> jax.Array:
    """Apply temperature / top-k / top-p to produce target-shaped logits."""
    t = jnp.maximum(temperature, 1e-6)
    logits = logits / t[..., None]
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, _NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with cumulative prob >= top_p (always >= 1 tok)
        cutoff_mask = cum - probs < top_p
        kth = jnp.max(jnp.where(cutoff_mask, sorted_logits, _NEG_INF), axis=-1, keepdims=True)
        logits = jnp.where(logits < kth, _NEG_INF, logits)
    return logits


def sample(
    logits: jax.Array,  # [..., V] fp32 (already shaped)
    key: jax.Array,
    temperature: jax.Array,  # [...]: rows with 0 take argmax
) -> jax.Array:
    """Gumbel-max sampling; rows with temperature == 0 reduce to argmax."""
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-10) + 1e-10)
    noisy = logits + jnp.where(temperature[..., None] > 0, gumbel, 0.0)
    return jnp.argmax(noisy, axis=-1).astype(jnp.int32)


def target_probs(
    logits: jax.Array,  # [..., V] fp32
    temperature: jax.Array,  # [...] > 0
    top_k: int = -1,  # static (engine groups requests by top_k)
    top_p: jax.Array | None = None,  # [...] dynamic nucleus threshold
) -> jax.Array:
    """logits -> target sampling distribution p(.).

    Reference: _build_target_probs (jacobi_decoding_nongreedy.py:110-123):
    temperature softmax, then top-k zero+renorm, then nucleus filtering
    keeping the smallest prefix with cdf <= top_p (always >= 1 token).
    """
    t = jnp.maximum(temperature, 1e-6)[..., None]
    probs = jax.nn.softmax(logits / t, axis=-1)
    if top_k > 0 and top_k < probs.shape[-1]:
        kth = jax.lax.top_k(probs, top_k)[0][..., -1:]
        probs = jnp.where(probs < kth, 0.0, probs)
        probs = probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-12)
    if top_p is not None:
        order = jnp.argsort(-probs, axis=-1)
        sorted_p = jnp.take_along_axis(probs, order, axis=-1)
        cdf = jnp.cumsum(sorted_p, axis=-1)
        keep_sorted = cdf <= top_p[..., None]
        keep_sorted = keep_sorted.at[..., 0].set(True)
        inv = jnp.argsort(order, axis=-1)  # unsort permutation
        keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
        probs = jnp.where(keep, probs, 0.0)
        probs = probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-12)
    return probs
