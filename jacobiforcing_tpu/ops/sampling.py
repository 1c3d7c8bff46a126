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
