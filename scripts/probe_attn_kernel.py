"""Timing probe for the paged-attention kernel on the real chip.

Usage: python scripts/probe_attn_kernel.py [B] [ctx] [L]
Prints kernel ms/call and the HBM roofline time for the KV bytes it reads.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jacobiforcing_tpu.ops.pallas.paged_attention import (
    paged_attention_pallas, set_flat_softmax_bound,
)

# JF_PA_CALIB_BOUND=<x>: simulate a calibrated model (drives the auto-flat
# policy and, round 5, the clamp elision — bound <= cap/2 skips the
# per-element min pass).  Use with JF_PA_SOFTMAX unset (auto).
if os.environ.get("JF_PA_CALIB_BOUND"):
    set_flat_softmax_bound(float(os.environ["JF_PA_CALIB_BOUND"]))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
L = int(sys.argv[3]) if len(sys.argv) > 3 else 64

# Qwen2.5-7B geometry, one layer
NH, KH, D, PAGE = 28, 4, 128, 256
NPAGES_TOT = B * (CTX // PAGE) + 8

key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, L, NH, D), jnp.bfloat16)
k = jax.random.normal(key, (KH, NPAGES_TOT * PAGE, D), jnp.bfloat16)
v = jax.random.normal(key, (KH, NPAGES_TOT * PAGE, D), jnp.bfloat16)
P = CTX // PAGE
bt = jnp.asarray(
    np.arange(B * P, dtype=np.int32).reshape(B, P), jnp.int32
)
clen = jnp.full((B,), CTX, jnp.int32)
pos = jnp.broadcast_to(jnp.arange(CTX - L, CTX, dtype=jnp.int32), (B, L))

# Kernel calls per dispatch.  NOTE (round 5): 32 leaves ~0.8us/call of
# per-dispatch queue overhead in the number at B=1 geometries (8k: 94us at
# INNER=32 vs 67us at INNER=1024 same day); the deep setting matches the
# serving regime (the decode loop runs inside lax.while_loop, fully
# amortized), so prefer JF_PROBE_INNER=1024 for absolute ratios and keep a
# fixed INNER only for same-protocol A/Bs.
INNER = int(os.environ.get("JF_PROBE_INNER", "32"))


@jax.jit
def loop(q0):
    def body(qc, _):
        o = paged_attention_pallas(
            qc, k, v, bt, clen, pos, 1.0 / D**0.5, page_size=PAGE
        )
        # feed output back as the next q so calls can't be elided/overlapped
        return (o * 0.5).astype(qc.dtype), ()

    qn, _ = jax.lax.scan(body, q0, None, length=INNER)
    return qn


# NOTE: on the axon tunnel block_until_ready does NOT wait; a host readback
# (np.asarray) is the only reliable completion barrier.
np.asarray(loop(q))  # compile + warm
# The tunnel has ~30ms dispatch latency; deep queues amortize it.
reps = 32
t0 = time.perf_counter()
for _ in range(reps):
    out = loop(q)
np.asarray(out)
ms = (time.perf_counter() - t0) / (reps * INNER) * 1e3

kv_bytes = 2 * B * CTX * KH * D * 2  # K+V bf16 read once
roofline_ms = kv_bytes / 819e9 * 1e3  # v5e ~819 GB/s
print(
    f"B={B} ctx={CTX} L={L}: {ms:.3f} ms/call  "
    f"(KV {kv_bytes/2**20:.1f} MiB, HBM roofline {roofline_ms:.3f} ms, "
    f"ratio {ms/roofline_ms:.1f}x)"
)
