"""Timing probe: query-tiled flash prefill kernel vs the dense XLA path.

Usage: python scripts/probe_prefill_attn.py [T] [prefix]
One 7B-geometry layer; queries at positions [prefix, prefix+T) against a
paged cache holding prefix+T tokens (the chunked-prefill shape).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jacobiforcing_tpu.ops.attention import paged_attention_xla
from jacobiforcing_tpu.ops.pallas.paged_attention import paged_attention_pallas

T = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
PREFIX = int(sys.argv[2]) if len(sys.argv) > 2 else 0

NH, KH, D, PAGE = 28, 4, 128, 256
B = 1
CTX = PREFIX + T
P = -(-CTX // PAGE)

key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, T, NH, D), jnp.bfloat16)
k = jax.random.normal(key, (KH, (B * P + 2) * PAGE, D), jnp.bfloat16)
v = jax.random.normal(key, (KH, (B * P + 2) * PAGE, D), jnp.bfloat16)
bt = jnp.asarray(np.arange(B * P, dtype=np.int32).reshape(B, P), jnp.int32)
clen = jnp.full((B,), CTX, jnp.int32)
pos = jnp.broadcast_to(jnp.arange(PREFIX, CTX, dtype=jnp.int32), (B, T))
scale = 1.0 / D**0.5

INNER = 8


def make_loop(fn):
    @jax.jit
    def loop(q0):
        def body(qc, _):
            o = fn(qc, k, v, bt, clen, pos, scale, page_size=PAGE)
            return (o * 0.5).astype(qc.dtype), ()

        qn, _ = jax.lax.scan(body, q0, None, length=INNER)
        # scalar carry-out: the host readback (the only reliable tunnel
        # barrier) must not transfer the [B,T,NH,D] output — at T=4096
        # that is 29MB over the tunnel and dwarfs the kernel time
        return jnp.sum(qn.astype(jnp.float32))

    return loop


def time_impl(name, fn):
    loop = make_loop(fn)
    np.asarray(loop(q))  # compile + warm (host readback: tunnel barrier)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = loop(q)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / (reps * INNER)
    print(f"{name:8s} T={T} prefix={PREFIX}: {dt*1e3:.3f} ms/layer-call")
    return dt


tk = time_impl("pallas", paged_attention_pallas)
try:
    tx = time_impl("xla", paged_attention_xla)
    print(f"speedup: {tx/tk:.2f}x")
except Exception as e:  # dense scores can OOM at large T*S
    print(f"xla path failed: {str(e)[:120]}")

# causal-flash HBM roofline for the KV stream: each query tile of QT rows
# reads min(clen, qstart+QT) keys+values
QT = 2048 // (NH // KH) // 128 * 128
nqt = -(-T // QT)
kv_bytes = 0
for t in range(nqt):
    kv_bytes += min(CTX, PREFIX + (t + 1) * QT) * KH * D * 2 * 2
print(f"kv stream {kv_bytes/1e6:.1f} MB -> roofline {kv_bytes/820e9*1e3:.3f} ms")
