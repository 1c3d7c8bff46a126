"""End-to-end prefill timing: full-model runner.prefill on the real chip.

Usage: JF_ATTN_IMPL=auto|xla python scripts/probe_prefill_e2e.py [preset] [T]
Times one prefill-with-drafting call (prompt of T tokens, L=64 draft).
One impl per process: JF_ATTN_IMPL is read at trace time, so flipping it
mid-process would silently reuse the first compile.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESET = sys.argv[1] if len(sys.argv) > 1 else "1.5b"
T = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

import jax
import jax.numpy as jnp
import numpy as np

from jacobiforcing_tpu.engine import runner
from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache

if PRESET == "7b":
    cfg = ModelConfig()
else:
    cfg = ModelConfig(
        vocab_size=151936, hidden_size=1536, intermediate_size=8960,
        num_layers=28, num_heads=12, num_kv_heads=2, head_dim=128,
        tie_word_embeddings=True,
    )

PAGE, L = 256, 64
B = 1
pps = (T + 2 * L) // PAGE + 1
if os.environ.get("JF_PROBE_QUANT", "") == "int8":
    from jacobiforcing_tpu.ops.quant import init_quantized_params

    params = init_quantized_params(cfg, jax.random.PRNGKey(0))
else:
    params = init_params(cfg, jax.random.PRNGKey(0))
rope = rope_table(cfg)
bt = jnp.asarray(np.arange(B * pps, dtype=np.int32).reshape(B, pps))
prompts = jnp.ones((B, T), jnp.int32)
lens = jnp.full((B,), T, jnp.int32)


def run_once():
    kv = alloc_kv_cache(cfg.num_layers, B * pps, PAGE, cfg.num_kv_heads, cfg.head_dim)
    out = runner.prefill(
        params, cfg, rope, prompts, jnp.zeros((B,), jnp.int32), lens, lens,
        kv, bt, n_out=L,
    )
    return out[2]  # draft [B, L]


impl = os.environ.get("JF_ATTN_IMPL", "auto")
np.asarray(run_once())  # compile + warm
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    d = run_once()
d_np = np.asarray(d)
dt = (time.perf_counter() - t0) / reps
print(f"{PRESET} T={T} impl={impl}: {dt*1e3:.1f} ms/prefill "
      f"({T/dt:.0f} tok/s) draft[:4]={d_np[0,:4].tolist()}", flush=True)
