"""A/B the raw Jacobi chunk loop under bench.py shapes vs LLMEngine shapes.

bench_engine measures ~54 ms/forward-trip where the raw batch8 loop measures
~31 ms; host-boundary probes price the tunnel sync at ~30 ms per STEP (2 ms
per trip at chunk_iters=16), so the rest must be in the executable itself.
Candidate shape differences (engine vs raw bench):
  * token buffer cap 8257 (max_model_len 8192 + margin) vs 833
  * block-table width 33 pages vs 4
  * KV cache 48 pages vs 32
  * iteration-budget chunking (chunk_iters=16) vs token-budget (128)
This sweeps each axis independently at B=8, W8A8 7B, ctx=512.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jacobiforcing_tpu.engine import runner
from jacobiforcing_tpu.models.qwen import ModelConfig, rope_table
from jacobiforcing_tpu.ops.calibrate import calibrate_flat_softmax
from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache
from jacobiforcing_tpu.ops.quant import init_quantized_params

B, L, CTX, PAGE = 8, 64, 512, 256

cfg = dataclasses.replace(ModelConfig(), act_quant=True)
params = init_quantized_params(cfg, jax.random.PRNGKey(0))
rope = rope_table(cfg)
calibrate_flat_softmax(params, cfg, rope)


def run(tag, cap, bt_width, kv_pages, chunk_iters, budget=128):
    kv = alloc_kv_cache(cfg.num_layers, kv_pages, PAGE, cfg.num_kv_heads,
                        cfg.head_dim, jnp.bfloat16)
    # rows own disjoint page ranges like the raw bench; width padded with -1
    pps = kv_pages // B
    bt = np.full((B, bt_width), -1, np.int32)
    for i in range(B):
        bt[i, :pps] = np.arange(i * pps, (i + 1) * pps)
    bt = jnp.asarray(bt)
    tokens = jnp.zeros((B, cap), jnp.int32).at[:, :CTX].set(1)

    def chunk(kv, tokens):
        return runner.jacobi_chunk_greedy(
            params, cfg, rope, kv, tokens, jnp.full((B,), CTX, jnp.int32),
            jnp.ones((B, L), jnp.int32), jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32), bt,
            jnp.full((B,), pps * PAGE, jnp.int32),
            jnp.full((B,), CTX + budget, jnp.int32), jax.random.PRNGKey(1), -1,
            jnp.full((B,), budget + 8, jnp.int32), chunk_budget=budget,
            chunk_iters=chunk_iters,
        )

    res = chunk(kv, tokens)
    np.asarray(res["iters"])
    tokens2 = jnp.zeros((B, cap), jnp.int32).at[:, :CTX].set(1)
    t0 = time.perf_counter()
    res = chunk(res["kv"], tokens2)
    total_iters = int(np.asarray(res["iters"]).sum())
    trips = int(np.asarray(res["iters"]).max())
    dt = time.perf_counter() - t0
    print(f"{tag:42s} trips={trips:3d} iters={total_iters:4d} "
          f"{dt * 1e3 / trips:7.2f} ms/trip  {4 * total_iters / dt:7.1f} tok/s@tpf4")
    del kv, res, tokens, tokens2
    return dt * 1e3 / trips


run("raw bench (cap833, bt4, kv32p, tokmode)", 833, 4, 32, 0)
run("engine cap (8257)", 8257, 4, 32, 0)
run("engine bt width (33)", 833, 33, 32, 0)
run("engine kv pages (48)", 833, 33, 48, 0)
run("iteration-budget chunking (16 trips)", 833, 4, 32, 16)
run("all engine shapes", 8257, 33, 48, 16)
