"""Benchmark driver: prints ONE JSON line with the headline metric.

Round-1 metric: single-stream Jacobi-equivalent decode throughput on the
largest Qwen2.5-family config that fits one chip.  Since acceptance rate (TPF)
is a property of the trained checkpoint, not the framework, we measure the
framework quantity — Jacobi iteration rate (one L=64-token block forward + fused
verify against the paged KV cache) — and report tokens/s at the reference's
measured TPF=4.0 (README.md:261): tps = TPF * iters/s.  vs_baseline compares
against the reference's 7B Jacobi-MR 163.9 tok/s on one A100 (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JF_ATTN_IMPL", "auto")


def main():
    import jax
    import jax.numpy as jnp

    from jacobiforcing_tpu.models.qwen import (
        ModelConfig, forward, greedy_tokens, init_params, rope_table,
    )
    from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache

    preset = os.environ.get("JF_BENCH_PRESET", "1.5b")
    if preset == "7b":
        cfg = ModelConfig()
    elif preset == "tiny":
        cfg = ModelConfig.tiny(dtype=jnp.bfloat16)
    else:
        cfg = ModelConfig(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_layers=28, num_heads=12, num_kv_heads=2, head_dim=128,
            tie_word_embeddings=True,
        )

    B = int(os.environ.get("JF_BENCH_B", "1"))
    L = int(os.environ.get("JF_BENCH_L", "64"))
    page = 256
    ctx = int(os.environ.get("JF_BENCH_CTX", "1024"))  # committed context length
    pages_per_seq = (ctx + 2 * L) // page + 1

    params = init_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)
    kv = alloc_kv_cache(cfg.num_layers, B * pages_per_seq, page, cfg.num_kv_heads, cfg.head_dim)
    block_tables = jnp.asarray(
        np.arange(B * pages_per_seq, dtype=np.int32).reshape(B, pages_per_seq))
    draft = jnp.zeros((B, L), jnp.int32)
    cur_len = jnp.full((B,), ctx, jnp.int32)

    @jax.jit
    def jacobi_iter(params, rope, kv, draft, cur_len, block_tables):
        positions = (cur_len - 1)[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
        h, kv = forward(
            params, cfg, draft, positions, kv, block_tables,
            cache_lens=cur_len - 1 + L, rope=rope,
            write_mask=jnp.ones((B, L), bool),
        )
        return greedy_tokens(params, cfg, h), kv

    # warmup (compile)
    g, kv = jacobi_iter(params, rope, kv, draft, cur_len, block_tables)
    g.block_until_ready()

    iters = int(os.environ.get("JF_BENCH_ITERS", "50"))
    t0 = time.perf_counter()
    for _ in range(iters):
        g, kv = jacobi_iter(params, rope, kv, g[:, :L], cur_len, block_tables)
    g.block_until_ready()
    dt = time.perf_counter() - t0

    iters_per_s = iters / dt
    tpf = 4.0  # reference's measured TPF for Jacobi-MR (README.md:261)
    tps = tpf * iters_per_s * B
    baseline_tps = 163.9  # reference 7B Jacobi-MR on 1xA100 (BASELINE.md)
    print(json.dumps({
        "metric": f"jacobi_tps_at_tpf4_{preset}_L{L}_B{B}",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / baseline_tps, 3),
    }))


if __name__ == "__main__":
    main()
