"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: single-stream Jacobi decode throughput on Qwen2.5-7B dims (the
reference's benchmark model) running INT8 weight-only on one v5e chip.
Since acceptance rate (TPF) is a property of the trained checkpoint, not the
framework, we measure the framework quantity — Jacobi iteration rate (one
L=64 block forward + fused chunked-argmax verify against the paged KV cache,
driven by the real device-resident decode loop) — and report tokens/s at the
reference's measured TPF=4.0 (README.md:261): tps = TPF * iters/s.
vs_baseline compares against the reference's 7B Jacobi-MR 163.9 tok/s on one
A100 (BASELINE.md).

Env knobs: JF_BENCH_PRESET=7b|1.5b|tiny, JF_BENCH_QUANT=int8|none,
JF_BENCH_B, JF_BENCH_L, JF_BENCH_CTX, JF_BENCH_TOKENS, JF_ATTN_IMPL.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from jacobiforcing_tpu.engine import runner
    from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
    from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache
    from jacobiforcing_tpu.ops.quant import init_quantized_params

    preset = os.environ.get("JF_BENCH_PRESET", "7b")
    quant = os.environ.get("JF_BENCH_QUANT", "int8" if preset == "7b" else "none")
    if preset == "7b":
        cfg = ModelConfig()  # Qwen2.5-7B dims
    elif preset == "tiny":
        cfg = ModelConfig.tiny(dtype=jnp.bfloat16)
    else:
        cfg = ModelConfig(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_layers=28, num_heads=12, num_kv_heads=2, head_dim=128,
            tie_word_embeddings=True,
        )
    if quant == "w8a8":  # int8 weights + per-token int8 activations (int8 MXU)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, act_quant=True)

    B = int(os.environ.get("JF_BENCH_B", "1"))
    L = int(os.environ.get("JF_BENCH_L", "64"))
    kv_dtype = {"fp8": jnp.float8_e4m3fn}.get(
        os.environ.get("JF_BENCH_KV", ""), jnp.bfloat16
    )
    page = 256
    ctx = int(os.environ.get("JF_BENCH_CTX", "1024"))
    budget = int(os.environ.get("JF_BENCH_TOKENS", "256"))  # tokens per chunk
    pages_per_seq = (ctx + budget + 2 * L) // page + 1

    key = jax.random.PRNGKey(0)
    if quant in ("int8", "w8a8"):
        params = init_quantized_params(cfg, key)
    else:
        params = init_params(cfg, key)
    rope = rope_table(cfg)
    kv = alloc_kv_cache(
        cfg.num_layers, B * pages_per_seq, page, cfg.num_kv_heads, cfg.head_dim,
        kv_dtype,
    )
    block_tables = jnp.asarray(
        np.arange(B * pages_per_seq, dtype=np.int32).reshape(B, pages_per_seq))

    cap = ctx + budget + 2 * L + 1
    tokens = jnp.zeros((B, cap), jnp.int32).at[:, :ctx].set(1)
    cur_len = jnp.full((B,), ctx, jnp.int32)
    draft = jnp.ones((B, L), jnp.int32)
    eos = jnp.zeros((B,), bool)
    iters0 = jnp.zeros((B,), jnp.int32)
    capacity = jnp.full((B,), pages_per_seq * page, jnp.int32)
    max_new = jnp.full((B,), budget, jnp.int32)

    def chunk(kv, tokens):
        # real device-resident decode loop; a random model commits ~1 tok/iter
        # so one chunk call runs ~`budget` full Jacobi iterations
        return runner.jacobi_chunk_greedy(
            params, cfg, rope, kv, tokens, cur_len, draft, eos, iters0,
            block_tables, capacity, max_new, jax.random.PRNGKey(1), -1,
            jnp.full((B,), budget + 8, jnp.int32),
            chunk_budget=budget,
        )

    res = chunk(kv, tokens)  # compile + warm
    np.asarray(res["iters"])

    # timed run (fresh token buffer, same executable)
    tokens2 = jnp.zeros((B, cap), jnp.int32).at[:, :ctx].set(1)
    t0 = time.perf_counter()
    res = chunk(res["kv"], tokens2)
    total_iters = int(np.asarray(res["iters"]).sum())
    dt = time.perf_counter() - t0

    iters_per_s = total_iters / dt
    tpf = 4.0  # reference's measured TPF for Jacobi-MR (README.md:261)
    tps = tpf * iters_per_s
    baseline_tps = 163.9  # reference 7B Jacobi-MR on 1xA100 (BASELINE.md)
    kv_tag = "_kvfp8" if kv_dtype == jnp.float8_e4m3fn else ""
    print(json.dumps({
        "metric": f"jacobi_tps_at_tpf4_{preset}_{quant}{kv_tag}_L{L}_B{B}",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / baseline_tps, 3),
    }))


if __name__ == "__main__":
    main()
