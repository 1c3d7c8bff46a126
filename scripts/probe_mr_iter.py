"""MR vs single-block Jacobi iteration time at serving geometry on the chip.

VERDICT item 4's done-criterion: MR at 4k ctx within ~1.3x of single-block
Jacobi iteration time.  Usage:

    python scripts/probe_mr_iter.py [ctx] [quant]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jacobiforcing_tpu.engine import multiblock, runner
    from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
    from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache
    from jacobiforcing_tpu.ops.quant import init_quantized_params

    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    quant = sys.argv[2] if len(sys.argv) > 2 else "w8a8"
    import dataclasses as dc

    cfg = ModelConfig()  # 7B dims
    if quant == "w8a8":
        cfg = dc.replace(cfg, act_quant=True)
    params = (
        init_quantized_params(cfg, jax.random.PRNGKey(0))
        if quant in ("int8", "w8a8")
        else init_params(cfg, jax.random.PRNGKey(0))
    )
    rope = rope_table(cfg)
    B, L, page = 1, 64, 256
    budget = 256
    pps = (ctx + budget + 4 * L) // page + 1
    cap = ctx + budget + 4 * L + 1

    def mk_tokens():
        return jnp.zeros((B, cap), jnp.int32).at[:, :ctx].set(1)

    def bench(fn, kv0, n=3):
        # jacobi chunk programs DONATE kv and tokens: thread the returned kv
        # and hand each call a fresh token buffer
        res = fn(kv0, mk_tokens())
        np.asarray(res["iters"])
        t0 = time.perf_counter()
        tot = toks = 0
        for _ in range(n):
            res = fn(res["kv"], mk_tokens())
            tot += int(np.asarray(res["iters"]).sum())
            toks += int(np.asarray(res.get("generated", res["iters"])).sum())
        dt = time.perf_counter() - t0
        return dt / max(tot, 1) * 1e3, tot, toks, dt

    # ---- single-block ----
    kv = alloc_kv_cache(cfg.num_layers, B * pps, page, cfg.num_kv_heads,
                        cfg.head_dim, jnp.bfloat16)
    bt = jnp.asarray(np.arange(B * pps, dtype=np.int32).reshape(B, pps))

    def single(kv, tokens):
        return runner.jacobi_chunk_greedy(
            params, cfg, rope, kv, tokens, jnp.full((B,), ctx, jnp.int32),
            jnp.ones((B, L), jnp.int32), jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32), bt, jnp.full((B,), pps * page, jnp.int32),
            jnp.full((B,), budget, jnp.int32), jax.random.PRNGKey(1), -1,
            jnp.full((B,), budget + 8, jnp.int32), chunk_budget=budget,
        )

    ms_s, it_s, tk_s, dt_s = bench(single, kv)
    print(f"single-block: {ms_s:.2f} ms/iter ({it_s} iters, {tk_s} toks, "
          f"{tk_s/dt_s:.1f} tok/s raw)")

    # ---- MR: K=2, C=4 (reference recommended config) ----
    K, C, N = 2, 4, L
    W = 2 * N
    kv2 = alloc_kv_cache(cfg.num_layers, B * pps, page, cfg.num_kv_heads,
                         cfg.head_dim, jnp.bfloat16)

    la_off = jnp.full((B,), N, jnp.int32)  # lookahead_start=N: candidates off

    def mr(kv, tokens, la):
        return multiblock.jacobi_chunk_multiblock(
            params, cfg, rope, kv, tokens, jnp.full((B,), ctx, jnp.int32),
            jnp.ones((B, K, N), jnp.int32),  # blk_draft
            jnp.full((B, K), N, jnp.int32).at[:, 1:].set(0),  # blk_dlen
            jnp.zeros((B, K), jnp.int32),  # blk_acc
            jnp.zeros((B, K, N), jnp.int32),  # blk_acc_toks
            jnp.zeros((B, K), jnp.int32).at[:, 0].set(ctx),  # blk_base
            jnp.zeros((B, K), bool).at[:, 0].set(True),  # blk_active
            jnp.zeros((B,), jnp.int32),  # ra
            jnp.ones((B,), jnp.int32),  # n_active
            jnp.zeros((B, C, W), jnp.int32),  # pool
            jnp.zeros((B, C), jnp.int32),  # pool_len
            jnp.zeros((B,), jnp.int32),  # pool_next
            jnp.zeros((B,), jnp.int32),  # last_next
            jnp.zeros((B,), bool),  # eos
            jnp.zeros((B,), jnp.int32),  # iters
            bt, jnp.full((B,), pps * page, jnp.int32),
            jnp.full((B,), budget, jnp.int32), -1, 0,
            jnp.full((B,), int(np.ceil(0.8 * N)), jnp.int32),
            la,
            jnp.full((B,), budget + 8, jnp.int32),
            N=N, K=K, C=C, W=W, chunk_budget=budget,
        )

    import functools

    ms_m, it_m, tk_m, dt_m = bench(
        functools.partial(mr, la=jnp.zeros((B,), jnp.int32)), kv2
    )
    print(f"MR K={K} C={C} (candidates on): {ms_m:.2f} ms/iter "
          f"({it_m} iters, {tk_m} toks, {tk_m/dt_m:.1f} tok/s raw)")
    kv3 = alloc_kv_cache(cfg.num_layers, B * pps, page, cfg.num_kv_heads,
                         cfg.head_dim, jnp.bfloat16)
    ms_n, it_n, tk_n, dt_n = bench(functools.partial(mr, la=la_off), kv3)
    print(f"MR K={K} C={C} (candidates off, middle tier): {ms_n:.2f} ms/iter "
          f"({it_n} iters, {tk_n} toks, {tk_n/dt_n:.1f} tok/s raw)")
    print(f"ratio MR-nocand/single: {ms_n/ms_s:.2f}x (target <= ~1.3x); "
          f"MR-full/single: {ms_m/ms_s:.2f}x")


if __name__ == "__main__":
    main()
