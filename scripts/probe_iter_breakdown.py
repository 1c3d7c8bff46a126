"""Decompose one B=1 Jacobi iteration (7B, L=64) into component costs.

The decode loop runs ~11.8 ms/iter against a ~9.3 ms weight-stream floor
(7.6 GB int8 @ 819 GB/s).  This probe times, dispatch-amortized (scan of
INNER calls with data feedback, host readback — see probe_attn_fixed_cost):

  a) model forward (hidden states only, no lm_head)
  b) forward + greedy_tokens (the chunked-argmax lm_head)   -> lm_head cost
  c) same at L=32/128                                       -> row-count term

Usage: python scripts/probe_iter_breakdown.py [quant] [ctx]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INNER = int(os.environ.get("JF_PROBE_INNER", "16"))
REPS = int(os.environ.get("JF_PROBE_REPS", "2"))


def time_fn(fn, *args):
    np.asarray(jax.block_until_ready(fn(*args)))  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out)  # host readback = the only reliable barrier on axon
    return (time.perf_counter() - t0) / (REPS * INNER) * 1e3  # ms/call


def main():
    import dataclasses as dc

    from jacobiforcing_tpu.models import qwen
    from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache
    from jacobiforcing_tpu.ops.quant import init_quantized_params

    quant = sys.argv[1] if len(sys.argv) > 1 else "int8"
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    cfg = qwen.ModelConfig()
    if quant == "w8a8":
        cfg = dc.replace(cfg, act_quant=True)
    params = init_quantized_params(cfg, jax.random.PRNGKey(0))
    rope = qwen.rope_table(cfg)
    page = 256
    B = 1

    for L in (64, 32) if os.environ.get("JF_PROBE_LSWEEP") else (64,):
        pps = (ctx + 2 * L) // page + 1
        kv = alloc_kv_cache(
            cfg.num_layers, B * pps, page, cfg.num_kv_heads, cfg.head_dim,
            jnp.bfloat16,
        )
        bt = jnp.asarray(np.arange(B * pps, dtype=np.int32).reshape(B, pps))
        clen = jnp.full((B,), ctx, jnp.int32)
        positions = jnp.broadcast_to(
            jnp.arange(ctx - L, ctx, dtype=jnp.int32), (B, L)
        )
        ids = jnp.ones((B, L), jnp.int32)

        def fwd_only(ids0, kv):
            def body(c, _):
                h, _kv = qwen.forward(
                    params, cfg, c, positions, kv, bt, clen, rope
                )
                # feed hidden back as ids via a cheap reduce to keep the chain
                nxt = (jnp.abs(h[..., 0]) * 0).astype(jnp.int32) + c
                return nxt, ()
            return jax.lax.scan(body, ids0, None, length=INNER)[0]

        def fwd_lmhead(ids0, kv):
            def body(c, _):
                h, _kv = qwen.forward(
                    params, cfg, c, positions, kv, bt, clen, rope
                )
                toks = qwen.greedy_tokens(params, cfg, h)  # [B, L]
                return toks.astype(jnp.int32), ()
            return jax.lax.scan(body, ids0, None, length=INNER)[0]

        print("compiling fwd_only...", flush=True)
        a = time_fn(jax.jit(fwd_only), ids, kv)
        print(f"forward={a:7.2f} ms; compiling fwd_lmhead...", flush=True)
        b = time_fn(jax.jit(fwd_lmhead), ids, kv)
        print(
            f"quant={quant} ctx={ctx} L={L}: forward={a:7.2f} ms  "
            f"+lm_head={b:7.2f} ms  (argmax head cost {b-a:5.2f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
