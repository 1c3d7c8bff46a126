"""Attribute the 4k in-engine prefill tax (VERDICT r3 #4).

Round 3 measured ~625 ms per 4k backfill prefill inside the engine vs 370 ms
for a bare 7B int8 4k `runner.prefill` (scripts/probe_prefill_e2e.py).  This
probe decomposes the gap by timing the SAME 4k prefill in ascending order of
engine-ness, all on the real chip, all ending with a host readback:

  A. bare prompt, minimal block table, int8 weight-only     (the 370ms probe)
  B. A but W8A8 (act_quant)                 [dtype: the engine bench is W8A8]
  C. B + draft-appended ids at the engine's padded bucket (T=4224)
  D. C + engine-sized padded block tables (pages_bucket rows, -1 padding)
  E. the engine's own _run_prefill on a fresh LLMEngine (host assembly +
     bucketing + readback included)

Usage: python scripts/probe_prefill_tax.py [T] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
L, PAGE = 64, 256

from jacobiforcing_tpu.engine import runner
from jacobiforcing_tpu.models.qwen import ModelConfig
from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache
from jacobiforcing_tpu.ops.quant import init_quantized_params

import dataclasses


def bench(label, fn, reps=REPS):
    np.asarray(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out)  # host readback ends the timing (tunnel: block_until_ready lies)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt


def variant_runner(act_quant: bool, bucketed: bool, padded_bt: bool):
    cfg = ModelConfig()
    if act_quant:
        cfg = dataclasses.replace(cfg, act_quant=True)
    params = init_quantized_params(cfg, jax.random.PRNGKey(0))
    from jacobiforcing_tpu.models.qwen import rope_table

    rope = rope_table(cfg)
    Tb = T + 2 * L if bucketed else T
    n_real = T + L if bucketed else T
    pps = (T + 2 * L) // PAGE + 1
    P = ((8192 + 256) // PAGE + 2) if padded_bt else pps  # engine pages_bucket
    bt_np = np.full((1, P), -1, np.int32)
    bt_np[0, :pps] = np.arange(pps)
    bt = jnp.asarray(bt_np)
    ids = jnp.ones((1, Tb), jnp.int32)
    starts = jnp.zeros((1,), jnp.int32)
    totals = jnp.full((1,), n_real, jnp.int32)
    plen = jnp.full((1,), T, jnp.int32)

    def run():
        # runner.prefill donates kv — allocate fresh per call (same protocol
        # as probe_prefill_e2e.py, so A reproduces its 370 ms number)
        kv = alloc_kv_cache(cfg.num_layers, pps + 1, PAGE,
                            cfg.num_kv_heads, cfg.head_dim)
        out = runner.prefill(params, cfg, rope, ids, starts, totals, plen,
                             kv, bt, n_out=L)
        return out[2]

    return run


def engine_prefill():
    from jacobiforcing_tpu.config import Config, SamplingParams
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine

    cfg = ModelConfig()
    params = init_quantized_params(cfg, jax.random.PRNGKey(0))
    eng = LLMEngine(
        Config(
            kvcache_page_size=PAGE, max_model_len=8192,
            jacobi_chunk_iters=8, quantization="",  # params pre-quantized
            prefill_token_buckets=(T + 2 * L,), eos=-1,
            batch_buckets=(1, 2, 4, 8),
        ),
        model_cfg=dataclasses.replace(cfg, act_quant=True), params=params,
        num_kv_pages=4 * ((T + 2 * L) // PAGE + 1),
    )
    sp = SamplingParams(
        temperature=0.0, max_tokens=4, decode_strategy="jacobi",
        jacobi_block_len=L, ignore_eos=True,
    )
    rng = np.random.RandomState(0)

    def run():
        s = eng.add_request(rng.randint(1, cfg.vocab_size, T).tolist(), sp)
        t0 = time.perf_counter()
        eng.step()  # the prefill step
        dt = time.perf_counter() - t0
        # drain and free
        while not eng.scheduler.is_finished:
            eng.step()
        return dt

    run()  # compile
    ts = [run() for _ in range(REPS)]
    print(f"E engine._run_prefill (incl host assembly): "
          f"{np.mean(ts)*1e3:.1f} ms (min {min(ts)*1e3:.1f})", flush=True)


print(f"7B, T={T}, L={L}, page={PAGE}")
bench("A int8  bare prompt, minimal bt      ", variant_runner(False, False, False))
bench("B w8a8  bare prompt, minimal bt      ", variant_runner(True, False, False))
bench("C w8a8  +draft ids, bucket T+2L      ", variant_runner(True, True, False))
bench("D w8a8  +engine padded block tables  ", variant_runner(True, True, True))
engine_prefill()
