"""Decompose the decode-attention call cost: raw pallas kernel vs wrapper glue.

The single-stream 7B iteration spends ~10ms on weight HBM (speed-of-light)
plus ~2ms of everything else; 28 paged-attention calls are the prime suspect.
This probe times, dispatch-amortized (scan of INNER calls, host readback):
  a) full `paged_attention_pallas` (kernel + q/out transpose glue)
  b) the raw pallas_call body alone (pre-transposed q, raw [B,KH,GL,D] out)
  c) a ctx sweep to split per-tile cost from per-call fixed cost

Usage: python scripts/probe_attn_fixed_cost.py [B] [L]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import jacobiforcing_tpu.ops.pallas.paged_attention as pa

# JF_PA_CALIB_BOUND=<x>: simulate a calibrated model (auto-flat + round-5
# clamp elision when <= cap/2); use with JF_PA_SOFTMAX unset
if os.environ.get("JF_PA_CALIB_BOUND"):
    pa.set_flat_softmax_bound(float(os.environ["JF_PA_CALIB_BOUND"]))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
L = int(sys.argv[2]) if len(sys.argv) > 2 else 64

NH, KH, D, PAGE = 28, 4, 128, 256
G = NH // KH
GL = G * L
# NOTE: per-DISPATCH cost on the axon tunnel is ~2.5ms — with INNER=32 that
# floors every measurement at ~78us/call (verified: a bare XLA multiply in
# this same harness reads 78.7us).  INNER must be large enough that
# 2.5ms/INNER << the signal being measured.
INNER = int(os.environ.get("JF_PROBE_INNER", "1024"))
REPS = int(os.environ.get("JF_PROBE_REPS", "4"))


def time_fn(fn, *args):
    np.asarray(jax.block_until_ready(fn(*args)))  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out)  # host readback = the only reliable barrier on axon
    return (time.perf_counter() - t0) / (REPS * INNER) * 1e3  # ms/call


def make_inputs(ctx):
    P = ctx // PAGE
    npages = B * P + 8
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, L, NH, D), jnp.bfloat16)
    k = jax.random.normal(key, (KH, npages * PAGE, D), jnp.bfloat16)
    v = jax.random.normal(key, (KH, npages * PAGE, D), jnp.bfloat16)
    bt = jnp.asarray(np.arange(B * P, dtype=np.int32).reshape(B, P))
    clen = jnp.full((B,), ctx, jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(ctx - L, ctx, dtype=jnp.int32), (B, L))
    return q, k, v, bt, clen, pos


for ctx in (256, 512, 1024, 2048, 4096, 8192):
    q, k, v, bt, clen, pos = make_inputs(ctx)

    @jax.jit
    def full(q0):
        def body(qc, _):
            o = pa.paged_attention_pallas(
                qc, k, v, bt, clen, pos, 1.0 / math.sqrt(D), page_size=PAGE
            )
            return (o * 0.5).astype(qc.dtype), ()

        return jax.lax.scan(body, q0, None, length=INNER)[0]

    ms_full = time_fn(full, q)

    # raw kernel: bypass the q/out transposes by feeding [B, KH, GL, D]
    # directly (reuses the module's kernel via a thin pallas_call clone)
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fused = B * KH <= 8 and KH * GL <= pa.MAX_Q_ROWS

    def raw_call(qr, k, v, bt, clen, qs):
        scratch = pa._scratch_shapes(
            GL, D, pa._PP * PAGE, k.dtype, pa.flat_enabled()
        )
        if fused:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, KH, GL, D), lambda b, *_: (b, 0, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, KH, GL, D), lambda b, *_: (b, 0, 0, 0)),
                scratch_shapes=scratch,
            )

            def kern(bt_r, cl_r, qs_r, q_ref, kh, vh, o_ref, *scratch):
                pa._kernel_fused(
                    bt_r, cl_r, qs_r, q_ref.at[0], kh, vh, None, None,
                    o_ref.at[0], *scratch, page=PAGE, L=L, scaled=False,
                )
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B, KH),
                in_specs=[
                    pl.BlockSpec((1, 1, GL, D), lambda b, h, *_: (b, h, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, 1, GL, D), lambda b, h, *_: (b, h, 0, 0)),
                scratch_shapes=scratch,
            )

            def kern(bt_r, cl_r, qs_r, q_ref, kh, vh, o_ref, *scratch):
                pa._kernel(
                    bt_r, cl_r, qs_r, q_ref.at[0, 0], kh, vh, None, None,
                    o_ref.at[0, 0], *scratch, page=PAGE, L=L, scaled=False,
                )

        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, KH, GL, D), qr.dtype),
        )(bt, clen, qs, qr, k, v)

    qr0 = (
        q.reshape(B, L, KH, G, D).transpose(0, 2, 3, 1, 4).reshape(B, KH, GL, D)
    )
    qr0 = (qr0.astype(jnp.float32) * (1.0 / math.sqrt(D) * math.log2(math.e))).astype(
        q.dtype
    )
    qs = pos[:, 0].astype(jnp.int32)

    @jax.jit
    def raw(q0):
        def body(qc, _):
            o = raw_call(qc, k, v, bt.astype(jnp.int32), clen, qs)
            return (o * 0.5).astype(qc.dtype), ()

        return jax.lax.scan(body, q0, None, length=INNER)[0]

    ms_raw = time_fn(raw, qr0)

    kv_bytes = 2 * B * KH * ctx * D * 2
    roof_ms = kv_bytes / 819e9 * 1e3
    print(
        f"ctx={ctx:5d}  full={ms_full*1e3:7.1f}us  raw={ms_raw*1e3:7.1f}us  "
        f"glue={(ms_full-ms_raw)*1e3:6.1f}us  hbm_roof={roof_ms*1e3:6.1f}us  "
        f"({'fused' if fused else 'per-head'})",
        flush=True,
    )
