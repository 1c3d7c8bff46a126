"""Probe: can a Pallas weight-streaming matmul beat XLA's fused int8->bf16 dot?

The B=1 Jacobi iteration is weight-bandwidth-bound: 11.8 ms/iter vs a 9.3 ms
floor for streaming 7.6 GB of int8 weights at 819 GB/s (NOTES.md), i.e.
~670 GB/s effective through XLA's convert+dot.  This probe reproduces the
production access pattern — `lax.scan` over NL stacked layer weights with an
activation feedback chain, exactly like models/qwen.forward — and times:

  a) XLA jnp.dot(x, w_l.astype(bf16)) * s          (the ops/quant.mm path)
  b) Pallas kernel on the plain [K, N] row-major layout (grid-pipelined)
  c) Pallas kernel on a pre-BLOCKED [K/KT, N/NT, KT, NT] layout where each
     weight tile is one contiguous DMA (a layout XLA cannot choose)

Sweeps tile geometry via JF_PROBE_KT / JF_PROBE_NT.  Dispatch-amortized with
host readback (block_until_ready does not wait on axon).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NL = int(os.environ.get("JF_PROBE_NL", "16"))  # stacked layers (scan length)
REPS = int(os.environ.get("JF_PROBE_REPS", "8"))
assert REPS >= 1, "JF_PROBE_REPS must be >= 1"

M = int(os.environ.get("JF_PROBE_M", "64"))
K = int(os.environ.get("JF_PROBE_K", "3584"))
N = int(os.environ.get("JF_PROBE_N", "18944"))
assert N >= K, "feedback chain slices y[:, :K]; need N >= K"


def time_fn(fn, *args):
    np.asarray(jax.block_until_ready(fn(*args)))  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out)
    ms = (time.perf_counter() - t0) / (REPS * NL) * 1e3  # ms per layer-matmul
    gbps = K * N / ms / 1e6
    return ms, gbps


def harness(call, w_all, s):
    """Scan over stacked layer weights with activation feedback — the
    production pattern (qwen.forward's lax.scan over `lp`).

    The feedback multiplier is a runtime argument (passed as 0.0 at call
    time) so the dependency on y cannot be constant-folded away even under
    aggressive algebraic simplification."""

    @jax.jit
    def run(x0, fb_scale):
        def body(xc, w_l):
            y = call(xc, w_l, s)  # [M, N]
            nxt = xc + (y[:, :K] * fb_scale).astype(xc.dtype)
            return nxt, ()

        return lax.scan(body, x0, w_all)[0]

    return lambda x0: run(x0, jnp.bfloat16(0.0))


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (M, K), jnp.bfloat16)
w_all = jax.random.randint(jax.random.PRNGKey(1), (NL, K, N), -127, 128, jnp.int8)
s = jnp.full((1, N), 0.01, jnp.bfloat16)

# ---------------------------------------------------------------- a) XLA
ms, gb = time_fn(
    harness(lambda xc, w, s: jnp.dot(xc, w.astype(xc.dtype)) * s, w_all, s), x
)
print(f"xla_int8_dot              {ms:7.3f} ms  {gb:6.0f} GB/s", flush=True)


def mk_pallas(KT, NT, blocked):
    nk = K // KT

    def kern(x_ref, w_ref, s_ref, o_ref, acc):
        kt = pl.program_id(1)

        @pl.when(kt == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        wt = w_ref[0, 0] if blocked else w_ref[...]
        acc[...] += lax.dot_general(
            x_ref[...], wt.astype(x_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(kt == nk - 1)
        def _():
            o_ref[...] = (acc[...] * s_ref[...].astype(jnp.float32)).astype(
                o_ref.dtype
            )

    wspec = (
        pl.BlockSpec((1, 1, KT, NT), lambda n, k: (k, n, 0, 0))
        if blocked
        else pl.BlockSpec((KT, NT), lambda n, k: (k, n))
    )
    return pl.pallas_call(
        kern,
        grid=(N // NT, nk),
        in_specs=[
            pl.BlockSpec((M, KT), lambda n, k: (0, k)),
            wspec,
            pl.BlockSpec((1, NT), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((M, NT), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, NT), jnp.float32)],
    )


sweep = os.environ.get("JF_PROBE_TILES", "512x512,896x1184,1792x1184,3584x1184,3584x2368")
for spec in sweep.split(","):
    KT, NT = (int(v) for v in spec.split("x"))
    if K % KT or N % NT:
        print(f"tiles {spec}: skip (not divisible)")
        continue
    # f32 reference (isolates kernel error from bf16 reference accumulation)
    ref = (
        np.asarray(x, np.float32) @ np.asarray(w_all[0], np.float32)
    ) * np.asarray(s, np.float32)
    # plain layout
    kern_plain = mk_pallas(KT, NT, blocked=False)
    ms, gb = time_fn(
        harness(lambda xc, w, s, k=kern_plain: k(xc, w, s), w_all, s), x
    )
    print(f"pallas_plain   {spec:>10}  {ms:7.3f} ms  {gb:6.0f} GB/s", flush=True)
    got = np.asarray(kern_plain(x, w_all[0], s), np.float32)
    err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"  plain rel-err {err:.2e}", flush=True)
    # blocked layout
    wb = w_all.reshape(NL, K // KT, KT, N // NT, NT).transpose(0, 1, 3, 2, 4)
    kern = mk_pallas(KT, NT, blocked=True)
    ms, gb = time_fn(harness(lambda xc, w, s, kern=kern: kern(xc, w, s), wb, s), x)
    print(f"pallas_blocked {spec:>10}  {ms:7.3f} ms  {gb:6.0f} GB/s", flush=True)

    got = np.asarray(kern(x, wb[0], s), np.float32)
    err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"  blocked rel-err {err:.2e}", flush=True)
