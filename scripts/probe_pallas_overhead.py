"""Calibrate bare pallas_call invocation overhead on this chip.

Times a chain of trivial kernels (copy + scale of a [448,128] block) in the
same scan-feedback harness as probe_attn_fixed_cost.py, plus variants that
add the structural features of the decode attention kernel one at a time:
scalar prefetch, manual HBM DMAs, fori_loop, accumulator scratch.
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

# See probe_attn_fixed_cost.py: INNER must amortize the ~2.5ms per-dispatch
# tunnel cost (INNER=32 floors everything at ~78us/call).
INNER = int(os.environ.get("JF_PROBE_INNER", "1024"))
REPS = int(os.environ.get("JF_PROBE_REPS", "4"))
GL, D = 448, 128


def time_fn(fn, *args):
    np.asarray(jax.block_until_ready(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / (REPS * INNER) * 1e6  # us/call


def harness(call):
    @jax.jit
    def run(q0):
        def body(qc, _):
            return (call(qc) * 0.5).astype(qc.dtype), ()

        return lax.scan(body, q0, None, length=INNER)[0]

    return run


q = jax.random.normal(jax.random.PRNGKey(0), (GL, D), jnp.bfloat16)

# 0) pure XLA op chain for reference
print(f"xla_mul      {time_fn(harness(lambda x: x * 2.0), q):7.1f} us", flush=True)


# 1) trivial pallas copy kernel
def k_copy(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


triv = pl.pallas_call(
    k_copy, out_shape=jax.ShapeDtypeStruct((GL, D), q.dtype)
)
print(f"pallas_triv  {time_fn(harness(triv), q):7.1f} us", flush=True)

# 2) + scalar prefetch grid spec (grid=(1,))
bt = jnp.zeros((1, 64), jnp.int32)


def k_spre(bt_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


spre = pl.pallas_call(
    k_spre,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((GL, D), lambda b, *_: (0, 0))],
        out_specs=pl.BlockSpec((GL, D), lambda b, *_: (0, 0)),
    ),
    out_shape=jax.ShapeDtypeStruct((GL, D), q.dtype),
)
print(f"pallas_spre  {time_fn(harness(lambda x: spre(bt, x)), q):7.1f} us", flush=True)

# 3) + manual HBM DMA loop + accumulator scratch (the decode kernel skeleton)
K = jax.random.normal(jax.random.PRNGKey(1), (4, 4096, D), jnp.bfloat16)
NBUF, PP, PAGE = 3, 2, 256
TILE = PP * PAGE


def k_dma(bt_ref, x_ref, k_hbm, o_ref, kbuf, sem, acc, *, ntiles):
    for t0 in range(NBUF):
        if t0 < ntiles:
            for j in range(PP):
                pltpu.make_async_copy(
                    k_hbm.at[0, pl.ds((t0 * PP + j) * PAGE, PAGE)],
                    kbuf.at[t0, pl.ds(j * PAGE, PAGE)],
                    sem.at[t0, j],
                ).start()
    acc[...] = jnp.zeros_like(acc)

    def body(t, _):
        slot = lax.rem(t, jnp.int32(NBUF))
        for j in range(PP):
            pltpu.make_async_copy(
                k_hbm.at[0, pl.ds(0, PAGE)], kbuf.at[slot, pl.ds(j * PAGE, PAGE)],
                sem.at[slot, j],
            ).wait()
        s = lax.dot_general(
            x_ref[...], kbuf[slot],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[...] += lax.dot_general(
            jnp.exp2(s - 10.0).astype(x_ref.dtype), kbuf[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(t + NBUF < ntiles)
        def _():
            for j in range(PP):
                pltpu.make_async_copy(
                    k_hbm.at[0, pl.ds(((t + NBUF) * PP + j) * PAGE, PAGE)],
                    kbuf.at[slot, pl.ds(j * PAGE, PAGE)],
                    sem.at[slot, j],
                ).start()

        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(ntiles), body, 0)
    o_ref[...] = acc[...].astype(o_ref.dtype)


for ntiles in (1, 2, 4, 8):
    import functools

    dma = pl.pallas_call(
        functools.partial(k_dma, ntiles=ntiles),
        out_shape=jax.ShapeDtypeStruct((GL, D), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((GL, D), lambda b, *_: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((GL, D), lambda b, *_: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((NBUF, TILE, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((NBUF, PP)),
                pltpu.VMEM((GL, D), jnp.float32),
            ],
        ),
    )
    print(
        f"pallas_dma{ntiles}  {time_fn(harness(lambda x: dma(bt, x, K)), q):7.1f} us",
        flush=True,
    )
