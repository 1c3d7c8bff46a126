"""Minimal on-chip probe for cross-program DMA semantics (JF_PA_RING debug).

Question: can a manual async copy started in grid program i be waited in
program i+1 on this Mosaic toolchain, with scratch (VMEM + SMEM + DMA sems)
persisting across sequential grid programs?

Kernel: grid (N,). Program i copies row i of the input (HBM) into a VMEM
scratch slot WITHOUT waiting, records "started" in SMEM, and waits on the
copy started by program i-1 (for i>0), adding that row into its output.
Program 0 outputs zeros. If cross-program DMA wait works, out[i] == x[i-1].

Run: python scripts/probe_ring_minimal.py [N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ROWS, D = 8, 128


def kernel(x_hbm, o_ref, buf, sem, st):
    i = pl.program_id(0)

    # wait on the copy the PREVIOUS program started into slot (i-1) % 2
    @pl.when(i > 0)
    def _():
        prev = lax.rem(i - 1, jnp.int32(2))
        pltpu.make_async_copy(
            x_hbm.at[pl.ds((i - 1) * ROWS, ROWS)], buf.at[prev], sem.at[prev]
        ).wait()
        o_ref[...] = buf[prev]

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # start our own copy for the NEXT program; do not wait
    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        slot = lax.rem(i, jnp.int32(2))
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * ROWS, ROWS)], buf.at[slot], sem.at[slot]
        ).start()
        st[0] = i


x = jnp.asarray(np.random.RandomState(0).randn(N * ROWS, D), jnp.float32)

out = pl.pallas_call(
    kernel,
    grid=(N,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((ROWS, D), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((N * ROWS, D), jnp.float32),
    scratch_shapes=[
        pltpu.VMEM((2, ROWS, D), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SMEM((1,), jnp.int32),
    ],
)(x)

out = np.asarray(out)
x = np.asarray(x)
ok0 = np.allclose(out[:ROWS], 0)
oks = [np.allclose(out[i * ROWS : (i + 1) * ROWS], x[(i - 1) * ROWS : i * ROWS])
       for i in range(1, N)]
print(f"program0 zeros: {ok0}; cross-program rows ok: {oks}")
print("CROSS-PROGRAM DMA WAIT: " + ("WORKS" if ok0 and all(oks) else "BROKEN"))
