"""Pallas INT4 weight-only dequant-matmul (EXPERIMENT — not wired into serving).

Measured on v5e: the in-kernel nibble unpack + bf16 convert is VPU-bound at
~2 ops/weight, capping effective bandwidth near 90 GB/s — SLOWER than the
fused int8 convert-dot XLA emits inside the model (~670 GB/s effective end to
end), so int4 does not pay on this generation despite halving HBM bytes.
Kept as a correct, tested building block for backends with native int4 MXU
feeds (XLA int4 is unimplemented on this backend) or faster int8 bit ops.

Packing: two int4 values per int8 byte along the OUTPUT axis, split-half
layout — packed column j holds output column j in the low nibble and column
j + N/2 in the high nibble, so unpacking is a concat (no interleave).
The grid streams packed weight tiles HBM->VMEM with Pallas's automatic
double buffering; x stays resident in VMEM.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4(w_q: jax.Array) -> jax.Array:
    """[.., K, N] int8 in [-8, 7] -> [.., K, N//2] int8 (split-half nibbles)."""
    n = w_q.shape[-1]
    assert n % 2 == 0
    lo = (w_q[..., : n // 2].astype(jnp.int32) + 8) & 0xF
    hi = (w_q[..., n // 2 :].astype(jnp.int32) + 8) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def _kernel(x_ref, wp_ref, s_ref, o_ref, *, n_half: int):
    wp = wp_ref[...].astype(jnp.int32) & 0xFF  # bytes as 0..255
    lo = (wp & 0xF) - 8
    hi = ((wp >> 4) & 0xF) - 8
    w = jnp.concatenate([lo, hi], axis=1).astype(x_ref.dtype)  # [K, Nt]
    y = lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s_ref[pl.program_id(0)]  # [Nt] (scale kept whole in VMEM)
    o_ref[...] = (y * s.astype(jnp.float32)[None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def int4_matmul(
    x: jax.Array,  # [M, K] bf16
    w_packed: jax.Array,  # [K, N//2] int8 (pack_int4 layout)
    scale: jax.Array,  # [N] per-output-channel scale
    *,
    tile_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    N = w_packed.shape[1] * 2
    assert N % tile_n == 0 and tile_n % 2 == 0
    ht = tile_n // 2

    # scale rearranged to match the kernel's concat([lo, hi]) tile layout:
    # tile i covers output columns [i*ht, (i+1)*ht) and [N/2 + i*ht, ...)
    s2 = jnp.concatenate(
        [scale[: N // 2].reshape(-1, ht), scale[N // 2 :].reshape(-1, ht)], axis=1
    )  # [N/(2*ht), tile_n]

    grid = (N // 2 // ht,)
    out = pl.pallas_call(
        functools.partial(_kernel, n_half=ht),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((K, ht), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scales whole-resident
        ],
        out_specs=pl.BlockSpec((M, tile_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
    )(x, w_packed, s2)

    # undo the tile-local [lo|hi] layout back to logical column order
    out = out.reshape(M, grid[0], 2, ht)
    lo = out[:, :, 0, :].reshape(M, N // 2)
    hi = out[:, :, 1, :].reshape(M, N // 2)
    return jnp.concatenate([lo, hi], axis=1)
