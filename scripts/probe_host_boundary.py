"""Measure host<->device boundary costs over the TPU tunnel.

The engine's per-step host boundary does: build [B, cap] np tokens, transfer
~6 arrays to device, dispatch, then 5 SEQUENTIAL np.asarray readbacks
(llm_engine._jacobi_chunk).  Each blocking readback pays a tunnel RTT; this
probe prices the parts so the engine fix targets the real cost.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, CAP = 8, 8257


def t(fn, n=20, warm=3):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3  # ms


scalar = jnp.zeros(()) + 1.0
small = [jnp.zeros((B,), jnp.int32) + i for i in range(5)]
big = jnp.zeros((B, CAP), jnp.int32) + 7
compact = jnp.zeros((B, 1024), jnp.int32) + 7
host_big = np.zeros((B, CAP), np.int32)

print(f"scalar readback RTT:          {t(lambda: np.asarray(scalar)):8.2f} ms")
print(f"5x sequential small readback: {t(lambda: [np.asarray(x) for x in small]):8.2f} ms")
print(f"1x device_get(5 small):       {t(lambda: jax.device_get(small)):8.2f} ms")
print(f"big [8,8257] readback:        {t(lambda: np.asarray(big)):8.2f} ms")
print(f"compact [8,1024] readback:    {t(lambda: np.asarray(compact)):8.2f} ms")
print(f"device_get(big+5 small):      {t(lambda: jax.device_get([big] + small)):8.2f} ms")
print(f"device_get(compact+5 small):  {t(lambda: jax.device_get([compact] + small)):8.2f} ms")
print(f"host->device [8,8257] (async dispatch): {t(lambda: jnp.asarray(host_big)):8.2f} ms")


def put_and_sync():
    x = jnp.asarray(host_big)
    np.asarray(x[0, 0])


print(f"host->device [8,8257] + sync: {t(put_and_sync):8.2f} ms")
