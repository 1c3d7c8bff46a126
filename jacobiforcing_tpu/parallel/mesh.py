"""Device mesh construction.

TPU-native replacement for the reference's NCCL world
(inference_engine/engine/model_runner.py:184-190): one Python controller, a
`jax.sharding.Mesh` over ("data", "model") axes, collectives compiled into the
program by XLA and scheduled over ICI.  The SharedMemory/Event control plane
and the rank-0 broadcast protocol (model_runner.py:268-289, 988-1128) have no
equivalent here — single-controller JAX eliminates them.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"

# The serving mesh, registered by LLMEngine (or any caller running sharded
# decode).  GSPMD cannot partition a Pallas custom call: without this, a
# model-sharded forward would force XLA to all-gather the KV cache around
# every attention kernel (or fail to partition).  ops/attention reads the
# registered mesh at trace time and wraps the kernel in jax.shard_map with
# head-sharded specs instead — attention is fully local to each model shard
# (the reference divides KV heads per rank the same way,
# model_runner.py:529).
_SERVING_MESH: Optional[Mesh] = None


def set_serving_mesh(mesh: Optional[Mesh]) -> None:
    """Register (or clear, with None) the mesh sharded decode runs under."""
    global _SERVING_MESH
    _SERVING_MESH = mesh


def get_serving_mesh() -> Optional[Mesh]:
    return _SERVING_MESH


def make_mesh(
    tensor_parallel_size: int = 1,
    data_parallel_size: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    `tensor_parallel_size` plays the role of the reference's
    `Config.tensor_parallel_size` (config.py:11); data_parallel_size = -1 uses
    all remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = tensor_parallel_size
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    dp = data_parallel_size if data_parallel_size > 0 else n // tp
    assert dp * tp <= n
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
