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
