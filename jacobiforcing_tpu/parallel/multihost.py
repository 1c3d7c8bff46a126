"""Multi-host initialization and cross-host sharding helpers.

The reference is single-node NCCL (dist.init_process_group("nccl",
"tcp://localhost:2333"), model_runner.py:184-190).  On TPU pods, multi-host
is the same single-controller SPMD program on every host:
`jax.distributed.initialize()` joins the hosts, `jax.devices()` spans the
full slice, and the existing ("data", "model") mesh simply covers more
devices — the "model" axis should stay within a host/ICI domain while "data"
crosses hosts over DCN (SURVEY.md §2.7).

Exercised in CI by tests/test_multihost.py: 2 local processes x 4 virtual CPU
devices join through `initialize_multihost` (gloo cross-process collectives)
and run a dp-sharded consistency step that must match a single-process oracle.
Real DCN behavior still needs a pod; the virtual-device mesh tests +
`__graft_entry__.dryrun_multichip` validate the SPMD programs themselves.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from jacobiforcing_tpu.parallel.mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed world (no-op if single-process).

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; set JAX_COORDINATOR_ADDRESS etc. (or pass explicitly) elsewhere.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JF_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(tensor_parallel_size: int = 1):
    """Mesh over the FULL pod: "model" (tp) packed densely so it rides ICI
    within a host, "data" spanning hosts over DCN."""
    devs = jax.devices()
    local = jax.local_device_count()
    assert tensor_parallel_size <= local, (
        f"tp={tensor_parallel_size} must fit within one host ({local} chips) "
        "so tensor-parallel collectives stay on ICI"
    )
    return make_mesh(tensor_parallel_size=tensor_parallel_size, devices=devs)


def is_primary() -> bool:
    return jax.process_index() == 0
