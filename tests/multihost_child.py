"""Child process for the multi-host initialization test.

Run as `python tests/multihost_child.py <process_id> <port> <out_dir>`.
Joins a 2-process jax.distributed world (4 virtual CPU devices per process =
8 global devices) through the production entry glue
(`parallel.multihost.initialize_multihost` + `make_pod_mesh`) and executes ONE
mesh-sharded consistency training step with the global batch sharded over the
cross-process "data" axis — the path a real TPU pod takes where the reference
instead spawns single-node NCCL ranks (model_runner.py:184-190).

Writes {loss, param fingerprint, world metadata} to <out_dir>/proc<i>.json so
the parent test can assert both processes agree with each other and with a
single-process oracle.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P, N, T = 6, 4, 3  # prompt len, block len, pairs (test_trainer.py geometry)
GLOBAL_BATCH = 4


def build_inputs():
    """Deterministic tiny model config + packed global batch (numpy)."""
    import numpy as np

    from jacobiforcing_tpu.train.consistency import TrainConfig, prepare_sample

    tc = TrainConfig(
        N=N, max_pairs=T, seq_bucket=64, ar_pair_bucket=64, cons_pair_bucket=64
    )
    rng = np.random.RandomState(7)
    rows = []
    for _ in range(GLOBAL_BATCH):
        prompt = rng.randint(1, 256, P).tolist()
        seq = list(prompt)
        target = rng.randint(1, 256, T * N)
        for j in range(T):
            last = target[j * N : (j + 1) * N].tolist()
            k = list(last)
            for t in range(N - 2, N):
                k[t] = int(rng.randint(1, 256))
            seq.extend(k)
            seq.extend(last)
        rows.append(seq)
    samples = [prepare_sample(r, P, T, tc) for r in rows]
    batch_np = {k: np.stack([np.asarray(s[k]) for s in samples]) for k in samples[0]}
    return tc, batch_np


def run_step(mesh, tc, batch_np):
    """One dp-sharded consistency step; returns (loss, param fingerprint)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
    from jacobiforcing_tpu.parallel.sharding import shard_params
    from jacobiforcing_tpu.train.consistency import make_train_step

    cfg = ModelConfig.tiny(dtype=jnp.float32)
    params = shard_params(init_params(cfg, jax.random.PRNGKey(0)), cfg, mesh, fsdp=True)
    rope = rope_table(cfg)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(cfg, tc, opt, mesh)
    bsh = NamedSharding(mesh, PS("data"))
    batch = {
        k: jax.make_array_from_callback(v.shape, bsh, lambda idx, v=v: v[idx])
        for k, v in batch_np.items()
    }
    params, opt_state, metrics = step(params, opt_state, rope, batch)
    fingerprint = float(
        jax.jit(
            lambda p: sum(
                jnp.sum(jnp.abs(x).astype(jnp.float64)) for x in jax.tree.leaves(p)
            ),
            out_shardings=NamedSharding(mesh, PS()),
        )(params)
    )
    return float(metrics["loss"]), fingerprint


def main():
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Cross-process CPU collectives (the CI stand-in for ICI/DCN).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from jacobiforcing_tpu.parallel.multihost import (
        initialize_multihost,
        is_primary,
        make_pod_mesh,
    )

    initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8 and jax.local_device_count() == 4

    # tp=2 stays within one process's devices (the ICI domain); data=4 spans
    # both processes (the DCN axis).
    mesh = make_pod_mesh(tensor_parallel_size=2)
    tc, batch_np = build_inputs()
    loss, fingerprint = run_step(mesh, tc, batch_np)

    with open(os.path.join(out_dir, f"proc{pid}.json"), "w") as f:
        json.dump(
            {
                "process_id": pid,
                "nproc": jax.process_count(),
                "ndev": len(jax.devices()),
                "primary": is_primary(),
                "loss": loss,
                "fingerprint": fingerprint,
            },
            f,
        )


if __name__ == "__main__":
    main()
