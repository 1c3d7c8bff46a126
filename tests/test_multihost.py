"""Multi-host production init path: 2 real processes x 4 virtual CPU devices
through `initialize_multihost` + `jax.distributed`, one dp-sharded consistency
step across processes (cross-process collectives via gloo — the CI stand-in
for a pod's ICI/DCN).

The reference never leaves single-node NCCL
(inference_engine/engine/model_runner.py:184-190); this exercises the glue a
TPU pod actually uses (parallel/multihost.py), asserting both processes
compute the same loss/updated params AND that they match a single-process
oracle on the same global batch (so the cross-process psum is not just
self-consistent but correct).
"""

import json
import os
import subprocess
import sys

import numpy as np

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_child.py")


def test_multihost_init_and_sharded_step(tmp_path):
    port = int(os.environ.get("JF_TEST_MH_PORT", "29431"))
    env = {
        k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(pid), str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    results = []
    for pid in (0, 1):
        with open(tmp_path / f"proc{pid}.json") as f:
            results.append(json.load(f))

    # world assembled: 2 processes, 8 global devices, rank-0 primary
    assert [r["nproc"] for r in results] == [2, 2]
    assert [r["ndev"] for r in results] == [8, 8]
    assert [r["primary"] for r in results] == [True, False]

    # both processes agree bit-for-bit on the replicated outputs
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["fingerprint"] == results[1]["fingerprint"]

    # ... and match a single-process oracle over the same global batch
    import jax

    from jacobiforcing_tpu.parallel.mesh import make_mesh
    from tests.multihost_child import build_inputs, run_step

    assert len(jax.devices()) == 8  # conftest's virtual-device mesh
    mesh = make_mesh(tensor_parallel_size=2, data_parallel_size=4)
    tc, batch_np = build_inputs()
    loss_ref, fp_ref = run_step(mesh, tc, batch_np)
    np.testing.assert_allclose(results[0]["loss"], loss_ref, rtol=1e-5)
    np.testing.assert_allclose(results[0]["fingerprint"], fp_ref, rtol=1e-6)
