"""Block-sparse (splash) training attention vs the dense-mask path.

The splash mask must equal build_train_mask exactly, and the kernelized
forward (+ gradients) must match dense attention in interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jacobiforcing_tpu.models.qwen import ModelConfig, forward_dense, init_params, rope_table
from jacobiforcing_tpu.ops.pallas.train_attention import JacobiTrainingMask
from jacobiforcing_tpu.train.consistency import build_train_mask, shared_position_ids

P, N, T = 32, 16, 3
L = P + 2 * T * N  # 128


@pytest.mark.parametrize("variant,window", [("single", 4), ("multiblock", 4), ("window", 2)])
def test_splash_mask_equals_dense_mask(variant, window):
    dense = np.asarray(
        build_train_mask(L, jnp.int32(P), jnp.int32(T), jnp.int32(L), N, variant, window)
    )
    m = JacobiTrainingMask(L, P, T, L, N, variant, window)
    q_ids = np.arange(L)[:, None] * np.ones((1, L), np.int64)
    kv_ids = np.ones((L, 1), np.int64) * np.arange(L)[None, :]
    splash = m.mask_function(q_ids, kv_ids)
    np.testing.assert_array_equal(splash, dense)


def test_splash_forward_and_grad_match_dense():
    cfg = ModelConfig.tiny(vocab_size=128, dtype=jnp.float32, head_dim=32,
                           num_heads=4, num_kv_heads=2, hidden_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, 128, (1, L)), jnp.int32)
    pos = shared_position_ids(L, jnp.int32(P), N)[None]
    mask = build_train_mask(L, jnp.int32(P), jnp.int32(T), jnp.int32(L), N)[None]

    h_dense = forward_dense(params, cfg, ids, pos, rope, mask)
    spec = (P, T, L, N, "single", 4, True)  # interpret mode
    h_splash = forward_dense(params, cfg, ids, pos, rope, splash_spec=spec)
    np.testing.assert_allclose(
        np.asarray(h_splash), np.asarray(h_dense), rtol=2e-4, atol=2e-4
    )

    # gradients must flow through the splash kernel (custom VJP)
    def loss_fn(p, spec_arg):
        kw = {"splash_spec": spec_arg} if spec_arg else {"attn_mask": mask}
        return jnp.sum(forward_dense(p, cfg, ids, pos, rope, **kw) ** 2)

    g_dense = jax.grad(lambda p: loss_fn(p, None))(params)
    g_splash = jax.grad(lambda p: loss_fn(p, spec))(params)
    for a, b in zip(jax.tree.leaves(g_dense), jax.tree.leaves(g_splash)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )


def test_splash_train_step_matches_dense():
    """One consistency-training step with splash attention must produce the
    same losses as the dense-mask path."""
    import optax
    from jacobiforcing_tpu.train.consistency import (
        TrainConfig, consistency_losses, prepare_sample,
    )

    cfg = ModelConfig.tiny(vocab_size=128, dtype=jnp.float32, head_dim=32,
                           num_heads=4, num_kv_heads=2, hidden_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)
    rng = np.random.RandomState(0)
    seq = rng.randint(1, 128, L).tolist()
    common = dict(N=N, seq_bucket=L, ar_pair_bucket=L, cons_pair_bucket=L)
    tc_d = TrainConfig(**common)
    tc_s = TrainConfig(attn_impl="splash", splash_interpret=True, **common)
    batch = {k: jnp.asarray(v) for k, v in prepare_sample(seq, P, T, tc_d).items()}

    _, m_d = consistency_losses(params, cfg, tc_d, rope, batch)
    _, m_s = consistency_losses(params, cfg, tc_s, rope, batch, (P, T, L))
    np.testing.assert_allclose(
        float(m_s["loss_ar"]), float(m_d["loss_ar"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m_s["loss_consistency"]), float(m_d["loss_consistency"]), rtol=2e-3, atol=1e-5
    )
