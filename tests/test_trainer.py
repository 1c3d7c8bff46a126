"""Consistency trainer tests: mask invariants, loss behavior, checkpoint/resume.

Reference semantics: soft_flexattn_cllm_trainer.py (mask :220-286, AR loss
:379-502, consistency :504-551) + multiblock/window variants."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
from jacobiforcing_tpu.train.consistency import (
    TrainConfig,
    build_train_mask,
    consistency_losses,
    make_train_step,
    prepare_sample,
    shared_position_ids,
)


P, N, T = 6, 4, 3  # prompt len, block len, pairs
L = P + 2 * T * N


def mask_np(variant="single", window=4):
    m = build_train_mask(
        L, jnp.int32(P), jnp.int32(T), jnp.int32(L), N, variant, window
    )
    return np.asarray(m)


def blocks():
    ks = [P + 2 * j * N for j in range(T)]
    ls = [P + (2 * j + 1) * N for j in range(T)]
    return ks, ls


def test_mask_invariants_single():
    m = mask_np("single")
    ks, ls = blocks()
    # prompt causal
    for q in range(P):
        assert m[q, : q + 1].all() and not m[q, q + 1 :].any()
    # k_1 sees prompt, last_0, itself causally; not k_0, not last_1
    q = ks[1] + 2
    assert m[q, :P].all()
    assert m[q, ls[0] : ls[0] + N].all()
    assert m[q, ks[1] : q + 1].all() and not m[q, q + 1 : ks[1] + N].any()
    assert not m[q, ks[0] : ks[0] + N].any()
    assert not m[q, ls[1] : ls[1] + N].any()
    # last_1 sees prompt, last_0, itself causally; no k blocks
    q = ls[1] + 1
    assert m[q, :P].all()
    assert m[q, ls[0] : ls[0] + N].all()
    assert m[q, ls[1] : q + 1].all() and not m[q, q + 1 : ls[1] + N].any()
    assert not m[q, ks[0] : ks[0] + N].any() and not m[q, ks[1] : ks[1] + N].any()


def test_mask_variants():
    ks, _ = blocks()
    q = ks[2] + 1  # a k_2 query
    m_single = mask_np("single")
    m_multi = mask_np("multiblock")
    m_w1 = mask_np("window", window=1)
    m_w2 = mask_np("window", window=2)
    # multiblock: k_2 sees k_0 and k_1
    assert not m_single[q, ks[0] : ks[0] + N].any()
    assert m_multi[q, ks[0] : ks[0] + N].all() and m_multi[q, ks[1] : ks[1] + N].all()
    # window=1: pair 2 alone in its window -> no previous k visible
    assert not m_w1[q, ks[0] : ks[0] + N].any() and not m_w1[q, ks[1] : ks[1] + N].any()
    # window=2: pairs {0,1} and {2,...}: k_2 sees no previous k; k_1 sees k_0
    q1 = ks[1] + 1
    assert m_w2[q1, ks[0] : ks[0] + N].all()
    assert not m_w2[q, ks[1] : ks[1] + N].any()


def test_shared_positions():
    pos = np.asarray(shared_position_ids(L, jnp.int32(P), N))
    ks, ls = blocks()
    for j in range(T):
        np.testing.assert_array_equal(pos[ks[j] : ks[j] + N], pos[ls[j] : ls[j] + N])
        np.testing.assert_array_equal(pos[ks[j] : ks[j] + N], P + j * N + np.arange(N))
    np.testing.assert_array_equal(pos[:P], np.arange(P))


def _make_row(rng, vocab=256, noisy_tail=2):
    """Synthetic packed row: k_j = last_j with the last `noisy_tail` tokens
    randomized (the packed-data layout of 2_prepare_..._noise_window.py:265-271)."""
    prompt = rng.randint(1, vocab, P).tolist()
    seq = list(prompt)
    target = rng.randint(1, vocab, T * N)
    for j in range(T):
        last = target[j * N : (j + 1) * N].tolist()
        k = list(last)
        for t in range(N - noisy_tail, N):
            k[t] = int(rng.randint(1, vocab))
        seq.extend(k)
        seq.extend(last)
    return seq


def _tc(**kw):
    d = dict(N=N, max_pairs=T, seq_bucket=64, ar_pair_bucket=64, cons_pair_bucket=64)
    d.update(kw)
    return TrainConfig(**d)


def test_loss_runs_and_decreases():
    cfg = ModelConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)
    tc = _tc()
    rng = np.random.RandomState(0)
    row = _make_row(rng)
    batch = {k: jnp.asarray(v) for k, v in prepare_sample(row, P, T, tc).items()}

    opt = optax.adamw(1e-3)
    step = make_train_step(cfg, tc, opt)
    opt_state = opt.init(params)
    losses = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, rope, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_consistency_zero_when_identical():
    cfg = ModelConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)
    tc = _tc()
    row = _make_row(np.random.RandomState(1), noisy_tail=0)  # k_j == last_j
    batch = {k: jnp.asarray(v) for k, v in prepare_sample(row, P, T, tc).items()}
    _, metrics = consistency_losses(params, cfg, tc, rope, batch)
    assert float(metrics["loss_consistency"]) == 0.0
    assert float(metrics["loss_ar"]) > 0.0


def test_teacher_detached():
    """Consistency gradient must flow only through the student (k_j) branch."""
    cfg = ModelConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)
    tc = _tc(ar_weight=0.0)  # isolate consistency loss
    row = _make_row(np.random.RandomState(2))
    batch = {k: jnp.asarray(v) for k, v in prepare_sample(row, P, T, tc).items()}
    g = jax.grad(lambda p: consistency_losses(p, cfg, tc, rope, batch)[0])(params)
    norm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert norm > 0  # student branch produces gradient


def test_trainer_loop_and_resume(tmp_path):
    from jacobiforcing_tpu.train.trainer import TrainerArgs, train

    cfg = ModelConfig.tiny(dtype=jnp.float32)
    rng = np.random.RandomState(3)
    rows = []
    for _ in range(4):
        seq = _make_row(rng)
        rows.append({
            "input_ids": seq, "prompt_len": P, "T": T,
        })

    class DS:
        def __len__(self):
            return len(rows)

        def __getitem__(self, i):
            return rows[i]

    args = TrainerArgs(
        output_dir=str(tmp_path / "out"), max_new_tokens=N, seq_bucket=64,
        max_steps=4, save_steps=2, log_steps=2, learning_rate=1e-4,
    )
    res = train(args, model_cfg=cfg, dataset=DS(), log_fn=lambda *_: None)
    assert res["step"] == 4
    # resume: max_steps=6 continues from step 4
    args2 = TrainerArgs(
        output_dir=str(tmp_path / "out"), max_new_tokens=N, seq_bucket=64,
        max_steps=6, save_steps=10, log_steps=2, learning_rate=1e-4,
    )
    res2 = train(args2, model_cfg=cfg, dataset=DS(), log_fn=lambda *_: None)
    assert res2["step"] == 6


def test_trainer_variants_e2e(tmp_path):
    """multiblock and window variants run through the full train() loop
    (ar_weight switching, mask wiring) and decrease loss."""
    from jacobiforcing_tpu.train.trainer import TrainerArgs, train

    cfg = ModelConfig.tiny(dtype=jnp.float32)
    rng = np.random.RandomState(5)
    rows = [{"input_ids": _make_row(rng), "prompt_len": P, "T": T} for _ in range(3)]

    class DS:
        def __len__(self):
            return len(rows)

        def __getitem__(self, i):
            return rows[i]

    for variant in ("multiblock", "window"):
        args = TrainerArgs(
            output_dir=str(tmp_path / variant), max_new_tokens=N, seq_bucket=64,
            variant=variant, window_size=2, max_steps=6, save_steps=100,
            log_steps=1, learning_rate=3e-4, resume=False,
        )
        res = train(args, model_cfg=cfg, dataset=DS(), log_fn=lambda *_: None)
        losses = [h["loss"] for h in res["history"]]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], (variant, losses)


def test_dp_step_matches_global_batch_gradient():
    """The mesh-sharded dp step must equal a single-device step on the mean
    loss over the same global batch (true data parallelism, not param-only
    sharding)."""
    from jacobiforcing_tpu.parallel.mesh import make_mesh
    from jacobiforcing_tpu.parallel.sharding import shard_params

    cfg = ModelConfig.tiny(dtype=jnp.float32)
    rope = rope_table(cfg)
    tc = _tc()
    rng = np.random.RandomState(7)
    samples = [prepare_sample(_make_row(rng), P, T, tc) for _ in range(4)]
    batch = {k: jnp.asarray(np.stack([s[k] for s in samples])) for k in samples[0]}

    opt = optax.adamw(1e-3)

    # single-device oracle: grad of mean loss over the 4 samples
    params_ref = init_params(cfg, jax.random.PRNGKey(0))
    opt_ref = opt.init(params_ref)

    def mean_loss(p):
        totals, _ = jax.vmap(
            lambda b: consistency_losses(p, cfg, tc, rope, b)
        )(batch)
        return jnp.mean(totals)

    loss_ref, g = jax.value_and_grad(mean_loss)(params_ref)
    upd, _ = opt.update(g, opt_ref, params_ref)
    params_ref = optax.apply_updates(params_ref, upd)

    # dp step over a 4x2 mesh with fsdp-sharded params
    mesh = make_mesh(tensor_parallel_size=2, data_parallel_size=4)
    params_dp = shard_params(init_params(cfg, jax.random.PRNGKey(0)), cfg, mesh, fsdp=True)
    opt_state = opt.init(params_dp)
    step = make_train_step(cfg, tc, opt, mesh)
    params_dp, _, metrics = step(params_dp, opt_state, rope, batch)

    np.testing.assert_allclose(float(metrics["loss"]), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_trainer_loop_dp(tmp_path):
    """train() with a mesh consumes global_batch samples per step."""
    from jacobiforcing_tpu.parallel.mesh import make_mesh
    from jacobiforcing_tpu.train.trainer import TrainerArgs, train

    cfg = ModelConfig.tiny(dtype=jnp.float32)
    rng = np.random.RandomState(9)
    rows = [{"input_ids": _make_row(rng), "prompt_len": P, "T": T} for _ in range(8)]

    class DS:
        def __len__(self):
            return len(rows)

        def __getitem__(self, i):
            return rows[i]

    mesh = make_mesh(tensor_parallel_size=1, data_parallel_size=4)
    args = TrainerArgs(
        output_dir=str(tmp_path / "dp"), max_new_tokens=N, seq_bucket=64,
        max_steps=4, save_steps=100, log_steps=1, learning_rate=3e-4,
        global_batch=0, resume=False,
    )
    res = train(args, model_cfg=cfg, dataset=DS(), mesh=mesh, log_fn=lambda *_: None)
    assert res["step"] == 4
    losses = [h["loss"] for h in res["history"]]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
