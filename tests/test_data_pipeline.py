"""Data pipeline tests: noise-schedule packing, masking-based synthesis, and
the full collect -> pack -> train loop on the tiny model.

Reference: 2_prepare_..._progressive_noise_window.py (packer),
1_progressive_masking_based_prepare_trajectory.py (masking), and the
generate_trajectory greedy collection drivers."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from jacobiforcing_tpu.config import SamplingParams
from jacobiforcing_tpu.data.collect import (
    collect_trajectories,
    synthesize_trajectories_masking,
)
from jacobiforcing_tpu.data.pack import pack_trajectories, select_noisy_state
from jacobiforcing_tpu.data.filters import (
    bucket_by_length,
    filter_by_token_length,
    reservoir_downsample,
)
from tests.test_engine import make_engine, make_prompts


N = 8


def _traj(fixed, noise_levels):
    """Craft a trajectory whose state i diverges from fixed at offset N - noise_levels[i]."""
    states = []
    for nl in noise_levels:
        s = list(fixed)
        for t in range(N - nl, N):
            s[t] = 999  # divergent token
        states.append(s)
    states.append(list(fixed))
    return states


def test_noise_state_selection():
    fixed = list(range(100, 100 + N))
    traj = _traj(fixed, [8, 6, 4, 2])  # ratios 1.0, .75, .5, .25, 0.0
    # progressive schedule over window 5 in [0, 1]: itr k -> target k/4
    for itr, expect in [(0, 4), (1, 3), (2, 2), (3, 1), (4, 0)]:
        k = select_noisy_state(traj, itr, N, 5, 0.0, 1.0, "progressive")
        assert k == expect, (itr, k)


def test_pack_layout_roundtrip():
    fixed0 = list(range(100, 100 + N))
    fixed1 = list(range(200, 200 + N))
    prompt = [1, 2, 3]
    rows = [
        {"data_id": "data_0", "diffusion_itr_id": "itr_1",
         "prompt_ids": prompt, "answer_trajectory_ids": _traj(fixed1, [4])},
        {"data_id": "data_0", "diffusion_itr_id": "itr_0",
         "prompt_ids": prompt, "answer_trajectory_ids": _traj(fixed0, [4])},
    ]
    packed = pack_trajectories(rows, N, window_size=2, strategy="progressive")
    assert len(packed) == 1
    row = packed[0]
    assert row["prompt_ids_len"] == 3
    seq = row["complete_training_sequence_ids"]
    assert len(seq) == 3 + 2 * 2 * N  # prompt + T=2 pairs
    # pairs sorted by diffusion_itr: first pair from itr_0 (fixed0)
    assert seq[3 + N : 3 + 2 * N] == fixed0  # last_0 block = fixed point
    assert seq[3 + 3 * N :] == fixed1  # last_1 block
    assert len(row["traj_position_indices"]) == 2


def test_masking_synthesis_contract():
    prompt = [1, 2, 3, 4]
    full = prompt + list(range(50, 50 + 2 * N))  # 2 chunks
    rows = synthesize_trajectories_masking(
        [{"prompt_ids": prompt, "full_ids": full}], chunk_size=N, pad_id=0, seed=0
    )
    assert len(rows) == 2
    r0 = rows[0]
    assert r0["diffusion_itr_id"] == "itr_0"
    traj = r0["answer_trajectory_ids"]
    assert len(traj) == N + 1  # N+1 corruption levels
    # final state is the clean prefix+chunk
    assert traj[-1] == full[: len(prompt) + N]
    # first state fully corrupted: last N tokens differ from clean (w.h.p. pool != chunk)
    assert all(len(s) == len(prompt) + N for s in traj)
    # packer consumes masking-format rows
    packed = pack_trajectories(rows, N, window_size=4)
    assert len(packed) == 1
    assert packed[0]["prompt_ids_len"] == len(prompt)


def test_filters():
    rows = [{"complete_training_sequence_ids": list(range(n))} for n in (5, 10, 20)]
    assert len(filter_by_token_length(rows, 10)) == 2
    big = [{"i": i} for i in range(100)]
    sub = reservoir_downsample(big, 10, seed=1)
    assert len(sub) == 10 and len({r["i"] for r in sub}) == 10
    buckets = bucket_by_length(big, lambda r: r["i"], bucket_size=30)
    assert [len(b) for b in buckets] == [30, 30, 30, 10]


def test_end_to_end_collect_pack_train():
    """The full JacobiForcing loop in-house: greedy trajectory collection on the
    tiny model -> noise-schedule packing -> consistency training steps."""
    eng = make_engine(num_pages=256)
    prompts = make_prompts(256, sizes=(6, 9))
    rows = collect_trajectories(
        eng, prompts, block_len=N, max_tokens=2 * N, temperature=0.0
    )
    assert len(rows) >= 2
    for r in rows:
        assert set(r) >= {"data_id", "diffusion_itr_id", "prompt_ids",
                          "answer_trajectory_ids", "teacher_output_ids"}
        assert all(len(s) == N for s in r["answer_trajectory_ids"])

    packed = pack_trajectories(rows, N, window_size=4)
    assert packed

    from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
    from jacobiforcing_tpu.train.consistency import (
        TrainConfig, make_train_step, prepare_sample,
    )

    cfg = ModelConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)
    tc = TrainConfig(N=N, seq_bucket=128, ar_pair_bucket=128, cons_pair_bucket=128)
    opt = optax.adamw(1e-4)
    step = make_train_step(cfg, tc, opt)
    opt_state = opt.init(params)
    for row in packed:
        T = len(row["traj_position_indices"])
        batch = {
            k: jnp.asarray(v)
            for k, v in prepare_sample(
                row["complete_training_sequence_ids"], row["prompt_ids_len"], T, tc
            ).items()
        }
        params, opt_state, metrics = step(params, opt_state, rope, batch)
        assert np.isfinite(float(metrics["loss"]))


def test_dataset_tools(tmp_path):
    from jacobiforcing_tpu.data.tools import (
        debug_decode_packed_row, merge_jsonl, profile_trajectory_dataset,
    )
    import json

    fixed = list(range(100, 100 + N))
    rows = [
        {"data_id": "data_0", "diffusion_itr_id": "itr_0",
         "prompt_ids": [1, 2], "answer_trajectory_ids": _traj(fixed, [6, 3])},
    ]
    prof = profile_trajectory_dataset(rows)
    assert prof["rows"] == 1 and prof["unique_data_ids"] == 1
    assert prof["iterations_per_block"]["mean"] == 3.0
    assert prof["initial_noise_ratio"]["mean"] == 0.75  # 6/8 noisy

    # merge
    for i in range(2):
        with open(tmp_path / f"shard{i}.jsonl", "w") as f:
            f.write(json.dumps(rows[0]) + "\n")
    n = merge_jsonl([str(tmp_path / "shard*.jsonl")], str(tmp_path / "all.jsonl"))
    assert n == 2

    # debug decode of packed rows
    packed = pack_trajectories(rows, N, window_size=2)
    pairs = debug_decode_packed_row(packed[0], N)
    assert pairs[0]["last"] == fixed
    assert 0.0 <= pairs[0]["noise_ratio"] <= 1.0
