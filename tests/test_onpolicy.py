"""On-policy rollout record tests.

Reference: jacobi_decoding_nongreedy_on_policy.py record contract (:7-34) —
block-local trajectories, prompt prefix per block, max-filled teacher output,
stop-token truncation."""

import numpy as np

from jacobiforcing_tpu.config import SamplingParams
from tests.test_engine import make_engine, make_prompts


def _sp(max_tokens=20, L=8, blocks=16):
    return SamplingParams(
        temperature=0.8, max_tokens=max_tokens,
        decode_strategy="jacobi_on_policy", jacobi_block_len=L,
        jacobi_max_blocks=1, jacobi_max_iterations=blocks,
    )


def test_rollout_record_structure():
    prompts = make_prompts(256)[:2]
    eng = make_engine()
    outs = eng.generate(prompts, _sp(max_tokens=20, L=8))
    for p, o in zip(prompts, outs):
        recs = o["rollout_records"]
        assert len(recs) >= 1
        full = p + o["token_ids"]
        committed = len(p)
        for k, rec in enumerate(recs):
            assert rec["diffusion_itr_id"] == f"itr_{k}"
            # prompt prefix of block k = everything committed before it
            assert rec["prompt_ids"] == full[:committed]
            traj = rec["answer_trajectory_ids"]
            assert len(traj) >= 2  # init + >= 1 iteration
            assert all(len(v) == 8 for v in traj)
            # committed tokens of this block appear as the prefix of the final state
            n_blk = min(8, len(full) - committed)
            assert traj[-1][:n_blk] == full[committed : committed + n_blk]
            # monotone convergence: committed prefix only grows along trajectory
            committed += n_blk
            assert rec["teacher_output_ids"] == full
            assert rec["num_iters"] >= 1


def test_rollout_block_progress_and_budget():
    prompts = make_prompts(256)[:1]
    eng = make_engine()
    outs = eng.generate(prompts, _sp(max_tokens=19, L=8))
    o = outs[0]
    assert len(o["token_ids"]) == 19  # budget-bounded (last block gen_len=3)
    recs = o["rollout_records"]
    assert len(recs) == 3  # 8 + 8 + 3
    # last block generates only 3, tail padded
    last = recs[-1]["answer_trajectory_ids"][-1]
    assert all(t == 0 for t in last[3:])  # pad_id = 0


def test_rollout_stop_token_truncates():
    prompts = make_prompts(256)[:1]
    probe_eng = make_engine()
    probe = probe_eng.generate(prompts, _sp(max_tokens=24, L=8))[0]
    # pick a token the rollout actually produced early as a stop token
    stop = probe["token_ids"][2] if probe["token_ids"] else 1
    eng = make_engine(stop_token_ids=(stop,))
    outs = eng.generate(prompts, _sp(max_tokens=24, L=8))
    ids = outs[0]["token_ids"]
    if stop in ids:
        assert ids[-1] == stop  # truncated right after the stop token
        assert stop not in ids[:-1]


def test_accept_threshold_collection():
    """Deterministic p(x) >= threshold acceptance (reference nongreedy
    collector): rollouts complete, records well-formed, and a threshold of
    1.0 forces pure sampling (1 token/iter) while 0 keeps RS behavior."""
    from jacobiforcing_tpu.data.collect import collect_trajectories

    prompts = make_prompts(256)[:2]
    eng = make_engine(num_pages=256)
    rows = collect_trajectories(
        eng, prompts, block_len=8, max_tokens=16, temperature=1.0,
        accept_threshold=0.99,
    )
    assert rows
    for r in rows:
        assert all(len(s) == 8 for s in r["answer_trajectory_ids"])
        assert len(r["answer_trajectory_ids"]) >= 2

    # threshold 1.0: nothing exceeds it -> exactly one token per iteration
    eng2 = make_engine(num_pages=256)
    sp = SamplingParams(temperature=1.0, max_tokens=8,
                        decode_strategy="jacobi_on_policy", jacobi_block_len=8,
                        jacobi_max_blocks=1, jacobi_max_iterations=16,
                        jacobi_accept_threshold=1.1)
    out = eng2.generate(prompts[:1], sp)[0]
    rec = out["rollout_records"][0]
    # 8 tokens generated in exactly 8 iterations (init + 8 states)
    assert rec["num_iters"] == 8
