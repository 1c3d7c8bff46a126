"""Engine stress tests: mixed strategy batches, staggered arrivals, page
pressure with prefix sharing, invariant checks across many steps."""

import numpy as np

from jacobiforcing_tpu.config import SamplingParams
from jacobiforcing_tpu.engine.sequence import SequenceStatus
from tests.test_engine import make_engine, make_prompts


def test_mixed_all_strategies_one_engine():
    """AR + jacobi + nongreedy + MR + on-policy requests interleaved in one
    engine must all complete with correct budgets and deterministic greedy
    outputs matching dedicated engines."""
    rng = np.random.RandomState(7)
    prompts = [rng.randint(1, 256, rng.randint(4, 20)).tolist() for _ in range(10)]
    sps = []
    for i in range(10):
        kind = i % 5
        if kind == 0:
            sps.append(SamplingParams(temperature=0.0, max_tokens=12))
        elif kind == 1:
            sps.append(SamplingParams(temperature=0.0, max_tokens=12,
                                      decode_strategy="jacobi", jacobi_block_len=8,
                                      jacobi_max_blocks=1))
        elif kind == 2:
            sps.append(SamplingParams(temperature=0.8, max_tokens=12,
                                      decode_strategy="jacobi_nongreedy",
                                      jacobi_block_len=8, jacobi_max_blocks=1))
        elif kind == 3:
            sps.append(SamplingParams(temperature=0.0, max_tokens=12,
                                      decode_strategy="jacobi_multiblock_rejection_recycling",
                                      jacobi_block_len=8, jacobi_max_blocks=2))
        else:
            sps.append(SamplingParams(temperature=0.5, max_tokens=12,
                                      decode_strategy="jacobi_on_policy",
                                      jacobi_block_len=8, jacobi_max_blocks=1,
                                      jacobi_max_iterations=8))
    eng = make_engine(num_pages=512)
    outs = eng.generate(prompts, sps)
    for i, o in enumerate(outs):
        assert len(o["token_ids"]) == 12, (i, len(o["token_ids"]))
    # greedy rows must match a dedicated engine exactly
    for i in (0, 1, 3):
        ref = make_engine(num_pages=512).generate([prompts[i]], sps[i])
        assert outs[i]["token_ids"] == ref[0]["token_ids"], i


def test_staggered_arrivals_continuous_batching():
    """Requests added mid-flight join the running batch and finish."""
    rng = np.random.RandomState(3)
    eng = make_engine(num_pages=512)
    sp = SamplingParams(temperature=0.0, max_tokens=16, decode_strategy="jacobi",
                        jacobi_block_len=8, jacobi_max_blocks=1)
    first = [eng.add_request(rng.randint(1, 256, 8).tolist(), sp) for _ in range(3)]
    for _ in range(2):
        eng.step()
    late = [eng.add_request(rng.randint(1, 256, 8).tolist(), sp) for _ in range(3)]
    steps = 0
    while not eng.scheduler.is_finished and steps < 200:
        eng.step()
        steps += 1
    assert eng.scheduler.is_finished
    for s in first + late:
        assert s.status is SequenceStatus.FINISHED
        assert s.num_completion_tokens == 16


def test_page_pressure_with_shared_prefixes():
    """Many requests sharing a long prefix under a tight page pool: prefix
    caching + preemption must still complete everything correctly."""
    rng = np.random.RandomState(5)
    base = rng.randint(1, 256, 48).tolist()  # 3 full pages of shared prefix
    prompts = [base + rng.randint(1, 256, 4).tolist() for _ in range(6)]
    sp = SamplingParams(temperature=0.0, max_tokens=12, decode_strategy="jacobi",
                        jacobi_block_len=8, jacobi_max_blocks=1)

    ample_eng = make_engine(num_pages=512)
    ample = ample_eng.generate(prompts, sp)
    tight_eng = make_engine(num_pages=28)
    tight = tight_eng.generate(prompts, sp)
    for a, t in zip(ample, tight):
        assert a["token_ids"] == t["token_ids"]
    assert tight_eng.block_manager.prefix_cache_hits > 0
    # all pages returned after retirement
    assert tight_eng.block_manager.num_free_pages == 28
    assert ample_eng.block_manager.num_free_pages == 512


def test_oversized_budget_terminates():
    """A max_tokens far beyond max_model_len must not livelock: the budget is
    clamped to the context window and generation completes."""
    import pytest

    rng = np.random.RandomState(1)
    eng = make_engine(num_pages=512)  # max_model_len=256 in make_engine
    prompt = rng.randint(1, 256, 40).tolist()
    out = eng.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_tokens=10**6, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1,
                       jacobi_max_iterations=10**6),
    )[0]
    assert len(out["token_ids"]) == 256 - 40
    with pytest.raises(AssertionError):
        eng.add_request(rng.randint(1, 256, 300).tolist(), SamplingParams())


def test_mr_auto_policy_under_page_pressure(monkeypatch):
    """MR with the 4-arm auto-policy rotating every chunk under a tight page
    pool: preemption clears BOTH mb_state and the single arm's sliding draft,
    so the dispatch paths must re-bootstrap whichever arm the rotation lands
    on after re-prefill — and still match the ample-pool run and greedy AR
    token for token."""
    from jacobiforcing_tpu.engine import mr_policy

    counter = {"i": -1}

    def cycling_pick(self):
        counter["i"] += 1
        arm = counter["i"] % self.n_arms
        # locked single exercises the async-pipeline path under preemption
        self.locked = arm if arm == 3 else None
        return arm

    monkeypatch.setattr(mr_policy.MRAutoPolicy, "pick", cycling_pick)
    rng = np.random.RandomState(5)
    base = rng.randint(1, 256, 48).tolist()
    prompts = [base + rng.randint(1, 256, 4).tolist() for _ in range(6)]
    sp = SamplingParams(
        temperature=0.0, max_tokens=12,
        decode_strategy="jacobi_multiblock_rejection_recycling",
        jacobi_block_len=8, jacobi_max_blocks=2, jacobi_max_iterations=512,
    )
    # chunk_iters=2: every chunk is two device trips, so the rotation
    # switches arms several times per request
    ample = make_engine(num_pages=512, jacobi_chunk_iters=2).generate(prompts, sp)
    tight_eng = make_engine(num_pages=28, jacobi_chunk_iters=2)
    tight = tight_eng.generate(prompts, sp)
    for a, t in zip(ample, tight):
        assert a["token_ids"] == t["token_ids"]
    assert counter["i"] >= 7  # the rotation really covered all arms
    ar = make_engine(num_pages=512).generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=12)
    )
    for a, b in zip(ar, ample):
        assert a["token_ids"] == b["token_ids"]
