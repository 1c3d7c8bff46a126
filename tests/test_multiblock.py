"""Multiblock + rejection recycling (MR) decoder tests.

Correctness bar: greedy MR output must equal greedy AR token-for-token, like
the single-block decoder (the promotion-resets-acceptance design guarantees
every committed token was verified against fully-committed context)."""

import numpy as np

from jacobiforcing_tpu.config import SamplingParams
from tests.test_engine import make_engine, make_prompts


def _mr_sp(max_tokens, N=8, K=2, pool=4, r=0.8, la=0.0, max_iters=256):
    return SamplingParams(
        temperature=0.0, max_tokens=max_tokens,
        decode_strategy="jacobi_multiblock_rejection_recycling",
        jacobi_block_len=N, jacobi_max_blocks=K, jacobi_n_gram_pool_size=pool,
        jacobi_spawn_ratio=r, jacobi_lookahead_start_ratio=la,
        jacobi_max_iterations=max_iters,
    )


def test_mr_equals_ar_single():
    prompts = make_prompts(256)[:2]
    ar = make_engine().generate(prompts, SamplingParams(temperature=0.0, max_tokens=24))
    for K in (1, 2):
        mr_eng = make_engine()
        mr = mr_eng.generate(prompts, _mr_sp(24, K=K))
        for a, m in zip(ar, mr):
            assert m["token_ids"][:24] == a["token_ids"], (K, a, m)


def test_mr_equals_ar_k3():
    prompts = make_prompts(256)[:1]
    ar = make_engine().generate(prompts, SamplingParams(temperature=0.0, max_tokens=20))
    mr = make_engine().generate(prompts, _mr_sp(20, K=3, r=0.5))
    assert mr[0]["token_ids"][:20] == ar[0]["token_ids"]


def test_mr_eos_stop():
    prompts = make_prompts(256)[:1]
    probe = make_engine().generate(prompts, SamplingParams(temperature=0.0, max_tokens=32))
    eos = probe[0]["token_ids"][9]
    eng = make_engine(eos=eos)
    out = eng.generate(prompts, _mr_sp(32))
    ids = out[0]["token_ids"]
    assert ids[-1] == eos and eos not in ids[:-1]
    assert ids == probe[0]["token_ids"][: len(ids)]


def test_mr_makes_multi_token_progress():
    """With self-matching content the n-gram pool should help; at minimum the
    decoder must be as fast as AR fallback (>= 1 token/iter)."""
    prompts = make_prompts(256)[:1]
    eng = make_engine()
    out = eng.generate(prompts, _mr_sp(24))
    assert len(out[0]["token_ids"]) >= 24
    assert eng.stats["generated_tokens"] >= eng.stats["jacobi_iterations"]


def test_mr_batched_equals_individual():
    """A BATCH of MR requests (mixed prompt lengths) must decode to exactly
    the per-request outputs, sharing device chunks (the reference cannot batch
    MR at all)."""
    prompts = make_prompts(256)  # 4 prompts, lengths 5/9/17/3
    sp = _mr_sp(20)
    eng = make_engine(num_pages=512)
    batch_out = eng.generate(prompts, sp)
    # batched: one chunk call per engine step for the whole group
    assert eng.stats["chunk_calls"] < 4 * 3
    for i, p in enumerate(prompts):
        solo = make_engine(num_pages=512).generate([p], sp)
        assert batch_out[i]["token_ids"] == solo[0]["token_ids"], i
