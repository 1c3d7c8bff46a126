"""Greedy Jacobi == greedy AR, token-for-token — the reference's core
correctness criterion (inference_engine/tests/test_jacobi_decoding_greedy.py:118-360)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import (
    PAGE,
    ar_generate_greedy,
    contiguous_block_tables,
    jacobi_generate_greedy,
    tiny_setup,
)


def make_prompts(vocab, rng=0):
    r = np.random.RandomState(rng)
    return [
        r.randint(1, vocab, size=n).tolist()
        for n in (5, 9, 17, 3)
    ]


def test_single_sequence_exact_match():
    cfg, params, rope, kv = tiny_setup()
    prompts = make_prompts(cfg.vocab_size)[:1]
    bt = contiguous_block_tables(1, 8, kv.num_pages)
    ar, _ = ar_generate_greedy(cfg, params, rope, kv, prompts, 40, bt)

    cfg, params, rope, kv = tiny_setup()
    jac, stats = jacobi_generate_greedy(cfg, params, rope, kv, prompts, 40, bt, L=8)
    assert jac[0] == ar[0], f"AR={ar[0]}\nJA={jac[0]}"
    # Jacobi must make progress: >= 1 token per iteration by construction.
    assert stats["generated"][0] >= stats["iters"][0]


def test_batch_exact_match():
    cfg, params, rope, kv = tiny_setup(num_pages=64)
    prompts = make_prompts(cfg.vocab_size)
    B = len(prompts)
    bt = contiguous_block_tables(B, 8, kv.num_pages)
    ar, _ = ar_generate_greedy(cfg, params, rope, kv, prompts, 32, bt)

    cfg, params, rope, kv = tiny_setup(num_pages=64)
    jac, _ = jacobi_generate_greedy(cfg, params, rope, kv, prompts, 32, bt, L=8)
    for b in range(B):
        assert jac[b] == ar[b], f"seq {b}: AR={ar[b]}\nJA={jac[b]}"


def test_cross_mode_consistency():
    """Jacobi must equal AR within each serving mode
    (reference test_jacobi_decoding_greedy.py:313-360).

    The tiny test model runs in fp64 (ModelConfig.tiny) precisely so that
    batch-shape-dependent kernel reassociation cannot flip argmax near-ties —
    the reference's batch tier only soft-checks this (>=50% "pass with
    warning", test_jacobi_decoding_greedy.py:209-304).
    """
    cfg, params, rope, kv = tiny_setup(num_pages=64)
    prompts = make_prompts(cfg.vocab_size)[:2]
    bt2 = contiguous_block_tables(2, 8, kv.num_pages)
    ar_batch, _ = ar_generate_greedy(cfg, params, rope, kv, prompts, 24, bt2)

    for b, p in enumerate(prompts):
        cfg, params, rope, kv = tiny_setup(num_pages=64)
        bt1 = contiguous_block_tables(1, 8, kv.num_pages)
        ar_single, _ = ar_generate_greedy(cfg, params, rope, kv, [p], 24, bt1)
        assert ar_single[0] == ar_batch[b]

        cfg, params, rope, kv = tiny_setup(num_pages=64)
        jac_single, _ = jacobi_generate_greedy(cfg, params, rope, kv, [p], 24, bt1, L=8)
        assert jac_single[0] == ar_batch[b]


def test_eos_termination():
    """EOS inside the accepted prefix must cap the commit and stop generation
    (reference jacobi_decoding.py:597-631)."""
    cfg, params, rope, kv = tiny_setup()
    prompts = make_prompts(cfg.vocab_size)[:1]
    bt = contiguous_block_tables(1, 8, kv.num_pages)
    ar, _ = ar_generate_greedy(cfg, params, rope, kv, prompts, 48, bt)
    # Pick the token AR generates at step ~10 as the "EOS" so it will be hit.
    eos_id = ar[0][10]
    ar_stop = ar[0][: ar[0].index(eos_id) + 1]

    cfg, params, rope, kv = tiny_setup()
    jac, _ = jacobi_generate_greedy(
        cfg, params, rope, kv, prompts, 48, bt, L=8, eos_token_id=eos_id
    )
    assert jac[0] == ar_stop, f"AR(stop)={ar_stop}\nJA={jac[0]}"
    assert jac[0][-1] == eos_id


def test_chunked_equals_unchunked():
    """Host re-entry between bounded device segments must not change output."""
    cfg, params, rope, kv = tiny_setup()
    prompts = make_prompts(cfg.vocab_size)[:2]
    bt = contiguous_block_tables(2, 8, kv.num_pages)
    full, _ = jacobi_generate_greedy(cfg, params, rope, kv, prompts, 32, bt, L=8)

    cfg, params, rope, kv = tiny_setup()
    chunked, _ = jacobi_generate_greedy(
        cfg, params, rope, kv, prompts, 32, bt, L=8, chunk_budget=8
    )
    assert full == chunked


def test_accept_lengths_math():
    """Unit test of the vectorized accept-length rule
    (reference jacobi_decoding.py:287-293)."""
    draft = jnp.array([[5, 1, 2, 3], [5, 9, 9, 9], [5, 1, 9, 3]], jnp.int32)
    greedy = jnp.array([[1, 2, 3], [1, 2, 3], [1, 2, 3]], jnp.int32)
    mismatch = draft[:, 1:] != greedy
    nm = jnp.sum(jnp.cumsum(mismatch, axis=-1) == 0, axis=-1)
    acc = nm + 1
    assert acc.tolist() == [4, 1, 2]
