"""Differential tests: native C++ block manager vs the Python implementation.

Random workloads of allocate/ensure/deallocate must produce byte-identical
page tables, cached lengths, and free counts."""

import numpy as np
import pytest

from jacobiforcing_tpu.engine.block_manager import BlockManager
from jacobiforcing_tpu.engine.sequence import Sequence
from jacobiforcing_tpu.config import SamplingParams

native = pytest.importorskip("jacobiforcing_tpu.engine.native_block_manager")
if native.load_native_lib() is None:
    pytest.skip("native lib unavailable", allow_module_level=True)


PAGE = 16


def _mk_seq(tokens):
    return Sequence(list(tokens), SamplingParams())


def test_differential_random_workload():
    rng = np.random.RandomState(0)
    py = BlockManager(64, PAGE)
    cc = native.NativeBlockManager(64, PAGE)

    # keep twin Sequence objects so seq_ids line up between managers
    live = []  # list of (py_seq, cc_seq)
    prompt_pool = [rng.randint(1, 50, rng.randint(3, 70)).tolist() for _ in range(12)]

    for step in range(400):
        op = rng.rand()
        if op < 0.45 and py.num_free_pages > 8:
            toks = prompt_pool[rng.randint(len(prompt_pool))]
            margin = int(rng.randint(0, 20))
            s_py, s_cc = _mk_seq(toks), _mk_seq(toks)
            s_cc.seq_id = s_py.seq_id  # align ids
            if not py.can_allocate(s_py, margin):
                continue
            c1 = py.allocate_prompt(s_py, margin)
            c2 = cc.allocate_prompt(s_cc, margin)
            assert c1 == c2, f"step {step}: cached_len {c1} != {c2}"
            assert s_py.block_table == s_cc.block_table, f"step {step}"
            live.append((s_py, s_cc))
        elif op < 0.7 and live:
            s_py, s_cc = live[rng.randint(len(live))]
            upto = len(s_py) + int(rng.randint(0, 64))
            r1 = py.ensure_capacity(s_py, upto)
            r2 = cc.ensure_capacity(s_cc, upto)
            assert r1 == r2
            assert s_py.block_table == s_cc.block_table
        elif live:
            i = rng.randint(len(live))
            s_py, s_cc = live.pop(i)
            py.deallocate(s_py)
            cc.deallocate(s_cc)
        assert py.num_free_pages == cc.num_free_pages, f"step {step}"
    assert py.prefix_cache_hits == cc.prefix_cache_hits
    assert py.prefix_cache_queries == cc.prefix_cache_queries
    assert py.prefix_cache_hits > 0  # workload actually exercised the cache


def test_engine_uses_native(monkeypatch):
    monkeypatch.setenv("JF_NATIVE_BM", "1")
    from tests.test_engine import make_engine, make_prompts
    from jacobiforcing_tpu.config import SamplingParams as SP

    eng = make_engine()
    assert type(eng.block_manager).__name__ == "NativeBlockManager"
    out = eng.generate(
        make_prompts(256)[:2], SP(temperature=0.0, max_tokens=12,
                                  decode_strategy="jacobi", jacobi_block_len=8,
                                  jacobi_max_blocks=1),
    )
    # equality with the python-BM engine
    monkeypatch.setenv("JF_NATIVE_BM", "0")
    eng2 = make_engine()
    assert type(eng2.block_manager).__name__ == "BlockManager"
    out2 = eng2.generate(
        make_prompts(256)[:2], SP(temperature=0.0, max_tokens=12,
                                  decode_strategy="jacobi", jacobi_block_len=8,
                                  jacobi_max_blocks=1),
    )
    for a, b in zip(out, out2):
        assert a["token_ids"] == b["token_ids"]
