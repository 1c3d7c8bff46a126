"""On-chip cross-path exact-match validation (the Mosaic kernel paths).

CPU tests prove AR == Jacobi == MR token-for-token through the XLA and
interpret-mode kernels; this script re-proves it ON THE REAL CHIP where the
compiled Pallas kernels serve decode AND the query-tiled prefill — the
cross-path greedy-argmax bit-stability criterion of the reference test
(inference_engine/tests/test_jacobi_decoding_greedy.py:313-360), extended to
long prompts that exercise chunked prefill + the tiled prefill kernel.

    python scripts/validate_tpu_paths.py [preset] [prompt_len] [max_tokens]

Uses random 1.5B-dim weights (no checkpoint needed): argmax agreement across
paths is a property of the kernels, not the weights.  The model runs in f32
on-chip — random-weight bf16 logits have ~1e-2 rounding, which makes argmax
near-ties overwhelm the signal; f32 leaves them rare but NOT absent: paths
forward different token counts per call (1 vs 64 vs S*N), so logits differ by
XLA-tiling reassociation (~1e-4 rel), and random-weight logits are nearly
exchangeable, so top-2 margins under that noise do occur.  Each divergence is
therefore *adjudicated*, not counted: re-forward the agreed prefix through
the prefill path and measure the logit margin between the two chosen tokens.
A near-tie has margin ~1e-4 of the logit scale (and the fresh forward often
sides with the non-AR path); a masking/KV-path bug picks a token far down
the distribution (margin >> 1e-3) and usually diverges in the first tokens.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRESET = sys.argv[1] if len(sys.argv) > 1 else "1.5b"
PROMPT_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 4500
MAX_TOKENS = int(sys.argv[3]) if len(sys.argv) > 3 else 48

import jax
import jax.numpy as jnp

from jacobiforcing_tpu.config import Config, SamplingParams
from jacobiforcing_tpu.engine.llm_engine import LLMEngine
from jacobiforcing_tpu.models.qwen import ModelConfig, init_params

if PRESET == "7b":
    mc = ModelConfig(dtype=jnp.float32)
else:
    mc = ModelConfig(
        vocab_size=151936, hidden_size=1536, intermediate_size=8960,
        num_layers=28, num_heads=12, num_kv_heads=2, head_dim=128,
        tie_word_embeddings=True, dtype=jnp.float32,
    )

params = init_params(mc, jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
prompts = [
    rng.randint(1, mc.vocab_size, PROMPT_LEN - d).tolist() for d in (0, 7, 131)
]


def make_engine():
    cfg = Config(max_model_len=8192, eos=-1)
    # modest KV pool: engines for the 3 strategies are created sequentially
    # but HBM also holds the f32 params; 96 pages = 24k slots is plenty for
    # 3 prompts of ~PROMPT_LEN+draft
    return LLMEngine(cfg, model_cfg=mc, params=params, num_kv_pages=96)


def margin_at(prefix, tok_a, tok_b):
    """Adjudicate a divergence at the position following `prefix`.

    Returns (margin, scale, noise): margin = logits[tok_a] - logits[tok_b]
    through the prefill path, scale = max |logit|, and noise = the measured
    cross-shape reassociation floor — max |Δlogit| over the whole vocab
    between forwarding the prefix at batch-bucket 1 and at batch-bucket 2
    (two copies).  A near-tie's |margin| sits within a few × noise; a
    masking/KV bug picks a token whose margin is orders above it."""
    from jacobiforcing_tpu.engine import runner
    from jacobiforcing_tpu.engine.llm_engine import _bucket
    import jax.numpy as jnp

    def prefill_logits(n_copies):
        eng = make_engine()
        sp1 = SamplingParams(temperature=0.0, max_tokens=1)
        seqs = [eng.add_request(list(prefix), sp1) for _ in range(n_copies)]
        sched, is_p = eng.scheduler.schedule()
        assert is_p
        B = _bucket(len(sched), eng.config.batch_buckets)
        T = _bucket(len(prefix), eng.config.prefill_token_buckets)
        ids = np.zeros((B, T), np.int32)
        starts = np.zeros((B,), np.int32)
        totals = np.ones((B,), np.int32)
        for i in range(len(sched)):
            ids[i, : len(prefix)] = prefix
            totals[i] = len(prefix)
        bt = eng._pad_block_table(sched, B)
        _, last_logits, _ = runner.prefill(
            eng.params, eng.model_cfg, eng.rope, jnp.asarray(ids),
            jnp.asarray(starts), jnp.asarray(totals), jnp.asarray(totals),
            eng.kv, bt, n_out=1,
        )
        return np.asarray(last_logits[0], np.float64)

    lg = prefill_logits(1)
    noise = float(np.abs(lg - prefill_logits(2)).max())
    return float(lg[tok_a] - lg[tok_b]), float(np.abs(lg).max()), noise


runs = {
    "ar": SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS),
    "jacobi": SamplingParams(
        temperature=0.0, max_tokens=MAX_TOKENS, decode_strategy="jacobi",
        jacobi_block_len=64, jacobi_max_blocks=1,
    ),
    "mr": SamplingParams(
        temperature=0.0, max_tokens=MAX_TOKENS,
        decode_strategy="jacobi_multiblock_rejection_recycling",
        jacobi_block_len=64, jacobi_max_blocks=2,
    ),
}

outs = {}
for name, sp in runs.items():
    t0 = time.perf_counter()
    outs[name] = make_engine().generate(prompts, sp)
    print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)

match = bugs = ties = 0
for i in range(len(prompts)):
    ref = outs["ar"][i]["token_ids"]
    for name in ("jacobi", "mr"):
        got = outs[name][i]["token_ids"]
        if got == ref:
            match += 1
            continue
        j = next(
            (k for k, (a, b) in enumerate(zip(ref, got)) if a != b),
            min(len(ref), len(got)),
        )
        # adjudicate: margin between the two chosen tokens at the agreed
        # prefix vs the measured cross-shape reassociation noise floor
        m, scale, noise = margin_at(prompts[i] + ref[:j], ref[j], got[j])
        tie = abs(m) <= max(8 * noise, 1e-4 * scale)
        ties += tie
        bugs += not tie
        print(
            f"[divergence] prompt {i} {name} at token {j}/{len(ref)}: "
            f"margin {m:+.2e}, noise floor {noise:.2e}, logit scale "
            f"{scale:.2f} -> {'near-tie' if tie else 'PATH BUG'}",
            flush=True,
        )

total = len(prompts) * 2
print(f"exact-match: {match}/{total} path-pairs, {ties} near-ties, "
      f"{bugs} bugs (prompt_len~{PROMPT_LEN}, {MAX_TOKENS} new tokens, "
      f"{PRESET} dims)")
assert bugs == 0, "cross-path divergence beyond argmax-tie margin: path bug"
print("OK")
