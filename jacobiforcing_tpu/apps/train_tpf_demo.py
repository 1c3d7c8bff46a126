"""Train a small checkpoint to a MEASURED Jacobi TPF >= 2 — no network needed.

All reference headline numbers are trained-checkpoint results
(README.md:253-270); with no network access to the released Jacobi-Forcing
checkpoints, this driver produces one in-env so the benchmark can report a
measured tokens-per-forward instead of assuming the reference's 4.0:

  1. SFT a small Qwen-architecture model on a synthetic copy language
     (continuation = prompt repeated cyclically) until greedy AR is
     near-perfect — the language is deterministic given the prompt, so
     multi-token-ahead prediction is learnable (induction-head copying);
  2. run the full JacobiForcing loop (collect on-policy trajectories through
     the engine -> progressive-noise packing -> AR+consistency training) to
     teach the model to converge whole blocks per forward;
  3. measure TPF end-to-end through the eval harness
     (apps/bench_generate.run, mean_tokens_per_forward on held-out prompts)
     and save the checkpoint + held-out prompts for bench.py.

    python -m jacobiforcing_tpu.apps.train_tpf_demo --out assets/tpf_demo
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


_T0 = time.perf_counter()


def _log(msg: str):
    print(f"[{time.perf_counter() - _T0:8.1f}s] {msg}", flush=True)


def copy_language_row(rng, vocab: int, p_lo=4, p_hi=9, total=96):
    """prompt = random tokens in [3, vocab); continuation repeats it."""
    n = int(rng.randint(p_lo, p_hi + 1))
    prompt = rng.randint(3, vocab, n).tolist()
    seq = list(prompt)
    while len(seq) < total + n:
        seq.extend(prompt)
    return prompt, seq[: total + n]


EOS_ID = 2
CD_BASE = 10  # countdown markers: CD_k = CD_BASE + k


def countdown_copy_row(rng, vocab: int, p_lo=4, p_hi=9, m_lo=3, m_hi=6):
    """Countdown copy language (the round-5 demo task).

    prompt = [CD_M, body]; continuation = [CD_{M-1}, body] ... [CD_1, body]
    [EOS], body = random tokens above the reserved range.  Two properties
    the plain cyclic task lacked (VERDICT r4 #5/#6):

      * every cycle starts with a unique countdown marker, so the cycle
        phase is locally unambiguous — the round-4 slow-tail diagnosis
        traced the worst TPF rows to PHASE ALIASING (prompts starting and
        ending with the same token made the cycle phase ambiguous,
        corr(dup-tokens, TPF) = -0.24);
      * termination is a LOCAL decision (the CD_1 cycle ends -> EOS, and
        CD_k -> CD_{k-1} is a learnable token map), so every row
        terminates with a natural EOS inside the token cap and the
        headline aggregate follows the reference's EOS-only protocol
        (jacobi_forcing_inference_humaneval.py:274-301) instead of the
        all-rows-hit-the-cap regime of rounds 3-4.
    """
    n = int(rng.randint(p_lo, p_hi + 1))
    m = int(rng.randint(m_lo, m_hi + 1))
    body = rng.randint(CD_BASE + m_hi + 1, vocab, n).tolist()
    prompt = [CD_BASE + m] + body
    seq = list(prompt)
    for k in range(m - 1, 0, -1):
        seq.append(CD_BASE + k)
        seq.extend(body)
    seq.append(EOS_ID)
    return prompt, seq


def demo_model_cfg(hidden=128, layers=4, heads=4, kv_heads=2):
    import jax.numpy as jnp

    from jacobiforcing_tpu.models.qwen import ModelConfig

    return ModelConfig(
        vocab_size=256, hidden_size=hidden, intermediate_size=4 * hidden,
        num_layers=layers, num_heads=heads, num_kv_heads=kv_heads,
        head_dim=hidden // heads,
        max_position=2048, qkv_bias=True, qk_norm=False,
        tie_word_embeddings=False, dtype=jnp.float32,
    )


def make_engine(mc, params, eos: int = -1):
    from jacobiforcing_tpu.config import Config
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine

    cfg = Config(
        kvcache_page_size=16, max_model_len=512, jacobi_chunk_tokens=64,
        eos=eos, prefill_token_buckets=(32, 64, 128, 256, 512),
    )
    return LLMEngine(cfg, model_cfg=mc, params=params, num_kv_pages=1024)


def measure_tpf_via_harness(mc, params, prompts, block_len, max_tokens, out_dir,
                            eos: int = -1, prompts_file="heldout_prompts.jsonl"):
    """End-to-end measurement through the eval harness (bench_generate.run).

    Returns (mean_tpf, sd_tpf, agg): mean +- sd of per-example
    tokens_per_forward over the held-out prompts — the variance-reduced
    protocol (>=64 prompts by default) so per-round numbers are comparable
    without best-of-round selection."""
    from jacobiforcing_tpu.apps import bench_generate

    args = bench_generate.make_parser().parse_args([])
    args.strategy = "jacobi"
    args.n_token_seq_len = block_len
    args.max_blocks = 1
    args.max_new_tokens = max_tokens
    args.max_iterations = 1 << 20
    args.output_dir = out_dir
    ds_path = os.path.join(out_dir, prompts_file)
    os.makedirs(out_dir, exist_ok=True)
    with open(ds_path, "w") as f:
        for i, p in enumerate(prompts):
            f.write(json.dumps({"task_id": f"copy_{i}", "prompt_ids": p}) + "\n")
    args.dataset = ds_path
    eng = make_engine(mc, params, eos=eos)
    agg, profiles = bench_generate.run(args, engine=eng, tokenizer=None)
    tpfs = np.asarray([p["tokens_per_forward"] for p in profiles], np.float64)
    return float(tpfs.mean()), float(tpfs.std(ddof=1)), agg


def run(args) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from jacobiforcing_tpu.config import SamplingParams
    from jacobiforcing_tpu.data import collect_trajectories, pack_trajectories
    from jacobiforcing_tpu.models.qwen import (
        forward_dense, init_params, logits_at, rope_table,
    )
    from jacobiforcing_tpu.train.consistency import (
        TrainConfig, make_train_step, prepare_sample,
    )
    from jacobiforcing_tpu.utils.loader import save_checkpoint

    N = args.block_len
    if getattr(args, "init_from", None):
        # continue consistency training from an existing demo checkpoint
        # (skips SFT; geometry comes from the checkpoint)
        from jacobiforcing_tpu.utils.loader import load_checkpoint

        mc, params = load_checkpoint(args.init_from, dtype=jnp.float32)
        _log(f"[init] resumed from {args.init_from} "
             f"({mc.hidden_size}h{mc.num_layers}L)")
    else:
        mc = demo_model_cfg(args.hidden, args.layers, args.heads, args.kv_heads)
        params = init_params(mc, jax.random.PRNGKey(0))
    rope = rope_table(mc)
    rng = np.random.RandomState(0)
    task = getattr(args, "task", "countdown")
    eos = EOS_ID if task == "countdown" else -1

    def gen_row():
        if task == "countdown":
            return countdown_copy_row(rng, mc.vocab_size)
        return copy_language_row(rng, mc.vocab_size)

    # ---- stage 1: SFT on the copy language (batched causal LM) ----
    sft_steps = 0 if getattr(args, "init_from", None) else args.sft_steps
    B, T = args.sft_batch, 96
    warmup = min(100, max(args.sft_steps // 10, 1))
    sft_sched = optax.warmup_cosine_decay_schedule(
        0.0, args.sft_lr, warmup_steps=warmup,
        decay_steps=max(args.sft_steps, warmup + 1), end_value=args.sft_lr * 0.02,
    )
    sft_opt = optax.adamw(sft_sched)
    sft_state = sft_opt.init(params)

    @jax.jit
    def sft_step(params, opt_state, ids, loss_w):
        def loss_fn(p):
            pos = jnp.broadcast_to(jnp.arange(ids.shape[1] - 1), ids[:, :-1].shape)
            h = forward_dense(p, mc, ids[:, :-1], pos, rope)
            logits = logits_at(p, mc, h)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
            return jnp.sum(nll * loss_w) / jnp.maximum(jnp.sum(loss_w), 1.0)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = sft_opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    for step_i in range(sft_steps):
        ids = np.zeros((B, T), np.int32)
        w = np.zeros((B, T - 1), np.float32)
        for b in range(B):
            if task == "countdown":
                prompt, seq = countdown_copy_row(rng, mc.vocab_size)
                seq = seq[:T]  # terminated rows are shorter than T; pad 0
                ids[b, : len(seq)] = seq
                w[b, len(prompt) - 1 : len(seq) - 1] = 1.0
            else:
                prompt, seq = copy_language_row(rng, mc.vocab_size, total=T)
                ids[b] = seq[:T]
                w[b, len(prompt) - 1:] = 1.0  # loss on the continuation only
        params, sft_state, loss = sft_step(
            params, sft_state, jnp.asarray(ids), jnp.asarray(w)
        )
        if step_i % 200 == 0:
            _log(f"[sft] step {step_i} loss {float(loss):.4f}")

    # ---- stage 2: Jacobi consistency rounds on own trajectories ----
    train_prompts = [gen_row()[0] for _ in range(args.n_prompts)]
    heldout = [gen_row()[0] for _ in range(args.heldout)]
    # an INDEPENDENT second held-out set: round-4 measured the same weights
    # at aggregate 3.21-3.46 across 64-prompt sets (per-set noise), so the
    # final numbers are reported on two sets (VERDICT r4 #6)
    heldout2 = [gen_row()[0] for _ in range(args.heldout)]

    # size the jit buckets to the actual packed geometry (dense-mask attention
    # is O(L^2); a 1024 bucket on a ~200-token pack wastes 25x the compute)
    def r64(x):
        return ((x + 63) // 64) * 64

    T_max = -(-args.max_tokens // N)  # blocks per prompt = packed pairs
    p_hi = 10 if task == "countdown" else 9  # +1: the countdown marker
    tc = TrainConfig(
        N=N, max_pairs=T_max,
        seq_bucket=r64(p_hi + 2 * T_max * N),
        ar_pair_bucket=r64(p_hi + T_max * N + T_max + 8),
        cons_pair_bucket=r64(T_max * N),
    )
    # decay the consistency lr across rounds: late rounds fine-tune an
    # already-decent acceptance policy, and a flat lr was observed to make
    # the per-round TPF oscillate (v1 history: 2.65 -> 2.16 -> 2.70 -> 2.61).
    # decay horizon = the actual expected step count (one step per packed row
    # per epoch) so the schedule really anneals to alpha*lr by the last round
    est_steps = max(args.rounds * args.epochs * args.n_prompts, 1)
    cons_sched = optax.cosine_decay_schedule(
        args.lr, decay_steps=est_steps, alpha=0.05
    )
    opt = optax.adamw(cons_sched)
    step = make_train_step(mc, tc, opt)
    opt_state = opt.init(params)

    tpf0, sd0, agg0 = measure_tpf_via_harness(
        mc, params, heldout, N, args.max_tokens, args.out, eos=eos
    )
    agg_tpf = agg0["aggregate_tokens_per_forward"]
    _log(f"[loop] TPF after SFT, before consistency: {tpf0:.3f} +- {sd0:.3f} "
         f"(aggregate {agg_tpf:.3f})")
    # aggregate = total tokens / total forwards — the throughput multiplier
    # (mean of per-example ratios overstates it; VERDICT r3 #1); the training
    # target is the AGGREGATE, the mean rides along for acceptance parity
    history = [{"round": -1, "tpf": round(tpf0, 3), "sd": round(sd0, 3),
                "tpf_aggregate": agg_tpf}]

    def write_result(tpf, sd, agg_tpf, extra=None):
        # --select final: ship the latest round (the round-3 default; no
        # selection).  --select best-aggregate: early-stopping-style model
        # selection ON THE HELD-OUT aggregate TPF — round-4 measurement
        # showed per-round aggregate swings of +-0.3 at this capacity
        # (v5 history: 3.58 at round 2, 3.29 at round 11), so "latest
        # round" ships whatever the oscillation last landed on; selecting
        # on the held-out eval is standard validation early stopping and
        # is recorded in the artifact so the protocol is explicit.
        result = {
            "tpf_history": history,
            "tpf_final": round(tpf, 3),
            "tpf_final_sd": round(sd, 3),
            "tpf_final_aggregate": agg_tpf,
            "n_heldout": len(heldout),
            "checkpoint": args.out,
            "block_len": N,
            "max_tokens": args.max_tokens,
            "selection": args.select,
            "task": task,
            "eos": eos,
        }
        if extra:
            result.update(extra)
        with open(os.path.join(args.out, "tpf_demo.json"), "w") as f:
            json.dump(result, f, indent=2)
        return result

    result = write_result(tpf0, sd0, agg_tpf)
    tpf, sd = tpf0, sd0
    def snap(ps):
        # the train step donates params, which would delete a stashed
        # reference a round later — stash a real device copy
        return jax.tree.map(jnp.copy, ps)

    best = {"agg": agg_tpf, "tpf": tpf0, "sd": sd0, "round": -1,
            "params": snap(params) if args.select == "best-aggregate" else None}
    for rnd in range(args.rounds):
        eng = make_engine(mc, params, eos=eos)
        rows = collect_trajectories(
            eng, train_prompts, block_len=N, max_tokens=args.max_tokens,
            temperature=0.0,
        )
        packed = pack_trajectories(rows, N, window_size=args.window)
        _log(f"[loop] round {rnd}: collected {len(rows)} rows, "
             f"{len(packed)} packed")
        for _ in range(args.epochs):
            for row in packed:
                T_pairs = len(row["traj_position_indices"])
                b = {
                    k: jnp.asarray(v)
                    for k, v in prepare_sample(
                        row["complete_training_sequence_ids"],
                        row["prompt_ids_len"], T_pairs, tc,
                    ).items()
                }
                params, opt_state, m = step(params, opt_state, rope, b)
        tpf, sd, agg = measure_tpf_via_harness(
            mc, params, heldout, N, args.max_tokens, args.out, eos=eos
        )
        agg_tpf = agg["aggregate_tokens_per_forward"]
        history.append({"round": rnd, "tpf": round(tpf, 3), "sd": round(sd, 3),
                        "tpf_aggregate": agg_tpf})
        if args.select == "best-aggregate" and agg_tpf > best["agg"]:
            best = {"agg": agg_tpf, "tpf": tpf, "sd": sd, "round": rnd,
                    "params": snap(params)}
        # checkpoint + result every round so long runs are resumable/inspectable
        save_checkpoint(args.out, mc, params)
        result = write_result(tpf, sd, agg_tpf)
        _log(
            f"[loop] round {rnd}: loss={float(m['loss']):.3f} "
            f"TPF={tpf:.3f} +- {sd:.3f} (aggregate {agg_tpf:.3f})"
        )

    if args.select == "best-aggregate":
        params = best["params"]
        tpf, sd, agg_tpf = best["tpf"], best["sd"], best["agg"]
        history.append({"round": f"selected:{best['round']}",
                        "tpf": round(tpf, 3), "sd": round(sd, 3),
                        "tpf_aggregate": agg_tpf})
    save_checkpoint(args.out, mc, params)
    # cross-set check: the SAME shipped weights on an independent prompt set
    tpf2, sd2, agg2 = measure_tpf_via_harness(
        mc, params, heldout2, N, args.max_tokens, args.out, eos=eos,
        prompts_file="heldout2_prompts.jsonl",
    )
    extra = {
        "tpf_set2": round(tpf2, 3),
        "tpf_set2_sd": round(sd2, 3),
        "tpf_set2_aggregate": agg2["aggregate_tokens_per_forward"],
        "set2_n_eos_terminated": agg2.get("n_eos_terminated", 0),
    }
    result = write_result(tpf, sd, agg_tpf, extra=extra)
    print(json.dumps(result))
    return result


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="assets/tpf_demo")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--kv-heads", type=int, default=2)
    p.add_argument("--block-len", type=int, default=32)
    p.add_argument("--max-tokens", type=int, default=96)
    p.add_argument("--n-prompts", type=int, default=64)
    p.add_argument("--heldout", type=int, default=64)
    p.add_argument("--rounds", type=int, default=12)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--window", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--sft-steps", type=int, default=6000)
    p.add_argument("--sft-batch", type=int, default=48)
    p.add_argument("--sft-lr", type=float, default=2e-3)
    p.add_argument(
        "--select", choices=("final", "best-aggregate"), default="final",
        help="which round's weights to ship: the last round (round-3 "
             "protocol) or the best held-out aggregate-TPF round "
             "(validation early stopping; recorded in tpf_demo.json)",
    )
    p.add_argument(
        "--task", choices=("countdown", "cyclic"), default="countdown",
        help="demo language: 'countdown' (round-5 default: cycle-start "
             "markers disambiguate the phase and the last marker triggers a "
             "natural EOS, matching the reference's EOS-only aggregate "
             "protocol) or the legacy 'cyclic' copy task",
    )
    p.add_argument(
        "--init-from", default=None,
        help="existing demo checkpoint dir: skip SFT, continue consistency "
             "rounds from its weights (geometry args are ignored)",
    )
    run(p.parse_args())


if __name__ == "__main__":
    from jacobiforcing_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    main()
