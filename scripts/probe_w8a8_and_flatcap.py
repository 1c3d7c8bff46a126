"""Bound two standing numeric assumptions on real artifacts (VERDICT r2 #6).

1. W8A8 logit perturbation at 7B dims: the 1025-tok/s batched headline runs
   per-token int8 activation quant on the int8 MXU.  This probe isolates the
   ACTIVATION-quant error (the weight-only int8 error is common to both
   paths): forward the same tokens through {int8 weights + bf16 activations}
   vs {int8 weights + int8 activations} at Qwen2.5-7B dims and report logit
   max/mean abs diff, argmax disagreement rate, and how the perturbation
   compares to the top1-top2 margin distribution (the quantity that controls
   Jacobi acceptance flips).

2. Flat-softmax cap: the decode kernels run p = exp2(min(s, 100)) with no
   running max, argued safe because attention logits sit far below 69 nats
   (paged_attention.py).  Substantiate on the in-repo TRAINED checkpoint
   (assets/tpf_demo*): measure the max |score| in the exp2 domain across all
   layers/heads/positions of real decoded sequences.

    python scripts/probe_w8a8_and_flatcap.py [w8a8|flatcap|all]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "all"


def probe_w8a8():
    import gc

    import jax
    import jax.numpy as jnp

    from jacobiforcing_tpu.models.qwen import (
        ModelConfig, logits_at, rope_table,
    )
    from jacobiforcing_tpu.ops.quant import init_quantized_params

    import dataclasses as dc

    T = int(os.environ.get("JF_PROBE_T", "128"))
    mc_bf = ModelConfig()  # 7B dims, int8 weights dequantized per layer
    mc_q = dc.replace(mc_bf, act_quant=True)
    params = init_quantized_params(mc_bf, jax.random.PRNGKey(0))
    rope = rope_table(mc_bf)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(1, mc_bf.vocab_size, (1, T)), jnp.int32
    )
    pos = jnp.arange(T, dtype=jnp.int32)[None, :]

    from jacobiforcing_tpu.models.qwen import forward_dense

    @jax.jit
    def run_bf16_acts(p):
        h = forward_dense(p, mc_bf, ids, pos, rope)
        return logits_at(p, mc_bf, h)

    @jax.jit
    def run_int8_acts(p):
        h = forward_dense(p, mc_q, ids, pos, rope)
        return logits_at(p, mc_q, h)

    la = np.asarray(run_bf16_acts(params), np.float32)[0]  # [T, V]
    gc.collect()
    lb = np.asarray(run_int8_acts(params), np.float32)[0]
    diff = np.abs(la - lb)
    top2 = np.partition(la, -2, axis=-1)[:, -2:]
    margin = top2[:, 1] - top2[:, 0]  # top1 - top2 per position
    flips = (la.argmax(-1) != lb.argmax(-1))
    out = {
        "probe": "w8a8_logit_error_7b",
        "positions": int(la.shape[0]),
        "logit_scale_mean_abs": round(float(np.mean(np.abs(la))), 4),
        "max_abs_diff": round(float(diff.max()), 4),
        "mean_abs_diff": round(float(diff.mean()), 4),
        "argmax_flip_rate": round(float(flips.mean()), 4),
        "margin_p5": round(float(np.percentile(margin, 5)), 4),
        "margin_p50": round(float(np.percentile(margin, 50)), 4),
        # fraction of positions where the observed perturbation of the top-2
        # pair could flip the argmax (perturbation >= half the margin)
        "could_flip_rate": round(
            float(np.mean(diff.max(-1) >= margin / 2)), 4
        ),
    }
    print(json.dumps(out), flush=True)
    return out


def probe_flatcap():
    import math

    import jax
    import jax.numpy as jnp

    from jacobiforcing_tpu.models.qwen import (
        apply_rope, rms_norm, rope_table,
    )
    from jacobiforcing_tpu.utils.loader import load_checkpoint

    demo = None
    for cand in ("assets/tpf_demo_n32_v3", "assets/tpf_demo_n32_v2",
                 "assets/tpf_demo"):
        d = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), cand)
        if os.path.isdir(d) and os.path.isfile(os.path.join(d, "tpf_demo.json")):
            demo = d
            break
    if demo is None:
        print(json.dumps({"probe": "flatcap", "error": "no demo checkpoint"}))
        return None
    mc, params = load_checkpoint(demo, dtype=jnp.float32)
    rope = rope_table(mc)
    with open(os.path.join(demo, "heldout_prompts.jsonl")) as f:
        prompts = [json.loads(l)["prompt_ids"] for l in f][:16]

    # run the real greedy continuation, then re-forward the full sequences
    # densely recording per-layer max |score * log2e| (the exp2-domain
    # quantity the kernel clamps at 100)
    from jacobiforcing_tpu.config import Config, SamplingParams
    from jacobiforcing_tpu.engine.llm_engine import LLMEngine

    eng = LLMEngine(
        Config(kvcache_page_size=16, max_model_len=512, jacobi_chunk_tokens=64,
               eos=-1, prefill_token_buckets=(32, 64, 128, 256, 512)),
        model_cfg=mc, params=params, num_kv_pages=1024,
    )
    outs = eng.generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=96,
                                decode_strategy="jacobi", jacobi_block_len=32,
                                jacobi_max_blocks=1),
    )
    seqs = [p + o["token_ids"] for p, o in zip(prompts, outs)]
    L = max(len(s) for s in seqs)
    ids = np.zeros((len(seqs), L), np.int32)
    lens = np.asarray([len(s) for s in seqs])
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s

    # instrumented dense forward: mirrors models/qwen.forward_dense's layer
    # body, recording each layer's max masked |score| in the exp2 domain
    lp = params["layers"]
    ids_j = jnp.asarray(ids)
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], ids.shape)
    mask = (jnp.arange(L)[None, :, None] >= jnp.arange(L)[None, None, :]) & (
        jnp.arange(L)[None, None, :] < jnp.asarray(lens)[:, None, None]
    )
    exp2_scale = (mc.head_dim ** -0.5) * math.log2(math.e)
    cos_t, sin_t = rope
    cos, sin = cos_t[pos], sin_t[pos]
    G = mc.num_heads // mc.num_kv_heads

    @jax.jit
    def layer_scores(ids_j):
        B, T = ids_j.shape
        x = params["embed"].astype(mc.dtype)[ids_j]
        maxes = []
        h = x
        for li in range(mc.num_layers):
            w = jax.tree.map(lambda a: a[li], lp)
            hn = rms_norm(h, w["ln1"], mc.rms_norm_eps)
            q = hn @ w["wq"]
            kk = hn @ w["wk"]
            vv = hn @ w["wv"]
            if mc.qkv_bias:
                q, kk, vv = q + w["bq"], kk + w["bk"], vv + w["bv"]
            q = q.reshape(B, T, mc.num_heads, mc.head_dim)
            kk = kk.reshape(B, T, mc.num_kv_heads, mc.head_dim)
            vv = vv.reshape(B, T, mc.num_kv_heads, mc.head_dim)
            if mc.qk_norm:
                q = rms_norm(q, w["q_norm"], mc.rms_norm_eps)
                kk = rms_norm(kk, w["k_norm"], mc.rms_norm_eps)
            q = apply_rope(q, cos, sin)
            kk = apply_rope(kk, cos, sin)
            qg = q.reshape(B, T, mc.num_kv_heads, G, mc.head_dim)
            s = jnp.einsum("bthgd,bshd->bhgts", qg, kk) * exp2_scale
            sm = jnp.where(mask[:, None, None], jnp.abs(s), 0.0)
            maxes.append(jnp.max(sm))
            # finish the layer exactly as forward_dense does
            probs = jax.nn.softmax(
                jnp.where(mask[:, None, None], s / math.log2(math.e), -1e30),
                axis=-1,
            ).astype(q.dtype)
            o = jnp.einsum("bhgts,bshd->bthgd", probs, vv)
            o = o.reshape(B, T, mc.num_heads * mc.head_dim) @ w["wo"]
            h = h + o
            hn2 = rms_norm(h, w["ln2"], mc.rms_norm_eps)
            mlp = (jax.nn.silu(hn2 @ w["w_gate"]) * (hn2 @ w["w_up"])) @ w["w_down"]
            h = h + mlp
        return jnp.stack(maxes)

    m = np.asarray(layer_scores(ids_j))
    out = {
        "probe": "flatcap_exp2_scores",
        "checkpoint": os.path.basename(demo),
        "per_layer_max": [round(float(v), 2) for v in m],
        "global_max": round(float(m.max()), 2),
        "cap": 100.0,
        "headroom_x": round(100.0 / max(float(m.max()), 1e-9), 1),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    if MODE in ("w8a8", "all"):
        probe_w8a8()
    if MODE in ("flatcap", "all"):
        probe_flatcap()
