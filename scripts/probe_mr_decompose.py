"""Decompose the MR full-tier iteration cost (VERDICT r3 #3, second half).

probe_mr_iter.py measures full-tier MR at ~2.17x single-block wall per
iteration (29.5 vs 13.6 ms at B=1/4k W8A8).  This probe attributes the extra
cost by timing the tier's pieces in isolation at the exact serving geometry
(B=1, 4k ctx, N=64, K=2, C=4 -> S=6, T=384 rows):

  fwd+head   forward_spec(T rows, 4k committed) + greedy_tokens  (the tier's
             compute core, matmuls + spec-attention + lm_head)
  fwd only   same without greedy_tokens                -> lm_head = diff
  fwd @ctx0  same with cache_len=0 (no committed pages) -> committed-KV
             attention stream = diff vs fwd only
  RA core    forward_spec(N rows) + greedy             (ra-only tier core)
  glue       full MR chunk ms/iter (probe_mr_iter protocol) minus fwd+head

Reference analog of the decomposed path: the batch-expanded forward + verify
of modeling/..._multiblock_lookahead_unified.py:317-464.

    python scripts/probe_mr_decompose.py [ctx] [quant] [n]
"""

import dataclasses as dc
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_chained(fn, args, n=8):
    """Median of n dispatches, each ended by a tiny readback (tunnel-safe).

    NOTE: per-call timing carries the tunnel dispatch+RTT (~25-40 ms); use
    for comparisons only, or prefer scan-amortized timing (below)."""
    out = fn(*args)
    np.asarray(out)  # compile + settle
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def bench_scanned(make_step, params, kv, rope, tokens0, reps, n=4):
    """Per-iteration wall of one forward amortized over a lax.scan of `reps`
    steps (tokens varied per step so XLA cannot hoist the body), minus a
    reps=1 call to cancel dispatch/readback overhead.  `make_step(p, kv_,
    rope_, tokens) -> scalar` must take params/kv/rope as ARGUMENTS (closure
    capture bakes 8.5GB constants into the lowering — round-3 lesson).

    This matches how the chunk programs amortize dispatch (lax.while_loop),
    so the numbers compose with probe_mr_iter's ms/iter."""
    from jax import lax

    def make(r):
        @jax.jit
        def many(p, kv_, rope_, tokens):
            def body(c, i):
                return c + make_step(p, kv_, rope_,
                                     (tokens + i) % 1000 + 1), None
            out, _ = lax.scan(body, jnp.float32(0.0),
                              jnp.arange(r, dtype=jnp.int32))
            return out

        return many

    big, one = make(reps), make(1)
    t_big = bench_chained(big, (params, kv, rope, tokens0), n)
    t_one = bench_chained(one, (params, kv, rope, tokens0), n)
    return max(t_big - t_one, 0.0) / max(reps - 1, 1)


def main():
    from jacobiforcing_tpu.engine import multiblock
    from jacobiforcing_tpu.models.qwen import (
        ModelConfig, forward_spec, greedy_tokens, rope_table,
    )
    from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache
    from jacobiforcing_tpu.ops.quant import init_quantized_params

    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    quant = sys.argv[2] if len(sys.argv) > 2 else "w8a8"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    gpad = os.environ.get("JF_SPEC_NO_GPAD", "0") != "1"

    # ---- COMPILED parity of the padded head-group geometry (advisor r4) ----
    # The Gp padding path (G=7 -> 8, new grid/BlockSpec shapes) was
    # interpret-parity-tested only; here the compiled lowering runs on-chip
    # against the XLA reference at the real 7B head geometry before any
    # timing.  Skip with JF_DECOMP_SKIP_PARITY=1.
    if gpad and os.environ.get("JF_DECOMP_SKIP_PARITY", "0") != "1":
        from jacobiforcing_tpu.ops.attention import paged_attention_with_block
        from jacobiforcing_tpu.ops.pallas.spec_attention import (
            spec_attention_pallas,
        )

        r = np.random.RandomState(0)
        Bp, KHp, Gpar, Dp, Np, Sp = 1, 4, 7, 128, 64, 6  # 7B GQA, T=384
        Tp = Sp * Np
        page_p = 256
        ctx_p = 512
        pps_p = ctx_p // page_p + 1
        qp = jnp.asarray(r.randn(Bp, Tp, KHp * Gpar, Dp), jnp.float32) * 0.3
        kp = jnp.asarray(r.randn(KHp, pps_p * page_p, Dp), jnp.bfloat16)
        vp = jnp.asarray(r.randn(KHp, pps_p * page_p, Dp), jnp.bfloat16)
        knp = jnp.asarray(r.randn(Bp, Tp, KHp, Dp), jnp.float32) * 0.3
        vnp = jnp.asarray(r.randn(Bp, Tp, KHp, Dp), jnp.float32) * 0.3
        btp = jnp.asarray(
            np.arange(Bp * pps_p, dtype=np.int32).reshape(Bp, pps_p))
        clp = jnp.full((Bp,), ctx_p, jnp.int32)
        segp = np.repeat(np.arange(Sp), Np)
        idxp = np.tile(np.arange(Np), Sp)
        seesp = (segp[:, None] == segp[None, :]) & (idxp[None, :] <= idxp[:, None])
        intrap = jnp.asarray(np.broadcast_to(seesp, (Bp, Tp, Tp)))
        sc = 1.0 / np.sqrt(Dp)
        ref_p = np.asarray(paged_attention_with_block(
            qp, kp.astype(jnp.float32), vp.astype(jnp.float32), btp, clp,
            knp, vnp, intrap, sc, page_size=page_p,
        ))
        out_p = np.asarray(spec_attention_pallas(
            qp.astype(jnp.bfloat16), kp, vp, btp, clp,
            knp.astype(jnp.bfloat16), vnp.astype(jnp.bfloat16), intrap, sc,
            page_size=page_p,
        ))
        err = float(np.max(np.abs(out_p - ref_p)))
        assert err < 2e-2, f"padded-Gp compiled parity failed: max err {err}"
        print(f"padded-Gp compiled parity ok: max |err| {err:.2e} "
              f"(bf16 kernel vs f32 XLA, G=7->8, T={Tp})", flush=True)
        del qp, kp, vp, knp, vnp, ref_p, out_p

    cfg = ModelConfig()
    if quant == "w8a8":
        cfg = dc.replace(cfg, act_quant=True)
    params = init_quantized_params(cfg, jax.random.PRNGKey(0))
    rope = rope_table(cfg)

    B, N, K, C = 1, 64, 2, 4
    S = 1 + C + (K - 1)
    T = S * N
    page = 256
    pps = (ctx + 2 * T) // page + 2
    kv = alloc_kv_cache(cfg.num_layers, B * pps, page, cfg.num_kv_heads,
                        cfg.head_dim, jnp.bfloat16)
    bt = jnp.asarray(np.arange(B * pps, dtype=np.int32).reshape(B, pps))
    clen = jnp.full((B,), ctx, jnp.int32)
    tok = jnp.ones((B, T), jnp.int32)
    pos = ctx + jnp.tile(jnp.arange(N, dtype=jnp.int32), (B, S))
    # tree mask: segment-local causal (the shape the tier actually uses)
    jT = np.arange(T)
    seg = jT // N
    intra = jnp.asarray((seg[:, None] == seg[None, :])
                        & (jT[:, None] % N >= jT[None, :] % N))[None]
    intra = jnp.broadcast_to(intra, (B, T, T))

    clen0 = jnp.zeros((B,), jnp.int32)
    tokN = jnp.ones((B, N), jnp.int32)
    posN = pos[:, :N]
    intraN = intra[:, :N, :N]
    reps = int(os.environ.get("JF_DECOMP_REPS", "8"))

    # small operands (pos/clen/intra/bt) may ride as closure constants; the
    # 8.5GB params/kv MUST be jit arguments (round-3 lesson, commit 472915b)
    def mk(with_head, pos_, clen_, intra_):
        def step(p, kv_, rope_, tokens):
            h, k_n, v_n = forward_spec(p, cfg, tokens, pos_, kv_, bt, clen_,
                                       intra_, rope_)
            out = k_n[0].sum().astype(jnp.float32)
            if with_head:
                return greedy_tokens(p, cfg, h).sum().astype(jnp.float32) + out
            return h.sum().astype(jnp.float32) + out

        return step

    ms_fh = bench_scanned(mk(True, pos, clen, intra), params, kv, rope,
                          tok, reps, n)
    print(f"fwd+head T={T}: {ms_fh:.2f} ms/iter", flush=True)
    ms_fo = bench_scanned(mk(False, pos, clen, intra), params, kv, rope,
                          tok, reps, n)
    print(f"fwd only T={T}: {ms_fo:.2f} ms/iter", flush=True)
    ms_f0 = bench_scanned(mk(False, pos, clen0, intra), params, kv, rope,
                          tok, reps, n)
    print(f"fwd ctx0 T={T}: {ms_f0:.2f} ms/iter", flush=True)
    ms_ra = bench_scanned(mk(True, posN, clen, intraN), params, kv, rope,
                          tokN, reps, n)
    print(f"RA core N={N}: {ms_ra:.2f} ms/iter", flush=True)

    if os.environ.get("JF_DECOMP_SKIP_CHUNK", "0") == "1":
        # reuse probe_mr_iter's chunk number (29.5 ms r3) instead of paying
        # the big MR chunk compile again
        import json
        print(json.dumps({
            "probe": "mr_decompose", "ctx": ctx, "quant": quant, "T": T,
            "head_group_padding": gpad,
            "full_fwd_plus_head_ms": round(ms_fh, 2),
            "full_fwd_only_ms": round(ms_fo, 2),
            "full_fwd_ctx0_ms": round(ms_f0, 2),
            "ra_core_ms": round(ms_ra, 2),
            "attrib": {
                "lm_head_argmax_ms": round(ms_fh - ms_fo, 2),
                "committed_kv_attention_ms": round(ms_fo - ms_f0, 2),
                "matmuls_and_block_attn_ms": round(ms_f0, 2),
            },
            "full_core_vs_ra_core_x": round(ms_fh / max(ms_ra, 1e-9), 2),
        }), flush=True)
        return

    # ---- full MR chunk ms/iter (probe_mr_iter protocol, candidates on) ----
    budget = 256
    cap = ctx + budget + 4 * N + 1
    W = 2 * N
    kv2 = alloc_kv_cache(cfg.num_layers, B * pps, page, cfg.num_kv_heads,
                         cfg.head_dim, jnp.bfloat16)

    def mk_tokens():
        return jnp.zeros((B, cap), jnp.int32).at[:, :ctx].set(1)

    def mr(kv_, tokens):
        return multiblock.jacobi_chunk_multiblock(
            params, cfg, rope, kv_, tokens, jnp.full((B,), ctx, jnp.int32),
            jnp.ones((B, K, N), jnp.int32),
            jnp.full((B, K), N, jnp.int32).at[:, 1:].set(0),
            jnp.zeros((B, K), jnp.int32),
            jnp.zeros((B, K, N), jnp.int32),
            jnp.zeros((B, K), jnp.int32).at[:, 0].set(ctx),
            jnp.zeros((B, K), bool).at[:, 0].set(True),
            jnp.zeros((B,), jnp.int32),
            jnp.ones((B,), jnp.int32),
            jnp.zeros((B, C, W), jnp.int32),
            jnp.zeros((B, C), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B,), bool),
            jnp.zeros((B,), jnp.int32),
            bt, jnp.full((B,), pps * page, jnp.int32),
            jnp.full((B,), budget, jnp.int32), -1, 0,
            jnp.full((B,), int(np.ceil(0.8 * N)), jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.full((B,), budget + 8, jnp.int32),
            N=N, K=K, C=C, W=W, chunk_budget=budget,
        )

    res = mr(kv2, mk_tokens())
    np.asarray(res["iters"])
    tot, dt = 0, 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        res = mr(res["kv"], mk_tokens())
        tot += int(np.asarray(res["iters"]).sum())
        dt += time.perf_counter() - t0
    ms_mr = 1e3 * dt / max(tot, 1)

    out = {
        "probe": "mr_decompose", "ctx": ctx, "quant": quant,
        "B": B, "N": N, "K": K, "C": C, "T": T,
        "head_group_padding": gpad,
        "full_fwd_plus_head_ms": round(ms_fh, 2),
        "full_fwd_only_ms": round(ms_fo, 2),
        "full_fwd_ctx0_ms": round(ms_f0, 2),
        "ra_core_ms": round(ms_ra, 2),
        "mr_full_chunk_ms_per_iter": round(ms_mr, 2),
        "attrib": {
            "lm_head_argmax_ms": round(ms_fh - ms_fo, 2),
            "committed_kv_attention_ms": round(ms_fo - ms_f0, 2),
            "matmuls_and_block_attn_ms": round(ms_f0, 2),
            "glue_ms": round(ms_mr - ms_fh, 2),
        },
        "full_core_vs_ra_core_x": round(ms_fh / max(ms_ra, 1e-9), 2),
    }
    import json
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
