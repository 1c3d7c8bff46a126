"""Pallas paged-attention kernel vs the XLA reference path (interpret mode on
CPU; the same kernel runs compiled on TPU via JF_ATTN_IMPL=pallas)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jacobiforcing_tpu.ops.attention import paged_attention_xla
from jacobiforcing_tpu.ops.pallas.paged_attention import paged_attention_pallas

PAGE = 16


def _setup(B=2, L=4, NH=4, KH=2, D=32, pages_per_seq=6, num_pages=16, seed=0):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(B, L, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    bt = np.full((B, pages_per_seq), -1, np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq)
    return q, k, v, jnp.asarray(bt)


@pytest.mark.parametrize("softmax", ["flat", "online"])
@pytest.mark.parametrize("L,cache0,cache1", [
    (4, 37, 80),   # jacobi block, ragged tails
    (1, 17, 65),   # AR decode
])
def test_kernel_matches_xla(L, cache0, cache1, softmax):
    q, k, v, bt = _setup(L=L)
    cache_lens = jnp.asarray([cache0, cache1], jnp.int32)
    positions = (cache_lens - L)[:, None] + jnp.arange(L)[None, :]
    scale = 1.0 / np.sqrt(q.shape[-1])

    ref = paged_attention_xla(q, k, v, bt, cache_lens, positions, scale, page_size=PAGE)
    out = paged_attention_pallas(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE,
        interpret=True, softmax=softmax,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_prefill_positions():
    """Prefill-style: positions starting at a prefix-cache offset."""
    q, k, v, bt = _setup(L=8)
    cache_lens = jnp.asarray([40, 56], jnp.int32)
    start = jnp.asarray([32, 48], jnp.int32)  # 8 new tokens each
    positions = start[:, None] + jnp.arange(8)[None, :]
    scale = 0.125
    ref = paged_attention_xla(q[:, :8], k, v, bt, cache_lens, positions, scale, page_size=PAGE)
    out = paged_attention_pallas(
        q[:, :8], k, v, bt, cache_lens, positions, scale, page_size=PAGE, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_padded_batch_rows():
    """Batch-bucket padding: rows beyond the live sequences carry clen=1 and
    an all -1 block table (engine _pad_block_table).  The kernel must clamp
    page ids to 0 — on hardware a negative page id becomes a negative DMA
    offset, which faults the chip and kills the TPU worker (observed on v5e).
    Live rows must be unaffected by the padding row's presence."""
    q, k, v, bt = _setup(L=4)
    bt_np = np.array(bt)
    bt_np[1, :] = -1  # row 1 is a padding row
    bt_np[0, 4:] = -1  # live row with a -1 table tail past its pages
    bt_pad = jnp.asarray(bt_np)
    cache_lens = jnp.asarray([37, 1], jnp.int32)
    positions = (cache_lens - 4)[:, None] + jnp.arange(4)[None, :]
    scale = 1.0 / np.sqrt(q.shape[-1])

    ref = paged_attention_xla(
        q[:1], k, v, bt_pad[:1], cache_lens[:1], positions[:1], scale, page_size=PAGE
    )
    out = paged_attention_pallas(
        q, k, v, bt_pad, cache_lens, positions, scale, page_size=PAGE, interpret=True
    )
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out[:1]), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_spec_kernel_padded_batch_rows():
    """Same -1-padding hazard for the MR spec kernel."""
    from jacobiforcing_tpu.ops.attention import paged_attention_with_block
    from jacobiforcing_tpu.ops.pallas.spec_attention import spec_attention_pallas

    r = np.random.RandomState(11)
    B, KH, G, D, T = 2, 2, 2, 128, 6
    NH = KH * G
    q = jnp.asarray(r.randn(B, T, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, 8 * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, 8 * PAGE, D), jnp.float32)
    k_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    v_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    bt = np.full((B, 4), -1, np.int32)
    bt[0] = np.arange(4)
    cache_lens = jnp.asarray([50, 1], jnp.int32)
    intra = jnp.asarray(np.tril(np.ones((T, T), bool))[None].repeat(B, 0))
    scale = 1.0 / np.sqrt(D)

    ref = paged_attention_with_block(
        q[:1], k, v, jnp.asarray(bt[:1]), cache_lens[:1], k_new[:1], v_new[:1],
        intra[:1], scale, page_size=PAGE,
    )
    out = spec_attention_pallas(
        q, k, v, jnp.asarray(bt), cache_lens, k_new, v_new, intra, scale,
        page_size=PAGE, interpret=True,
    )
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(np.asarray(out[:1]), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_spec_kernel_matches_with_block_xla():
    """MR speculative kernel (committed pages + in-flight block under a tree
    mask) == the XLA paged_attention_with_block reference."""
    from jacobiforcing_tpu.ops.attention import paged_attention_with_block
    from jacobiforcing_tpu.ops.pallas.spec_attention import spec_attention_pallas

    r = np.random.RandomState(0)
    B, NH, KH, D = 2, 4, 2, 128
    S, N = 3, 4  # RA + 1 candidate + 1 pseudo segments
    T = S * N
    num_pages, pages_per_seq = 16, 6
    q = jnp.asarray(r.randn(B, T, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    k_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    v_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    bt = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq)
    bt = jnp.asarray(bt)
    cache_lens = jnp.asarray([37, 80], jnp.int32)

    # MR tree mask: same-segment causal; pseudo (seg 2) sees RA (seg 0) fully
    seg = np.repeat(np.arange(S), N)
    idx = np.tile(np.arange(N), S)
    sees = ((seg[:, None] == seg[None, :]) & (idx[None, :] <= idx[:, None])) | (
        (seg[:, None] == 2) & (seg[None, :] == 0)
    )
    # row 5 of batch 1: no intra visibility at all (inactive candidate row)
    masks = np.broadcast_to(sees, (B, T, T)).copy()
    masks[1, 5, :] = False
    intra = jnp.asarray(masks)

    scale = 1.0 / np.sqrt(D)
    ref = paged_attention_with_block(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale, page_size=PAGE
    )
    for softmax in ("flat", "online"):
        out = spec_attention_pallas(
            q, k, v, bt, cache_lens, k_new, v_new, intra, scale,
            page_size=PAGE, interpret=True, softmax=softmax,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_spec_kernel_group_tiled(monkeypatch):
    """Oversized query sets split over head-group tiles (grid axis 2): the
    full MR tier (G*T=2304 rows on 1.5B dims) measured 18.28M scoped VMEM vs
    the 16M v5e limit, so it must tile.  _MAX_ROWS is lowered to force two
    group tiles at CPU-interpretable sizes."""
    from jacobiforcing_tpu.ops.attention import paged_attention_with_block
    from jacobiforcing_tpu.ops.pallas import spec_attention as sa_mod

    monkeypatch.setattr(sa_mod, "_MAX_ROWS", 24)  # G=4, T=12 -> gpt=2, 2 tiles
    assert sa_mod.groups_per_tile(4, 12) == 2
    assert sa_mod.groups_per_tile(4, 25) == 0  # single group over cap

    r = np.random.RandomState(5)
    B, KH, G, D = 2, 2, 4, 128
    S, N = 3, 4
    T = S * N
    NH = KH * G
    num_pages, pages_per_seq = 16, 6
    q = jnp.asarray(r.randn(B, T, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    k_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    v_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    bt = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq)
    bt = jnp.asarray(bt)
    cache_lens = jnp.asarray([37, 80], jnp.int32)
    seg = np.repeat(np.arange(S), N)
    idx = np.tile(np.arange(N), S)
    sees = ((seg[:, None] == seg[None, :]) & (idx[None, :] <= idx[:, None])) | (
        (seg[:, None] == 2) & (seg[None, :] == 0)
    )
    intra = jnp.asarray(np.broadcast_to(sees, (B, T, T)).copy())
    scale = 1.0 / np.sqrt(D)

    ref = paged_attention_with_block(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale, page_size=PAGE
    )
    out = sa_mod.spec_attention_pallas(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale,
        page_size=PAGE, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_spec_kernel_padded_head_groups(monkeypatch):
    """G=7 (Qwen 7B GQA) with G*T over the row cap tiles gpt=1 = SEVEN
    re-streams of the committed page stream; the kernel pads the group axis
    to Gp=8 (gpt=4, two slices) and slices the zero rows off.  Parity vs the
    XLA reference must hold exactly through the padding."""
    from jacobiforcing_tpu.ops.attention import paged_attention_with_block
    from jacobiforcing_tpu.ops.pallas import spec_attention as sa_mod

    # T=12: gpt(G=7)=1 (7*12=84 > 48, 7 prime), gpt(Gp=8)=4 (48 <= 48)
    monkeypatch.setattr(sa_mod, "_MAX_ROWS", 48)
    assert sa_mod.groups_per_tile(7, 12) == 1
    assert sa_mod.groups_per_tile(8, 12) == 4

    r = np.random.RandomState(11)
    B, KH, G, D = 2, 2, 7, 128
    S, N = 3, 4
    T = S * N
    NH = KH * G
    num_pages, pages_per_seq = 16, 6
    q = jnp.asarray(r.randn(B, T, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    k_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    v_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    bt = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq)
    bt = jnp.asarray(bt)
    cache_lens = jnp.asarray([37, 80], jnp.int32)
    seg = np.repeat(np.arange(S), N)
    idx = np.tile(np.arange(N), S)
    sees = ((seg[:, None] == seg[None, :]) & (idx[None, :] <= idx[:, None])) | (
        (seg[:, None] == 2) & (seg[None, :] == 0)
    )
    intra = jnp.asarray(np.broadcast_to(sees, (B, T, T)).copy())
    scale = 1.0 / np.sqrt(D)

    ref = paged_attention_with_block(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale, page_size=PAGE
    )
    out = sa_mod.spec_attention_pallas(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale,
        page_size=PAGE, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_feasible_bounds_query_tile():
    """Prefill-scale query blocks must NOT dispatch to the Pallas kernel: the
    kernel holds all G*T query rows in VMEM (measured OOM at G*T=14336)."""
    from jacobiforcing_tpu.ops.attention import kernel_feasible

    k = jnp.zeros((4, 256, 128), jnp.bfloat16)
    ok = jnp.zeros((1, 64, 28, 128), jnp.bfloat16)  # decode block: G*L=448
    big = jnp.zeros((1, 2048, 28, 128), jnp.bfloat16)  # prefill: G*T=14336
    assert kernel_feasible(ok, k, 256)
    assert not kernel_feasible(big, k, 256)
    assert not kernel_feasible(ok, k, 8)  # page not sublane-aligned
    assert not kernel_feasible(ok.astype(jnp.float16), k, 256)


def test_prefill_tiled_matches_xla(monkeypatch):
    """Query-tiled flash prefill (G*T beyond the VMEM row cap) == XLA dense.

    MAX_Q_ROWS is lowered so the tiled path triggers at CPU-interpretable
    sizes; T=160 is deliberately not a multiple of the 128-row query tile to
    cover tail padding, and the prefix offsets cover prefix-cache prefill.
    """
    from jacobiforcing_tpu.ops.pallas import paged_attention as pa_mod

    monkeypatch.setattr(pa_mod, "MAX_Q_ROWS", 64)
    r = np.random.RandomState(3)
    B, T, NH, KH, D = 2, 160, 4, 2, 32
    pages_per_seq, num_pages = 14, 28
    q = jnp.asarray(r.randn(B, T, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    bt = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq)
    bt = jnp.asarray(bt)
    start = jnp.asarray([32, 47], jnp.int32)  # prefix-cache offsets
    cache_lens = start + T
    positions = start[:, None] + jnp.arange(T)[None, :]
    scale = 1.0 / np.sqrt(D)

    ref = paged_attention_xla(q, k, v, bt, cache_lens, positions, scale, page_size=PAGE)
    out = paged_attention_pallas(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE,
        interpret=True, softmax="flat",
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_prefill_tiled_fp8_scales(monkeypatch):
    """Tiled prefill with fp8 per-row dequant scales == scaled XLA path."""
    from jacobiforcing_tpu.ops.pallas import paged_attention as pa_mod

    monkeypatch.setattr(pa_mod, "MAX_Q_ROWS", 64)
    r = np.random.RandomState(7)
    B, T, NH, KH, D = 1, 192, 2, 1, 32
    pages_per_seq, num_pages = 16, 16
    q = jnp.asarray(r.randn(B, T, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    ks = jnp.asarray(0.5 + r.rand(KH, num_pages * PAGE), jnp.float32)
    vs = jnp.asarray(0.5 + r.rand(KH, num_pages * PAGE), jnp.float32)
    bt = jnp.asarray(np.arange(pages_per_seq, dtype=np.int32)[None, :])
    start = jnp.asarray([16], jnp.int32)
    cache_lens = start + T
    positions = start[:, None] + jnp.arange(T)[None, :]
    scale = 1.0 / np.sqrt(D)

    ref = paged_attention_xla(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE,
        k_scale_l=ks, v_scale_l=vs,
    )
    out = paged_attention_pallas(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE,
        interpret=True, k_scale_l=ks, v_scale_l=vs,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_spec_kernel_scaled_kv():
    """MR speculative kernel with per-row fp8/int8-KV dequant scales folded
    into scores/probabilities == the scaled XLA paged_attention_with_block
    (closes the round-2 gap where scaled-KV MR fell off the kernel onto the
    dense-gather path)."""
    from jacobiforcing_tpu.ops.attention import paged_attention_with_block
    from jacobiforcing_tpu.ops.pallas.spec_attention import spec_attention_pallas

    r = np.random.RandomState(3)
    B, NH, KH, D = 2, 4, 2, 128
    S, N = 3, 4
    T = S * N
    num_pages, pages_per_seq = 16, 6
    q = jnp.asarray(r.randn(B, T, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    ks = jnp.asarray(0.5 + r.rand(KH, num_pages * PAGE), jnp.float32)
    vs = jnp.asarray(0.5 + r.rand(KH, num_pages * PAGE), jnp.float32)
    k_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    v_new = jnp.asarray(r.randn(B, T, KH, D), jnp.float32)
    bt = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq)
    bt = jnp.asarray(bt)
    cache_lens = jnp.asarray([37, 80], jnp.int32)

    seg = np.repeat(np.arange(S), N)
    idx = np.tile(np.arange(N), S)
    sees = ((seg[:, None] == seg[None, :]) & (idx[None, :] <= idx[:, None])) | (
        (seg[:, None] == 2) & (seg[None, :] == 0)
    )
    intra = jnp.asarray(np.broadcast_to(sees, (B, T, T)).copy())

    scale = 1.0 / np.sqrt(D)
    ref = paged_attention_with_block(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale, page_size=PAGE,
        k_scale_l=ks, v_scale_l=vs,
    )
    out = spec_attention_pallas(
        q, k, v, bt, cache_lens, k_new, v_new, intra, scale,
        page_size=PAGE, interpret=True, k_scale_l=ks, v_scale_l=vs,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)



def test_softmax_policy_calibration(monkeypatch):
    """The "auto" softmax policy is calibration-driven: flat only when the
    recorded logit bound is measured-safe; env forcing wins; the calibration
    utility records the bound it measures."""
    from jacobiforcing_tpu.models.qwen import ModelConfig, init_params, rope_table
    from jacobiforcing_tpu.ops.calibrate import calibrate_flat_softmax
    from jacobiforcing_tpu.ops.pallas import paged_attention as pa

    monkeypatch.setenv("JF_PA_SOFTMAX", "auto")
    monkeypatch.setattr(pa, "_FLAT_BOUND", None)
    assert not pa.flat_enabled()  # unknown range -> safe (online)
    pa.set_flat_softmax_bound(10.0)
    assert pa.flat_enabled()
    pa.set_flat_softmax_bound(520.0)  # the measured demo-checkpoint range
    assert not pa.flat_enabled()
    monkeypatch.setenv("JF_PA_SOFTMAX", "flat")
    assert pa.flat_enabled()
    monkeypatch.setenv("JF_PA_SOFTMAX", "online")
    assert not pa.flat_enabled()
    assert pa._resolve_flat("flat") and not pa._resolve_flat("online")

    monkeypatch.setenv("JF_PA_SOFTMAX", "auto")
    cfg = ModelConfig.tiny(dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    bound = calibrate_flat_softmax(params, cfg, rope_table(cfg), T=32, B=1)
    assert bound > 0.0
    assert pa.get_flat_softmax_bound() == bound


@pytest.mark.parametrize("pp,split", [("2", 4), ("4", 8)])
def test_kernel_split_path_matches_xla(monkeypatch, pp, split):
    """Intra-tile ILP split parity (ADVICE r3): the production default
    (SPLIT=4, page_size=256 -> tile 512) activates the chunked flat-softmax
    path, which the PAGE=16 tests above can never reach (tile % (SPLIT*128)
    != 0 there).  Recreate the activating geometry in interpret mode —
    PAGE=256 with pp=2 (tile 512, SPLIT=4) and pp=4 (tile 1024, SPLIT=8) —
    on the per-head kernel, with ragged tails so both the full-tile fast
    path and the masked tail run.  Scaled (quantized-KV) callers are
    dispatched to online softmax before the split guard
    (`flat = ... and not scaled`), so the split has no scaled variant to
    cover.  The fused-heads variant is covered separately below."""
    from jacobiforcing_tpu.ops.pallas import paged_attention as pa

    monkeypatch.setattr(pa, "_PP_ENV", pp)
    monkeypatch.setattr(pa, "_SPLIT", split)
    monkeypatch.setenv("JF_PA_FUSEH", "0")  # force the per-head kernel
    BIGPAGE = 256
    B, L, NH, KH, D = 2, 4, 4, 2, 32
    pages_per_seq, num_pages = 4, 8
    r = np.random.RandomState(3)
    q = jnp.asarray(r.randn(B, L, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * BIGPAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * BIGPAGE, D), jnp.float32)
    bt = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq)
    bt = jnp.asarray(bt)
    # row 0 ends mid-tile (masked tail chunks), row 1 on a tile boundary
    cache_lens = jnp.asarray([300, 1024], jnp.int32)
    positions = (cache_lens - L)[:, None] + jnp.arange(L)[None, :]
    scale = 1.0 / np.sqrt(D)

    tile = int(pp) * BIGPAGE
    assert tile % (split * 128) == 0, "geometry must activate the split"
    ref = paged_attention_xla(
        q, k, v, bt, cache_lens, positions, scale, page_size=BIGPAGE
    )
    out = paged_attention_pallas(
        q, k, v, bt, cache_lens, positions, scale, page_size=BIGPAGE,
        interpret=True, softmax="flat",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pp,split", [("2", 4), ("4", 8)])
def test_kernel_fused_split_path_matches_xla(monkeypatch, pp, split):
    """Fused-heads variant of the split parity test above: the fused kernel
    streams the flattened (head, tile) sequence in one program per b, and its
    flat path now runs the same per-chunk score->exp2->pv chains.  Geometry
    keeps B*KH inside the fused gate and activates the split (tile 512/1024);
    ragged lengths cover the masked-tail chunks, including a mid-head tile
    boundary (head transition with tt==0 accumulator reset between chunks)."""
    from jacobiforcing_tpu.ops.pallas import paged_attention as pa

    monkeypatch.setattr(pa, "_PP_ENV", pp)
    monkeypatch.setattr(pa, "_SPLIT", split)
    monkeypatch.setenv("JF_PA_FUSEH", "1")
    BIGPAGE = 256
    B, L, NH, KH, D = 2, 4, 4, 2, 32
    pages_per_seq, num_pages = 4, 8
    r = np.random.RandomState(7)
    q = jnp.asarray(r.randn(B, L, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * BIGPAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * BIGPAGE, D), jnp.float32)
    bt = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq)
    bt = jnp.asarray(bt)
    cache_lens = jnp.asarray([300, 1024], jnp.int32)
    positions = (cache_lens - L)[:, None] + jnp.arange(L)[None, :]
    scale = 1.0 / np.sqrt(D)

    tile = int(pp) * BIGPAGE
    assert tile % (split * 128) == 0, "geometry must activate the split"
    assert B * KH <= 8, "geometry must stay on the fused-heads path"
    ref = paged_attention_xla(
        q, k, v, bt, cache_lens, positions, scale, page_size=BIGPAGE
    )
    out = paged_attention_pallas(
        q, k, v, bt, cache_lens, positions, scale, page_size=BIGPAGE,
        interpret=True, softmax="flat",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("softmax", ["flat", "online"])
def test_kernel_perhead_ragged_matches_xla(monkeypatch, softmax):
    """Per-head (B, KH)-grid kernel parity on ragged lengths.  The fused
    streaming path is now the default wherever KH*GL fits VMEM, so this
    forces the per-head fallback (the KH*GL > MAX_Q_ROWS regime, e.g. L=128
    blocks) to keep it covered on a multi-program grid with different ntiles
    per program."""
    from jacobiforcing_tpu.ops.pallas import paged_attention as pa

    monkeypatch.setenv("JF_PA_FUSEH", "0")  # force the per-head fallback
    B, L, NH, KH, D = 3, 4, 4, 2, 32
    pages_per_seq, num_pages = 6, 32
    r = np.random.RandomState(11)
    q = jnp.asarray(r.randn(B, L, NH, D), jnp.float32)
    k = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    v = jnp.asarray(r.randn(KH, num_pages * PAGE, D), jnp.float32)
    bt = np.zeros((B, pages_per_seq), np.int32)
    for b in range(B):
        bt[b] = np.arange(b * pages_per_seq, (b + 1) * pages_per_seq)
    bt = jnp.asarray(bt)
    cache_lens = jnp.asarray([37, 80, 9], jnp.int32)  # ragged ntiles
    positions = (cache_lens - L)[:, None] + jnp.arange(L)[None, :]
    scale = 1.0 / np.sqrt(D)

    ref = paged_attention_xla(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE
    )
    out = paged_attention_pallas(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE,
        interpret=True, softmax=softmax,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flat_clamp_elision_parity(monkeypatch):
    """Round-5 clamp elision: when a calibrated bound proves scores safe, the
    flat path skips the per-element _FLAT_CAP min() — the output must be
    bit-compatible with the clamped flat path (min is the identity below the
    cap) and match the XLA reference."""
    from jacobiforcing_tpu.ops.pallas import paged_attention as pa

    q, k, v, bt = _setup(L=4)
    cache_lens = jnp.asarray([37, 80], jnp.int32)
    positions = (cache_lens - 4)[:, None] + jnp.arange(4)[None, :]
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = paged_attention_xla(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE)

    # clamped: forced flat with no calibrated bound
    monkeypatch.setattr(pa, "_FLAT_BOUND", None)
    clamped = np.asarray(paged_attention_pallas(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE,
        interpret=True, softmax="flat"))
    # elided: calibrated bound <= cap/2 (fresh jit cache key via interpret
    # already traces per call; _FLAT_BOUND is read at trace time)
    paged_attention_pallas.clear_cache()
    monkeypatch.setattr(pa, "_FLAT_BOUND", 10.0)
    elided = np.asarray(paged_attention_pallas(
        q, k, v, bt, cache_lens, positions, scale, page_size=PAGE,
        interpret=True, softmax="flat"))
    np.testing.assert_array_equal(clamped, elided)
    np.testing.assert_allclose(elided, np.asarray(ref), rtol=2e-5, atol=2e-5)
    paged_attention_pallas.clear_cache()
