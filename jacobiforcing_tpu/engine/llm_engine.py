"""Engine core: request admission, batched prefill/decode dispatch, retirement.

Re-design of the reference LLMEngine + ModelRunner host half
(inference_engine/engine/llm_engine.py:15-202, model_runner.py:155-1659).
The reference's TP worker processes, SharedMemory command mailbox, and
broadcast protocol vanish: one Python controller drives jitted programs whose
collectives XLA compiles in (SURVEY.md §2.7).

Decode dispatch:
  * AR sequences step one token per `ar_decode_step` call (batched, bucketed);
  * Jacobi sequences run whole device-resident chunks (`jacobi_chunk_greedy`),
    grouped by (block_len L, ignore_eos) the way the reference groups by L to
    avoid padding (jacobi_decoding.py:500-513); batch is padded to the next
    compile bucket instead of CUDA-graph capture (model_runner.py:1596-1658).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional, Sequence as PySeq

import numpy as np
import jax
import jax.numpy as jnp

from jacobiforcing_tpu.config import Config, SamplingParams
from jacobiforcing_tpu.engine import runner
from jacobiforcing_tpu.engine.block_manager import BlockManager
from jacobiforcing_tpu.engine.scheduler import Scheduler
from jacobiforcing_tpu.engine.sequence import Sequence, SequenceStatus
from jacobiforcing_tpu.models.qwen import ModelConfig, rope_table
from jacobiforcing_tpu.ops.kv_cache import alloc_kv_cache
from jacobiforcing_tpu.utils.profiling import get_profiler


class _PendingChunk:
    """One dispatched-but-unread Jacobi chunk (speculative host pipeline)."""

    __slots__ = ("res", "seqs", "expected_lens", "iters0", "nongreedy",
                 "stat_key")

    def __init__(self, res, seqs, expected_lens, iters0, nongreedy,
                 stat_key=None):
        self.res = res
        self.seqs = seqs
        self.expected_lens = expected_lens
        self.iters0 = iters0
        self.nongreedy = nongreedy
        # extra stats bucket credited with this chunk's iterations at commit
        # time (e.g. "mr_single" for MR groups served by the single arm —
        # async commits land a chunk later, so dispatch-time deltas miss them)
        self.stat_key = stat_key


def _bucket(n: int, buckets: PySeq[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class LLMEngine:
    def __init__(
        self,
        config: Config,
        *,
        model_cfg: Optional[ModelConfig] = None,
        params: Optional[Dict[str, Any]] = None,
        tokenizer=None,
        num_kv_pages: Optional[int] = None,
        kv_dtype=None,
        mesh=None,
        calibration_ids=None,  # [B, T] representative prompt tokens
    ):
        self.config = config
        if config.compilation_cache:
            from jacobiforcing_tpu.utils.platform import enable_compilation_cache

            enable_compilation_cache(config.compilation_cache_dir)
        if params is None:
            from jacobiforcing_tpu.utils.loader import load_checkpoint

            model_cfg, params = load_checkpoint(config.model_path)
        assert model_cfg is not None
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer

        # Tensor parallelism: shard params + KV over the ("data", "model")
        # mesh; XLA compiles the collectives the reference issues by hand
        # (linear.py:149-153 all_reduce, embed_head.py:34-42) — SURVEY.md §2.7.
        if mesh is None and config.tensor_parallel_size > 1:
            from jacobiforcing_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(tensor_parallel_size=config.tensor_parallel_size)
        self.mesh = mesh
        # Register (or clear) the serving mesh so the Pallas attention
        # dispatch shard_maps the kernel over it (GSPMD cannot partition a
        # custom call) — ops/attention.py _serving_mesh_for.
        from jacobiforcing_tpu.parallel.mesh import set_serving_mesh

        set_serving_mesh(mesh)
        if config.quantization in ("int8", "w8a8"):
            from jacobiforcing_tpu.ops.quant import quantize_params

            params = quantize_params(params)
            if config.quantization == "w8a8":
                # large-batch mode: per-token activation quant + int8 MXU
                model_cfg = dataclasses.replace(model_cfg, act_quant=True)
                self.model_cfg = model_cfg
        if mesh is not None:
            from jacobiforcing_tpu.parallel.sharding import shard_params

            tp = mesh.shape.get("model", 1)
            assert model_cfg.num_kv_heads % tp == 0, (
                f"kv heads {model_cfg.num_kv_heads} not divisible by tp={tp}"
            )
            params = shard_params(params, model_cfg, mesh)
        self.params = params
        if tokenizer is not None and config.eos < 0:
            config.eos = tokenizer.eos_token_id
        self.rope = rope_table(model_cfg)

        # Flat-softmax calibration: measure this model's attention-logit
        # range BEFORE any decode-path compile so the Pallas kernels pick the
        # flat (fast) softmax only when it is exact for these weights (sharp
        # induction heads of trained Jacobi checkpoints measure 5x past the
        # flat cap — ops/calibrate.py).  Skipped on CPU backends (XLA path)
        # and when JF_PA_SOFTMAX forces a choice.  Random-token calibration
        # can miss structure-gated sharp heads (calibrate.py docstring), so
        # (a) callers with representative prompts pass `calibration_ids`, and
        # (b) otherwise the first real request re-calibrates on its own
        # prompt (`_maybe_prompt_recalibrate`) — if that flips the decision
        # to online, the jit caches are cleared so any already-compiled
        # executables (e.g. warmup's) are retraced with the safe softmax.
        self.flat_softmax_bound = None
        self._prompt_recal_pending = False
        if (
            os.environ.get("JF_PA_CALIBRATE", "1") != "0"
            and os.environ.get("JF_PA_SOFTMAX", "auto") == "auto"
            and (
                jax.default_backend() not in ("cpu",)
                or os.environ.get("JF_PA_CALIBRATE_FORCE", "0") == "1"
            )
        ):
            from jacobiforcing_tpu.ops.calibrate import calibrate_flat_softmax

            self.flat_softmax_bound = calibrate_flat_softmax(
                params, model_cfg, self.rope, ids=calibration_ids
            )
            self._prompt_recal_pending = (
                calibration_ids is None
                and os.environ.get("JF_PA_CALIBRATE_PROMPTS", "1") != "0"
            )

        if kv_dtype is None and config.kv_cache_dtype:
            kv_dtype = {
                "fp8": jnp.float8_e4m3fn,
                "int8": jnp.int8,
                "bf16": jnp.bfloat16,
            }[config.kv_cache_dtype]
        page = config.kvcache_page_size
        npages = num_kv_pages or (config.num_kv_pages if config.num_kv_pages > 0 else None)
        if npages is None:
            npages = self._pages_from_hbm(page, kv_dtype or model_cfg.dtype)
        self.kv = alloc_kv_cache(
            model_cfg.num_layers, npages, page, model_cfg.num_kv_heads,
            model_cfg.head_dim, kv_dtype or model_cfg.dtype,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding

            from jacobiforcing_tpu.parallel.sharding import kv_cache_spec

            spec = kv_cache_spec()
            put = lambda x, s: (
                jax.device_put(x, NamedSharding(mesh, s)) if x is not None else None
            )
            self.kv = type(self.kv)(
                k=put(self.kv.k, spec.k),
                v=put(self.kv.v, spec.v),
                page_size=self.kv.page_size,
                k_scale=put(self.kv.k_scale, spec.k_scale),
                v_scale=put(self.kv.v_scale, spec.v_scale),
            )
        # Native C++ block manager when available (JF_NATIVE_BM=0 disables)
        self.block_manager = None
        if os.environ.get("JF_NATIVE_BM", "1") != "0":
            try:
                from jacobiforcing_tpu.engine.native_block_manager import (
                    NativeBlockManager,
                )

                self.block_manager = NativeBlockManager(npages, page)
            except Exception:
                self.block_manager = None
        if self.block_manager is None:
            self.block_manager = BlockManager(npages, page)
        self.scheduler = Scheduler(config, self.block_manager)

        self.rng = np.random.RandomState(config.seed)
        self.key = jax.random.PRNGKey(config.seed)
        # static shapes for compile bucketing
        max_margin = max(config.jacobi_block_len * config.jacobi_max_blocks, 256)
        self.pages_bucket = (config.max_model_len + max_margin + page - 1) // page
        self.cap_tokens = config.max_model_len + max_margin + 1
        self.stats: Dict[str, float] = {
            "prefill_tokens": 0, "generated_tokens": 0, "jacobi_iterations": 0,
            "ar_steps": 0, "chunk_calls": 0, "chunk_forwards": 0,
        }
        self._mr_policies: Dict[tuple, Any] = {}
        # outstanding speculative decode chunks by group signature
        # (see _jacobi_chunk: one-chunk-lag host commit)
        self._pending: Dict[tuple, _PendingChunk] = {}

    # ------------------------------------------------------------------
    def _pages_from_hbm(self, page: int, kv_dtype) -> int:
        """Size the KV pool from free device memory (reference
        model_runner.py:523-648 sizes from free VRAM with a hard cap)."""
        from jacobiforcing_tpu.ops.kv_cache import needs_row_scales

        mc = self.model_cfg
        bytes_per_tok = (
            2 * mc.num_layers * mc.num_kv_heads * mc.head_dim
            * jnp.dtype(kv_dtype).itemsize
        )
        if needs_row_scales(kv_dtype):  # fp32 per-row dequant scales
            bytes_per_tok += 2 * mc.num_layers * mc.num_kv_heads * 4
        avail = None
        try:
            dev = jax.devices()[0]
            stats = dev.memory_stats()
            if stats:
                free = stats.get("bytes_limit", 8 << 30) * self.config.hbm_utilization
                used = stats.get("bytes_in_use", 0)
                avail = max(free - used, 1 << 28)
        except Exception:
            pass
        if avail is None:
            # memory_stats unavailable (e.g. tunneled backends): derive chip
            # HBM from config.hbm_bytes or the device kind, minus the resident
            # params and a 2GB workspace reserve
            cap = self.config.hbm_bytes or self._hbm_from_device_kind()
            param_bytes = sum(
                x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params)
            )
            avail = max(
                int(cap * self.config.hbm_utilization) - param_bytes - (2 << 30),
                1 << 28,
            )
        npages = int(avail // (bytes_per_tok * page))
        return max(16, min(npages, 40_000))  # reference's 40k hard cap

    @staticmethod
    def _hbm_from_device_kind() -> int:
        """Per-chip HBM by TPU generation (public specs); 16GB if unknown."""
        table = {"v5 lite": 16, "v5e": 16, "v4": 32, "v5p": 95, "v6e": 32,
                 "v6 lite": 32, "v3": 32, "v2": 16}
        try:
            kind = jax.devices()[0].device_kind.lower()
        except Exception:
            return 16 << 30
        for key, gb in table.items():
            if key in kind:
                return gb << 30
        return 16 << 30

    # ------------------------------------------------------------------
    SUPPORTED_STRATEGIES = {
        "autoregressive", "jacobi", "jacobi_nongreedy", "jacobi_on_policy",
        # Engine-side MR support is an extension over the reference, whose
        # serving engine declares it unsupported (model_runner.py:1468-1473)
        # and only implements it on the HF path (modeling/...unified.py).
        "jacobi_multiblock_rejection_recycling",
    }

    def add_request(self, token_ids: List[int], sampling_params: SamplingParams) -> Sequence:
        strat = sampling_params.decode_strategy
        if strat not in self.SUPPORTED_STRATEGIES:
            raise NotImplementedError(f"decode_strategy {strat!r} not supported yet")
        assert len(token_ids) < self.config.max_model_len, (
            f"prompt ({len(token_ids)} tokens) exceeds max_model_len "
            f"{self.config.max_model_len}"
        )
        # clamp the budget so a capacity-stalled sequence cannot livelock the
        # scheduler (generation is bounded by the model context anyway)
        room = self.config.max_model_len - len(token_ids)
        if sampling_params.max_tokens > room:
            from dataclasses import replace

            sampling_params = replace(sampling_params, max_tokens=room)
        if self._prompt_recal_pending:
            self._maybe_prompt_recalibrate(token_ids)
        seq = Sequence(token_ids, sampling_params)
        self.scheduler.add(seq)
        return seq

    def _maybe_prompt_recalibrate(self, token_ids: List[int]) -> None:
        """Re-run flat-softmax calibration on the first REAL prompt.

        Random-token init calibration keeps structure-gated sharp heads dark
        (ops/calibrate.py); the first request is the earliest representative
        input available.  Runs once; if the measured bound flips the policy
        from flat to online, clears the jit caches so executables compiled
        in between (warmup) are retraced with the exact softmax."""
        self._prompt_recal_pending = False
        from jacobiforcing_tpu.ops.calibrate import calibrate_flat_softmax
        from jacobiforcing_tpu.ops.pallas.paged_attention import (
            flat_enabled, set_flat_softmax_bound,
        )

        was_flat = flat_enabled()
        ids = np.asarray(token_ids[:128], np.int32)[None, :]
        bound = calibrate_flat_softmax(self.params, self.model_cfg, self.rope,
                                       ids=ids)
        # keep the WORST (largest) measured bound across calibration passes
        if self.flat_softmax_bound is not None:
            bound = max(bound, self.flat_softmax_bound)
            set_flat_softmax_bound(bound)
        self.flat_softmax_bound = bound
        if was_flat and not flat_enabled():
            print(
                f"[jacobiforcing_tpu] prompt calibration raised the attention"
                f" score bound to {bound:.1f} exp2-units (> cap/2); switching"
                f" to online softmax and clearing compiled executables",
                flush=True,
            )
            jax.clear_caches()

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------
    def step(self) -> List[Sequence]:
        seqs, is_prefill = self.scheduler.schedule()
        flushed: List[Sequence] = []
        if not seqs:
            if self._pending:
                # drain: commit outstanding speculative chunks so their
                # sequences can retire (the scheduler sees finishes only
                # after commits land)
                flushed = self._flush_pending()
                self.scheduler.postprocess(flushed)
                return [s for s in flushed if s.is_finished]
            return []
        max_b = self.config.batch_buckets[-1]
        if is_prefill:
            if self._pending:
                # commit before backfill: the decode groups change membership
                # after this prefill, so land their pending work now (and let
                # any finish free pages first)
                flushed = self._flush_pending()
                self.scheduler.postprocess(flushed)
            for i in range(0, len(seqs), max_b):
                self._run_prefill(seqs[i : i + max_b])
        else:
            self._run_decode(seqs)
        self.scheduler.postprocess(seqs)
        # a pending chunk whose sequences ALL retired this step is provably
        # inert (every finish condition is mirrored in-kernel): drop it so
        # the engine ends clean instead of flushing zero tokens at drain
        for sig in list(self._pending):
            if all(
                s.status is not SequenceStatus.RUNNING
                for s in self._pending[sig].seqs
            ):
                del self._pending[sig]
        finished = [s for s in seqs if s.is_finished]
        if flushed:
            in_batch = set(id(s) for s in seqs)
            finished += [
                s for s in flushed if s.is_finished and id(s) not in in_batch
            ]
        return finished

    # ------------------------------------------------------------------
    def _pad_block_table(self, seqs: List[Sequence], B: int) -> jnp.ndarray:
        bt = np.full((B, self.pages_bucket), -1, np.int32)
        for i, s in enumerate(seqs):
            tab = s.block_table[: self.pages_bucket]
            bt[i, : len(tab)] = tab
        return jnp.asarray(bt)

    def _draft_len(self, s: Sequence) -> int:
        return (
            s.sampling_params.jacobi_block_len
            if s.sampling_params.decode_strategy.startswith("jacobi")
            else 0
        )

    def _prefill_segment(self, seqs: List[Sequence], max_T: int) -> None:
        """Forward one bounded segment of each long uncached prompt suffix.

        Chunked prefill: the reference lacks it (model_runner.py:714-768
        forwards the whole suffix in one varlen batch); here each segment is
        at most `max_T` tokens so prefill memory stays bounded and prompts
        near max_model_len never overflow the compile bucket.  Each segment
        leaves >= 1 uncached token so the final (draft-appended) pass still
        gathers logits at prompt_len-1."""
        B = _bucket(len(seqs), self.config.batch_buckets)
        seg_lens = [
            min(len(s) - s.num_cached_tokens - 1, max_T) for s in seqs
        ]
        T = _bucket(max(seg_lens), self.config.prefill_token_buckets)
        ids = np.zeros((B, T), np.int32)
        starts = np.zeros((B,), np.int32)
        totals = np.ones((B,), np.int32)
        for i, s in enumerate(seqs):
            c = s.num_cached_tokens
            ids[i, : seg_lens[i]] = s.token_ids[c : c + seg_lens[i]]
            starts[i] = c
            totals[i] = c + seg_lens[i]
        bt = self._pad_block_table(seqs, B)
        prof = get_profiler()
        if prof:
            prof.record_bucket("prefill_segment", (B, T))
            prof.start("prefill.forward")
        self.kv, last_logits, _ = runner.prefill(
            self.params, self.model_cfg, self.rope, jnp.asarray(ids),
            jnp.asarray(starts), jnp.asarray(totals), jnp.asarray(totals),
            self.kv, bt, n_out=1,
        )
        if prof:
            last_logits.block_until_ready()
            prof.stop("prefill.forward")
        for i, s in enumerate(seqs):
            s.num_cached_tokens += seg_lens[i]
        self.stats["prefill_tokens"] += sum(seg_lens)

    def _run_prefill(self, seqs: List[Sequence]) -> None:
        cfgb = self.config.batch_buckets
        # Chunked prefill for prompts whose uncached suffix (+ Jacobi draft)
        # exceeds the largest prefill bucket.
        max_T = self.config.prefill_token_buckets[-1]
        while True:
            todo = [
                s for s in seqs
                if len(s) - s.num_cached_tokens + self._draft_len(s) > max_T
            ]
            if not todo:
                break
            self._prefill_segment(todo, max_T)
        jac_Ls = [
            s.sampling_params.jacobi_block_len
            for s in seqs
            if s.sampling_params.decode_strategy.startswith("jacobi")
        ]
        n_out = max(jac_Ls) if jac_Ls else 1
        B = _bucket(len(seqs), cfgb)

        suffixes, starts, totals, prompts_l = [], [], [], []
        for s in seqs:
            cached = s.num_cached_tokens
            suffix = list(s.token_ids[cached:])
            L = (
                s.sampling_params.jacobi_block_len
                if s.sampling_params.decode_strategy.startswith("jacobi")
                else 0
            )
            if L:
                suffix += self.rng.randint(0, self.model_cfg.vocab_size, L).tolist()
            suffixes.append(suffix)
            starts.append(cached)
            totals.append(len(s) + L)
            prompts_l.append(len(s))

        max_suffix = max(len(x) for x in suffixes)
        T = _bucket(max_suffix, self.config.prefill_token_buckets)
        # the segment loop above guarantees every suffix fits the bucket;
        # assert instead of silently truncating (round-1 bug: near-max-length
        # prompts dropped their tail while totals claimed the full length)
        assert max_suffix <= T, f"prefill suffix {max_suffix} > bucket {T}"
        ids = np.zeros((B, T), np.int32)
        for i, x in enumerate(suffixes):
            ids[i, : len(x)] = x
        starts_a = np.zeros((B,), np.int32)
        totals_a = np.ones((B,), np.int32)
        prompts_a = np.ones((B,), np.int32)
        starts_a[: len(seqs)] = starts
        totals_a[: len(seqs)] = totals
        prompts_a[: len(seqs)] = prompts_l

        bt = self._pad_block_table(seqs, B)
        prof = get_profiler()
        if prof:
            prof.record_bucket("prefill", (B, T, n_out))
            prof.start("prefill.forward")
        self.kv, last_logits, draft = runner.prefill(
            self.params, self.model_cfg, self.rope, jnp.asarray(ids),
            jnp.asarray(starts_a), jnp.asarray(totals_a), jnp.asarray(prompts_a),
            self.kv, bt, n_out=n_out,
        )
        # `last_logits` is [B, vocab] fp32 (~5 MB at 7B dims) and only the AR
        # sampling path below reads it; Jacobi rows use the tiny greedy draft.
        # Skipping the dead readback saves a multi-MB tunnel transfer on every
        # backfill prefill in Jacobi serving.
        need_logits = any(
            not s.sampling_params.decode_strategy.startswith("jacobi")
            for s in seqs
        )
        if need_logits:
            last_logits, draft = jax.device_get((last_logits, draft))
            last_logits = np.asarray(last_logits, np.float32)
        else:
            draft = jax.device_get(draft)
        if prof:
            prof.stop("prefill.forward")
        self.stats["prefill_tokens"] += sum(len(x) for x in suffixes)

        for i, s in enumerate(seqs):
            sp = s.sampling_params
            if sp.decode_strategy.startswith("jacobi"):
                s.prefill_draft = draft[i]  # [n_out] greedy continuation
            else:
                # commit first token now (reference prefill -> Sampler path)
                if sp.temperature > 0:
                    logits = last_logits[i] / max(sp.temperature, 1e-6)
                    g = self.rng.gumbel(size=logits.shape)
                    tok = int(np.argmax(logits + g))
                else:
                    tok = int(np.argmax(last_logits[i]))
                s.extend_tokens([tok])
                self.stats["generated_tokens"] += 1
            s.num_cached_tokens = len(s) - 1

    # ------------------------------------------------------------------
    def _run_decode(self, seqs: List[Sequence]) -> None:
        max_b = self.config.batch_buckets[-1]
        ar = [s for s in seqs if not s.sampling_params.decode_strategy.startswith("jacobi")]
        jac = [s for s in seqs if s.sampling_params.decode_strategy.startswith("jacobi")]
        for i in range(0, len(ar), max_b):
            self._ar_step(ar[i : i + max_b])
        mr = [
            s for s in jac
            if s.sampling_params.decode_strategy == "jacobi_multiblock_rejection_recycling"
        ]
        mr_groups: Dict[tuple, List[Sequence]] = {}
        for s in mr:
            sp = s.sampling_params
            k = (
                sp.jacobi_block_len, max(1, sp.jacobi_max_blocks),
                max(1, sp.jacobi_n_gram_pool_size), sp.ignore_eos,
            )
            mr_groups.setdefault(k, []).append(s)
        for (L, K, C, ignore_eos), group in mr_groups.items():
            for i in range(0, len(group), max_b):
                self._mr_dispatch(
                    group[i : i + max_b], L, K, C,
                    -1 if ignore_eos else self.config.eos,
                )
        jac = [s for s in jac if s not in mr]
        onpolicy = [s for s in jac if s.sampling_params.decode_strategy == "jacobi_on_policy"]
        jac = [s for s in jac if s.sampling_params.decode_strategy != "jacobi_on_policy"]
        op_groups: Dict[tuple, List[Sequence]] = {}
        for s in onpolicy:
            sp = s.sampling_params
            k = (
                sp.jacobi_block_len, sp.top_k, 0.0 < sp.top_p < 1.0,
                sp.temperature == 0.0,  # greedy trajectory collection mode
                float(sp.jacobi_accept_threshold),
            )
            op_groups.setdefault(k, []).append(s)
        for (L, top_k, use_top_p, greedy_mode, thr), group in op_groups.items():
            for i in range(0, len(group), max_b):
                self._onpolicy_block(
                    group[i : i + max_b], L, top_k, use_top_p, greedy_mode, thr
                )

        groups: Dict[tuple, List[Sequence]] = {}
        for s in jac:
            sp = s.sampling_params
            nongreedy = sp.decode_strategy == "jacobi_nongreedy"
            k = (
                sp.jacobi_block_len,
                sp.ignore_eos,
                nongreedy,
                sp.top_k if nongreedy else -1,
                (0.0 < sp.top_p < 1.0) if nongreedy else False,
            )
            groups.setdefault(k, []).append(s)
        for (L, ignore_eos, nongreedy, top_k, use_top_p), group in groups.items():
            for i in range(0, len(group), max_b):
                self._jacobi_chunk(
                    group[i : i + max_b], L, -1 if ignore_eos else self.config.eos,
                    nongreedy=nongreedy, top_k=top_k, use_top_p=use_top_p,
                )

    def _ar_step(self, seqs: List[Sequence]) -> None:
        B = _bucket(len(seqs), self.config.batch_buckets)
        last = np.zeros((B,), np.int32)
        lens = np.ones((B,), np.int32)
        temps = np.zeros((B,), np.float32)
        active = np.zeros((B,), bool)
        for i, s in enumerate(seqs):
            last[i] = s.last_token
            lens[i] = len(s)
            temps[i] = s.sampling_params.temperature
            active[i] = True
        bt = self._pad_block_table(seqs, B)
        prof = get_profiler()
        if prof:
            prof.record_bucket("ar_decode", (B,))
            prof.start("forward")
            prof.add_iteration()
        self.kv, next_tokens = runner.ar_decode_step(
            self.params, self.model_cfg, self.rope, self.kv,
            jnp.asarray(last), jnp.asarray(lens), bt, jnp.asarray(active),
            jnp.asarray(temps), self._next_key(),
        )
        next_tokens = np.asarray(next_tokens)
        if prof:
            prof.stop("forward")
            prof.add_tokens(len(seqs))
        for i, s in enumerate(seqs):
            s.extend_tokens([int(next_tokens[i])])
            s.num_cached_tokens = len(s) - 1
            self.stats["generated_tokens"] += 1
        self.stats["ar_steps"] += 1

    # -- speculative host pipeline ------------------------------------------
    # The Jacobi chunk is a pure device-state transition: every non-chunk-
    # relative input is either carried in `res` (tokens/cur_len/draft/eos/
    # iters/kv) or invariant across chunks (len_limit = prompt+max_tokens
    # absolute, max_iters, temps) or host-rebuildable smalls (block tables,
    # capacity).  So the engine can dispatch chunk k+1 from chunk k's OUTPUT
    # HANDLES before reading chunk k back: the ~30 ms tunnel round trip of
    # the readback then overlaps chunk k+1's device execution instead of
    # idling the chip (one-chunk-lag host commit — the serving-engine analog
    # of double-buffered stepping).  Safety: every finish condition (EOS,
    # len_limit, max_iters, capacity) is mirrored in-kernel, so the pending
    # chunk's rows for host-finished sequences are provably inert; a dropped
    # pending loses only uncommitted work, never correctness.  The reference
    # has no equivalent (its host loop blocks on every forward,
    # inference_engine/engine/llm_engine.py:86-140).

    def _chunk_sig(self, seqs, L, eos_id, nongreedy, top_k, use_top_p):
        return (
            tuple(s.seq_id for s in seqs), L, eos_id, nongreedy, top_k,
            use_top_p,
        )

    def _dispatch_chunk(
        self, seqs, L, eos_id, nongreedy, top_k, use_top_p, handles=None
    ):
        """Dispatch one Jacobi chunk; carried state comes from `handles`
        (device arrays of the previous chunk's `res`) or is host-built."""
        B = _bucket(len(seqs), self.config.batch_buckets)
        capacity = np.zeros((B,), np.int32)
        len_limit = np.zeros((B,), np.int32)
        temps = np.ones((B,), np.float32)
        top_ps = np.ones((B,), np.float32)
        max_iters_arr = np.ones((B,), np.int32)
        for i, s in enumerate(seqs):
            capacity[i] = min(
                self.block_manager.capacity_tokens(s), self.cap_tokens - 1
            )
            # absolute limit (= prompt_len + max_tokens): chunk-invariant, so
            # a speculative redispatch needs no budget rebuild even though it
            # cannot know the pending chunk's commits yet
            len_limit[i] = len(s) + max(0, s.max_tokens - s.num_completion_tokens)
            temps[i] = s.sampling_params.temperature
            top_ps[i] = s.sampling_params.top_p
            max_iters_arr[i] = min(s.sampling_params.jacobi_max_iterations, 2**30)

        if handles is not None:
            tokens = handles["tokens"]
            cur_len = handles["cur_len"]
            draft = handles["draft"]
            eos = handles["eos"]
            iters = handles["iters"]
        else:
            tokens = np.zeros((B, self.cap_tokens), np.int32)
            cur_len = np.ones((B,), np.int32)
            eos = np.ones((B,), bool)  # padding rows inert
            iters = np.zeros((B,), np.int32)
            draft = np.zeros((B, L), np.int32)
            for i, s in enumerate(seqs):
                n = len(s)
                tokens[i, :n] = s.token_ids
                cur_len[i] = n
                eos[i] = False
                iters[i] = s.jacobi_iters
                if s.draft is not None:
                    draft[i] = s.draft
                    draft[i, 0] = s.last_token
                else:
                    draft[i, 0] = s.last_token
                    pf = s.prefill_draft
                    ncopy = 0
                    if pf is not None:
                        ncopy = min(len(pf), L - 1)
                        draft[i, 1 : 1 + ncopy] = pf[:ncopy]
                        s.prefill_draft = None
                    if ncopy < L - 1:
                        draft[i, 1 + ncopy :] = self.rng.randint(
                            0, self.model_cfg.vocab_size, L - 1 - ncopy
                        )
            tokens = jnp.asarray(tokens)
            cur_len = jnp.asarray(cur_len)
            draft = jnp.asarray(draft)
            eos = jnp.asarray(eos)
            iters = jnp.asarray(iters)

        bt = self._pad_block_table(seqs, B)
        prof = get_profiler()
        if prof:
            prof.record_bucket(
                "jacobi_nongreedy" if nongreedy else "jacobi", (B, L)
            )
        if nongreedy:
            res = runner.jacobi_chunk_nongreedy(
                self.params, self.model_cfg, self.rope, self.kv,
                tokens, cur_len, draft, eos, iters, bt, jnp.asarray(capacity),
                jnp.asarray(len_limit), jnp.asarray(temps), jnp.asarray(top_ps),
                self._next_key(), eos_id, jnp.asarray(max_iters_arr),
                chunk_budget=self.config.jacobi_chunk_tokens,
                chunk_iters=self.config.jacobi_chunk_iters,
                top_k=top_k, use_top_p=use_top_p,
            )
        else:
            res = runner.jacobi_chunk_greedy(
                self.params, self.model_cfg, self.rope, self.kv,
                tokens, cur_len, draft, eos, iters, bt, jnp.asarray(capacity),
                jnp.asarray(len_limit), self._next_key(), eos_id,
                jnp.asarray(max_iters_arr),
                chunk_budget=self.config.jacobi_chunk_tokens,
                chunk_iters=self.config.jacobi_chunk_iters,
            )
        self.kv = res["kv"]
        return res

    def _commit_chunk(self, pending: "_PendingChunk") -> None:
        """Read one dispatched chunk back and commit its tokens to the host
        Sequence mirrors.  Valid whenever each sequence is still RUNNING with
        an unchanged committed length (no external mutation since dispatch);
        other rows are skipped — their device rows were inert or their work
        is deliberately discarded (preemption)."""
        res = pending.res
        prof = get_profiler()
        if prof:
            prof.start("forward")
        # ONE batched transfer: each fresh per-array readback pays a full
        # host<->device round trip (~30 ms over the TPU tunnel), so five
        # sequential np.asarray calls cost ~150 ms per engine step — measured
        # as the bulk of the engine-vs-raw-runner throughput gap
        # (scripts/probe_host_boundary.py, probe_engine_shapes.py).  The
        # committed tokens come back as the compact [B, W] chunk window
        # (runner._commit_window), not the [B, cap] buffer: the tunnel also
        # charges ~40 us/KB of payload, so the full buffer adds 10-20 ms per
        # chunk at 8k caps.
        window, starts, cur_out, iters_out, draft_out, gen = jax.device_get(
            (res["new_tokens"], res["win_start"], res["cur_len"],
             res["iters"], res["draft"], res["generated"])
        )
        if prof:
            prof.stop("forward")
        iters0 = pending.iters0
        n = len(pending.seqs)
        for i, s in enumerate(pending.seqs):
            if (
                s.status is not SequenceStatus.RUNNING
                or len(s) != pending.expected_lens[i]
            ):
                continue
            off = len(s) - starts[i]
            new = window[i, off : off + (cur_out[i] - len(s))].tolist()
            s.extend_tokens(new)
            s.num_cached_tokens = len(s) - 1
            s.draft = draft_out[i]
            s.jacobi_iters = int(iters_out[i])
            self.stats["generated_tokens"] += int(gen[i])
        if prof:
            prof.add_tokens(int(gen[:n].sum()))
            prof.add_iteration(int(iters_out[:n].sum() - iters0[:n].sum()))
        it_delta = int(iters_out[:n].sum() - iters0[:n].sum())
        self.stats["jacobi_iterations"] += it_delta
        if pending.stat_key:
            self.stats[pending.stat_key] = (
                self.stats.get(pending.stat_key, 0) + it_delta
            )
        # device while-loop trips this chunk = the slowest row's iterations
        # (rows that finish early ride along inactive) — separates per-forward
        # time from batch-occupancy effects in profiling
        self.stats["chunk_forwards"] += int(
            (iters_out[:n] - iters0[:n]).max(initial=0)
        )
        self.stats["chunk_calls"] += 1

    def _flush_pending(self) -> List[Sequence]:
        """Commit every outstanding speculative chunk (drain / before prefill
        / group change).  Returns the sequences whose state may have changed
        so the caller can postprocess them."""
        touched: List[Sequence] = []
        for pending in self._pending.values():
            self._commit_chunk(pending)
            touched.extend(pending.seqs)
        self._pending.clear()
        return touched

    def _jacobi_chunk(
        self,
        seqs: List[Sequence],
        L: int,
        eos_id: int,
        *,
        nongreedy: bool = False,
        top_k: int = -1,
        use_top_p: bool = False,
        stat_key: str = None,
    ) -> None:
        use_async = self.config.jacobi_async_host
        sig = self._chunk_sig(seqs, L, eos_id, nongreedy, top_k, use_top_p)
        pending = self._pending.pop(sig, None)
        valid = pending is not None and all(
            s.status is SequenceStatus.RUNNING and len(s) == el
            for s, el in zip(pending.seqs, pending.expected_lens)
        )
        if use_async and valid:
            # dispatch chunk k+1 from chunk k's output handles, THEN read
            # chunk k back — the readback overlaps k+1's device execution
            handles = {
                k: pending.res[k]
                for k in ("tokens", "cur_len", "draft", "eos", "iters")
            }
            res = self._dispatch_chunk(
                seqs, L, eos_id, nongreedy, top_k, use_top_p, handles=handles
            )
            self._commit_chunk(pending)
            self._pending[sig] = _PendingChunk(
                res, list(seqs), [len(s) for s in seqs],
                np.asarray([s.jacobi_iters for s in seqs]
                           + [0] * (len(pending.iters0) - len(seqs))),
                nongreedy, stat_key=stat_key,
            )
            return
        if pending is not None:
            self._commit_chunk(pending)
        if self._pending:
            # group membership changed (finish without backfill, preemption,
            # strategy mix change): recover other groups' pending work before
            # their mirrors drift
            self._flush_pending()
        B = _bucket(len(seqs), self.config.batch_buckets)
        iters0 = np.zeros((B,), np.int32)
        for i, s in enumerate(seqs):
            iters0[i] = s.jacobi_iters
        res = self._dispatch_chunk(
            seqs, L, eos_id, nongreedy, top_k, use_top_p, handles=None
        )
        rec = _PendingChunk(
            res, list(seqs), [len(s) for s in seqs], iters0, nongreedy,
            stat_key=stat_key,
        )
        if use_async:
            # lag begins: this chunk's commits arrive on the next call/flush
            self._pending[sig] = rec
        else:
            self._commit_chunk(rec)

    # ------------------------------------------------------------------
    def _mr_dispatch(
        self, seqs: List[Sequence], N: int, K: int, C: int, eos_id: int
    ) -> None:
        """Route one MR chunk through the measured auto-policy
        (engine/mr_policy.py): full MR / MR-without-candidates / RA-only /
        TRUE single-block — all greedy, all committing identical tokens, so
        the arm only changes throughput, never output."""
        if not self.config.jacobi_mr_auto_policy or C < 1:
            self._multiblock_chunk(seqs, N, K, C, eos_id)
            return
        from jacobiforcing_tpu.engine.mr_policy import ARM_SINGLE, MRAutoPolicy

        pol = self._mr_policies.get((N, K, C))
        if pol is None:
            pol = self._mr_policies[(N, K, C)] = MRAutoPolicy(
                probe_chunks=self.config.jacobi_mr_probe_chunks,
                reprobe_every=self.config.jacobi_mr_reprobe_every,
                n_arms=4 if self.config.jacobi_mr_single_arm else 3,
                # an arm's first-ever call may pay its XLA compile wall —
                # keep it out of the probe window (mr_policy.py docstring)
                discard_first=True,
            )
        arm = pol.pick()
        force = os.environ.get("JF_MR_FORCE_ARM")
        if force:
            arm = int(force)
        # Arm transitions happen OUTSIDE the timed window: they are one-time
        # costs of probe rotation (absent in the locked steady state the
        # measurement predicts), and the single->MR re-entry includes a
        # non-committing AR forward whose first call compiles.
        if arm == ARM_SINGLE:
            self._mr_to_single(seqs, N)
        else:
            # leaving the single arm: its speculative pipeline (if any) must
            # land first — _mr_reenter and the MR bootstrap read host mirrors
            # (draft, committed length), which lag one chunk while async
            if self._pending:
                self._flush_pending()
            self._mr_reenter(seqs, N, K, C)
        gen0 = self.stats["generated_tokens"]
        t0 = time.perf_counter()
        if arm == ARM_SINGLE:
            # TRUE single-block: the sliding-window greedy chunk program —
            # no MR state-machine glue, no block-boundary draft restarts.
            if pol.locked == ARM_SINGLE and self.config.jacobi_async_host:
                # LOCKED steady state rides the speculative host pipeline
                # like any jacobi group (the ~30 ms tunnel readback overlaps
                # the next chunk's device execution — paying it serially
                # would handicap exactly the arm the lock chose).  Commits
                # lag one chunk (mr_single iterations are credited at commit
                # time via stat_key); the drift EMA still tracks throughput.
                self._jacobi_chunk(seqs, N, eos_id, stat_key="mr_single")
            else:
                # PROBING (or forced) runs synchronously so the recorded
                # wall maps 1:1 to committed tokens; flush any pipeline
                # state first — a later sync/MR dispatch must see current
                # host mirrors, not one-chunk-lagged ones.
                if self._pending:
                    self._flush_pending()
                B = _bucket(len(seqs), self.config.batch_buckets)
                iters0 = np.zeros((B,), np.int32)
                expected = [len(s) for s in seqs]
                for i, s in enumerate(seqs):
                    iters0[i] = s.jacobi_iters
                res = self._dispatch_chunk(seqs, N, eos_id, False, -1, False)
                # sync commit credits mr_single via stat_key too (the async
                # path's commits arrive a chunk later — never double-count
                # with a dispatch-time delta here)
                self._commit_chunk(
                    _PendingChunk(res, list(seqs), expected, iters0, False,
                                  stat_key="mr_single")
                )
        else:
            # The three MR arms run the SAME MR chunk executable over the
            # SAME carried state — the knobs only gate which speculative
            # tiers can engage, so switches among them never retrace:
            #   arm 1 disables candidates: lookahead_start = N+1 can never
            #     be reached by block acceptance (<= N), so cand_valid stays
            #     false and the program takes its no-cand forward;
            #   arm 2 additionally stops pseudo spawning (spawn threshold
            #     N+1), draining to the RA-only tier (N-token forwards).
            self._multiblock_chunk(
                seqs, N, K, C, eos_id,
                la_override=(N + 1) if arm >= 1 else None,
                spawn_override=(N + 1) if arm == 2 else None,
            )
        # both chunk paths end with one batched jax.device_get, so this wall
        # time is real on tunneled backends (block_until_ready is not)
        dt = time.perf_counter() - t0
        toks = self.stats["generated_tokens"] - gen0
        # drain edge: some row hit its finish condition during (or, under
        # async, just before) this chunk — its collapsed per-slot yield is
        # batch structure, not workload drift (mr_policy.record docstring)
        drained = any(
            s.num_completion_tokens >= s.max_tokens
            or (eos_id >= 0 and len(s) > 0 and s.last_token == eos_id)
            for s in seqs
        )
        if os.environ.get("JF_MR_POLICY_LOG", "0") == "1":
            print(f"[mr_policy] arm={arm} B={len(seqs)} toks={toks} "
                  f"wall={dt*1e3:.1f}ms locked={pol.locked} "
                  f"drained={drained}", flush=True)
        pol.record(arm, toks, dt, slots=len(seqs), drained=drained)

    def _mr_to_single(self, seqs: List[Sequence], N: int) -> None:
        """Hand MR state off to the single-block program.  Exact at ANY chunk
        boundary: single-block's draft[0] is the last committed token (always
        known) and its verifier never pre-commits, so the speculative tail
        can be anything — we seed it with the RA block's packed draft (whose
        position in the token stream is exactly the commit point) to carry
        the MR lookahead work across the handoff."""
        for s in seqs:
            st = s.mb_state
            if st is None:
                continue
            ra = int(st["ra"])
            dlen = int(st["blk_dlen"][ra])
            d = np.empty((N,), np.int32)
            d[0] = s.last_token
            take = min(max(dlen, 0), N - 1)
            if take:
                d[1 : 1 + take] = np.asarray(st["blk_draft"][ra][:take])
            if 1 + take < N:
                d[1 + take :] = self.rng.randint(
                    0, self.model_cfg.vocab_size, N - 1 - take
                )
            s.draft = d
            s.mb_state = None

    def _mr_reenter(self, seqs: List[Sequence], N: int, K: int, C: int) -> None:
        """Re-enter the MR state machine from single-block state.  MR
        pre-commits RA draft[0] unconditionally (it is by invariant the
        model's greedy continuation, verified in the previous iteration), so
        the sliding draft's spec[0] — which is UNVERIFIED after an AR
        fallback — cannot seed it directly (the round-4 wrong-token bug).
        One non-committing AR forward recomputes the verified continuation;
        the rest of the sliding draft carries over as the speculative tail."""
        need = [s for s in seqs if s.mb_state is None and s.draft is not None]
        if not need:
            return
        B = _bucket(len(need), self.config.batch_buckets)
        last = np.zeros((B,), np.int32)
        lens = np.ones((B,), np.int32)
        active = np.zeros((B,), bool)
        for i, s in enumerate(need):
            last[i] = s.last_token
            lens[i] = len(s)
            active[i] = True
        bt = self._pad_block_table(need, B)
        # temperature 0 -> greedy argmax; write_mask re-writes the seed's own
        # KV slot with identical content (deterministic fn of prefix), so the
        # cache is unchanged and nothing is committed
        self.kv, nxt = runner.ar_decode_step(
            self.params, self.model_cfg, self.rope, self.kv,
            jnp.asarray(last), jnp.asarray(lens), bt, jnp.asarray(active),
            jnp.asarray(np.zeros((B,), np.float32)), self._next_key(),
        )
        nxt = np.asarray(nxt)
        for i, s in enumerate(need):
            old = np.asarray(s.draft)
            draft0 = np.empty((N,), np.int32)
            draft0[0] = int(nxt[i])
            # old = [seed, spec0, spec1, ...]; spec0 is superseded by the
            # verified continuation, the rest stays as the tail guess
            take = min(max(old.shape[0] - 2, 0), N - 1)
            if take:
                draft0[1 : 1 + take] = old[2 : 2 + take]
            if 1 + take < N:
                draft0[1 + take :] = self.rng.randint(
                    0, self.model_cfg.vocab_size, N - 1 - take
                )
            s.draft = None
            s.mb_state = self._mb_bootstrap(s, draft0, N, K, C)

    def mr_policy_snapshot(self) -> Dict[str, Any]:
        return {str(k): p.snapshot() for k, p in self._mr_policies.items()}

    def _mb_bootstrap(
        self, s: Sequence, draft0: np.ndarray, N: int, K: int, C: int
    ) -> dict:
        """Fresh MR state with one RA block at the current commit point.
        `draft0[0]` MUST be the model's verified greedy continuation of the
        committed prefix (prefill bootstrap or the re-entry AR forward) —
        the MR verifier pre-commits it unconditionally."""
        W = 2 * N
        bd = np.zeros((K, N), np.int32)
        bd[0] = draft0
        return {
            "blk_draft": bd,
            "blk_dlen": np.asarray([N] + [0] * (K - 1), np.int32),
            "blk_acc": np.zeros((K,), np.int32),
            "blk_acc_toks": np.zeros((K, N), np.int32),
            "blk_base": np.asarray([len(s)] + [0] * (K - 1), np.int32),
            "blk_active": np.asarray([True] + [False] * (K - 1), bool),
            "ra": np.int32(0),
            "n_active": np.int32(1),
            "pool": np.zeros((C, W), np.int32),
            "pool_len": np.zeros((C,), np.int32),
            "pool_next": np.int32(0),
            "last_next": np.int32(draft0[0]),
        }

    def _multiblock_chunk(
        self, seqs: List[Sequence], N: int, K: int, C: int, eos_id: int,
        la_override: Optional[int] = None,
        spawn_override: Optional[int] = None,
    ) -> None:
        """One BATCHED device segment of multiblock + rejection-recycling
        decoding (the reference HF path is single-sequence and its engine
        rejects MR; batching it is a TPU-side extension)."""
        import math

        from jacobiforcing_tpu.engine.multiblock import jacobi_chunk_multiblock

        W = 2 * N
        pad_id = max(self.config.pad, 0)
        B = _bucket(len(seqs), self.config.batch_buckets)

        for s in seqs:
            if s.mb_state is None:
                pf = s.prefill_draft if s.prefill_draft is not None else np.zeros(0, np.int32)
                draft0 = np.full((N,), pad_id, np.int32)
                n = min(len(pf), N)
                draft0[:n] = pf[:n]
                if n < N:
                    draft0[n:] = self.rng.randint(0, self.model_cfg.vocab_size, N - n)
                s.prefill_draft = None
                s.mb_state = self._mb_bootstrap(s, draft0, N, K, C)

        def stack(key, pad_shape, dtype):
            out = np.zeros((B,) + pad_shape, dtype)
            for i, s in enumerate(seqs):
                out[i] = s.mb_state[key]
            return jnp.asarray(out)

        tokens = np.zeros((B, self.cap_tokens), np.int32)
        cur_len = np.ones((B,), np.int32)
        eos = np.ones((B,), bool)  # padding rows inert
        iters = np.zeros((B,), np.int32)
        capacity = np.zeros((B,), np.int32)
        max_new = np.zeros((B,), np.int32)
        max_iters = np.ones((B,), np.int32)
        spawn_thr = np.full((B,), N, np.int32)
        la_start = np.zeros((B,), np.int32)
        for i, s in enumerate(seqs):
            sp = s.sampling_params
            tokens[i, : len(s)] = s.token_ids
            cur_len[i] = len(s)
            eos[i] = False
            iters[i] = s.jacobi_iters
            capacity[i] = min(self.block_manager.capacity_tokens(s), self.cap_tokens - 1)
            max_new[i] = max(0, s.max_tokens - s.num_completion_tokens)
            max_iters[i] = min(sp.jacobi_max_iterations, 2**30)
            spawn_thr[i] = (
                spawn_override if spawn_override is not None
                else int(math.ceil(sp.jacobi_spawn_ratio * N))
            )
            la_start[i] = (
                la_override if la_override is not None
                else int(math.ceil(sp.jacobi_lookahead_start_ratio * N))
            )

        bt = self._pad_block_table(seqs, B)
        prof = get_profiler()
        if prof:
            prof.record_bucket("jacobi_mr", (B, N, K, C))
            prof.start("forward")
        res = jacobi_chunk_multiblock(
            self.params, self.model_cfg, self.rope, self.kv,
            jnp.asarray(tokens), jnp.asarray(cur_len),
            stack("blk_draft", (K, N), np.int32), stack("blk_dlen", (K,), np.int32),
            stack("blk_acc", (K,), np.int32), stack("blk_acc_toks", (K, N), np.int32),
            stack("blk_base", (K,), np.int32), stack("blk_active", (K,), bool),
            stack("ra", (), np.int32), stack("n_active", (), np.int32),
            stack("pool", (C, W), np.int32), stack("pool_len", (C,), np.int32),
            stack("pool_next", (), np.int32), stack("last_next", (), np.int32),
            jnp.asarray(eos), jnp.asarray(iters), bt,
            jnp.asarray(capacity), jnp.asarray(max_new), eos_id, pad_id,
            jnp.asarray(spawn_thr), jnp.asarray(la_start), jnp.asarray(max_iters),
            N=N, K=K, C=C, W=W,
            chunk_budget=self.config.jacobi_chunk_tokens,
            chunk_iters=self.config.jacobi_chunk_iters,
        )
        self.kv = res["kv"]
        # one batched transfer (fresh per-array readbacks each pay a tunnel RTT)
        host = jax.device_get({k: v for k, v in res.items() if k != "kv"})
        toks = host["tokens"]
        cur_out = host["cur_len"]
        iters_out = host["iters"]
        gen = host["generated"]
        if prof:
            prof.stop("forward")
            prof.add_tokens(int(gen[: len(seqs)].sum()))
            prof.add_iteration(int(iters_out[: len(seqs)].sum() - iters[: len(seqs)].sum()))
        per_seq = {
            k: host[k]
            for k in ("blk_draft", "blk_dlen", "blk_acc", "blk_acc_toks",
                      "blk_base", "blk_active", "ra", "n_active", "pool",
                      "pool_len", "pool_next", "last_next")
        }
        for i, s in enumerate(seqs):
            new = toks[i, len(s) : cur_out[i]].tolist()
            s.extend_tokens(new)
            s.num_cached_tokens = len(s) - 1
            s.jacobi_iters = int(iters_out[i])
            for k, arr in per_seq.items():
                s.mb_state[k] = arr[i]
            self.stats["generated_tokens"] += int(gen[i])
        self.stats["jacobi_iterations"] += int(iters_out[: len(seqs)].sum() - iters[: len(seqs)].sum())
        # device while-loop trips this chunk = the slowest row's iterations
        # (same occupancy accounting as _jacobi_chunk)
        self.stats["chunk_forwards"] += int(
            (iters_out[: len(seqs)] - iters[: len(seqs)]).max(initial=0)
        )
        self.stats["chunk_calls"] += 1
        for name, n in zip(("mr_full", "mr_nocand", "mr_ra_only"),
                           host["tiers"].tolist()):
            self.stats[name] = self.stats.get(name, 0) + int(n)

    # ------------------------------------------------------------------
    def _onpolicy_block(
        self, seqs: List[Sequence], L: int, top_k: int, use_top_p: bool,
        greedy_mode: bool = False, accept_threshold: float = 0.0,
    ) -> None:
        """Run one on-policy rollout block per sequence; append records.

        Reference record format: jacobi_decoding_nongreedy_on_policy.py:7-34
        and generate_rollout_records_batch (:493-627)."""
        B = _bucket(len(seqs), self.config.batch_buckets)
        tokens = np.zeros((B, self.cap_tokens), np.int32)
        cur_len = np.ones((B,), np.int32)
        block_init = np.zeros((B, L), np.int32)
        gen_len = np.zeros((B,), np.int32)
        active = np.zeros((B,), bool)
        capacity = np.zeros((B,), np.int32)
        temps = np.ones((B,), np.float32)
        top_ps = np.ones((B,), np.float32)
        pad_id = max(self.config.pad, 0)

        stops = [t for t in self.config.stop_token_ids]
        if self.config.eos >= 0 and self.config.eos not in stops:
            stops.append(self.config.eos)
        if not stops:
            stops = [-1]
        stops_arr = np.full((max(4, len(stops)),), -1, np.int32)
        stops_arr[: len(stops)] = stops

        prefixes = []
        for i, s in enumerate(seqs):
            n = len(s)
            tokens[i, :n] = s.token_ids
            cur_len[i] = n
            gl = min(L, max(0, s.max_tokens - s.num_completion_tokens))
            gen_len[i] = gl
            active[i] = gl > 0 and not s.op_stopped
            capacity[i] = min(self.block_manager.capacity_tokens(s), self.cap_tokens - 1)
            temps[i] = s.sampling_params.temperature
            top_ps[i] = s.sampling_params.top_p
            prefixes.append(list(s.token_ids))
            # prompt-conditioned draft init (on_policy.py:254-265)
            choices = [t for t in s.token_ids if t != pad_id]
            if choices:
                block_init[i, :gl] = self.rng.choice(choices, size=gl)
            else:
                block_init[i, :gl] = self.rng.randint(0, self.model_cfg.vocab_size, gl)
            block_init[i, gl:] = pad_id

        bt = self._pad_block_table(seqs, B)
        res = runner.jacobi_onpolicy_block(
            self.params, self.model_cfg, self.rope, self.kv,
            jnp.asarray(tokens), jnp.asarray(cur_len), jnp.asarray(block_init),
            jnp.asarray(gen_len), jnp.asarray(active), bt, jnp.asarray(capacity),
            jnp.asarray(temps), jnp.asarray(top_ps), self._next_key(),
            jnp.asarray(stops_arr), pad_id, top_k=top_k, use_top_p=use_top_p,
            greedy_mode=greedy_mode, accept_threshold=accept_threshold,
        )
        self.kv = res["kv"]
        # one batched transfer (fresh per-array readbacks each pay a tunnel RTT)
        tokens_out, cur_out, iters_out, fwds_out, stopped_out, traj_out = (
            jax.device_get((res["tokens"], res["cur_len"], res["iters"],
                            res["fwds"], res["stopped"], res["traj"]))
        )

        for i, s in enumerate(seqs):
            if not active[i]:
                continue
            new = tokens_out[i, len(s) : cur_out[i]].tolist()
            s.extend_tokens(new)
            s.num_cached_tokens = len(s) - 1
            s.op_iters += int(iters_out[i])
            s.op_fwds += int(fwds_out[i])
            s.op_stopped = bool(stopped_out[i])
            s.jacobi_iters += 1  # block count (on-policy max_iterations = blocks)
            n_it = int(iters_out[i])
            total_toks = s.num_completion_tokens
            s.rollout_records.append({
                "diffusion_itr_id": f"itr_{len(s.rollout_records)}",
                "prompt_ids": prefixes[i],
                "answer_trajectory_ids": traj_out[i, : n_it + 1].tolist(),
                "teacher_output_ids": None,  # max-filled at retirement
                "tokens_per_iter": total_toks / max(s.op_iters, 1),
                "tokens_per_forward": total_toks / max(s.op_fwds, 1),
                "num_iters": s.op_iters,
                "num_forwards": s.op_fwds,
            })
            self.stats["generated_tokens"] += len(new)
            self.stats["jacobi_iterations"] += n_it

    # ------------------------------------------------------------------
    def exit(self) -> None:
        """Release device buffers (reference LLMEngine.exit joins workers and
        unlinks SharedMemory, llm_engine.py:59-78 — here just the KV pool)."""
        self._pending.clear()
        self.kv = None
        self.params = None
        from jacobiforcing_tpu.parallel.mesh import get_serving_mesh, set_serving_mesh

        if get_serving_mesh() is self.mesh:
            set_serving_mesh(None)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.exit()
        return False

    # ------------------------------------------------------------------
    def generate_stream(
        self,
        prompt_token_ids: List[int],
        sampling_params: SamplingParams,
    ):
        """Stream newly committed tokens per engine step (reference:
        applications/jacobi_streaming_driver.py per-chunk callbacks).  The
        Jacobi chunk budget (config.jacobi_chunk_tokens) sets the streaming
        granularity.  Yields lists of new token ids."""
        seq = self.add_request(prompt_token_ids, sampling_params)
        emitted = 0
        while not seq.is_finished:
            self.step()
            new = seq.completion_token_ids[emitted:]
            if new:
                emitted += len(new)
                yield new

    def warmup(
        self,
        *,
        strategies: PySeq[str] = ("ar", "jacobi"),
        block_lens: Optional[PySeq[int]] = None,
        batch_buckets: Optional[PySeq[int]] = None,
        prefill_token_buckets: Optional[PySeq[int]] = None,
    ) -> Dict[str, float]:
        """Precompile the engine's jit buckets by driving synthetic requests.

        TPU analog of the reference's CUDA-graph capture at init
        (model_runner.py:1552-1658: one AR graph per batch bucket, one Jacobi
        graph per (bs, L)): here each (shape bucket, strategy) pair is one
        cached XLA executable, and without warmup the first real request in a
        bucket pays its ~20-40s compile.  Requests run through the real
        scheduler/prefill/decode path, so warmed shapes match serving shapes
        exactly; generated tokens are discarded and KV pages are freed when
        the dummy requests complete.

        Opt-in and potentially slow (one XLA compile per bucket; the full
        default grid is ~25 executables).  Deployments that know their
        shapes should narrow the lists.  `strategies` may include "ar",
        "jacobi", "jacobi_nongreedy", and "mr".  Returns {warm_tag: seconds}.
        """
        cfg = self.config
        bbs = list(batch_buckets if batch_buckets is not None else cfg.batch_buckets)
        tbs = list(
            prefill_token_buckets
            if prefill_token_buckets is not None
            else cfg.prefill_token_buckets
        )
        Ls = list(block_lens if block_lens is not None else [cfg.jacobi_block_len])
        V = self.model_cfg.vocab_size
        timings: Dict[str, float] = {}

        def sp_for(strategy: str, L: int) -> SamplingParams:
            if strategy == "ar":
                return SamplingParams(temperature=0.0, max_tokens=2)
            if strategy == "jacobi_nongreedy":
                return SamplingParams(
                    temperature=0.7, max_tokens=2,
                    decode_strategy="jacobi_nongreedy",
                    jacobi_block_len=L, jacobi_max_blocks=1,
                )
            if strategy == "mr":
                return SamplingParams(
                    temperature=0.0, max_tokens=2,
                    decode_strategy="jacobi_multiblock_rejection_recycling",
                    jacobi_block_len=L, jacobi_max_blocks=cfg.jacobi_max_blocks,
                    jacobi_n_gram_pool_size=cfg.jacobi_n_gram_pool_size,
                )
            return SamplingParams(
                temperature=0.0, max_tokens=2, decode_strategy="jacobi",
                jacobi_block_len=L, jacobi_max_blocks=1,
            )

        def run(tag: str, n_prompts: int, prompt_len: int, strategy: str, L: int):
            t0 = time.perf_counter()
            prompts = [
                self.rng.randint(1, V, prompt_len).tolist()
                for _ in range(n_prompts)
            ]
            self.generate(prompts, sp_for(strategy, L))
            timings[tag] = round(time.perf_counter() - t0, 2)

        strategies = list(strategies)
        if "mr" in strategies and self.config.jacobi_mr_auto_policy:
            # the MR auto-policy's single arm runs the plain jacobi chunk
            # program and its re-entry uses the AR decode step — warm both,
            # or the arm's first probe pays their compile walls mid-serving
            # (the policy discards that sample, but the wall is still real)
            for extra in ("jacobi", "ar"):
                if self.config.jacobi_mr_single_arm and extra not in strategies:
                    strategies.append(extra)
        for strategy in strategies:
            for L in Ls if strategy != "ar" else [0]:
                ltag = f"_L{L}" if L else ""
                for B in bbs:  # one decode executable per batch bucket
                    run(f"{strategy}{ltag}_B{B}", B, 32, strategy, L)
                for T in tbs:  # one prefill executable per token bucket
                    plen = min(T - L, cfg.max_model_len - L - 8)
                    if plen <= 0:
                        continue
                    run(f"prefill_{strategy}{ltag}_T{T}", 1, plen, strategy, L)
        # warmup traffic (compile walls of seconds per bucket) must not seed
        # the MR auto-policy's measurements — mr_policy.py docstring
        self._mr_policies.clear()
        return timings

    def generate(
        self,
        prompt_token_ids: List[List[int]],
        sampling_params: SamplingParams | List[SamplingParams],
        use_tqdm: bool = False,
    ) -> List[Dict[str, Any]]:
        """Blocking batch generation (reference llm_engine.py:142-202)."""
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompt_token_ids)
        seqs = [self.add_request(p, sp) for p, sp in zip(prompt_token_ids, sampling_params)]
        t0 = time.perf_counter()
        pbar = None
        if use_tqdm:
            from tqdm import tqdm

            pbar = tqdm(total=len(seqs), desc="generate")
        gen0 = self.stats["generated_tokens"]
        done = 0
        while not self.scheduler.is_finished:
            finished = self.step()
            if pbar is not None:
                done += len(finished)
                dt = max(time.perf_counter() - t0, 1e-9)
                pbar.update(len(finished))
                pbar.set_postfix(
                    {"tok/s": f"{(self.stats['generated_tokens'] - gen0) / dt:.1f}"}
                )
        if pbar is not None:
            pbar.close()
        dt = time.perf_counter() - t0
        self.stats["wall_s"] = dt
        outs = []
        for s in seqs:
            out = {"token_ids": s.completion_token_ids}
            if self.tokenizer is not None:
                out["text"] = self.tokenizer.decode(s.completion_token_ids)
            if s.rollout_records:
                # max-fill teacher_output_ids with the final full sequence
                # (on_policy.py: teacher filled for ALL blocks at the end)
                full = list(s.token_ids)
                for rec in s.rollout_records:
                    rec["teacher_output_ids"] = full
                out["rollout_records"] = s.rollout_records
            outs.append(out)
        return outs
