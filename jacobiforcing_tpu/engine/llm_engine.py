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
    ):
        self.config = config
        if params is None:
            from jacobiforcing_tpu.utils.loader import load_checkpoint

            model_cfg, params = load_checkpoint(config.model_path)
        assert model_cfg is not None
        self.model_cfg = model_cfg
        self.params = params
        self.tokenizer = tokenizer
        if tokenizer is not None and config.eos < 0:
            config.eos = tokenizer.eos_token_id
        self.rope = rope_table(model_cfg)

        page = config.kvcache_page_size
        npages = num_kv_pages or (config.num_kv_pages if config.num_kv_pages > 0 else None)
        if npages is None:
            npages = self._pages_from_hbm(page, kv_dtype or model_cfg.dtype)
        self.kv = alloc_kv_cache(
            model_cfg.num_layers, npages, page, model_cfg.num_kv_heads,
            model_cfg.head_dim, kv_dtype or model_cfg.dtype,
        )
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
            "ar_steps": 0, "chunk_calls": 0,
        }

    # ------------------------------------------------------------------
    def _pages_from_hbm(self, page: int, kv_dtype) -> int:
        """Size the KV pool from free device memory (reference
        model_runner.py:523-648 sizes from free VRAM with a hard cap)."""
        mc = self.model_cfg
        bytes_per_tok = (
            2 * mc.num_layers * mc.num_kv_heads * mc.head_dim
            * jnp.dtype(kv_dtype).itemsize
        )
        try:
            dev = jax.devices()[0]
            free = dev.memory_stats().get("bytes_limit", 8 << 30) * self.config.hbm_utilization
            used = dev.memory_stats().get("bytes_in_use", 0)
            avail = max(free - used, 1 << 28)
        except Exception:
            avail = 4 << 30
        npages = int(avail // (bytes_per_tok * page))
        return max(16, min(npages, 40_000))  # reference's 40k hard cap

    # ------------------------------------------------------------------
    SUPPORTED_STRATEGIES = {"autoregressive", "jacobi"}

    def add_request(self, token_ids: List[int], sampling_params: SamplingParams) -> Sequence:
        strat = sampling_params.decode_strategy
        if strat not in self.SUPPORTED_STRATEGIES:
            # Matches the reference's engine-side guard for declared-unsupported
            # strategies (model_runner.py:1468-1473; test expects
            # NotImplementedError for jacobi_multiblock_rejection_recycling).
            raise NotImplementedError(f"decode_strategy {strat!r} not supported yet")
        seq = Sequence(token_ids, sampling_params)
        self.scheduler.add(seq)
        return seq

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------
    def step(self) -> List[Sequence]:
        seqs, is_prefill = self.scheduler.schedule()
        if not seqs:
            return []
        if is_prefill:
            self._run_prefill(seqs)
        else:
            self._run_decode(seqs)
        self.scheduler.postprocess(seqs)
        return [s for s in seqs if s.is_finished]

    # ------------------------------------------------------------------
    def _pad_block_table(self, seqs: List[Sequence], B: int) -> jnp.ndarray:
        bt = np.full((B, self.pages_bucket), -1, np.int32)
        for i, s in enumerate(seqs):
            tab = s.block_table[: self.pages_bucket]
            bt[i, : len(tab)] = tab
        return jnp.asarray(bt)

    def _run_prefill(self, seqs: List[Sequence]) -> None:
        cfgb = self.config.batch_buckets
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

        T = _bucket(max(len(x) for x in suffixes), self.config.prefill_token_buckets)
        ids = np.zeros((B, T), np.int32)
        for i, x in enumerate(suffixes):
            ids[i, : len(x)] = x[:T]
        starts_a = np.zeros((B,), np.int32)
        totals_a = np.ones((B,), np.int32)
        prompts_a = np.ones((B,), np.int32)
        starts_a[: len(seqs)] = starts
        totals_a[: len(seqs)] = totals
        prompts_a[: len(seqs)] = prompts_l

        bt = self._pad_block_table(seqs, B)
        self.kv, last_logits, draft = runner.prefill(
            self.params, self.model_cfg, self.rope, jnp.asarray(ids),
            jnp.asarray(starts_a), jnp.asarray(totals_a), jnp.asarray(prompts_a),
            self.kv, bt, n_out=n_out,
        )
        last_logits = np.asarray(last_logits, np.float32)
        draft = np.asarray(draft)
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
        ar = [s for s in seqs if not s.sampling_params.decode_strategy.startswith("jacobi")]
        jac = [s for s in seqs if s.sampling_params.decode_strategy.startswith("jacobi")]
        if ar:
            self._ar_step(ar)
        groups: Dict[tuple, List[Sequence]] = {}
        for s in jac:
            k = (s.sampling_params.jacobi_block_len, s.sampling_params.ignore_eos)
            groups.setdefault(k, []).append(s)
        for (L, ignore_eos), group in groups.items():
            self._jacobi_chunk(group, L, -1 if ignore_eos else self.config.eos)

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
        self.kv, next_tokens = runner.ar_decode_step(
            self.params, self.model_cfg, self.rope, self.kv,
            jnp.asarray(last), jnp.asarray(lens), bt, jnp.asarray(active),
            jnp.asarray(temps), self._next_key(),
        )
        next_tokens = np.asarray(next_tokens)
        for i, s in enumerate(seqs):
            s.extend_tokens([int(next_tokens[i])])
            s.num_cached_tokens = len(s) - 1
            self.stats["generated_tokens"] += 1
        self.stats["ar_steps"] += 1

    def _jacobi_chunk(self, seqs: List[Sequence], L: int, eos_id: int) -> None:
        B = _bucket(len(seqs), self.config.batch_buckets)
        tokens = np.zeros((B, self.cap_tokens), np.int32)
        cur_len = np.ones((B,), np.int32)
        eos = np.ones((B,), bool)  # padding rows inert
        iters = np.zeros((B,), np.int32)
        capacity = np.zeros((B,), np.int32)
        max_new = np.zeros((B,), np.int32)
        draft = np.zeros((B, L), np.int32)

        for i, s in enumerate(seqs):
            n = len(s)
            tokens[i, :n] = s.token_ids
            cur_len[i] = n
            eos[i] = False
            iters[i] = s.jacobi_iters
            capacity[i] = min(
                self.block_manager.capacity_tokens(s), self.cap_tokens - 1
            )
            max_new[i] = max(0, s.max_tokens - s.num_completion_tokens)
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

        bt = self._pad_block_table(seqs, B)
        res = runner.jacobi_chunk_greedy(
            self.params, self.model_cfg, self.rope, self.kv,
            jnp.asarray(tokens), jnp.asarray(cur_len), jnp.asarray(draft),
            jnp.asarray(eos), jnp.asarray(iters), bt, jnp.asarray(capacity),
            jnp.asarray(max_new), self._next_key(), eos_id,
            chunk_budget=self.config.jacobi_chunk_tokens,
            max_iters=self.config.jacobi_max_iterations,
        )
        self.kv = res["kv"]
        tokens_out = np.asarray(res["tokens"])
        cur_out = np.asarray(res["cur_len"])
        iters_out = np.asarray(res["iters"])
        draft_out = np.asarray(res["draft"])
        gen = np.asarray(res["generated"])

        for i, s in enumerate(seqs):
            new = tokens_out[i, len(s) : cur_out[i]].tolist()
            s.extend_tokens(new)
            s.num_cached_tokens = len(s) - 1
            s.draft = draft_out[i]
            s.jacobi_iters = int(iters_out[i])
            self.stats["generated_tokens"] += int(gen[i])
        self.stats["jacobi_iterations"] += int(iters_out[: len(seqs)].sum() - iters[: len(seqs)].sum())
        self.stats["chunk_calls"] += 1

    # ------------------------------------------------------------------
    def generate(
        self,
        prompt_token_ids: List[List[int]],
        sampling_params: SamplingParams | List[SamplingParams],
    ) -> List[Dict[str, Any]]:
        """Blocking batch generation (reference llm_engine.py:142-202)."""
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompt_token_ids)
        seqs = [self.add_request(p, sp) for p, sp in zip(prompt_token_ids, sampling_params)]
        t0 = time.perf_counter()
        while not self.scheduler.is_finished:
            self.step()
        dt = time.perf_counter() - t0
        self.stats["wall_s"] = dt
        outs = []
        for s in seqs:
            out = {"token_ids": s.completion_token_ids}
            if self.tokenizer is not None:
                out["text"] = self.tokenizer.decode(s.completion_token_ids)
            outs.append(out)
        return outs
