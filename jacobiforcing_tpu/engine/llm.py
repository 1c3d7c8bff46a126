"""Public serving API (reference: inference_engine/llm.py:12-149).

    from jacobiforcing_tpu import LLM
    llm = LLM(model="/path/to/ckpt", tensor_parallel_size=1)
    outs = llm.generate(prompts, SamplingParams(max_tokens=128), greedy=True,
                        jacobi_decoding=True)

Like the reference, `generate` merges greedy/Jacobi convenience kwargs into
SamplingParams and delegates to the engine.
"""

from __future__ import annotations

from dataclasses import fields, replace
from typing import Any, Dict, List, Optional, Union

from jacobiforcing_tpu.config import Config, SamplingParams
from jacobiforcing_tpu.engine.llm_engine import LLMEngine


class LLM:
    def __init__(self, model: str = "", tokenizer=None, **kwargs):
        cfg_fields = {f.name for f in fields(Config)}
        cfg_kwargs = {k: v for k, v in kwargs.items() if k in cfg_fields}
        engine_kwargs = {k: v for k, v in kwargs.items() if k not in cfg_fields}
        config = Config(model=model, **cfg_kwargs)
        if tokenizer is None and model:
            try:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(config.model_path)
            except Exception:
                tokenizer = None
        self.engine = LLMEngine(config, tokenizer=tokenizer, **engine_kwargs)
        self.tokenizer = tokenizer

    def generate(
        self,
        prompts: Union[List[str], List[List[int]]],
        sampling_params: Optional[SamplingParams] = None,
        *,
        greedy: Optional[bool] = None,
        jacobi_decoding: Optional[bool] = None,
        jacobi_block_len: Optional[int] = None,
        jacobi_max_iterations: Optional[int] = None,
        use_tqdm: bool = False,
    ) -> List[Dict[str, Any]]:
        """Generate; kwargs merge into SamplingParams (reference llm.py:22-149)."""
        sp = sampling_params or SamplingParams()
        updates: Dict[str, Any] = {}
        if greedy:
            updates["temperature"] = 0.0
        if jacobi_decoding is not None:
            updates["decode_strategy"] = "jacobi" if jacobi_decoding else "autoregressive"
        if jacobi_block_len is not None:
            updates["jacobi_block_len"] = jacobi_block_len
        if jacobi_max_iterations is not None:
            updates["jacobi_max_iterations"] = jacobi_max_iterations
        if updates:
            sp = replace(sp, **updates)
        if sp.decode_strategy == "jacobi" and sp.temperature > 0 and not sp.jacobi_on_policy:
            sp = replace(sp, decode_strategy="jacobi_nongreedy")

        if prompts and isinstance(prompts[0], str):
            assert self.tokenizer is not None, "text prompts need a tokenizer"
            prompt_ids = [self.tokenizer.encode(p) for p in prompts]
        else:
            prompt_ids = prompts  # already token ids
        return self.engine.generate(prompt_ids, sp, use_tqdm=use_tqdm)

    def warmup(self, **kw):
        """Precompile serving buckets (see LLMEngine.warmup)."""
        return self.engine.warmup(**kw)

    @property
    def stats(self):
        return self.engine.stats

    def exit(self) -> None:
        self.engine.exit()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.exit()
        return False
