# MR throughput on TPU: 1.5B int8, batch of 4 MR requests via the engine
import time, numpy as np, jax, jax.numpy as jnp
from jacobiforcing_tpu.config import Config, SamplingParams
from jacobiforcing_tpu.engine.llm_engine import LLMEngine
from jacobiforcing_tpu.models.qwen import ModelConfig
from jacobiforcing_tpu.ops.quant import init_quantized_params

cfg_m = ModelConfig(vocab_size=151936, hidden_size=1536, intermediate_size=8960,
                    num_layers=28, num_heads=12, num_kv_heads=2, head_dim=128,
                    tie_word_embeddings=True)
params = init_quantized_params(cfg_m, jax.random.PRNGKey(0))
cfg = Config(max_model_len=2048, jacobi_chunk_tokens=256,
             prefill_token_buckets=(256, 512), batch_buckets=(1, 2, 4, 8))
eng = LLMEngine(cfg, model_cfg=cfg_m, params=params, num_kv_pages=64)
rng = np.random.RandomState(0)
prompts = [rng.randint(1, 151936, 128).tolist() for _ in range(4)]
sp = SamplingParams(temperature=0.0, max_tokens=512,
                    decode_strategy="jacobi_multiblock_rejection_recycling",
                    jacobi_block_len=64, jacobi_max_blocks=2,
                    jacobi_n_gram_pool_size=4, jacobi_spawn_ratio=0.85,
                    jacobi_max_iterations=4096)
# warm (compile)
eng.generate([prompts[0][:64]], SamplingParams(temperature=0.0, max_tokens=8,
    decode_strategy="jacobi_multiblock_rejection_recycling", jacobi_block_len=64,
    jacobi_max_blocks=2, jacobi_n_gram_pool_size=4, jacobi_max_iterations=64))
t0 = time.perf_counter()
outs = eng.generate(prompts, sp)
dt = time.perf_counter() - t0
toks = sum(len(o["token_ids"]) for o in outs)
iters = eng.stats["jacobi_iterations"]
print(f"MR batch=4: {toks} tokens in {dt:.1f}s = {toks/dt:.1f} tok/s raw "
      f"(TPF {toks/max(iters,1):.2f} on random weights; at TPF=4: {4*iters/dt:.0f} tok/s)")
