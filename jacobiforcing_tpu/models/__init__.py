from jacobiforcing_tpu.models.qwen import (  # noqa: F401
    ModelConfig,
    init_params,
    forward,
    logits_at,
    greedy_tokens,
    rope_table,
)
