"""JacobiForcing-TPU: a TPU-native framework for causal parallel (Jacobi) decoding.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hao-ai-lab/JacobiForcing (reference: /root/reference):

  * a serving engine with paged KV cache, continuous batching, prefix caching,
    tensor parallelism over a device mesh, and batched Jacobi decoding
    (reference: inference_engine/),
  * greedy / rejection-sampling / on-policy Jacobi decoders
    (reference: inference_engine/engine/jacobi_decoding*.py),
  * multiblock decoding with rejection recycling
    (reference: modeling/*multiblock_lookahead_unified.py),
  * a trainer for the AR + progressive-consistency loss over packed
    noise-scheduled Jacobi trajectories (reference: JacobiForcing/train/),
  * the trajectory-collection + packing data pipeline
    (reference: generate_trajectory/).

Unlike the reference (host-driven CUDA/torch), the decode fixed-point loop here
lives on device as one jitted `lax.while_loop`; KV "trims" are length-counter
decrements; sharding is declarative over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from jacobiforcing_tpu.config import Config, SamplingParams  # noqa: F401

__all__ = ["Config", "SamplingParams", "LLM"]


def __getattr__(name):
    # Lazy import to keep `import jacobiforcing_tpu` light.
    if name == "LLM":
        try:
            from jacobiforcing_tpu.engine.llm import LLM
        except ImportError as e:  # pragma: no cover
            raise AttributeError(
                "jacobiforcing_tpu.LLM is not available: "
                f"engine.llm failed to import ({e})"
            ) from e
        return LLM
    raise AttributeError(name)
