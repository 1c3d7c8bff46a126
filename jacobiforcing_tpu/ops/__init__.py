from jacobiforcing_tpu.ops.kv_cache import KVCache, alloc_kv_cache, write_kv, gather_pages  # noqa: F401
from jacobiforcing_tpu.ops.attention import paged_attention  # noqa: F401
