"""ctypes binding for the native C++ block manager (native/block_manager.cpp).

Drop-in replacement for the Python BlockManager (same duck-typed interface
used by the scheduler/engine); auto-builds the shared library on first use
when a toolchain is available, otherwise the caller falls back to Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from jacobiforcing_tpu.engine.sequence import Sequence

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def load_native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) libjf_native.so; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.abspath(os.path.join(_NATIVE_DIR, "libjf_native.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "block_manager.cpp"))
    try:
        if not os.path.exists(path) or (
            os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(path)
        ):
            subprocess.run(
                ["make", "-C", os.path.dirname(path)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(path)
    except Exception:
        return None
    lib.jf_bm_create.restype = ctypes.c_void_p
    lib.jf_bm_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.jf_bm_destroy.argtypes = [ctypes.c_void_p]
    lib.jf_bm_num_free.restype = ctypes.c_int
    lib.jf_bm_num_free.argtypes = [ctypes.c_void_p]
    lib.jf_bm_allocate_prompt.restype = ctypes.c_int
    lib.jf_bm_allocate_prompt.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.jf_bm_ensure_capacity.restype = ctypes.c_int
    lib.jf_bm_ensure_capacity.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.jf_bm_deallocate.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.jf_bm_get_table.restype = ctypes.c_int
    lib.jf_bm_get_table.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.jf_bm_prefix_hits.restype = ctypes.c_long
    lib.jf_bm_prefix_hits.argtypes = [ctypes.c_void_p]
    lib.jf_bm_prefix_queries.restype = ctypes.c_long
    lib.jf_bm_prefix_queries.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


class NativeBlockManager:
    """Same interface as engine.block_manager.BlockManager, C++-backed."""

    def __init__(self, num_pages: int, page_size: int):
        lib = load_native_lib()
        if lib is None:
            raise RuntimeError("native block manager unavailable")
        self._lib = lib
        self._bm = lib.jf_bm_create(num_pages, page_size)
        self.page_size = page_size
        self.num_pages = num_pages

    def __del__(self):
        try:
            if getattr(self, "_bm", None):
                self._lib.jf_bm_destroy(self._bm)
                self._bm = None
        except Exception:
            pass

    # ---- stats ----
    @property
    def num_free_pages(self) -> int:
        return self._lib.jf_bm_num_free(self._bm)

    @property
    def prefix_cache_hits(self) -> int:
        return self._lib.jf_bm_prefix_hits(self._bm)

    @property
    def prefix_cache_queries(self) -> int:
        return self._lib.jf_bm_prefix_queries(self._bm)

    # ---- interface ----
    def can_allocate(self, seq: Sequence, margin_tokens: int = 0) -> bool:
        need = (len(seq) + margin_tokens + self.page_size - 1) // self.page_size
        return need <= self.num_free_pages

    def _sync_table(self, seq: Sequence) -> None:
        n = len(seq.block_table) + 64
        while True:
            buf = (ctypes.c_int32 * n)()
            got = self._lib.jf_bm_get_table(self._bm, seq.seq_id, buf, n)
            if got <= n:
                seq.block_table = list(buf[:got])
                return
            n = got

    def allocate_prompt(self, seq: Sequence, margin_tokens: int = 0) -> int:
        toks = np.asarray(seq.token_ids, np.int32)
        cached = self._lib.jf_bm_allocate_prompt(
            self._bm, seq.seq_id,
            toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(toks), margin_tokens,
        )
        if cached < 0:
            raise RuntimeError("out of KV pages")
        self._sync_table(seq)
        seq.num_cached_tokens = cached
        return cached

    def ensure_capacity(self, seq: Sequence, upto_tokens: int) -> bool:
        ok = bool(self._lib.jf_bm_ensure_capacity(self._bm, seq.seq_id, upto_tokens))
        # sync even on failure: partial progress keeps the appended pages
        # (python BlockManager semantics)
        self._sync_table(seq)
        return ok

    def deallocate(self, seq: Sequence) -> None:
        self._lib.jf_bm_deallocate(self._bm, seq.seq_id)
        seq.block_table = []
        seq.num_cached_tokens = 0

    def capacity_tokens(self, seq: Sequence) -> int:
        return len(seq.block_table) * self.page_size
