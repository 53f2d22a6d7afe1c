"""ctypes bindings for the native graph_core library (C++).

Loads ``native/libgraph_core.so`` (building it with ``make`` on first use
if a toolchain is available) and exposes the host-side preprocessing hot
paths — CSR construction, GCN normalization, uniform neighbor sampling —
with numpy-equivalent fallbacks when no compiler exists. Every function
returns bit-identical results to its numpy fallback (tested in
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

__all__ = [
    "available",
    "coo_to_csr_perm",
    "gcn_norm_weights",
    "uniform_sample",
    "in_degree",
]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraph_core.so")


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL | None:
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "graph_core.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.kgt_coo_to_csr.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
    ]
    lib.kgt_gcn_norm.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64, f32p,
    ]
    lib.kgt_uniform_sample.argtypes = [
        i32p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
        i64p,
    ]
    lib.kgt_in_degree.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i64p]
    return lib


def available() -> bool:
    """True when the native library is loadable (builds it if needed)."""
    return _lib() is not None


def coo_to_csr_perm(
    receivers: np.ndarray, num_nodes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Stable receiver sort: returns ``(perm [E] int64, row_ptr [N+1] int64)``."""
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = receivers.shape[0]
    lib = _lib()
    if lib is None:
        perm = np.argsort(receivers, kind="stable").astype(np.int64)
        row_ptr = np.zeros(num_nodes + 1, np.int64)
        np.cumsum(
            np.bincount(receivers, minlength=num_nodes), out=row_ptr[1:]
        )
        return perm, row_ptr
    perm = np.empty(e, np.int64)
    row_ptr = np.empty(num_nodes + 1, np.int64)
    lib.kgt_coo_to_csr(receivers, e, num_nodes, perm, row_ptr)
    return perm, row_ptr


def gcn_norm_weights(
    senders: np.ndarray, receivers: np.ndarray, num_nodes: int
) -> np.ndarray:
    """Symmetric GCN edge weights (reference utils/main.py:22-33 numerics)."""
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    e = senders.shape[0]
    lib = _lib()
    if lib is None:
        deg = np.bincount(receivers, minlength=num_nodes).astype(np.float64)
        inv = np.power(deg + 1e-12, -0.5)
        inv[np.isinf(inv)] = 0.0
        return (inv[receivers] * inv[senders]).astype(np.float32)
    out = np.empty(e, np.float32)
    lib.kgt_gcn_norm(senders, receivers, e, num_nodes, out)
    return out


def uniform_sample(
    sorted_senders: np.ndarray,
    row_ptr: np.ndarray,
    seeds: np.ndarray,
    fanout: int,
    seed: int = 0,
) -> np.ndarray:
    """Uniform in-neighbor sampling: ``[len(seeds), fanout]`` int64, -1 pad."""
    sorted_senders = np.ascontiguousarray(sorted_senders, np.int32)
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    b = seeds.shape[0]
    lib = _lib()
    if lib is None:
        rng = np.random.default_rng(seed)
        out = np.full((b, fanout), -1, np.int64)
        for i, v in enumerate(seeds):
            lo, hi = int(row_ptr[v]), int(row_ptr[v + 1])
            deg = hi - lo
            if deg == 0:
                continue
            if deg <= fanout:
                out[i, :deg] = sorted_senders[lo:hi]
            else:
                pick = rng.choice(deg, size=fanout, replace=False)
                out[i] = sorted_senders[lo + pick]
        return out
    out = np.empty(b * fanout, np.int64)
    lib.kgt_uniform_sample(
        sorted_senders, row_ptr, seeds, b, fanout, seed, out
    )
    return out.reshape(b, fanout)


def in_degree(receivers: np.ndarray, num_nodes: int) -> np.ndarray:
    receivers = np.ascontiguousarray(receivers, np.int32)
    lib = _lib()
    if lib is None:
        return np.bincount(receivers, minlength=num_nodes).astype(np.int64)
    out = np.empty(num_nodes, np.int64)
    lib.kgt_in_degree(receivers, receivers.shape[0], num_nodes, out)
    return out
