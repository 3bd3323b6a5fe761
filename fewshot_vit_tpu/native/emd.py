"""ctypes bindings + on-demand build for the exact C++ EMD solver.

Host-side parity tool for the on-device Sinkhorn path (see ``ops.emd``).
The shared library is compiled once with g++ into the package directory.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "emd_solver.cpp")
_LIB = os.path.join(_HERE, "libemd.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True, capture_output=True,
    )


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        d = ctypes.POINTER(ctypes.c_double)
        lib.emd_exact_batch.argtypes = [d, d, d, ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, d, d]
        lib.emd_exact_batch.restype = ctypes.c_int
        _lib = lib
    return _lib


def emd_exact(
    cost: np.ndarray, w1: np.ndarray, w2: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact EMD flows for batched problems.

    cost (B, N1, N2), w1 (B, N1), w2 (B, N2); each problem's marginals must
    have (near-)equal sums — weights are rebalanced to match exactly.
    Returns (flows (B, N1, N2), costs (B,)).
    """
    cost = np.ascontiguousarray(cost, np.float64)
    w1 = np.ascontiguousarray(w1, np.float64)
    w2 = np.ascontiguousarray(w2, np.float64)
    b, n1, n2 = cost.shape
    # rebalance (floating error between sides breaks the simplex)
    s1 = w1.sum(-1, keepdims=True)
    s2 = w2.sum(-1, keepdims=True)
    w2 = w2 * (s1 / s2)
    flows = np.zeros_like(cost)
    costs = np.zeros(b, np.float64)
    d = ctypes.POINTER(ctypes.c_double)
    rc = get_lib().emd_exact_batch(
        cost.ctypes.data_as(d), w1.ctypes.data_as(d), w2.ctypes.data_as(d),
        b, n1, n2, flows.ctypes.data_as(d), costs.ctypes.data_as(d),
    )
    if rc != 0:
        raise RuntimeError(f"emd_exact_batch failed with code {rc}")
    return flows, costs
