"""ctypes bindings for the native graph builder (csrc/sig_native.cpp).

Build-on-first-use: the .so is compiled with the repo Makefile when missing
or older than its source, then memoized for the process.  All functions are
safe to call without a toolchain — ``native_available()`` just returns False
and callers fall back to the Python/scipy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO, "csrc")
_SO = os.path.join(_CSRC, "libsig_native.so")
_SRC = os.path.join(_CSRC, "sig_native.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_if_needed() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not _build_if_needed():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64, f64, vp = ctypes.c_int64, ctypes.c_double, ctypes.c_void_p
        pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.sig_build_state.restype = vp
        lib.sig_build_state.argtypes = [i64, i64, f64, f64, pf64, f64, f64,
                                        f64, f64, f64, f64, f64]
        lib.sig_state_nnz_s.restype = i64
        lib.sig_state_nnz_s.argtypes = [vp]
        lib.sig_state_nnz_q.restype = i64
        lib.sig_state_nnz_q.argtypes = [vp]
        lib.sig_state_export.restype = None
        lib.sig_state_export.argtypes = [vp, pi64, pi64, pf64, pi64, pi64,
                                         pf64, pi64]
        lib.sig_state_free.restype = None
        lib.sig_state_free.argtypes = [vp]
        lib.sig_native_num_threads.restype = ctypes.c_int
        lib.sig_native_num_threads.argtypes = []
        pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.sig_greedy_round.restype = i64
        lib.sig_greedy_round.argtypes = [i64, i64, pi64, pi64, pf64, pi64,
                                         pi64, pf64, pi64, pi32, pi32]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_num_threads() -> int:
    lib = _load()
    return int(lib.sig_native_num_threads()) if lib is not None else 0


def build_state_csr_native(sta_locs: np.ndarray, params, cutoff: float
                           ) -> Tuple["object", "object", np.ndarray, np.ndarray]:
    """(S_csr, Q_csr, h_max, asso) from user coordinates via the C++ builder.

    ``sta_locs`` must already be in the caller's desired (e.g. spatial) order;
    ``params`` is an :class:`sig_sdp_mmw_tpu.env.env.EnvParams`.  Raises
    RuntimeError if the native library is unavailable — callers that want the
    automatic fallback go through :func:`env.large.generate_large_state_csr`.
    """
    import scipy.sparse

    from sig_sdp_mmw_tpu.env import phy

    lib = _load()
    if lib is None:
        raise RuntimeError("native builder unavailable (no toolchain?)")

    p = params
    K = int(sta_locs.shape[0])
    xy = np.ascontiguousarray(sta_locs, dtype=np.float64)
    h = lib.sig_build_state(
        K, int(p.cell_size), float(p.cell_edge), float(p.grid_edge), xy,
        float(p.fre_Hz), float(phy.noise_dbm(p.bandwidth)),
        float(p.min_sinr_db), float(p.min_sinr), float(p.txp_offset),
        float(p.min_s_n_ratio), float(cutoff))
    if not h:
        raise RuntimeError("sig_build_state failed")
    try:
        nnz_s = lib.sig_state_nnz_s(h)
        nnz_q = lib.sig_state_nnz_q(h)
        S_indptr = np.empty(K + 1, np.int64)
        S_indices = np.empty(nnz_s, np.int64)
        S_data = np.empty(nnz_s, np.float64)
        Q_indptr = np.empty(K + 1, np.int64)
        Q_indices = np.empty(nnz_q, np.int64)
        h_max = np.empty(K, np.float64)
        asso = np.empty(K, np.int64)
        lib.sig_state_export(h, S_indptr, S_indices, S_data, Q_indptr,
                             Q_indices, h_max, asso)
    finally:
        lib.sig_state_free(h)

    S = scipy.sparse.csr_matrix((S_data, S_indices, S_indptr), shape=(K, K))
    Q = scipy.sparse.csr_matrix((np.ones(nnz_q), Q_indices, Q_indptr),
                                shape=(K, K))
    return S, Q, h_max, asso


def greedy_round_native(StT_csr, Q_csr, h_max: np.ndarray,
                        user_order: np.ndarray, slot_order: np.ndarray,
                        Z: int) -> Tuple[np.ndarray, int]:
    """One greedy rounding scan via the C++ loop (sig_greedy_round).

    ``StT_csr``: CSR whose row k lists k's S-row neighbors with gains
    S[k, j] (= ``build_st_csr(S, Q).T``); ``slot_order`` [K, Z] int32 slots
    in decreasing preference.  Returns (slot_of int32 with -1 unassigned,
    remainder).  Raises RuntimeError when the native library is missing.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native rounding unavailable (no toolchain?)")
    K = StT_csr.shape[0]
    slot_of = np.empty(K, np.int32)
    rem = lib.sig_greedy_round(
        K, int(Z),
        np.ascontiguousarray(StT_csr.indptr, np.int64),
        np.ascontiguousarray(StT_csr.indices, np.int64),
        np.ascontiguousarray(StT_csr.data, np.float64),
        np.ascontiguousarray(Q_csr.indptr, np.int64),
        np.ascontiguousarray(Q_csr.indices, np.int64),
        np.ascontiguousarray(h_max, np.float64),
        np.ascontiguousarray(user_order, np.int64),
        np.ascontiguousarray(slot_order, np.int32),
        slot_of)
    if rem < 0:
        raise RuntimeError("sig_greedy_round: invalid arguments")
    return slot_of, int(rem)
