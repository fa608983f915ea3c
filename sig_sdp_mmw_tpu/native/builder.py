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
        lib.sig_bcsr_maxblk.restype = i64
        lib.sig_bcsr_maxblk.argtypes = [i64, i64, i64, i64, pi64, pi64]
        lib.sig_bcsr_pack.restype = ctypes.c_int
        lib.sig_bcsr_pack.argtypes = [i64, i64, i64, i64, i64, pi64, pi64,
                                      pf64, pi32, vp, ctypes.c_int, vp, vp,
                                      vp, vp, vp]
        lib.sig_bcsr_gram_maps.restype = i64
        lib.sig_bcsr_gram_maps.argtypes = [i64, i64, i64, i64, pi32, pi32,
                                           pi32, pi32, i64, pi32, pi32]
        pf32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.sig_bcsr_sym_weights.restype = None
        lib.sig_bcsr_sym_weights.argtypes = [i64, pi64, pi64, pf32]
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


def bcsr_pack_native(M_csr, block, pad_rows_to: Optional[int] = None,
                     dtype=np.float32, return_entry_maps: bool = False):
    """BlockEll arrays from a canonical (column-sorted) scipy CSR matrix via
    the C++ packer — the multithreaded twin of
    ``ops.bcsr._bcsr_arrays_np`` with the value cast fused into the scatter
    (bf16 output never materializes an f32 block array).

    Returns ``(bcols, blocks, Kp)`` or, with ``return_entry_maps``,
    ``(bcols, blocks, Kp, (ebr, eslot, erloc, ecloc))`` with int64 maps —
    bit-identical to the numpy path (tests/test_native.py).  Raises
    RuntimeError when the native library is unavailable.
    """
    import math

    lib = _load()
    if lib is None:
        raise RuntimeError("native BCSR packer unavailable (no toolchain?)")
    Br, Bc = (block, block) if isinstance(block, int) else map(int, block)
    M = M_csr.tocsr()
    if not M.has_sorted_indices:
        M.sort_indices()
    K = M.shape[0]
    lcm = Br * Bc // math.gcd(Br, Bc)
    Kp = pad_rows_to or ((K + lcm - 1) // lcm) * lcm
    Kbr = Kp // Br
    indptr = np.ascontiguousarray(M.indptr, np.int64)
    indices = np.ascontiguousarray(M.indices, np.int64)
    data = np.ascontiguousarray(M.data, np.float64)
    maxblk = int(lib.sig_bcsr_maxblk(K, Kp, Br, Bc, indptr, indices))
    if maxblk < 0:
        raise RuntimeError("sig_bcsr_maxblk: invalid arguments")

    dt = np.dtype(dtype)
    if dt == np.float32:
        code, store = 0, np.float32
    elif dt.name == "bfloat16":
        code, store = 1, np.uint16
    else:
        raise ValueError(f"unsupported pack dtype {dt}")
    bcols = np.zeros((Kbr, maxblk), np.int32)
    blocks = np.zeros(Kbr * Br * maxblk * Bc, store)
    nnz = M.nnz
    if return_entry_maps:
        maps = [np.empty(nnz, np.int32) for _ in range(5)]
        map_ptrs = [m.ctypes.data_as(ctypes.c_void_p) for m in maps]
    else:
        maps, map_ptrs = None, [None] * 5
    rc = lib.sig_bcsr_pack(K, Kp, Br, Bc, maxblk, indptr, indices, data,
                           bcols, blocks.ctypes.data_as(ctypes.c_void_p),
                           code, *map_ptrs)
    if rc != 0:
        raise RuntimeError("sig_bcsr_pack failed")
    blocks = (blocks.view(dt) if code == 1 else blocks
              ).reshape(Kbr, Br, maxblk, Bc)
    if return_entry_maps:
        # (ebr, eslot, erloc, ecloc, epos) — int32, CSR entry order.
        return bcols, blocks, Kp, tuple(maps)
    return bcols, blocks, Kp


def bcsr_gram_maps_native(ebr: np.ndarray, eslot: np.ndarray,
                          erloc: np.ndarray, ecloc: np.ndarray,
                          maxblk: int, Br: int, Bc: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """(g_src, g_dst) [maxblk, max_e] from the packer's int32 entry maps —
    the counting-sort twin of the numpy stable-argsort grouping in
    ``ops.bcsr.bcsr_operands_from_state`` (bit-identical, entry order
    preserved within each slot; unfilled g_dst slots hold nnz = the sink).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native gram maps unavailable (no toolchain?)")
    nnz = int(eslot.shape[0])
    counts = np.bincount(eslot, minlength=maxblk)
    max_e = max(int(counts.max(initial=0)), 1)
    g_src = np.zeros((maxblk, max_e), np.int32)
    g_dst = np.full((maxblk, max_e), nnz, np.int32)
    rc = lib.sig_bcsr_gram_maps(
        nnz, int(maxblk), int(Br), int(Bc),
        np.ascontiguousarray(ebr, np.int32),
        np.ascontiguousarray(eslot, np.int32),
        np.ascontiguousarray(erloc, np.int32),
        np.ascontiguousarray(ecloc, np.int32), max_e, g_src, g_dst)
    if rc < 0:
        raise RuntimeError("sig_bcsr_gram_maps failed")
    return g_src, g_dst


def bcsr_sym_weights_native(M_csr) -> np.ndarray:
    """[nnz] float32 symmetrization weights in CSR entry order — 0.5 where
    the transpose entry exists, else 1.0 (the scipy P - 0.5 * P.*P^T pattern
    arithmetic of ``ops.bcsr.bcsr_operands_from_state``, entrywise)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native weights unavailable (no toolchain?)")
    M = M_csr
    w = np.empty(M.nnz, np.float32)
    lib.sig_bcsr_sym_weights(M.shape[0],
                             np.ascontiguousarray(M.indptr, np.int64),
                             np.ascontiguousarray(M.indices, np.int64), w)
    return w


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
