"""ctypes binding to the native IO library
(seqrec_tpu/native_src/seqrec_io.cc).

The shared library is built on first use with ``g++ -O3`` into a
writable cache directory (site-packages may be read-only for installed
distributions); all entry points degrade to the pure-Python parsers
when the toolchain or the build is unavailable, so the framework never
hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_PKG_ROOT, "native_src", "seqrec_io.cc")
_BUILD_DIR = os.environ.get("SEQREC_NATIVE_BUILD_DIR") or os.path.join(
    os.path.expanduser("~"), ".cache", "seqrec_tpu", "native"
)
_LIB_PATH = os.path.join(_BUILD_DIR, "libseqrec_io.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


class _SeqData(ctypes.Structure):
    _fields_ = [
        ("items", ctypes.POINTER(ctypes.c_int32)),
        ("ratings", ctypes.POINTER(ctypes.c_float)),
        ("offsets", ctypes.POINTER(ctypes.c_int64)),
        ("users", ctypes.POINTER(ctypes.c_int64)),
        ("n_seq", ctypes.c_int64),
        ("n_interactions", ctypes.c_int64),
    ]


class _TripletData(ctypes.Structure):
    _fields_ = [
        ("users", ctypes.POINTER(ctypes.c_int64)),
        ("items", ctypes.POINTER(ctypes.c_int32)),
        ("ratings", ctypes.POINTER(ctypes.c_float)),
        ("n", ctypes.c_int64),
    ]


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                _SRC,
                "-o",
                _LIB_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("SEQREC_NO_NATIVE"):
            _lib_failed = True
            return None
        if not os.path.isfile(_LIB_PATH) or (
            os.path.isfile(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not os.path.isfile(_SRC) or not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.seqrec_load_sequences.restype = ctypes.POINTER(_SeqData)
        lib.seqrec_load_sequences.argtypes = [ctypes.c_char_p]
        lib.seqrec_free_sequences.argtypes = [ctypes.POINTER(_SeqData)]
        lib.seqrec_load_triplets.restype = ctypes.POINTER(_TripletData)
        lib.seqrec_load_triplets.argtypes = [ctypes.c_char_p]
        lib.seqrec_free_triplets.argtypes = [ctypes.POINTER(_TripletData)]
        _lib = lib
        return _lib


def load_sequences_native(filename: str):
    """Parse a sequences file natively. Returns (items, ratings, offsets,
    users) numpy arrays, or None when the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ptr = lib.seqrec_load_sequences(filename.encode())
    if not ptr:
        return None
    d = ptr.contents
    try:
        items = np.ctypeslib.as_array(d.items, shape=(d.n_interactions,)).copy()
        ratings = np.ctypeslib.as_array(d.ratings, shape=(d.n_interactions,)).copy()
        offsets = np.ctypeslib.as_array(d.offsets, shape=(d.n_seq + 1,)).copy()
        users = np.ctypeslib.as_array(d.users, shape=(d.n_seq,)).copy()
    finally:
        lib.seqrec_free_sequences(ptr)
    return items, ratings, offsets, users


def load_triplets_native(filename: str):
    """Parse a triplets file natively → (users, items, ratings) or None."""
    lib = get_lib()
    if lib is None:
        return None
    ptr = lib.seqrec_load_triplets(filename.encode())
    if not ptr:
        return None
    d = ptr.contents
    try:
        users = np.ctypeslib.as_array(d.users, shape=(d.n,)).copy()
        items = np.ctypeslib.as_array(d.items, shape=(d.n,)).copy()
        ratings = np.ctypeslib.as_array(d.ratings, shape=(d.n,)).copy()
    finally:
        lib.seqrec_free_triplets(ptr)
    return users, items, ratings
