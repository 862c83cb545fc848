"""ctypes bindings for the native host codecs (native/der_codec.c).

Compiled on demand with the system compiler and cached; every entry point
has a pure-Python fallback (utils/der.py), so the native path is a
throughput optimization, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "der_codec.c")
_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                          "secp256k1_zkp_tpu")
_SO = os.path.join(_CACHE_DIR, "der_codec.so")

_lib = None
_tried = False


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_CACHE_DIR, exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cc = os.environ.get("CC", "gcc")
    tmp = _SO + ".tmp"
    try:
        subprocess.run([cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                       check=True, capture_output=True, timeout=60)
        os.replace(tmp, _SO)
        return _SO
    except Exception:
        return None


def _get():
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so:
            try:
                lib = ctypes.CDLL(so)
                lib.secp_tpu_der_parse_batch.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
                lib.secp_tpu_der_serialize_batch.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_void_p]
                _lib = lib
            except OSError:
                _lib = None
    return _lib


def have_native() -> bool:
    return _get() is not None


def der_parse_batch(sigs: list[bytes]):
    """list of DER sigs -> (rs [n,64] uint8, ok [n] bool).

    Native batch parse; falls back to utils/der.py per-sig."""
    n = len(sigs)
    lib = _get()
    if lib is None:
        from . import der
        rs = np.zeros((n, 64), np.uint8)
        ok = np.zeros(n, bool)
        for i, s in enumerate(sigs):
            p = der.sig_der_parse(s)
            if p is not None:
                r, sv = p
                rs[i, :32] = np.frombuffer(r.to_bytes(32, "big"), np.uint8)
                rs[i, 32:] = np.frombuffer(sv.to_bytes(32, "big"), np.uint8)
                ok[i] = True
        return rs, ok
    data = b"".join(sigs)
    offs = np.zeros(n, np.int64)
    lens = np.zeros(n, np.int64)
    pos = 0
    for i, s in enumerate(sigs):
        offs[i] = pos
        lens[i] = len(s)
        pos += len(s)
    buf = np.frombuffer(data, np.uint8) if data else np.zeros(1, np.uint8)
    rs = np.zeros((n, 64), np.uint8)
    ok = np.zeros(n, np.uint8)
    lib.secp_tpu_der_parse_batch(
        buf.ctypes.data, offs.ctypes.data, lens.ctypes.data, n,
        rs.ctypes.data, ok.ctypes.data)
    return rs, ok.astype(bool)


def der_serialize_batch(rs: np.ndarray):
    """rs [n, 64] uint8 -> list of DER bytes."""
    n = rs.shape[0]
    lib = _get()
    if lib is None:
        from . import der
        out = []
        for i in range(n):
            r = int.from_bytes(bytes(rs[i, :32]), "big")
            s = int.from_bytes(bytes(rs[i, 32:]), "big")
            out.append(der.sig_der_serialize(r, s))
        return out
    rs = np.ascontiguousarray(rs, np.uint8)
    out = np.zeros((n, 72), np.uint8)
    lens = np.zeros(n, np.int64)
    lib.secp_tpu_der_serialize_batch(rs.ctypes.data, n, out.ctypes.data,
                                     lens.ctypes.data)
    return [bytes(out[i, :lens[i]]) for i in range(n)]
