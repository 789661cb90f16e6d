"""Native (C++) runtime components, reached via ctypes.

Currently: the async chunked checkpoint writer (ckpt.cpp). The shared
library is built on first use with g++ and cached next to the source;
if no toolchain is available everything degrades to a pure-Python
fallback with identical on-disk format.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
import zlib

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libckpt.so")
_SRC = os.path.join(_DIR, "ckpt.cpp")

_lib = None
_lib_lock = threading.Lock()


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC, "-o", _SO],
        check=True, capture_output=True)


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.ckpt_open.restype = ctypes.c_void_p
            lib.ckpt_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.ckpt_write.restype = ctypes.c_int64
            lib.ckpt_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
            lib.ckpt_flush.restype = ctypes.c_int
            lib.ckpt_flush.argtypes = [ctypes.c_void_p]
            lib.ckpt_written.restype = ctypes.c_int64
            lib.ckpt_written.argtypes = [ctypes.c_void_p]
            lib.ckpt_close.restype = ctypes.c_int
            lib.ckpt_close.argtypes = [ctypes.c_void_p]
            lib.ckpt_scan.restype = ctypes.c_int64
            lib.ckpt_scan.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_uint64),
                                      ctypes.POINTER(ctypes.c_uint64),
                                      ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = False
        return _lib


class CheckpointWriter:
    """Async append-only record writer (length-prefix + CRC32)."""

    def __init__(self, path, append=False):
        self.path = path
        if append and os.path.exists(path):
            # truncate any corrupt/partial tail left by a crash, so the
            # appended records remain reachable by the reader
            valid_end = _valid_prefix_end(path)
            if valid_end < os.path.getsize(path):
                with open(path, "r+b") as f:
                    f.truncate(valid_end)
        lib = _load()
        self._native = bool(lib)
        if self._native:
            self._h = lib.ckpt_open(path.encode(), 1 if append else 0)
            if not self._h:
                raise OSError(f"can't open {path}")
        else:
            self._f = open(path, "ab" if append else "wb")

    def write(self, payload: bytes):
        if self._native:
            rc = _load().ckpt_write(self._h, payload, len(payload))
            if rc < 0:
                raise OSError("checkpoint write failed")
        else:
            crc = zlib.crc32(payload) & 0xFFFFFFFF
            self._f.write(struct.pack("<QI", len(payload), crc))
            self._f.write(payload)
            self._f.flush()

    def flush(self):
        if self._native:
            if _load().ckpt_flush(self._h) != 0:
                raise OSError("checkpoint flush failed")

    def close(self):
        if self._native:
            _load().ckpt_close(self._h)
            self._h = None
        else:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _valid_prefix_end(path):
    """Byte offset of the end of the last valid record."""
    end = 0
    with open(path, "rb") as f:
        while True:
            hdr = f.read(12)
            if len(hdr) < 12:
                break
            ln, crc = struct.unpack("<QI", hdr)
            if ln > 1 << 40:
                break
            payload = f.read(ln)
            if len(payload) < ln or (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
                break
            end += 12 + ln
    return end


def read_records(path):
    """All valid records in a checkpoint file (stops at first corrupt
    or partial record, preserving crash-resume semantics)."""
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(12)
            if len(hdr) < 12:
                break
            ln, crc = struct.unpack("<QI", hdr)
            if ln > 1 << 40:
                break
            payload = f.read(ln)
            if len(payload) < ln:
                break
            if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
                break
            out.append(payload)
    return out


def scan_count(path):
    """Number of valid records (via the native scanner when built)."""
    lib = _load()
    if lib:
        n = lib.ckpt_scan(path.encode(), (ctypes.c_uint64 * 0)(),
                          (ctypes.c_uint64 * 0)(), 0)
        return max(int(n), 0)
    return len(read_records(path))
