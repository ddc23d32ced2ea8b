"""Native (C++) runtime components, built on demand with the system g++.

`io_stream`: double-buffered streaming reader/writer for the huge
[CELLS, NFREQ] cell-frequency files (absorbed.data / emitted.data) -- the
prefetch thread overlaps disk IO with the device solve, and the file never
has to fit in host memory.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None


def _build():
    src = os.path.join(_DIR, "io_stream.cpp")
    out = os.path.join(_DIR, "libsocio.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        # per-pid temp name: concurrent builders (parallel pytest workers,
        # simultaneous CLI runs) each write their own file and race only
        # on the atomic rename, never on the compiler output
        tmp = "%s.%d.tmp" % (out, os.getpid())
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", tmp])
        os.replace(tmp, out)
    return out


def lib():
    global _LIB
    if _LIB is None:
        so = _build()
        L = ctypes.CDLL(so)
        L.socio_reader_open.restype = ctypes.c_void_p
        L.socio_reader_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        L.socio_reader_next.restype = ctypes.c_int64
        L.socio_reader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        L.socio_reader_close.argtypes = [ctypes.c_void_p]
        L.socio_writer_open.restype = ctypes.c_void_p
        L.socio_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                        ctypes.c_int64]
        L.socio_writer_put.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64]
        L.socio_writer_close.argtypes = [ctypes.c_void_p]
        _LIB = L
    return _LIB


class StreamReader:
    """Iterate a cell-frequency file in prefetched row chunks."""

    def __init__(self, path, batch):
        rows = ctypes.c_int64()
        cols = ctypes.c_int64()
        self._h = lib().socio_reader_open(
            str(path).encode(), batch, ctypes.byref(rows),
            ctypes.byref(cols))
        if not self._h:
            raise IOError("cannot open %s" % path)
        self.rows = rows.value
        self.cols = cols.value
        self.batch = batch

    def __iter__(self):
        buf = np.empty((self.batch, self.cols), np.float32)
        while True:
            got = lib().socio_reader_next(
                self._h, buf.ctypes.data_as(ctypes.c_void_p))
            if got <= 0:
                break
            yield buf[:got].copy()

    def close(self):
        if self._h:
            lib().socio_reader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class StreamWriter:
    """Background-threaded writer of a cell-frequency file."""

    def __init__(self, path, rows, cols):
        self._h = lib().socio_writer_open(str(path).encode(), rows, cols)
        if not self._h:
            raise IOError("cannot open %s" % path)
        self.cols = cols

    def put(self, chunk):
        chunk = np.ascontiguousarray(chunk, np.float32)
        lib().socio_writer_put(
            self._h, chunk.ctypes.data_as(ctypes.c_void_p),
            chunk.shape[0])

    def close(self):
        if self._h:
            lib().socio_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
