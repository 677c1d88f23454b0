"""ctypes bindings for the native async frame writer.

The writer owns a background thread: `submit` copies the framebuffer and
returns immediately; quantize + encode + disk write happen off the render
loop (the reference does all of this synchronously per frame,
camera.cu:211-215). Falls back silently when the .so isn't built —
tracer.render.driver then writes synchronously via tracer.io.image.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libtracer_io.so")

FORMATS = {"bin": 0, "ppm": 1}


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.tracer_writer_create.restype = ctypes.c_void_p
    lib.tracer_writer_submit.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.tracer_writer_pending.argtypes = [ctypes.c_void_p]
    lib.tracer_writer_pending.restype = ctypes.c_int
    lib.tracer_writer_failures.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
    ]
    lib.tracer_writer_failures.restype = ctypes.c_int
    lib.tracer_writer_wait.argtypes = [ctypes.c_void_p]
    lib.tracer_writer_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


class AsyncFrameWriter:
    """Async writer for 'bin' and 'ppm' frames.

    The queue is bounded (4 frames): submit blocks when the disk falls
    behind, and wait() raises OSError if any write failed."""

    def __init__(self):
        lib = _load()
        assert lib is not None, "libtracer_io.so not built (make -C tracer/io/native)"
        self._lib = lib
        self._handle = lib.tracer_writer_create()

    def submit(self, path: str, framebuffer: np.ndarray, samples_per_pixel: int,
               fmt: str = "bin") -> None:
        fb = np.ascontiguousarray(framebuffer, np.float32)
        h, w, _ = fb.shape
        self._lib.tracer_writer_submit(
            self._handle, fb.reshape(-1), w, h,
            1.0 / float(samples_per_pixel), path.encode(), FORMATS[fmt],
        )

    def pending(self) -> int:
        return self._lib.tracer_writer_pending(self._handle)

    def wait(self) -> None:
        """Drain the queue; raises if any write failed."""
        self._lib.tracer_writer_wait(self._handle)
        buf = ctypes.create_string_buffer(512)
        failures = self._lib.tracer_writer_failures(self._handle, buf, len(buf))
        if failures:
            raise OSError(
                f"async frame writer: {failures} write(s) failed "
                f"({buf.value.decode(errors='replace')})"
            )

    def close(self) -> None:
        if self._handle:
            self._lib.tracer_writer_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        self.close()
