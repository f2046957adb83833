"""ctypes binding for the native fast file reader/writer (csrc/fastio.cpp).

Built on demand by ``make -C csrc`` into wholegraph_tpu/lib/libwgtpu_io.so
(the binary is not committed; this module builds it at first import if a
toolchain is present).  The Python loader (file_io.py) falls back to
pure-numpy reads/writes when the library can't be built.  This mirrors the
reference's split between the plain loader and the multi-threaded native
loaders (file_io.cpp:413-1121).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "lib", "libwgtpu_io.so")
_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _build() -> None:
    src = os.path.join(_CSRC, "fastio.cpp")
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return
    proc = subprocess.run(
        ["make", "-C", _CSRC],
        capture_output=True,
        timeout=120,
    )
    if proc.returncode != 0:
        err = (proc.stderr or proc.stdout or b"").decode(errors="replace")[-2000:]
        raise RuntimeError(
            f"make -C {_CSRC} failed (rc={proc.returncode}):\n{err}"
        )


try:  # pragma: no cover - exercised indirectly
    _build()
except Exception as e:
    # callers catch ImportError and fall back to numpy IO; carry the compiler
    # output so a broken toolchain is diagnosable instead of a silent demotion
    import warnings

    warnings.warn(f"wholegraph_tpu native io unavailable, using numpy IO: {e}")
    raise ImportError(f"native io library not built: {e}") from e

_lib = ctypes.CDLL(_LIB_PATH)
_lib.wgtpu_read_rows_v2.restype = ctypes.c_int
_lib.wgtpu_read_rows_v2.argtypes = [
    ctypes.POINTER(ctypes.c_char_p),
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_int64),
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.POINTER(ctypes.c_ubyte),
    ctypes.c_int,
    ctypes.c_int,
]

_lib.wgtpu_write_rows.restype = ctypes.c_int
_lib.wgtpu_write_rows.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_ubyte),
    ctypes.c_int64,
    ctypes.c_int,
]

DEFAULT_THREADS = min(os.cpu_count() or 4, 16)

# O_DIRECT (page-cache bypass) for cold bulk loads; per-file fallback to
# buffered IO where the filesystem refuses it (reference _directio variants,
# file_io.cpp:883,1121).
DIRECT_IO = os.environ.get("WGTPU_DIRECT_IO", "0") == "1"


def read_rows_native(
    filelist: Sequence[str],
    file_starts: np.ndarray,
    entry_size: int,
    lo: int,
    hi: int,
    out: np.ndarray,
    nthreads: int = DEFAULT_THREADS,
    direct: bool | None = None,
) -> None:
    """Read global rows [lo, hi) of the filelist into out (uint8 flat)."""
    assert out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]
    assert out.size >= (hi - lo) * entry_size
    paths = (ctypes.c_char_p * len(filelist))(
        *[p.encode() for p in filelist]
    )
    starts = np.ascontiguousarray(file_starts, dtype=np.int64)
    rc = _lib.wgtpu_read_rows_v2(
        paths,
        len(filelist),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        entry_size,
        lo,
        hi,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        nthreads,
        1 if (DIRECT_IO if direct is None else direct) else 0,
    )
    if rc != 0:
        raise OSError(rc, f"native read failed: {os.strerror(rc)}")


def write_rows_native(path: str, data: np.ndarray, nthreads: int = DEFAULT_THREADS) -> None:
    """Write a host array to ``path`` with threaded pwrite (the store_to_file
    analog; reference file_io.cpp store/multithread variants)."""
    flat = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    rc = _lib.wgtpu_write_rows(
        path.encode(),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        flat.size,
        nthreads,
    )
    if rc != 0:
        raise OSError(rc, f"native write failed: {os.strerror(rc)}")
