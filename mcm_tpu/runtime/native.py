"""ctypes bindings + build for the native host decoder.

The shared object is compiled on first use (g++ -O3 -march=native against
libjpeg) and cached next to the source; environments without a toolchain or
libjpeg fall back to the PIL pipeline transparently
(:func:`native_available` gates the fast path).

Distribution note: a prebuilt ``_libmcmdecoder.so`` is only trusted when
its sibling ``.host`` tag matches this machine's CPU (``-march=native``
code SIGILLs elsewhere) — ship BOTH files, or ship ``decoder.cpp`` and let
the target rebuild; a bare ``.so`` without tag or source is treated as
stale and the loader degrades to PIL with a warning.

``MCM_TPU_DISABLE_NATIVE=1`` forces the PIL path (used by the
cross-implementation parity goldens: the native resize matches PIL only to
±2 LSB)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import warnings
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decoder.cpp")
_SO = os.path.join(_DIR, "_libmcmdecoder.so")
_TAG = _SO + ".host"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _host_tag() -> str:
    """Identifies the CPU the .so was built for: -march=native code moved
    to a different machine (shared checkout, copied venv) would SIGILL at
    first call — dlopen can't detect that, so the cache key must."""
    import hashlib
    import platform
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        pass
    return (platform.machine() + ":"
            + hashlib.md5(flags.encode()).hexdigest()[:12])


def _build() -> bool:
    # compile to a temp path and rename into place: concurrent builders
    # (multi-process tests, multihost launch) each publish a complete .so
    # atomically, and a killed/timed-out g++ can't leave a fresh-mtime
    # garbage file that poisons every future process
    tmp = f"{_SO}.build.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", tmp, "-ljpeg", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True,
                       timeout=240)
        os.replace(tmp, _SO)
        with open(_TAG, "w") as f:
            f.write(_host_tag())
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        warnings.warn(f"native decoder build failed ({detail[:400]}); "
                      "falling back to PIL")
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _is_stale() -> bool:
    if not os.path.exists(_SO):
        return True
    if os.path.exists(_SRC) and os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        return True
    try:
        with open(_TAG) as f:
            return f.read().strip() != _host_tag()
    except OSError:
        return True  # unknown provenance — rebuild rather than risk SIGILL


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    # escape hatch for bit-exact-vs-PIL runs (cross-implementation parity
    # goldens): the native resize is PIL-parity only to ±2 LSB
    if os.environ.get("MCM_TPU_DISABLE_NATIVE"):
        return None
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if _is_stale():
            if not os.path.exists(_SRC):  # prebuilt .so shipped w/o source
                _failed = True
                warnings.warn("native decoder source missing and no "
                              "host-matched prebuilt library; "
                              "falling back to PIL")
                return None
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as first_err:
            # A truly corrupt cache (truncated .so) should be healed, but
            # NEVER by unlinking: a transient dlopen failure (EMFILE/
            # ENOMEM) in this process would delete a valid library other
            # processes just built or are about to load.  Rebuild once —
            # os.replace publishes atomically, so worst case we overwrite
            # a valid cache with identical content — and only then give up
            # (leaving the cache for processes that can load it).
            lib = None
            if os.path.exists(_SRC) and _build():
                try:
                    lib = ctypes.CDLL(_SO)
                except OSError:
                    pass
            if lib is None:
                warnings.warn(f"native decoder load failed ({first_err}); "
                              "falling back to PIL")
                _failed = True
                return None
        lib.mcm_decode_one.restype = ctypes.c_int
        lib.mcm_decode_one.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        lib.mcm_decode_batch.restype = ctypes.c_int
        lib.mcm_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        # hasattr, not direct access: a prebuilt .so from before the
        # serving path shipped without decoder.cpp predates this symbol —
        # the batch path must keep working, mem decode falls back to PIL
        if hasattr(lib, "mcm_decode_mem"):
            lib.mcm_decode_mem.restype = ctypes.c_int
            lib.mcm_decode_mem.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        if hasattr(lib, "mcm_decode_mem_batch"):
            lib.mcm_decode_mem_batch.restype = ctypes.c_int
            lib.mcm_decode_mem_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def default_decode_threads() -> int:
    """Decode-pool width when the caller doesn't pin one — shared by the
    file/memory batch entry points and DataPipeline so the policy can't
    drift between the offline and serving paths."""
    return min(32, os.cpu_count() or 4)


def decode_one(path: str, size: int = 224,
               fast: bool = False) -> Optional[np.ndarray]:
    """uint8 [size, size, 3] or None if the native path can't decode it."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((size, size, 3), dtype=np.uint8)
    rc = lib.mcm_decode_one(
        os.fsencode(path), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), int(fast))
    return out if rc == 0 else None


def decode_one_mem(data: bytes, size: int = 224,
                   fast: bool = False) -> Optional[np.ndarray]:
    """Decode one in-memory JPEG (serving request body) → uint8
    [size, size, 3], or None if the native path can't decode it (caller
    falls back to PIL, which also covers non-JPEG formats)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mcm_decode_mem"):
        return None
    out = np.empty((size, size, 3), dtype=np.uint8)
    rc = lib.mcm_decode_mem(
        data, len(data), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), int(fast))
    return out if rc == 0 else None


def decode_mem_batch(datas: Sequence[bytes], size: int = 224,
                     n_threads: int = 0, fast: bool = False
                     ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Threaded in-memory variant of :func:`decode_batch` (serving bulk
    requests): (uint8 [N, size, size, 3], status [N]) — status≠0 rows
    failed and must be re-decoded by the PIL fallback.  (None, None)
    when the native library (or the symbol, on a prebuilt .so) is
    unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "mcm_decode_mem_batch"):
        return None, None
    n = len(datas)
    out = np.empty((n, size, size, 3), dtype=np.uint8)
    status = np.zeros((n,), dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*datas)
    lens = (ctypes.c_long * n)(*[len(d) for d in datas])
    n_threads = n_threads or default_decode_threads()
    lib.mcm_decode_mem_batch(
        arr, lens, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads, int(fast),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, status


def decode_batch(paths: Sequence[str], size: int = 224,
                 n_threads: int = 0, fast: bool = False,
                 out: Optional[np.ndarray] = None
                 ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """(uint8 [N, size, size, 3], status [N]) — status≠0 rows failed and
    must be re-decoded by the fallback.  (None, None) when unavailable.

    ``out``: optional preallocated C-contiguous uint8 [N, size, size, 3]
    decode target — the hot pipeline decodes straight into its padded
    batch buffer instead of paying an extra ~38 MB zero-fill + memcpy per
    batch (failed rows may hold partial writes; the caller's fallback
    overwrites them)."""
    lib = _load()
    if lib is None:
        return None, None
    n = len(paths)
    if out is None:
        out = np.empty((n, size, size, 3), dtype=np.uint8)
    elif (out.shape != (n, size, size, 3) or out.dtype != np.uint8
            or not out.flags.c_contiguous):
        raise ValueError(f"out must be C-contiguous uint8 "
                         f"[{n}, {size}, {size}, 3]")
    status = np.zeros((n,), dtype=np.int32)
    # fsencode, not str.encode: surrogateescape filenames (as os.listdir
    # yields them) must reach the decoder as their on-disk bytes, not
    # crash the whole batch with UnicodeEncodeError
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    n_threads = n_threads or default_decode_threads()
    lib.mcm_decode_batch(
        arr, n, size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n_threads, int(fast), status.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int)))
    return out, status
