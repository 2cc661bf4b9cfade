"""ctypes bindings for the C++ runtime library (wsdl_native.cpp).

Auto-builds on first use if the shared object is missing (g++ is part of the
baked toolchain). The native pieces mirror the reference's two third-party
C-extension dependencies (SURVEY.md §2.2): dense-CRF mean field (pydensecrf)
and connected components (skimage).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libwsdl_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    if not hasattr(lib, "wsdl_io_submit"):
        # stale prebuilt library from before the IO runtime existed: rebuild.
        # dlopen dedups by (dev, inode) and the linker truncates in place, so
        # unlink first to guarantee the rebuilt object gets a fresh identity.
        del lib
        os.unlink(_LIB_PATH)
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)

    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    i32p = ctypes.POINTER(ctypes.c_int32)

    lib.wsdl_densecrf.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, u8p,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.wsdl_permutohedral_filter.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
    ]
    lib.wsdl_label_components.argtypes = [ctypes.c_int, ctypes.c_int, u8p, i32p]
    lib.wsdl_label_components.restype = ctypes.c_int
    lib.wsdl_keep_largest.argtypes = [ctypes.c_int, ctypes.c_int, u8p, u8p]
    lib.wsdl_io_start.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.wsdl_io_submit.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
    lib.wsdl_io_submit.restype = ctypes.c_int
    lib.wsdl_io_flush.argtypes = []
    lib.wsdl_io_flush.restype = ctypes.c_int
    if hasattr(lib, "wsdl_io_flush_errors"):
        lib.wsdl_io_flush_errors.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.wsdl_io_flush_errors.restype = ctypes.c_int
    lib.wsdl_png_write.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
    lib.wsdl_png_write.restype = ctypes.c_int
    _lib = lib
    return lib


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def densecrf(
    unary: np.ndarray,          # [H,W,L] negative log-probs
    rgb: np.ndarray,            # [H,W,3] uint8
    gauss_sxy: float = 1.0,
    gauss_compat: float = 2.0,
    bilat_sxy: float = 50.0,
    bilat_srgb: float = 5.0,
    bilat_compat: float = 10.0,
    n_iters: int = 5,
    exact: bool = False,
) -> np.ndarray:
    """Mean-field dense-CRF marginals [H,W,L]. exact=True runs the O(N²)
    brute-force golden (test scale only)."""
    lib = _load()
    H, W, L = unary.shape
    u = _f32(unary.reshape(H * W, L))
    img = np.ascontiguousarray(rgb, np.uint8)
    out = np.empty((H * W, L), np.float32)
    lib.wsdl_densecrf(
        H, W, L,
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        gauss_sxy, gauss_compat, bilat_sxy, bilat_srgb, bilat_compat,
        n_iters, 1 if exact else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape(H, W, L)


def permutohedral_filter(positions: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Raw lattice Gaussian filter: positions [N,d], values [N,C] → [N,C]."""
    lib = _load()
    N, d = positions.shape
    C = values.shape[1]
    pos = _f32(positions)
    val = _f32(values)
    out = np.empty((N, C), np.float32)
    lib.wsdl_permutohedral_filter(
        N, d, C,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        val.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def label_components(mask: np.ndarray) -> np.ndarray:
    """8-connected labels: -1 background, else min-pixel-index component id."""
    lib = _load()
    H, W = mask.shape
    m = np.ascontiguousarray(mask != 0, np.uint8)
    out = np.empty((H, W), np.int32)
    lib.wsdl_label_components(
        H, W,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def _png_args(arr: np.ndarray):
    a = np.ascontiguousarray(arr, np.uint8)
    if a.ndim == 2:
        H, W, C = a.shape[0], a.shape[1], 1
    elif a.ndim == 3 and a.shape[2] in (1, 3):
        H, W, C = a.shape[0], a.shape[1], a.shape[2]
    else:
        raise ValueError(f"expected [H,W], [H,W,1] or [H,W,3] uint8, got {arr.shape}")
    return a, H, W, C


def png_write_async(path: str, arr: np.ndarray) -> None:
    """Enqueue a PNG write on the native writer pool and return immediately.

    The pool copies the pixels synchronously, so the caller may reuse/free
    `arr`. Call :func:`io_flush` before any stage that reads the files — the
    reference pipeline communicates between stages via these directories
    (PsuedoMasks.py:31-36; SURVEY.md §5 checkpoint/resume).
    """
    lib = _load()
    a, H, W, C = _png_args(arr)
    rc = lib.wsdl_io_submit(
        path.encode(), H, W, C, a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise OSError(f"wsdl_io_submit failed for {path}")


def png_write(path: str, arr: np.ndarray) -> None:
    """Synchronous native PNG write (encode + write on the calling thread)."""
    lib = _load()
    a, H, W, C = _png_args(arr)
    rc = lib.wsdl_png_write(
        path.encode(), H, W, C, a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise OSError(f"wsdl_png_write failed for {path}")


def io_flush_report() -> tuple[int, list[str]]:
    """Durability barrier that REPORTS instead of raising: block until every
    queued PNG write completed, then return (failure_count, detail_lines)
    where each detail line is "<path>: <reason>" (first few failures only —
    count > len(lines) means some failures carry no path detail)."""
    lib = _load()
    if hasattr(lib, "wsdl_io_flush_errors"):
        buf = ctypes.create_string_buffer(4096)
        failures = lib.wsdl_io_flush_errors(buf, len(buf))
        detail = buf.value.decode(errors="replace")
        return failures, [ln for ln in detail.splitlines() if ln]
    return lib.wsdl_io_flush(), []  # stale prebuilt library


def io_flush() -> None:
    """Durability barrier: block until every queued PNG write completed.

    Raises OSError naming the failed path(s) and errno — a durability
    failure must be diagnosable, not just countable."""
    failures, lines = io_flush_report()
    if failures:
        detail = "\n".join(lines) or "(no detail)"
        raise OSError(f"{failures} asynchronous PNG writes failed:\n{detail}")


def keep_largest(mask: np.ndarray) -> np.ndarray:
    lib = _load()
    H, W = mask.shape
    m = np.ascontiguousarray(mask != 0, np.uint8)
    out = np.empty((H, W), np.uint8)
    lib.wsdl_keep_largest(
        H, W,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out
