"""Native data-loader bindings (ctypes over graph_detr4d_tpu/native/
loader.cpp). Compiled on first use with g++; falls back cleanly when the
toolchain or libjpeg is unavailable — callers check `available()`.

The hot host-side path (12 JPEG decodes + resize/crop/flip + normalize per
sample) runs multithreaded in C++ outside the GIL, replacing the
reference's torch-DataLoader-worker + mmcv-imgproc native path.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "libgrd4dloader.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    # compile to a process-private temp name, then rename: the .so lives
    # on a shared filesystem (multi-host ranks), and a concurrent
    # process dlopen-ing a half-written file corrupts its load
    tmp = f"{_SO}.tmp.{os.getpid()}"
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        tmp,
        "-ljpeg",
        "-lpthread",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    try:
        # prebuilt .so shipped without the source: just use it
        return os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    except OSError:
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if _needs_build():
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.grd4d_load_images.restype = ctypes.c_int
        lib.grd4d_load_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.grd4d_load_images_u8.restype = ctypes.c_int
        lib.grd4d_load_images_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_images(
    paths,
    *,
    resize: float = 1.0,
    crop_xy=(0, 0),
    out_hw,
    flip: bool = False,
    mean=(123.675, 116.28, 103.53),  # RGB, img_norm_cfg
    std=(58.395, 57.12, 57.375),
    num_threads: int = 0,
    raw_uint8: bool = False,
) -> np.ndarray:
    """Decode + fused resize/crop/flip (+ normalize) a camera set.

    Returns (len(paths), out_h, out_w, 3) float32 — or RAW uint8 with
    `raw_uint8=True` (no normalization; the device_normalize serving
    path, 1/4 the host->device bytes). Raises RuntimeError on
    unreadable/corrupt files or when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (g++/libjpeg)")
    n = len(paths)
    out_h, out_w = out_hw
    c_paths = (ctypes.c_char_p * n)(
        *[p.encode() for p in paths]
    )
    nt = num_threads or min(n, os.cpu_count() or 1)
    if raw_uint8:
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        failed = lib.grd4d_load_images_u8(
            c_paths,
            n,
            ctypes.c_double(resize),
            int(crop_xy[0]),
            int(crop_xy[1]),
            out_h,
            out_w,
            int(bool(flip)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            nt,
        )
    else:
        out = np.empty((n, out_h, out_w, 3), np.float32)
        mean_a = np.asarray(mean, np.float32)
        std_a = np.asarray(std, np.float32)
        failed = lib.grd4d_load_images(
            c_paths,
            n,
            ctypes.c_double(resize),
            int(crop_xy[0]),
            int(crop_xy[1]),
            out_h,
            out_w,
            int(bool(flip)),
            mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nt,
        )
    if failed:
        raise RuntimeError(f"native loader failed on {failed} image(s)")
    return out
