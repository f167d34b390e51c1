"""ctypes bindings for the native data loader (loader.cpp).

Builds ``libyolodata.so`` on first use (g++ -O3 against libjpeg/libpng)
and exposes:
  - ``load_image(path, size)`` -> (HWC uint8 array, zoom[w, h])
  - ``load_batch(paths, size, threads)`` -> (N,H,W,3) + zooms
  - ``parse_labelimg(xml_text, class_names)`` -> (boxes, labels)
  - ``load_and_encode_batch(...)`` -> full images+grid-labels pipeline

``available()`` reports whether the library could be built/loaded; the
Python (PIL/ElementTree) path in ``tf2_yolo_tpu.data`` is the
fallback, so the framework works without a toolchain.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_SO = os.path.join(_HERE, "libyolodata.so")

_lib = None
_lock = threading.Lock()
_build_error = None


_MARKER = _SO + ".host"     # records which host built the .so


def _host_id():
    import platform
    return f"{platform.machine()}-{platform.node()}"


def _build():
    # no -march=native: the .so may outlive the build host (a binary
    # with AVX-512 would SIGILL on a lesser CPU instead of falling
    # back); -O3 + the compiler's default arch is close enough for an
    # IO-bound loader
    cmd = ["g++", "-O3", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-ljpeg", "-lpng", "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(_MARKER, "w") as f:
        f.write(_host_id())


def _needs_build():
    if not os.path.exists(_SO):
        return True
    if os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        return True
    try:
        with open(_MARKER) as f:
            return f.read() != _host_id()
    except OSError:
        return True    # unknown provenance (e.g. checked-out binary)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if _needs_build():
                _build()
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = e
            return None

        lib.yolo_load_image.restype = ctypes.c_int
        lib.yolo_load_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double)]
        lib.yolo_load_batch.restype = ctypes.c_int
        lib.yolo_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int]
        lib.yolo_parse_labelimg.restype = ctypes.c_int
        lib.yolo_parse_labelimg.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int)]
        lib.yolo_load_and_encode_batch.restype = ctypes.c_int
        lib.yolo_load_and_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        _lib = lib
        return _lib


def available():
    return _load() is not None


def _as_c_paths(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() if p is not None else None for p in paths]
    return arr


def load_image(path, size):
    """Decode+resize one image. Returns (H, W, 3) uint8 and
    zoom (orig_w/out_w, orig_h/out_h)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    h, w = size
    out = np.empty((h, w, 3), np.uint8)
    zoom = np.empty((2,), np.float64)
    rc = lib.yolo_load_image(
        path.encode(), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        zoom.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise IOError(f"failed to decode image ({rc}): {path}")
    return out, zoom


def load_batch(paths, size, threads=8):
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    h, w = size
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    zooms = np.empty((n, 2), np.float64)
    fails = lib.yolo_load_batch(
        _as_c_paths(paths), n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        zooms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), threads)
    if fails:
        raise IOError(f"{fails}/{n} images failed to decode")
    return out, zooms


def parse_labelimg(xml_text, class_names, max_boxes=256):
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    boxes = np.zeros((max_boxes, 4), np.float64)
    labels = np.zeros((max_boxes,), np.int32)
    n = lib.yolo_parse_labelimg(
        xml_text.encode(), "\n".join(class_names).encode(), max_boxes,
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return boxes[:n], labels[:n].tolist()


def load_and_encode_batch(img_paths, xml_paths, size, grid_shape,
                          class_names, threads=8, max_boxes=256):
    """Full native pipeline: images + labelimg XMLs -> (imgs uint8,
    grid labels f32). xml_paths entries may be None."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    h, w = size
    gh, gw = grid_shape
    n = len(img_paths)
    c = len(class_names)
    imgs = np.empty((n, h, w, 3), np.uint8)
    labels = np.zeros((n, gh, gw, 5 + c), np.float32)
    fails = lib.yolo_load_and_encode_batch(
        _as_c_paths(img_paths), _as_c_paths(xml_paths), n, h, w,
        gh, gw, "\n".join(class_names).encode(), c, max_boxes,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads)
    if fails:
        raise IOError(f"{fails}/{n} samples failed")
    return imgs, labels
