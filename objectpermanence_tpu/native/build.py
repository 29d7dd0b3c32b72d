"""Build + load the native ingest library (ctypes, no pybind11).

The .so is compiled once per source hash and cached in the package dir
(falls back to a temp dir if not writable). `load_ingest_library()` returns
None when no compiler is available — callers fall back to Python.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "ingest.cc"
_LIB_CACHE: dict = {}


def _build(src: Path, out_path: Path) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(out_path), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as exc:
        if isinstance(exc, subprocess.CalledProcessError):
            print(f"native ingest build failed:\n{exc.stderr.decode()[:2000]}")
        return False


def load_ingest_library() -> Optional[ctypes.CDLL]:
    """Compile (cached) and load libingest; None if unavailable."""
    if "ingest" in _LIB_CACHE:
        return _LIB_CACHE["ingest"]

    if os.environ.get("OP_TPU_DISABLE_NATIVE"):
        _LIB_CACHE["ingest"] = None
        return None

    src_hash = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    candidates = [
        _SRC.parent / f"libingest_{src_hash}.so",
        Path(tempfile.gettempdir()) / f"op_tpu_libingest_{src_hash}.so",
    ]
    lib = None
    for so_path in candidates:
        if not so_path.exists():
            try:
                so_path.parent.mkdir(parents=True, exist_ok=True)
                if not _build(_SRC, so_path):
                    continue
            except OSError:
                continue
        try:
            lib = ctypes.CDLL(str(so_path))
            break
        except OSError:
            continue

    if lib is not None:
        lib.pad_video.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ]
        lib.containment_oracle.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ]
    _LIB_CACHE["ingest"] = lib
    return lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def native_pad_video(frame_boxes, frame_labels, feature_width: int,
                     is_cone: np.ndarray) -> Optional[np.ndarray]:
    """Native pad/align; None when the library is unavailable."""
    lib = load_ingest_library()
    if lib is None:
        return None
    num_frames = len(frame_labels)
    labels_cat = (np.concatenate([np.asarray(l).reshape(-1) for l in frame_labels])
                  if num_frames else np.zeros(0)).astype(np.int64)
    boxes_cat = np.concatenate(
        [np.asarray(b, np.float32).reshape(-1, 4) for b in frame_boxes]
    ).astype(np.float32) if labels_cat.size else np.zeros((0, 4), np.float32)
    offsets = np.zeros(num_frames + 1, np.int64)
    for f in range(num_frames):
        offsets[f + 1] = offsets[f] + len(np.asarray(frame_labels[f]).reshape(-1))

    out = np.zeros((num_frames, 15, feature_width), np.float32)
    cone_table = np.ascontiguousarray(is_cone.astype(np.uint8))
    boxes_cat = np.ascontiguousarray(boxes_cat)
    labels_cat = np.ascontiguousarray(labels_cat)
    lib.pad_video(_ptr(boxes_cat, ctypes.c_float), _ptr(labels_cat, ctypes.c_int64),
                  _ptr(offsets, ctypes.c_int64), num_frames, feature_width,
                  _ptr(cone_table, ctypes.c_uint8), _ptr(out, ctypes.c_float))
    return out


def native_containment_oracle(padded: np.ndarray, feature_width: int
                              ) -> Optional[np.ndarray]:
    lib = load_ingest_library()
    if lib is None:
        return None
    padded = np.ascontiguousarray(padded, np.float32)
    out = np.zeros(len(padded), np.int32)
    lib.containment_oracle(_ptr(padded, ctypes.c_float), len(padded),
                           feature_width, int(feature_width == 6),
                           _ptr(out, ctypes.c_int32))
    return out
