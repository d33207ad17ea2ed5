"""ctypes bindings to the native runtime (native/isi_native.cpp).

Provides the C++ mmap codemap-store reader and WAV codec. Auto-builds the
shared library on first use (g++ is in the image); every entry point has
a pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libisi_native.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None
    lib.isi_store_open.restype = ctypes.c_int
    lib.isi_store_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_void_p)]
    lib.isi_store_num_records.restype = ctypes.c_int64
    lib.isi_store_num_records.argtypes = [ctypes.c_void_p]
    lib.isi_store_read_batch.restype = ctypes.c_int
    lib.isi_store_read_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.isi_store_close.restype = None
    lib.isi_store_close.argtypes = [ctypes.c_void_p]
    lib.isi_wav_encode_pcm16.restype = ctypes.c_int64
    lib.isi_wav_encode_pcm16.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_char_p]
    lib.isi_wav_decode.restype = ctypes.c_int64
    lib.isi_wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


class NativeStoreReader:
    """C++ mmap reader over a CodemapStore's codes.bin."""

    def __init__(self, codes_bin_path, num_records: int,
                 top_shape: Tuple[int, int], bottom_shape: Tuple[int, int],
                 num_attrs: int):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.top_shape = tuple(top_shape)
        self.bottom_shape = tuple(bottom_shape)
        self.num_attrs = int(num_attrs)
        self._top_elems = int(np.prod(top_shape))
        self._bottom_elems = int(np.prod(bottom_shape))
        handle = ctypes.c_void_p()
        rc = lib.isi_store_open(
            str(codes_bin_path).encode(), num_records, self._top_elems,
            self._bottom_elems, num_attrs, ctypes.byref(handle))
        if rc != 0:
            raise OSError(f"isi_store_open failed rc={rc}")
        self._handle = handle

    def __len__(self) -> int:
        return int(self._lib.isi_store_num_records(self._handle))

    def read_batch(self, indices: Sequence[int]):
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        n = len(idx)
        tops = np.empty((n, self._top_elems), np.int32)
        bottoms = np.empty((n, self._bottom_elems), np.int32)
        attrs = np.empty((n, max(self.num_attrs, 1)), np.int32)
        rc = self._lib.isi_store_read_batch(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            bottoms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            attrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise IndexError("isi_store_read_batch failed")
        return (tops.reshape((n,) + self.top_shape),
                bottoms.reshape((n,) + self.bottom_shape),
                attrs[:, : self.num_attrs])

    def close(self):
        if self._handle:
            self._lib.isi_store_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def wav_encode_pcm16(audio: np.ndarray, sample_rate: int
                     ) -> Optional[bytes]:
    lib = load_library()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        channels, samples = 1, audio.shape[0]
        interleaved = audio
    else:
        channels, samples = audio.shape
        interleaved = np.ascontiguousarray(audio.T).reshape(-1)
    size = lib.isi_wav_encode_pcm16(
        interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        samples, channels, sample_rate, None)
    buf = ctypes.create_string_buffer(size)
    lib.isi_wav_encode_pcm16(
        interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        samples, channels, sample_rate, buf)
    return buf.raw


def wav_decode(blob: bytes):
    lib = load_library()
    if lib is None:
        return None
    channels = ctypes.c_int32()
    sample_rate = ctypes.c_int32()
    frames = lib.isi_wav_decode(blob, len(blob), None,
                                ctypes.byref(channels),
                                ctypes.byref(sample_rate))
    if frames < 0:
        raise ValueError(f"isi_wav_decode failed rc={frames}")
    out = np.empty(frames * channels.value, np.float32)
    lib.isi_wav_decode(blob, len(blob),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       ctypes.byref(channels), ctypes.byref(sample_rate))
    audio = out.reshape(frames, channels.value).T
    return np.ascontiguousarray(audio), int(sample_rate.value)
