"""ctypes bindings for the native rANS coder (see rans.cpp).

Replaces tfc's RangeEncode/RangeDecode C++ kernels (used at
/root/reference/mbt2018.py:84-85 and 269-280). The device computes integer
symbols and CDF-row indexes; only those small integer tensors cross the
host boundary, mirroring where the reference crosses into TF's C++ kernels.
"""

import ctypes

import numpy as np

from nic_tpu.coding.build import library_path
from nic_tpu.config import CODER_PRECISION

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


class RansCoder:
    """Encode/decode int32 symbol arrays against per-row quantized CDFs."""

    def __init__(self, precision: int = CODER_PRECISION):
        self.precision = precision
        lib = ctypes.CDLL(library_path())
        lib.rans_encode.restype = ctypes.c_int64
        lib.rans_encode.argtypes = [
            _i32p, _i32p, ctypes.c_int64,
            _u32p, ctypes.c_int64, _i32p,
            ctypes.c_int32, _u8p, ctypes.c_int64,
        ]
        lib.rans_decode.restype = ctypes.c_int64
        lib.rans_decode.argtypes = [
            _u8p, ctypes.c_int64, _i32p, ctypes.c_int64,
            _u32p, ctypes.c_int64, _i32p,
            ctypes.c_int32, _i32p,
        ]
        self._lib = lib

    def encode(
        self,
        symbols: np.ndarray,
        indexes: np.ndarray,
        cdfs: np.ndarray,
        cdf_sizes: np.ndarray,
    ) -> bytes:
        symbols = np.ascontiguousarray(symbols.reshape(-1), np.int32)
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        cdfs = np.ascontiguousarray(cdfs, np.uint32)
        cdf_sizes = np.ascontiguousarray(cdf_sizes, np.int32)
        assert symbols.size == indexes.size
        capacity = symbols.size * 8 + 1024
        out = np.empty(capacity, np.uint8)
        n = self._lib.rans_encode(
            symbols, indexes, symbols.size,
            cdfs, cdfs.shape[1], cdf_sizes,
            self.precision, out, capacity,
        )
        if n == -1:  # grow once for pathological streams
            capacity = symbols.size * 64 + 65536
            out = np.empty(capacity, np.uint8)
            n = self._lib.rans_encode(
                symbols, indexes, symbols.size,
                cdfs, cdfs.shape[1], cdf_sizes,
                self.precision, out, capacity,
            )
        if n < 0:
            raise ValueError(f"rans_encode failed with code {n}")
        return out[:n].tobytes()

    def decode(
        self,
        data: bytes,
        indexes: np.ndarray,
        cdfs: np.ndarray,
        cdf_sizes: np.ndarray,
    ) -> np.ndarray:
        shape = indexes.shape
        indexes = np.ascontiguousarray(indexes.reshape(-1), np.int32)
        cdfs = np.ascontiguousarray(cdfs, np.uint32)
        cdf_sizes = np.ascontiguousarray(cdf_sizes, np.int32)
        buf = np.frombuffer(data, np.uint8)
        buf = np.ascontiguousarray(buf)
        out = np.empty(indexes.size, np.int32)
        n = self._lib.rans_decode(
            buf, buf.size, indexes, indexes.size,
            cdfs, cdfs.shape[1], cdf_sizes,
            self.precision, out,
        )
        if n != indexes.size:
            raise ValueError(f"rans_decode failed with code {n}")
        return out.reshape(shape)
