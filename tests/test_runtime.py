"""Native runtime IO tests (C++ library vs numpy fallback parity)."""
import numpy as np
import pytest

from bds3_tpu import runtime
from tests.reference_impls import jacobi_symbol  # noqa: F401  (path check)


def matlab_luts():
    """The reference's explicit 16-entry LUTs (unpack_cplx.m:19-20)."""
    lut_i = [1, -1, 1, -1, 3, -3, 3, -3, 1, -1, 1, -1, 3, -3, 3, -3]
    lut_q = [1, 1, -1, -1, 1, 1, -1, -1, 3, 3, -3, -3, 3, 3, -3, -3]
    return lut_i, lut_q


class TestUnpack:
    def test_matches_matlab_luts(self):
        lut_i, lut_q = matlab_luts()
        packed = np.arange(256, dtype=np.uint8)
        out = runtime.unpack_nut4nt(packed)
        for v in range(256):
            lo, hi = v & 15, v >> 4
            assert out[4 * v + 0] == lut_i[lo]
            assert out[4 * v + 1] == lut_q[lo]
            assert out[4 * v + 2] == lut_i[hi]
            assert out[4 * v + 3] == lut_q[hi]

    def test_native_available(self):
        # the toolchain is part of the environment; the native path must
        # actually build (fallback exists for foreign machines)
        assert runtime.has_native()

    def test_native_numpy_parity(self):
        rng = np.random.default_rng(0)
        packed = rng.integers(0, 256, 10_000).astype(np.uint8)
        native = runtime.unpack_nut4nt(packed)
        # force the numpy path
        lib, runtime._lib = runtime._lib, None
        tried = runtime._tried
        runtime._tried = True
        try:
            fallback = runtime.unpack_nut4nt(packed)
        finally:
            runtime._lib, runtime._tried = lib, tried
        assert np.array_equal(native, fallback)


class TestDeinterleave:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        data = rng.integers(-128, 128, 2 * 5000).astype(np.int8)
        i, q = runtime.deinterleave_iq(data)
        assert np.array_equal(i, data[0::2])
        assert np.array_equal(q, data[1::2])


class TestPread:
    def test_read_block(self, tmp_path):
        p = tmp_path / "x.bin"
        rng = np.random.default_rng(2)
        data = rng.integers(-128, 128, 100_000).astype(np.int8)
        data.tofile(p)
        blk = runtime.pread_block(str(p), 1234, 5678)
        assert np.array_equal(blk, data[1234 : 1234 + 5678])
        assert runtime.file_size(str(p)) == 100_000
