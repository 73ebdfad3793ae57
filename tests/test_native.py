"""Native C++ library parity tests: the ctypes fast paths must be
bit-identical to the numpy reference implementations."""

import numpy as np
import pytest

from blama_tpu import native
from blama_tpu.gguf import GGMLType, quants


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no C++ toolchain)")
    return lib


RNG = np.random.default_rng(0)


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K])
def test_native_dequant_bitexact(lib, t):
    block = 256 if t.name.endswith("K") else 32
    x = (RNG.standard_normal((8, block * 4)) * 0.5).astype(np.float32)
    packed = quants.quantize(x, t)
    # numpy reference (force fallback)
    fn = getattr(quants, f"dequantize_{t.name.lower()}")
    ref = fn(packed, 8, block * 4)
    out = native.native_dequantize(t.name, packed, x.size).reshape(8, block * 4)
    np.testing.assert_array_equal(out, ref)


def test_native_repack_matches_numpy(lib):
    from blama_tpu.ops.pallas import quant_matmul as qm

    N, K = 384, 512
    x = (RNG.standard_normal((N, K)) * 0.1).astype(np.float32)
    packed = quants.quantize(x, GGMLType.Q4_K)

    codes_n, scales_n, mins_n, n_pad = native.native_repack_q4k(packed, N, K)

    # numpy path
    codes, scales, mins = qm.unpack_q4k_arrays(packed, N, K)
    codes = np.ascontiguousarray(codes.T)
    scales = np.ascontiguousarray(scales.T)
    mins = np.ascontiguousarray(mins.T)
    pad = n_pad - N
    codes = np.pad(codes, ((0, 0), (0, pad)))
    scales = np.pad(scales, ((0, 0), (0, pad)))
    mins = np.pad(mins, ((0, 0), (0, pad)))
    ct = codes.reshape(K // qm.KT, 2, qm.KT // 2, n_pad)
    packed_np = (ct[:, 0] | (ct[:, 1] << 4)).reshape(K // 2, n_pad)

    np.testing.assert_array_equal(codes_n, packed_np)
    np.testing.assert_array_equal(scales_n, scales)
    np.testing.assert_array_equal(mins_n, mins)


def test_dequantize_dispatch_uses_native(lib):
    """quants.dequantize output is identical whether or not native is used."""
    x = (RNG.standard_normal((4, 512)) * 0.3).astype(np.float32)
    packed = quants.quantize(x, GGMLType.Q4_K)
    via_dispatch = quants.dequantize(packed, GGMLType.Q4_K, (4, 512))
    direct = quants.dequantize_q4_k(packed, 4, 512)
    np.testing.assert_array_equal(via_dispatch, direct)


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K])
def test_native_dequant_subnormal_scales(lib, t):
    """Tiny weights force SUBNORMAL f16 block scales (d < 2^-14): the native
    f16_to_f32 subnormal branch had an exponent off-by-one that halved every
    subnormal scale (caught via a q6_k round-trip, round 4)."""
    block = 256 if t.name.endswith("K") else 32
    x = (RNG.standard_normal((8, block * 4)) * 2e-4).astype(np.float32)
    packed = quants.quantize(x, t)
    fn = getattr(quants, f"dequantize_{t.name.lower()}")
    ref = fn(packed, 8, block * 4)
    assert np.abs(ref).max() > 0
    # the fixture must actually exercise subnormal f16 scales
    f16 = np.frombuffer(packed.tobytes(), np.float16)
    tiny = (np.abs(f16.astype(np.float32)) < 2.0 ** -14) & (f16 != 0)
    assert tiny.any(), "fixture produced no subnormal f16 scale words"
    out = native.native_dequantize(t.name, packed, x.size).reshape(8, block * 4)
    np.testing.assert_array_equal(out, ref)


def test_native_q8_0_tail_blocks(lib):
    """n_blocks not a multiple of the q8_0 parallel chunk (4096): the tail
    must still dequantize (a floor division dropped it — round 4)."""
    n_blocks = 4100
    x = (RNG.standard_normal((1, n_blocks * 32)) * 0.5).astype(np.float32)
    packed = quants.quantize(x, GGMLType.Q8_0)
    ref = quants.dequantize_q8_0(np.frombuffer(packed.tobytes(), np.uint8),
                                 1, n_blocks * 32)
    out = native.native_dequantize("Q8_0", packed, x.size).reshape(1, -1)
    np.testing.assert_array_equal(out, ref)
