"""Quantization format tests: layout invariants and round-trip accuracy.

Mirrors the role of llama.cpp's quant correctness tests for the formats the
reference serves (SURVEY.md §2.2); the reference itself delegates these to
llama.cpp, so these tests pin down our from-scratch implementations.
"""

import numpy as np
import pytest

from blama_tpu.gguf import GGMLType, quants, tensor_nbytes


RNG = np.random.default_rng(0)


def _rand(rows, cols, scale=1.0):
    return (RNG.standard_normal((rows, cols)) * scale).astype(np.float32)


QUANT_CASES = [
    # (type, block, max relative rmse)
    (GGMLType.Q8_0, 32, 0.01),
    (GGMLType.Q4_0, 32, 0.12),
    (GGMLType.Q4_1, 32, 0.10),
    (GGMLType.Q5_0, 32, 0.06),
    (GGMLType.Q5_1, 32, 0.05),
    (GGMLType.Q4_K, 256, 0.10),
    (GGMLType.Q5_K, 256, 0.05),
    (GGMLType.Q6_K, 256, 0.03),
]


@pytest.mark.parametrize("t,block,tol", QUANT_CASES)
def test_roundtrip_accuracy(t, block, tol):
    x = _rand(8, block * 4)
    packed = quants.quantize(x, t)
    assert packed.nbytes == tensor_nbytes((block * 4, 8), t)
    y = quants.dequantize(packed, t, x.shape)
    rmse = np.sqrt(np.mean((x - y) ** 2))
    ref = np.sqrt(np.mean(x**2))
    assert rmse / ref < tol, f"{t.name}: relative rmse {rmse/ref:.4f} > {tol}"


@pytest.mark.parametrize("t,block,tol", QUANT_CASES)
def test_quantized_is_fixed_point(t, block, tol):
    """quant(dequant(quant(x))) == quant(x): dequantized values are exactly
    representable, so re-quantizing is stable (required for deterministic
    fixture generation)."""
    x = _rand(4, block * 2)
    p1 = quants.quantize(x, t)
    y = quants.dequantize(p1, t, x.shape)
    p2 = quants.quantize(y, t)
    y2 = quants.dequantize(p2, t, x.shape)
    np.testing.assert_allclose(y, y2, rtol=1e-5, atol=1e-6)


def test_q8_0_exact_small_ints():
    """Integers well within int8 range must round-trip exactly at d=1/127*max."""
    x = np.arange(-16, 16, dtype=np.float32).reshape(1, 32) * (127.0 / 16.0)
    y = quants.dequantize(quants.quantize(x, GGMLType.Q8_0), GGMLType.Q8_0, x.shape)
    np.testing.assert_allclose(x, y, atol=np.abs(x).max() / 127 + 1e-6)


def test_scale_min_pack_unpack_roundtrip():
    sc = RNG.integers(0, 64, size=(16, 8))
    mn = RNG.integers(0, 64, size=(16, 8))
    packed = quants._pack_scale_min_k4(sc, mn)
    sc2, mn2 = quants._unpack_scale_min_k4(packed)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)


def test_q4_k_superblock_layout():
    """Hand-check the Q4_K byte layout on a crafted superblock:
    d=1, dmin=0, all sub-block scales 1 → values equal their 4-bit codes."""
    codes = RNG.integers(0, 16, size=256).astype(np.float32)
    blk = np.zeros(144, dtype=np.uint8)
    blk[0:2] = np.array([1.0], dtype=np.float16).view(np.uint8)  # d = 1.0
    blk[2:4] = np.array([0.0], dtype=np.float16).view(np.uint8)  # dmin = 0
    sc = np.ones((1, 8), dtype=np.int64)
    mn = np.zeros((1, 8), dtype=np.int64)
    blk[4:16] = quants._pack_scale_min_k4(sc, mn)[0]
    q = codes.astype(np.uint8)
    for c in range(4):
        chunk = q[64 * c: 64 * (c + 1)]
        blk[16 + 32 * c: 16 + 32 * (c + 1)] = chunk[:32] | (chunk[32:] << 4)
    y = quants.dequantize(blk, GGMLType.Q4_K, (1, 256))
    np.testing.assert_allclose(y[0], codes)


def test_q6_k_superblock_layout():
    """d=1, all 16 int8 scales 1 → values equal (code - 32)."""
    codes = RNG.integers(0, 64, size=256).astype(np.int32)
    blk = np.zeros(210, dtype=np.uint8)
    q = codes.astype(np.uint8)
    for h in range(2):
        qq = q[128 * h: 128 * (h + 1)]
        q1, q2, q3, q4 = qq[0:32], qq[32:64], qq[64:96], qq[96:128]
        blk[64 * h: 64 * h + 32] = (q1 & 0xF) | ((q3 & 0xF) << 4)
        blk[64 * h + 32: 64 * h + 64] = (q2 & 0xF) | ((q4 & 0xF) << 4)
        blk[128 + 32 * h: 128 + 32 * (h + 1)] = (
            (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
        )
    blk[192:208] = np.ones(16, dtype=np.int8).view(np.uint8)
    blk[208:210] = np.array([1.0], dtype=np.float16).view(np.uint8)
    y = quants.dequantize(blk, GGMLType.Q6_K, (1, 256))
    np.testing.assert_allclose(y[0], (codes - 32).astype(np.float32))


def test_q5_k_high_bits():
    """Values ≥16 must engage the qh high-bit plane."""
    x = np.full((1, 256), 23.0, dtype=np.float32)
    x[0, ::2] = 7.0
    y = quants.dequantize(quants.quantize(x, GGMLType.Q5_K), GGMLType.Q5_K, x.shape)
    assert np.abs(y - x).max() < 0.6


def test_bf16_roundtrip():
    x = _rand(2, 64)
    packed = quants.quantize(x, GGMLType.BF16)
    y = quants.dequantize(packed, GGMLType.BF16, x.shape)
    np.testing.assert_allclose(x, y, rtol=1e-2)
    # bf16 of a bf16 value is exact
    y2 = quants.dequantize(quants.quantize(y, GGMLType.BF16), GGMLType.BF16, x.shape)
    np.testing.assert_array_equal(y, y2)
