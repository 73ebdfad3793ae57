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


# -- round-5 formats: Q2_K / Q3_K / Q8_K / IQ4_NL / IQ4_XS -------------------
# (VERDICT r4 missing #3: the reference serves any GGUF llama.cpp reads,
# /root/reference/README.md:9; these layouts follow ggml-quants.c)

NEW_CASES = [
    (GGMLType.Q2_K, 256, 0.35),
    (GGMLType.Q3_K, 256, 0.18),
    (GGMLType.Q8_K, 256, 0.01),
    (GGMLType.IQ4_NL, 32, 0.12),
    (GGMLType.IQ4_XS, 256, 0.12),
]


@pytest.mark.parametrize("t,block,tol", NEW_CASES)
def test_new_format_roundtrip_accuracy(t, block, tol):
    x = _rand(8, block * 4)
    packed = quants.quantize(x, t)
    assert packed.nbytes == tensor_nbytes((block * 4, 8), t)
    y = quants.dequantize(packed, t, x.shape)
    rmse = np.sqrt(np.mean((x - y) ** 2))
    ref = np.sqrt(np.mean(x**2))
    assert rmse / ref < tol, f"{t.name}: relative rmse {rmse/ref:.4f} > {tol}"


def test_q2_k_superblock_layout():
    """Byte-exact decode of a crafted Q2_K superblock following the ggml
    dequantize_row_q2_K loop: byte l of 32-byte half h holds sub-blocks
    8h+2j(+1) at bit 2j; scales byte = (sc & 0xF) | (mn << 4)."""
    codes = RNG.integers(0, 4, size=256).astype(np.int32)
    sc = RNG.integers(0, 16, size=16).astype(np.int32)
    mn = RNG.integers(0, 16, size=16).astype(np.int32)
    blk = np.zeros(84, dtype=np.uint8)
    blk[0:16] = (sc | (mn << 4)).astype(np.uint8)
    q = codes.reshape(16, 16).astype(np.uint8)  # [sub, elem]
    for h in range(2):
        for j in range(4):
            blk[16 + 32 * h: 16 + 32 * h + 16] |= q[8 * h + 2 * j] << (2 * j)
            blk[16 + 32 * h + 16: 16 + 32 * h + 32] |= q[8 * h + 2 * j + 1] << (2 * j)
    blk[80:82] = np.array([0.5], np.float16).view(np.uint8)   # d
    blk[82:84] = np.array([0.25], np.float16).view(np.uint8)  # dmin
    y = quants.dequantize(blk, GGMLType.Q2_K, (1, 256))
    want = (0.5 * sc[:, None] * codes.reshape(16, 16)
            - 0.25 * mn[:, None]).reshape(-1).astype(np.float32)
    np.testing.assert_allclose(y[0], want, rtol=1e-6)


def test_q3_k_superblock_layout():
    """Byte-exact decode of a crafted Q3_K superblock: 2 low bits in qs at
    bit 2j, high bit in hmask at bit 4h+j; value = low2 - (hbit ? 0 : 4);
    16 6-bit scales packed via the kmask shuffle, used as (stored - 32)."""
    codes = RNG.integers(0, 8, size=256).astype(np.int32)  # q+4 in 0..7
    scv = RNG.integers(0, 64, size=16).astype(np.int32)    # stored scales
    blk = np.zeros(110, dtype=np.uint8)
    q = codes.reshape(16, 16).astype(np.uint8)
    for h in range(2):
        for j in range(4):
            for half16 in range(2):
                s = 8 * h + 2 * j + half16
                blk[32 + 32 * h + 16 * half16: 32 + 32 * h + 16 * half16 + 16] |= (
                    (q[s] & 3) << (2 * j))
                blk[0 + 16 * half16: 16 + 16 * half16] |= (
                    (q[s] >> 2) << (4 * h + j))
    blk[96:108] = quants._q3k_pack_scales(scv)
    blk[108:110] = np.array([0.5], np.float16).view(np.uint8)
    y = quants.dequantize(blk, GGMLType.Q3_K, (1, 256))
    want = (0.5 * (scv[:, None] - 32)
            * (codes.reshape(16, 16) - 4)).reshape(-1).astype(np.float32)
    np.testing.assert_allclose(y[0], want, rtol=1e-6)


def test_q3k_scale_pack_unpack_roundtrip():
    scv = RNG.integers(0, 64, size=(7, 16)).astype(np.int32)
    packed = quants._q3k_pack_scales(scv)
    np.testing.assert_array_equal(quants._q3k_unpack_scales(packed), scv)


def test_q8_k_layout_and_bsums():
    """f32 d + 256 int8 + per-16 int16 bsums; decode = d * q."""
    x = _rand(1, 256, scale=3.0)
    packed = quants.quantize(x, GGMLType.Q8_K).reshape(-1)
    d = packed[0:4].copy().view(np.float32)[0]
    q = packed[4:260].view(np.int8).astype(np.int32)
    bsums = packed[260:292].copy().view(np.int16).astype(np.int32)
    np.testing.assert_array_equal(bsums, q.reshape(16, 16).sum(axis=1))
    y = quants.dequantize(packed, GGMLType.Q8_K, (1, 256))
    np.testing.assert_allclose(y[0], d * q, rtol=1e-6)


def test_q2_k_q8_k_fixed_point():
    for t in (GGMLType.Q2_K, GGMLType.Q8_K):
        x = _rand(4, 512)
        y = quants.dequantize(quants.quantize(x, t), t, x.shape)
        y2 = quants.dequantize(quants.quantize(y, t), t, x.shape)
        np.testing.assert_allclose(y, y2, rtol=1e-5, atol=1e-6)


def test_iq4_nl_codebook_layout():
    """d=1 → values are exactly the public kvalues_iq4nl codebook entries;
    low nibbles are elements 0..15, high nibbles 16..31."""
    idx = RNG.integers(0, 16, size=32).astype(np.uint8)
    blk = np.zeros(18, dtype=np.uint8)
    blk[0:2] = np.array([1.0], np.float16).view(np.uint8)
    blk[2:] = idx[:16] | (idx[16:] << 4)
    y = quants.dequantize(blk, GGMLType.IQ4_NL, (1, 32))
    np.testing.assert_allclose(
        y[0], quants.KVALUES_IQ4NL[idx].astype(np.float32))


def test_iq4_xs_superblock_layout():
    """8 sub-blocks of 32 share the IQ4_NL codebook; 6-bit sub scales split
    4 low bits (scales_l nibbles) + 2 high bits (scales_h), used - 32."""
    idx = RNG.integers(0, 16, size=(8, 32)).astype(np.uint8)
    ls = RNG.integers(0, 64, size=8).astype(np.int32)
    blk = np.zeros(136, dtype=np.uint8)
    blk[0:2] = np.array([0.5], np.float16).view(np.uint8)
    sh = 0
    for ib in range(8):
        sh |= (int(ls[ib]) >> 4) << (2 * ib)
        blk[4 + ib // 2] |= (ls[ib] & 0xF) << (4 * (ib % 2))
        blk[8 + 16 * ib: 8 + 16 * (ib + 1)] = idx[ib, :16] | (idx[ib, 16:] << 4)
    blk[2:4] = np.array([sh], np.uint16).view(np.uint8)
    y = quants.dequantize(blk, GGMLType.IQ4_XS, (1, 256))
    want = (0.5 * (ls[:, None] - 32)
            * quants.KVALUES_IQ4NL[idx].astype(np.float32)).reshape(-1)
    np.testing.assert_allclose(y[0], want, rtol=1e-6)
