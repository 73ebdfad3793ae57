"""Probe SWAR nibble unpack: u8 --bitcast--> i32 --mask/shift--> bitcast i8."""
import os
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_roundtrip(x_ref, o_ref):
    w = pltpu.bitcast(x_ref[:], jnp.int32)         # [R/4, nt]
    o_ref[:] = pltpu.bitcast(w, jnp.uint8)         # [R, nt] — identity?


def k_swar_lo_hi(x_ref, lo_ref, hi_ref):
    w = pltpu.bitcast(x_ref[:], jnp.int32)
    lo = w & 0x0F0F0F0F
    hi = (w >> 4) & 0x0F0F0F0F
    lo_ref[:] = pltpu.bitcast(lo, jnp.int8)
    hi_ref[:] = pltpu.bitcast(hi, jnp.int8)


def k_swar_dot(x_ref, c_ref, o_ref):
    """SWAR unpack then i8 MXU dot: checks MXU consumes bitcast output."""
    w = pltpu.bitcast(c_ref[:], jnp.int32)
    lo = pltpu.bitcast(w & 0x0F0F0F0F, jnp.int8)       # [R, nt]
    hi = pltpu.bitcast((w >> 4) & 0x0F0F0F0F, jnp.int8)
    a = x_ref[:]
    o_ref[:] = (
        jax.lax.dot_general(a, lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        + jax.lax.dot_general(a, hi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32))


def main():
    rng = np.random.default_rng(0)
    R, NT = 256, 512
    x = rng.integers(0, 255, (R, NT), dtype=np.uint8)
    xj = jnp.asarray(x)

    rt = np.asarray(pl.pallas_call(
        k_roundtrip, out_shape=jax.ShapeDtypeStruct((R, NT), jnp.uint8))(xj))
    print("roundtrip identity:", np.array_equal(rt, x))

    lo, hi = pl.pallas_call(
        k_swar_lo_hi,
        out_shape=(jax.ShapeDtypeStruct((R, NT), jnp.int8),
                   jax.ShapeDtypeStruct((R, NT), jnp.int8)))(xj)
    lo, hi = np.asarray(lo), np.asarray(hi)
    print("lo matches x&0xF:", np.array_equal(lo, (x & 0xF).astype(np.int8)))
    print("hi matches x>>4:", np.array_equal(hi, (x >> 4).astype(np.int8)))

    a = rng.integers(-127, 127, (32, R), dtype=np.int8)
    out = np.asarray(pl.pallas_call(
        k_swar_dot, out_shape=jax.ShapeDtypeStruct((32, NT), jnp.int32))(
            jnp.asarray(a), xj))
    want = (a.astype(np.int64) @ (x & 0xF).astype(np.int64)
            + a.astype(np.int64) @ (x >> 4).astype(np.int64))
    print("swar dot correct:", np.array_equal(out, want.astype(np.int32)))


if __name__ == "__main__":
    main()
