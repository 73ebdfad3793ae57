"""Probe Mosaic capability: u8-native bitops, i8 MXU dots inside Pallas."""
import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache_tpu"))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        out = np.asarray(out)
        print(f"OK   {name}: {out.ravel()[:4]} dtype-roundtrip fine")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def k_u8_bitops(x_ref, o_ref):
    x = x_ref[:]
    lo = x & jnp.uint8(0xF)
    hi = x >> jnp.uint8(4)
    o_ref[:] = lo + hi


def k_u8_upcast_i16(x_ref, o_ref):
    x = x_ref[:].astype(jnp.int16)
    lo = x & jnp.int16(0xF)
    hi = (x >> 4) & jnp.int16(0xF)
    o_ref[:] = (lo + hi).astype(jnp.uint8)


def k_i8_dot(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def k_i8_from_unpack_dot(a_ref, c_ref, o_ref):
    c = c_ref[:].astype(jnp.int32)
    lo = (c & 0xF).astype(jnp.int8)
    hi = (c >> 4).astype(jnp.int8)
    q = jnp.concatenate([lo, hi], axis=0)
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def main():
    rng = np.random.default_rng(0)
    xu8 = jnp.asarray(rng.integers(0, 255, (256, 512), dtype=np.uint8))
    a8 = jnp.asarray(rng.integers(-127, 127, (32, 256), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-8, 8, (256, 512), dtype=np.int8))
    c8 = jnp.asarray(rng.integers(0, 255, (128, 512), dtype=np.uint8))

    probe("u8 bitops native", lambda: pl.pallas_call(
        k_u8_bitops, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.uint8))(xu8))
    probe("i16 bitops", lambda: pl.pallas_call(
        k_u8_upcast_i16, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.uint8))(xu8))
    probe("i8xi8->i32 dot", lambda: pl.pallas_call(
        k_i8_dot, out_shape=jax.ShapeDtypeStruct((32, 512), jnp.int32))(a8, b8))
    probe("unpack->i8 dot", lambda: pl.pallas_call(
        k_i8_from_unpack_dot, out_shape=jax.ShapeDtypeStruct((32, 512), jnp.int32))(a8, c8))


if __name__ == "__main__":
    main()
