"""Ring attention vs the single-device reference on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from blama_tpu.ops.attention import attention
from blama_tpu.ops.ring_attention import ring_attention
from blama_tpu.ops.rope import apply_rope


def make_mesh_sp(n):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, ("sp",))


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_reference(sp):
    B, T, H, Hkv, D = 1, 32, 4, 2, 16
    S = T
    rope_dim, freq_base = D, 10000.0
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    q_pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    kv_pos = q_pos

    q_rot = apply_rope(q, q_pos, rope_dim, freq_base)
    ref = attention(q_rot, k, v, q_pos, kv_pos, rope_dim, freq_base)

    k_rot = apply_rope(k, jnp.maximum(kv_pos, 0), rope_dim, freq_base)
    out = ring_attention(q_rot, k_rot, v, q_pos, kv_pos, make_mesh_sp(sp))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_with_holes_and_noncausal():
    B, T, H, Hkv, D = 2, 16, 4, 4, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    q_pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    # punch holes (context-shift leftovers) into the kv positions
    kv_pos = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    kv_pos[:, 3] = -1
    kv_pos[:, 7] = -1
    kv_pos = jnp.asarray(kv_pos)

    q_rot = apply_rope(q, q_pos, D, 10000.0)
    k_rot = apply_rope(k, jnp.maximum(kv_pos, 0), D, 10000.0)
    mesh = make_mesh_sp(4)
    for causal in (True, False):
        ref = attention(q_rot, k, v, q_pos, kv_pos, D, 10000.0, causal=causal)
        out = ring_attention(q_rot, k_rot, v, q_pos, kv_pos, mesh, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_ring_row_with_no_valid_keys_is_zero():
    """The first query of a causal block whose keys are all holes."""
    B, T, H, Hkv, D = 1, 8, 2, 2, 8
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    q_pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    kv_pos = jnp.full((B, T), -1, jnp.int32)  # nothing valid
    out = ring_attention(q, k, v, q_pos, kv_pos, make_mesh_sp(2))
    np.testing.assert_array_equal(np.asarray(out), np.zeros_like(out))
