"""LoRA adapter + control vector tests (reference surface: LoraAdapter.cpp,
ControlVector.cpp, Instance.cpp:52-84)."""

import numpy as np
import pytest

from blama_tpu.gguf import GGMLType, GGUFWriter
from blama_tpu.runtime.control_vector import (
    ControlVector,
    ControlVectorLoadInfo,
    write_control_vector,
)
from blama_tpu.runtime.instance import Instance, InstanceInitParams
from blama_tpu.runtime.lora import LoraAdapter
from blama_tpu.runtime.model import Model
from blama_tpu.runtime.session import CompleteParams, SessionInitParams
from blama_tpu.testing import write_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("m") / "t.gguf")
    write_tiny_llama(p, GGMLType.Q8_0)
    m = Model(p)
    yield m
    m.close()


def write_tiny_lora(path, n_layer=2, n_embd=256, r=4, alpha=8.0, seed=5):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "llama")
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", alpha)
    for i in range(n_layer):
        a = (rng.standard_normal((r, n_embd)) * 0.05).astype(np.float32)
        b = (rng.standard_normal((n_embd, r)) * 0.05).astype(np.float32)
        w.add_tensor(f"blk.{i}.attn_q.weight.lora_a", a, GGMLType.F32)
        w.add_tensor(f"blk.{i}.attn_q.weight.lora_b", b, GGMLType.F32)
    w.write()


def _greedy_tokens(instance, model, n=6):
    s = instance.start_session(SessionInitParams(seed=1, temperature=0.0))
    s.set_initial_prompt(model.vocab.tokenize("hello world", True, True))
    out = [p.token for p in s.complete(CompleteParams(max_tokens=n))]
    instance.stop_session()
    return out


def test_lora_load_and_metadata(model, tmp_path):
    p = str(tmp_path / "lora.gguf")
    write_tiny_lora(p)
    ad = LoraAdapter(p)
    assert ad.rank() == 4
    assert ad.alpha == 8.0
    assert ad.effective_scale(1.0) == pytest.approx(2.0)  # alpha/r
    assert set(ad.tensors) == {"blk.0.attn_q.weight", "blk.1.attn_q.weight"}


def test_lora_changes_and_restores_generation(model, tmp_path):
    p = str(tmp_path / "lora.gguf")
    write_tiny_lora(p, seed=11)
    inst = Instance(model, InstanceInitParams(ctx_size=64))
    base = _greedy_tokens(inst, model)

    ad = LoraAdapter(p)
    inst.add_lora(ad, scale=5.0)
    with_lora = _greedy_tokens(inst, model)
    assert with_lora != base  # adapter actually affects the forward pass

    inst.clear_lora_state()
    restored = _greedy_tokens(inst, model)
    assert restored == base  # exact restore after unfold


def test_lora_on_quantized_weights(tmp_path):
    """Quantized modes apply LoRA at matmul time (LoraWrapped) rather than
    folding into packed codes; detach restores the base bit-exactly."""
    mp = str(tmp_path / "q.gguf")
    write_tiny_llama(mp, GGMLType.Q4_K)
    from blama_tpu.runtime.model import ModelParams
    m = Model(mp, ModelParams(dtype="q4k_fused"))
    lp = str(tmp_path / "lora.gguf")
    write_tiny_lora(lp, seed=11)
    inst = Instance(m, InstanceInitParams(ctx_size=64))
    base = _greedy_tokens(inst, m)

    ad = LoraAdapter(lp)
    inst.add_lora(ad, scale=5.0)
    from blama_tpu.ops.pallas.quant_matmul import LoraWrapped
    assert isinstance(m.weights["layers"][0]["wq"], LoraWrapped)
    with_lora = _greedy_tokens(inst, m)
    assert with_lora != base

    inst.clear_lora_state()
    assert not isinstance(m.weights["layers"][0]["wq"], LoraWrapped)
    restored = _greedy_tokens(inst, m)
    assert restored == base
    m.close()


def test_lora_stacked_adapters_quantized(tmp_path):
    """Two adapters stack along the rank axis; removing both restores."""
    mp = str(tmp_path / "q.gguf")
    write_tiny_llama(mp, GGMLType.Q4_K)
    from blama_tpu.runtime.model import ModelParams
    m = Model(mp, ModelParams(dtype="q4k_fused"))
    l1, l2 = str(tmp_path / "l1.gguf"), str(tmp_path / "l2.gguf")
    write_tiny_lora(l1, seed=21)
    write_tiny_lora(l2, seed=22, r=2)
    inst = Instance(m, InstanceInitParams(ctx_size=64))
    base = _greedy_tokens(inst, m)
    inst.add_lora(LoraAdapter(l1), scale=4.0)
    one = _greedy_tokens(inst, m)
    inst.add_lora(LoraAdapter(l2), scale=4.0)
    w = m.weights["layers"][0]["wq"]
    assert w.a.shape[1] == 6 and len(w.tags) == 2  # r=4 + r=2 stacked
    both = _greedy_tokens(inst, m)
    assert base != one and one != both
    inst.clear_lora_state()
    assert _greedy_tokens(inst, m) == base
    m.close()


def test_control_vector_parse_and_sum(tmp_path):
    p1 = str(tmp_path / "cv1.gguf")
    p2 = str(tmp_path / "cv2.gguf")
    v1 = np.arange(256, dtype=np.float32) * 0.01
    v2 = np.ones(256, np.float32)
    write_control_vector(p1, {1: v1, 2: v2})
    write_control_vector(p2, {2: v2})
    cv = ControlVector([
        ControlVectorLoadInfo(p1, strength=2.0),
        ControlVectorLoadInfo(p2, strength=-1.0),
    ])
    np.testing.assert_allclose(cv.directions[1], v1 * 2.0)
    np.testing.assert_allclose(cv.directions[2], v2 * 2.0 - v2)
    bias = cv.as_layer_bias(n_layer=2, layer_start=1, layer_end=2)
    np.testing.assert_allclose(bias[0], v1 * 2.0)
    np.testing.assert_allclose(bias[1], v2)
    # range restriction
    bias2 = cv.as_layer_bias(n_layer=2, layer_start=2, layer_end=2)
    np.testing.assert_allclose(bias2[0], 0.0)


def test_control_vector_bad_tensor_name(tmp_path):
    p = str(tmp_path / "bad.gguf")
    w = GGUFWriter(p)
    w.add_tensor("not_direction.1", np.ones(8, np.float32), GGMLType.F32)
    w.write()
    with pytest.raises(ValueError, match="invalid control vector tensor name"):
        ControlVector(ControlVectorLoadInfo(p))


def test_control_vector_steers_generation(model, tmp_path):
    p = str(tmp_path / "cv.gguf")
    rng = np.random.default_rng(3)
    write_control_vector(
        p, {1: rng.standard_normal(256).astype(np.float32) * 2.0,
            2: rng.standard_normal(256).astype(np.float32) * 2.0}
    )
    inst = Instance(model, InstanceInitParams(ctx_size=64))
    base = _greedy_tokens(inst, model)
    inst.apply_control_vector(ControlVector(ControlVectorLoadInfo(p, strength=3.0)))
    steered = _greedy_tokens(inst, model)
    assert steered != base
    inst.apply_control_vector(None)
    assert _greedy_tokens(inst, model) == base
