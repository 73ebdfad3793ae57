"""LoRA adapter loading and application.

Mirror of the reference LoraAdapter (/root/reference/inference/code/llama/
LoraAdapter.{hpp,cpp}) + the Instance attach path (Instance.cpp:52-61):
load a LoRA GGUF (tensors `<base>.lora_a` / `<base>.lora_b`, metadata
`adapter.lora.alpha`), apply per-instance with a scale, clear to remove.

TPU-native application, two modes matching llama.cpp's behavior:
* dense weights: the scaled low-rank delta (scale · α/r · B·A) is folded
  into the base weights at attach time — one host-side update + upload
  instead of an extra matmul every step. Detach restores by subtracting the
  same delta (bit-exact, since the fold is float32 on host).
* quantized weights (packed QuantTensor*): folding into 4-bit codes would
  lose the delta, so the adapter is applied at matmul time as a runtime
  low-rank term y += (x·aᵀ)·(scale·bᵀ) via LoraWrapped — the analog of
  llama.cpp's build_lora_mm on quantized tensors. Detach strips the wrapper,
  restoring the untouched base bit-exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..gguf.reader import GGUFReader


@dataclass
class LoraTensors:
    a: np.ndarray  # (r, n_in)
    b: np.ndarray  # (n_out, r)


class LoraAdapter:
    def __init__(self, gguf_path: str):
        self.path = gguf_path
        r = GGUFReader(gguf_path)
        try:
            md = r.metadata
            if md.get("adapter.type", "lora") != "lora":
                raise ValueError(f"not a lora adapter: {gguf_path}")
            self.alpha = float(md.get("adapter.lora.alpha", 0.0))
            self.tensors: dict[str, LoraTensors] = {}
            pairs: dict[str, dict[str, np.ndarray]] = {}
            for name in r.tensor_names():
                if name.endswith(".lora_a"):
                    base = name[: -len(".lora_a")]
                    pairs.setdefault(base, {})["a"] = r.tensor_float(name)
                elif name.endswith(".lora_b"):
                    base = name[: -len(".lora_b")]
                    pairs.setdefault(base, {})["b"] = r.tensor_float(name)
            for base, ab in pairs.items():
                if "a" not in ab or "b" not in ab:
                    raise ValueError(f"incomplete lora pair for {base}")
                self.tensors[base] = LoraTensors(ab["a"], ab["b"])
        finally:
            r.close()

    def rank(self) -> int:
        for t in self.tensors.values():
            return t.a.shape[0]
        return 0

    def effective_scale(self, user_scale: float) -> float:
        """llama.cpp: scale = alpha ? user_scale * alpha / r : user_scale."""
        r = self.rank()
        return user_scale * self.alpha / r if self.alpha and r else user_scale


# mapping base tensor name → (params path, transposed?)
_LAYER_KEYS = {
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up",
    "ffn_down.weight": "w_down",
}


def lora_deltas(adapter: LoraAdapter, n_layer: int, user_scale: float) -> dict:
    """Compute per-tensor deltas in the stacked-params layout (n_in, n_out)."""
    scale = adapter.effective_scale(user_scale)
    out: dict[str, dict[int, np.ndarray]] = {}
    for base, t in adapter.tensors.items():
        if not base.startswith("blk."):
            continue
        parts = base.split(".", 2)
        layer = int(parts[1])
        key = _LAYER_KEYS.get(parts[2])
        if key is None:
            continue
        delta = (t.b.astype(np.float32) @ t.a.astype(np.float32)).T * scale  # (n_in, n_out)
        out.setdefault(key, {})[layer] = delta
    return out


def _wrap_runtime(w, aT, bT, tag):
    """Stack a (aT [K,r], bT [r,N]) segment onto w as a LoraWrapped."""
    import jax.numpy as jnp

    from ..ops.pallas.quant_matmul import LoraWrapped

    r = aT.shape[1]
    if isinstance(w, LoraWrapped):
        return LoraWrapped(
            w.base, jnp.concatenate([w.a, aT], axis=1),
            jnp.concatenate([w.b, bT], axis=0), w.tags + ((tag, r),))
    return LoraWrapped(w, aT, bT, ((tag, r),))


def _unwrap_runtime(w, tag):
    """Remove the rank segment tagged `tag`; returns the bare base when no
    segments remain (bit-exact: the base tensor was never modified)."""
    import jax.numpy as jnp

    from ..ops.pallas.quant_matmul import LoraWrapped

    if not isinstance(w, LoraWrapped):
        return w
    off = 0
    for i, (t, r) in enumerate(w.tags):
        if t == tag:
            segs = w.tags[:i] + w.tags[i + 1:]
            if not segs:
                return w.base
            a = jnp.concatenate([w.a[:, :off], w.a[:, off + r:]], axis=1)
            b = jnp.concatenate([w.b[:off], w.b[off + r:]], axis=0)
            return LoraWrapped(w.base, a, b, segs)
        off += r
    return w


def _apply_lora_runtime(weights: dict, adapter: LoraAdapter,
                        user_scale: float, sign: float) -> dict:
    """Quantized-mode attach/detach: wrap targets with runtime deltas."""
    import jax.numpy as jnp

    tag = (id(adapter), float(user_scale))
    scale = adapter.effective_scale(user_scale)
    layers = [dict(p) for p in weights["layers"]]
    for base, t in adapter.tensors.items():
        if not base.startswith("blk."):
            continue
        parts = base.split(".", 2)
        layer = int(parts[1])
        key = _LAYER_KEYS.get(parts[2])
        if key is None or layer >= len(layers):
            continue
        p = layers[layer]
        # fused-projection layouts (wqkv / wgu): the delta lands on a column
        # segment of the fused tensor — pad bT with zeros outside it
        off = 0
        if key not in p:
            if key in ("wq", "wk", "wv") and "wqkv" in p:
                total = p["wqkv"].shape[1]
                seg = t.b.shape[0]
                off = {"wq": 0, "wk": total - 2 * seg,
                       "wv": total - seg}[key]
                key = "wqkv"
            elif key in ("w_gate", "w_up") and "wgu" in p:
                total = p["wgu"].shape[1]
                off = 0 if key == "w_gate" else total // 2
                key = "wgu"
            else:
                continue
        if sign > 0:
            aT = jnp.asarray(t.a.astype(np.float32).T)            # [K, r]
            bT = jnp.asarray(t.b.astype(np.float32).T * scale)    # [r, Nseg]
            if off or bT.shape[1] != p[key].shape[1]:
                full = jnp.zeros((bT.shape[0], p[key].shape[1]), jnp.float32)
                bT = full.at[:, off: off + bT.shape[1]].set(bT)
            layers[layer][key] = _wrap_runtime(p[key], aT, bT, tag)
        else:
            layers[layer][key] = _unwrap_runtime(p[key], tag)
    return {**weights, "layers": layers}


def apply_lora(weights: dict, adapter: LoraAdapter, user_scale: float, sign: float = 1.0) -> dict:
    """Fold (sign=+1) or unfold (sign=-1) the adapter into a params pytree."""
    import jax.numpy as jnp

    if isinstance(weights["layers"], (list, tuple)):
        return _apply_lora_runtime(weights, adapter, user_scale, sign)
    deltas = lora_deltas(adapter, weights["layers"]["wq"].shape[0], user_scale)
    layers = dict(weights["layers"])
    for key, per_layer in deltas.items():
        w = np.asarray(layers[key]).astype(np.float32)
        for layer, delta in per_layer.items():
            w[layer] = w[layer] + sign * delta
        layers[key] = jnp.asarray(w, weights["layers"][key].dtype)
    return {**weights, "layers": layers}
