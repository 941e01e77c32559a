"""Weight-only int8/int4 quantized execution for the big DiT presets.

The reference runs its two default depth->image backends on ONE consumer
GPU via Nunchaku int4 quantization plus sequential CPU offload
(reference: tools/qwen_depth.py:50-62 — int4 QwenImageEditPlus 20B;
tools/flux_depth.py:12-30 — int4 FLUX.1-Depth-dev 12B + int4 T5).  The
TPU-native equivalent here is weight-only quantization with
dequantize-in-matmul:

* weights live in HBM as int8 (or int4) with one fp32 scale per output
  channel — 2x/4x smaller than bf16, so FLUX-12B (~12 GB int8) and
  Qwen-20B (~10 GB int4) fit a single 16 GB v5e chip;
* each matmul converts ONLY its own kernel to bf16 inside the layer
  (y = (x @ q.astype(bf16)) * scale), so the transient dequantized copy
  is one layer's kernel (<= ~75 MB), never the whole model — the XLA
  buffer is freed after the dot;
* the MXU consumes the converted operand exactly like a bf16 matmul:
  no scalar loops, static shapes, fp32 accumulation via
  preferred_element_type.

int4 storage packs TWO signed nibbles per int8 byte along the input dim
(kernel_p4 [in/2, out]) and unpacks with two arithmetic shifts inside the
matmul — pure elementwise ops XLA fuses into the MXU operand load.  The
native jnp.int4 dtype is deliberately NOT used at runtime: on the
tunneled TPU backend an eager op on an S4 array recurses forever in
device_put relayout (S4 tiled layout T(64,128)(8,1)); nibble-packed int8
has identical HBM footprint and none of the dtype hazards.
Symmetric per-output-channel absmax quantization: q = round(w/s),
s = max|w|/Qmax per column — the standard weight-only scheme; activations
stay bf16.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax.core import meta as flax_meta

_QMAX = {8: 127, 4: 7}


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Pack a [in, out] tensor of signed 4-bit values (in [-8, 7], any
    int dtype) into [in/2, out] int8: row 2i -> low nibble, row 2i+1 ->
    high nibble.  Requires an even input dim (every transformer dim in
    the presets is)."""
    assert q.shape[0] % 2 == 0, f"odd in-dim {q.shape} cannot pack int4"
    q = jnp.asarray(q, jnp.int32)
    packed = (q[0::2] & 0xF) | ((q[1::2] & 0xF) << 4)
    return packed.astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4: [in/2, out] int8 -> [in, out] int8.  Two
    arithmetic shifts per nibble (int8 << wraps mod 256; >> sign-extends)
    — elementwise, fused by XLA into the consuming matmul's operand."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return jnp.stack([lo, hi], axis=1).reshape(
        packed.shape[0] * 2, packed.shape[1])


def quantize_array(w: jnp.ndarray, bits: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric quantization of a [in, out] kernel.

    Returns (q, scale [out] f32) with dequant(q, s) = q * s[None, :];
    q is [in,out] int8 for bits=8, nibble-packed [in/2,out] int8 for
    bits=4 (see pack_int4).
    """
    qmax = _QMAX[bits]
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / qmax, 1e-12)
    q = jnp.clip(jnp.round(w / scale[None, :]), -qmax, qmax)
    if bits == 4:
        return pack_int4(q), scale.astype(jnp.float32)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def dequantize_array(q: jnp.ndarray, scale: jnp.ndarray,
                     dtype=jnp.float32, bits: int = 8) -> jnp.ndarray:
    if bits == 4:
        q = unpack_int4(q)
    return q.astype(dtype) * scale.astype(dtype)[None, :]


def _int_kernel_init(bits: int, axes):
    """Random init directly in the quantized representation.

    Draws a unit normal and discretizes at 3-sigma full scale; together
    with _scale_init the dequantized kernel reproduces lecun-normal
    statistics (std 1/sqrt(in_dim)), so random-weight benches behave
    like the bf16 path.  Carries the same logical partitioning axes as
    the bf16 kernels so tp sharding still applies.
    """
    qmax = _QMAX[bits]

    def init(key, shape, dtype):
        # bits=4: `shape` is the PACKED [in/2, out] shape
        full = (shape[0] * 2, shape[1]) if bits == 4 else shape
        w = jax.random.normal(key, full, jnp.float32)
        q = jnp.clip(jnp.round(w * (qmax / 3.0)), -qmax, qmax)
        return pack_int4(q) if bits == 4 else q.astype(dtype)

    return nn.with_logical_partitioning(init, axes)


class QuantDense(nn.Module):
    """Dense with an int8/int4 kernel and per-output-channel f32 scale.

    y = (x @ kernel.astype(compute_dtype)) * scale + bias — the scale is
    applied AFTER the matmul (mathematically identical for symmetric
    per-column scales, and the dequant stays a pure convert the TPU
    fuses into the MXU operand load).
    """
    features: int
    bits: int = 8
    use_bias: bool = True
    dtype: Any = jnp.bfloat16    # activation/compute dtype
    shard: str = "out"           # 'out' | 'in' tp-sharded kernel dim

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        axes = ("embed", "tp") if self.shard == "out" else ("tp", "embed")
        if self.bits == 4:
            assert in_dim % 2 == 0, f"int4 needs even in_dim, got {in_dim}"
            stored = self.param("kernel_p4",
                                _int_kernel_init(4, axes),
                                (in_dim // 2, self.features), jnp.int8)
        else:
            stored = self.param("kernel", _int_kernel_init(8, axes),
                                (in_dim, self.features), jnp.int8)
        # Anti-LICM barrier: tie the stored int kernel to the activation
        # so the unpack/dequant chain is loop-VARIANT inside while/fori
        # denoise loops.  Without it XLA's while-loop invariant code
        # motion hoists every layer's dequantized kernel out of the loop
        # and materializes them ALL simultaneously — observed 20.2 GB of
        # HLO temps (60+ hoisted 216 MB f32 converts) for the int4 20B
        # Qwen preset, i.e. the entire int4 HBM saving undone at compile
        # time.  The barrier keeps each dequant in-loop, transient, and
        # freed right after its matmul.
        stored, x = jax.lax.optimization_barrier((stored, x))
        kernel = unpack_int4(stored) if self.bits == 4 else stored
        qmax = _QMAX[self.bits]
        scale = self.param(
            "scale",
            lambda key, shape, dtype: jnp.full(
                shape, 3.0 / (qmax * np.sqrt(in_dim)), dtype),
            (self.features,), jnp.float32)
        y = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)


def quantize_tree(params: Dict[str, Any], bits: int,
                  select) -> Dict[str, Any]:
    """Quantize selected 2D 'kernel' leaves of a full-precision tree.

    select(path_tuple) -> bool decides which module dicts quantize; the
    kernel is replaced in place by its int representation and a sibling
    'scale' is added (the exact structure QuantDense expects).  Biases
    and every non-selected leaf pass through unchanged.  Logical-
    partitioning metadata boxes are stripped (apply accepts plain
    arrays; the quantized single-chip path never reshards params).
    """
    params = flax_meta.unbox(params)

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (k == "kernel" and hasattr(v, "ndim") and v.ndim == 2
                    and select(path)):
                q, s = quantize_array(v, bits)
                out["kernel_p4" if bits == 4 else "kernel"] = q
                out["scale"] = s
            else:
                out[k] = walk(v, path + (k,))
        return out

    return walk(params, ())


def fp_template_like(qtree: Dict[str, Any]) -> Dict[str, Any]:
    """Full-precision structural template for a quantized tree.

    Wherever a module dict holds an int 'kernel' with a sibling 'scale',
    the pair collapses to one f32 zeros kernel — the structure a
    checkpoint converter grafts into; quantize_tree() then reproduces
    the quantized structure from the grafted values."""
    qtree = flax_meta.unbox(qtree)

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "kernel_p4" in node and "scale" in node:
            out = {k: walk(v) for k, v in node.items()
                   if k not in ("scale", "kernel_p4")}
            h, o = node["kernel_p4"].shape
            out["kernel"] = np.zeros((h * 2, o), np.float32)
            return out
        if ("kernel" in node and "scale" in node
                and hasattr(node["kernel"], "dtype")
                and jnp.issubdtype(node["kernel"].dtype, jnp.integer)):
            out = {k: walk(v) for k, v in node.items() if k != "scale"}
            out["kernel"] = np.zeros(node["kernel"].shape, np.float32)
            return out
        return {k: walk(v) for k, v in node.items()}

    return walk(qtree)


def dit_block_select(path: Tuple[str, ...]) -> bool:
    """Quantization domain for MMDiT: every matmul inside the
    double-/single-stream blocks (attention qkv/out, MLPs, AdaLN
    modulation).  Embedders, norms and the output head stay bf16/f32 —
    together <1% of parameters."""
    return any(p.startswith(("double_", "single_")) for p in path)


def t5_block_select(path: Tuple[str, ...]) -> bool:
    """Quantization domain for the T5 encoder stack: the q/k/v/o and
    wi/wo kernels inside the layer blocks (reference runs the FLUX T5
    int4: tools/flux_depth.py:21-27)."""
    return any(p.startswith("block_") or p == "block" for p in path)


def vl_block_select(path: Tuple[str, ...]) -> bool:
    """Quantization domain for Qwen2.5-VL: text layers_* and vision
    blocks_* matmuls; embeddings, merger and norms stay bf16."""
    return any(p.startswith(("layers_", "blocks_")) for p in path)


def tree_bytes(params) -> int:
    """On-device bytes of a parameter tree (packed-int4 kernels are int8
    at half the logical element count, so itemsize accounting is exact).
    Accepts arrays or jax.ShapeDtypeStruct leaves (eval_shape trees)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        n = int(np.prod(leaf.shape))
        if "int4" in str(leaf.dtype):
            # np.dtype(int4).itemsize == 1 would overcount 2x; this repo
            # nibble-packs int4 into int8 so such a leaf reaching here
            # means an external/legacy tree (ADVICE r4 #3)
            total += (n + 1) // 2
        else:
            total += n * np.dtype(leaf.dtype).itemsize
    return total
