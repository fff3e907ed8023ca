"""W8A8 int8 inference path.

TPU v5e's MXU runs int8 x int8 -> int32 at twice the bf16 rate
(~394 vs ~197 TOPS), so for inference-bound deployments the transformer
matmuls are quantized on the fly:

- weights: symmetric per-output-channel scales (max-abs / 127), quantized
  in-graph from the fp32 master params — checkpoints, converters, and the
  param tree are completely unchanged, and the quantize cost is one extra
  read of W per apply (amortized over the batch);
- activations: dynamic symmetric per-row scales (max-abs / 127), the
  standard W8A8 dynamic-quant recipe;
- the matmul itself is ``lax.dot_general`` with int8 operands and an int32
  accumulator, which XLA lowers onto the MXU's native int8 path.

The reference has no quantized path (torch fp16 autocast only,
reference train.py:36-43); this is a TPU-native deployment addition,
exposed via ``get_model(..., quant_int8=True)`` / ``--quant int8``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-8


def quantize_rowwise(x: jnp.ndarray):
    """Symmetric int8 quantization along the last axis: (..., K) ->
    (int8 values, fp32 scales (..., 1))."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_colwise(w: jnp.ndarray):
    """Symmetric per-output-channel quantization of a (K, N) kernel."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0  # (1, N)
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray, bias=None, out_dtype=None):
    """(..., K) @ (K, N) with W8A8 dynamic quantization; returns (..., N)."""
    out_dtype = out_dtype or x.dtype
    x_q, s_x = quantize_rowwise(x)
    w_q, s_w = quantize_colwise(kernel)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s_x * s_w)  # (..., N)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` (same param names/shapes/init, so converted
    checkpoints load identically) whose matmul runs int8 on the MXU."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return int8_matmul(x, kernel, bias, out_dtype=self.dtype)
