"""W8A8 int8 inference path.

TPU v5e's MXU runs int8 x int8 -> int32 at twice the bf16 rate
(~394 vs ~197 TOPS), so for inference-bound deployments the transformer
matmuls are quantized on the fly:

- weights: symmetric per-output-channel scales (max-abs / 127), quantized
  in-graph from the fp32 master params — checkpoints, converters, and the
  param tree are completely unchanged, and the quantize cost is one extra
  read of W per apply (amortized over the batch);
- activations, two modes:
  * ``dynamic`` (default): symmetric per-row scales (max-abs / 127),
    computed in-graph — no calibration needed, but each quantized matmul
    pays an extra max-reduction pass over its input;
  * ``static``: one per-tensor scale per matmul input, recorded offline by
    ``calibrate_int8`` (max-abs over representative batches, stored in the
    ``"quant"`` variable collection) — the production W8A8 recipe: the
    quantize step is a single fused multiply-round, no reduction;
- the matmul itself is ``lax.dot_general`` with int8 operands and an int32
  accumulator, which XLA lowers onto the MXU's native int8 path.

The reference has no quantized path (torch fp16 autocast only,
reference train.py:36-43); this is a TPU-native deployment addition,
exposed via ``get_model(..., quant_int8=True)`` / ``--quant int8`` and
``quant_mode="static"`` / ``--quant int8_static`` (after calibration).
"""

from __future__ import annotations

import logging
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


def int8_matmul_static(
    x: jnp.ndarray, kernel: jnp.ndarray, act_scale: jnp.ndarray, bias=None, out_dtype=None
):
    """(..., K) @ (K, N) with a precalibrated per-tensor activation scale:
    quantization is one fused multiply-round, no reduction pass over x."""
    out_dtype = out_dtype or x.dtype
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
    ).astype(jnp.int8)
    w_q, s_w = quantize_colwise(kernel)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (act_scale * s_w)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def int8_mlp_static(
    x: jnp.ndarray,
    k1: jnp.ndarray, b1, s1: jnp.ndarray,
    k2: jnp.ndarray, b2, s2: jnp.ndarray,
    act, out_dtype=None,
):
    """Transformer MLP (fc -> act -> proj) with both matmuls int8-static,
    fused so the ``mlp_ratio``-wide hidden never exists in HBM above int8.

    The unfused Int8Dense pair writes the hidden bf16 (2 bytes/elt), reads
    it back for the activation, and re-quantizes it for the proj matmul —
    3x the hidden bytes. Here the first dot's epilogue (dequant-scale +
    bias + act + re-quantize at the proj's calibrated scale ``s2``) is one
    XLA output fusion emitting int8 directly (A/B via EBC_FUSE_MLP, see
    scripts/bisect_trunk_unrolled.py).

    Numerics: the hidden stays fp32 inside the fusion instead of dipping
    through bf16 between fc and act, so results differ from the unfused
    pair only within bf16 rounding of the hidden (tested).

    ``s1``/``s2`` are the precalibrated per-tensor activation scales of
    the fc and proj inputs (same quantities Int8Dense static mode uses).
    """
    out_dtype = out_dtype or x.dtype
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s1), -127, 127
    ).astype(jnp.int8)
    w1_q, s_w1 = quantize_colwise(k1)
    acc1 = jax.lax.dot_general(
        x_q, w1_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc1.astype(jnp.float32) * (s1 * s_w1)
    if b1 is not None:
        h = h + b1.astype(jnp.float32)
    h = act(h)
    h_q = jnp.clip(jnp.round(h / s2), -127, 127).astype(jnp.int8)
    w2_q, s_w2 = quantize_colwise(k2)
    acc2 = jax.lax.dot_general(
        h_q, w2_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc2.astype(jnp.float32) * (s2 * s_w2)
    if b2 is not None:
        out = out + b2.astype(jnp.float32)
    return out.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` (same param names/shapes/init, so converted
    checkpoints load identically) whose matmul runs int8 on the MXU.

    ``quant_mode="static"`` uses the per-tensor activation scale from the
    ``"quant"`` collection (populate it with ``calibrate_int8`` first);
    ``"dynamic"`` computes per-row scales in-graph, and — when the
    ``"quant"`` collection is mutable — records the max-abs seen, which is
    exactly what calibration does."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    quant_mode: str = "dynamic"

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
        # Only touch the "quant" collection when static mode needs to read
        # it or a calibration pass (mutable "quant") wants to record — the
        # plain dynamic path must keep working with bare params/batch_stats.
        if self.quant_mode == "static":
            amax = self.variable("quant", "act_amax", lambda: jnp.zeros((), jnp.float32))
            return int8_matmul_static(
                x, kernel, jnp.maximum(amax.value, _EPS * 127.0) / 127.0,
                bias, out_dtype=self.dtype,
            )
        # (not during init: a dynamic-mode model's variable tree must stay
        # identical to nn.Dense's so converted checkpoints load unchanged)
        if not self.is_initializing() and self.is_mutable_collection("quant"):
            amax = self.variable("quant", "act_amax", lambda: jnp.zeros((), jnp.float32))
            amax.value = jnp.maximum(amax.value, jnp.abs(x.astype(jnp.float32)).max())
        return int8_matmul(x, kernel, bias, out_dtype=self.dtype)


class Int8Conv(nn.Module):
    """Drop-in for ``nn.Conv`` (same param names/shapes/init) whose
    convolution runs int8 on the MXU — measured 315 vs 189 TFLOP/s-equiv
    for the ClipEBC decoder's 3x3/768ch shape on v5e
    (scripts/bisect_conv_quant.py). Weights: per-output-channel scales;
    activations: per-tensor (static via the calibrated ``"quant"``
    collection, else one in-graph max-reduction). Symmetric quantization
    maps 0 -> 0, so zero padding is exact."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: tuple = (1, 1)
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    kernel_init: Any = nn.initializers.lecun_normal()
    quant_mode: str = "dynamic"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        kf = kernel.astype(jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0, _EPS)
        w_q = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)

        xf = x.astype(jnp.float32)
        if self.quant_mode == "static":
            amax = self.variable("quant", "act_amax", lambda: jnp.zeros((), jnp.float32))
            s_x = jnp.maximum(amax.value, _EPS * 127.0) / 127.0
        else:
            if not self.is_initializing() and self.is_mutable_collection("quant"):
                amax = self.variable(
                    "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
                )
                amax.value = jnp.maximum(amax.value, jnp.abs(xf).max())
            s_x = jnp.maximum(jnp.abs(xf).max() / 127.0, _EPS)
        x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)

        dn = jax.lax.conv_dimension_numbers(
            x.shape, w_q.shape, ("NHWC", "HWIO", "NHWC")
        )
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        acc = jax.lax.conv_general_dilated(
            x_q, w_q, self.strides, pad,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * (s_x * s_w)
        if bias is not None:
            out = out + bias
        return out.astype(self.dtype)


def calibrate_int8(apply_fn, variables, batches):
    """Record per-matmul activation max-abs over representative ``batches``.

    ``apply_fn(variables, batch)`` must run a *dynamic*-mode quant model's
    inference forward with ``mutable=["quant"]`` and return the flax
    ``(out, mutated_collections)`` pair; returns ``variables`` with the
    ``"quant"`` collection populated (running max across batches), ready
    for a ``quant_mode="static"`` model."""
    variables = dict(variables)
    for batch in batches:
        _, mut = apply_fn(variables, batch)
        if "quant" not in mut:
            raise ValueError(
                "calibration recorded nothing: the model has no quantized "
                "layers (flax omits an untouched mutable collection) — "
                "build it with quant_int8=True / a clip_* backbone"
            )
        variables["quant"] = mut["quant"]
    validate_quant_scales(variables)
    return variables


def validate_quant_scales(variables, strict: bool = False) -> None:
    """Check recorded ``act_amax`` scales after calibration.

    A zero amax means that layer was never exercised during calibration.
    If EVERY scale is zero the calibration recorded nothing (e.g. a
    static-mode model was calibrated directly instead of its dynamic
    twin — static mode only *reads* the scale, never records) — that is
    always an error. Individual zero leaves merely mean a branch the
    calibration forward never took (e.g. gated off by config); static
    inference only reads the scales of layers it executes, so those are
    reported as a WARNING naming each leaf (ADVICE r3: hard-failing here
    aborted previously-working calibrations). ``strict=True`` restores
    the hard error for setups where every registered layer must run."""
    import numpy as np

    quant = variables.get("quant")
    if not quant:
        raise ValueError("variables have no 'quant' collection — run calibrate_int8 first")

    def _fmt(path) -> str:
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    leaves = jax.tree_util.tree_flatten_with_path(quant)[0]
    bad = [_fmt(path) for path, leaf in leaves
           if not np.all(np.asarray(leaf) > 0)]
    if not bad:
        return
    msg = (
        "uncalibrated int8 activation scales (act_amax == 0) at: "
        + ", ".join(bad[:8])
        + (" …" if len(bad) > 8 else "")
        + " — calibrate the dynamic-mode twin (mutable=['quant']) on "
        "representative data before running quant_mode='static'"
    )
    if len(bad) == len(leaves) or strict:
        raise ValueError(msg)
    logging.getLogger("clip_ebc_tpu").warning(
        "%s (layers not exercised by the calibration forward; static "
        "inference is unaffected unless it executes them)", msg
    )
