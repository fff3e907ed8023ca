"""W8A8 int8 inference path (ops/quant.py).

The reference has no quantized path (torch fp16 autocast only); this is a
TPU-native deployment addition, so the tests check internal consistency:
int8 matmul accuracy vs fp32, checkpoint-compatible param trees, and a
full flagship ClipEBC forward agreeing with the bf16 path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

from clip_ebc_tpu.ops.quant import Int8Dense, int8_matmul, quantize_rowwise


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    got = np.asarray(int8_matmul(x, w, b, out_dtype=jnp.float32))
    ref = np.asarray(x @ w + b)
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert np.median(rel) < 0.02, np.median(rel)
    # Symmetric per-row/per-channel quantization keeps errors bounded.
    assert np.max(np.abs(got - ref)) < 0.2 * np.max(np.abs(ref))


def test_quantize_rowwise_roundtrip_bounds():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 512)) * 3.0, jnp.float32)
    q, s = quantize_rowwise(x)
    assert q.dtype == jnp.int8 and s.shape == (8, 1)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    # max error per element is half a quantization step = scale/2
    assert np.all(np.abs(deq - np.asarray(x)) <= np.asarray(s) / 2 + 1e-6)


def test_int8_dense_param_tree_matches_nn_dense():
    """Converted torch checkpoints must load into the int8 model unchanged."""
    x = jnp.zeros((2, 32), jnp.float32)
    p_ref = nn.Dense(16, dtype=jnp.bfloat16).init(jax.random.PRNGKey(0), x)
    p_q = Int8Dense(16, dtype=jnp.bfloat16).init(jax.random.PRNGKey(0), x)
    ref_shapes = jax.tree.map(lambda a: (a.shape, a.dtype), p_ref)
    q_shapes = jax.tree.map(lambda a: (a.shape, a.dtype), p_q)
    assert ref_shapes == q_shapes


def test_int8_dense_matches_fp32_dense_with_shared_params():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    params = nn.Dense(32).init(jax.random.PRNGKey(1), x)
    ref = np.asarray(nn.Dense(32).apply(params, x))
    got = np.asarray(Int8Dense(32, dtype=jnp.float32).apply(params, x))
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert np.median(rel) < 0.02


def test_clip_ebc_quant_forward_close_to_bf16():
    """Full flagship model: quant_int8 and plain bf16 share one param tree
    and must produce close density maps / total counts."""
    from clip_ebc_tpu.config import get_bins_and_anchors
    from clip_ebc_tpu.models import get_model

    bins, anchors = get_bins_and_anchors(
        reduction=8, truncation=4, dataset="qnrf",
        granularity="fine", anchor_points="average",
    )
    kw = dict(input_size=224, reduction=8, bins=bins, anchor_points=anchors,
              num_vpt=2, dtype=jnp.bfloat16)
    base = get_model("clip_vit_b_16", **kw)
    quant = get_model("clip_vit_b_16", **kw, quant_int8=True)

    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 224, 224, 3)), jnp.float32)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    # identical param tree: the quant model initializes the same names/shapes
    v_q = quant.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.map(lambda a: a.shape, variables) == jax.tree.map(lambda a: a.shape, v_q)

    d_ref = np.asarray(base.apply(variables, x, train=False), np.float32)
    d_q = np.asarray(quant.apply(variables, x, train=False), np.float32)
    assert d_q.shape == d_ref.shape
    c_ref, c_q = d_ref.sum(), d_q.sum()
    # bf16 randomly-initialized nets: counts should agree within a few percent
    assert abs(c_q - c_ref) <= 0.05 * max(abs(c_ref), 1.0), (c_ref, c_q)
    # densities pointwise close in the same ballpark
    assert np.median(np.abs(d_q - d_ref)) <= 0.05 * (np.abs(d_ref).max() + 1e-6)


def test_int8_static_calibrate_then_matches_dynamic():
    """Static mode: calibrate on a batch, then static forward agrees with
    the dynamic path (same per-tensor range when the eval data matches the
    calibration data) and with fp32 within quantization tolerance."""
    from clip_ebc_tpu.ops.quant import calibrate_int8

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    params = nn.Dense(32).init(jax.random.PRNGKey(1), x)

    dyn = Int8Dense(32, dtype=jnp.float32, quant_mode="dynamic")
    static = Int8Dense(32, dtype=jnp.float32, quant_mode="static")

    variables = calibrate_int8(
        lambda v, b: dyn.apply(v, b, mutable=["quant"]), dict(params), [x]
    )
    assert float(variables["quant"]["act_amax"]) > 0.0

    ref = np.asarray(nn.Dense(32).apply(params, x))
    got = np.asarray(static.apply(variables, x))
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert np.median(rel) < 0.03, np.median(rel)


def test_int8_static_running_max_across_batches():
    rng = np.random.default_rng(5)
    small = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    big = small * 10.0
    params = nn.Dense(8).init(jax.random.PRNGKey(0), small)
    dyn = Int8Dense(8, quant_mode="dynamic")
    from clip_ebc_tpu.ops.quant import calibrate_int8

    v = calibrate_int8(
        lambda vv, b: dyn.apply(vv, b, mutable=["quant"]),
        dict(params), [small, big, small],
    )
    assert np.isclose(
        float(v["quant"]["act_amax"]), float(jnp.abs(big).max()), rtol=1e-6
    )


def test_clip_ebc_static_quant_end_to_end():
    """Flagship model: dynamic-mode calibration populates every trunk
    matmul's scale; the static model then runs and stays close to bf16."""
    from clip_ebc_tpu.config import get_bins_and_anchors
    from clip_ebc_tpu.models import get_model

    bins, anchors = get_bins_and_anchors(
        reduction=8, truncation=4, dataset="qnrf",
        granularity="fine", anchor_points="average",
    )
    kw = dict(input_size=224, reduction=8, bins=bins, anchor_points=anchors,
              num_vpt=2, dtype=jnp.bfloat16)
    base = get_model("clip_vit_b_16", **kw)
    dyn = get_model("clip_vit_b_16", **kw, quant_int8=True)
    static = get_model("clip_vit_b_16", **kw, quant_int8=True, quant_mode="static")

    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(1, 224, 224, 3)), jnp.float32
    )
    variables = dict(base.init(jax.random.PRNGKey(0), x, train=False))

    from clip_ebc_tpu.ops.quant import calibrate_int8

    variables = calibrate_int8(
        lambda v, b: dyn.apply(v, b, train=False, mutable=["quant"]),
        variables, [x],
    )
    # every trunk resblock matmul got a positive scale (leaves may be
    # vectors, e.g. the (3,) per-{q,k,v} qkv_amax ranges)
    leaves = jax.tree.leaves(variables["quant"])
    assert len(leaves) >= 12 * 4 and all(
        float(jnp.min(v)) > 0 for v in leaves
    )

    d_ref = np.asarray(base.apply(variables, x, train=False), np.float32)
    d_s = np.asarray(static.apply(variables, x, train=False), np.float32)
    c_ref, c_s = d_ref.sum(), d_s.sum()
    assert abs(c_s - c_ref) <= 0.08 * max(abs(c_ref), 1.0), (c_ref, c_s)


def test_int8_conv_matches_conv():
    """Int8Conv: param tree identical to nn.Conv; output within
    quantization tolerance of the fp32 conv."""
    from clip_ebc_tpu.ops.quant import Int8Conv

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    conv = nn.Conv(24, (3, 3), padding=((1, 1), (1, 1)))
    v = conv.init(jax.random.PRNGKey(0), x)
    q = Int8Conv(24, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.float32)
    vq = q.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(lambda a: (a.shape, a.dtype), v) == jax.tree.map(
        lambda a: (a.shape, a.dtype), vq
    )
    ref = np.asarray(conv.apply(v, x))
    got = np.asarray(q.apply(v, x))
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert np.median(rel) < 0.03, np.median(rel)


def test_int8_conv_static_calibration():
    from clip_ebc_tpu.ops.quant import Int8Conv, calibrate_int8

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    conv = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))
    v = dict(conv.init(jax.random.PRNGKey(0), x))
    dyn = Int8Conv(8, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.float32)
    static = Int8Conv(
        8, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.float32, quant_mode="static"
    )
    v = calibrate_int8(lambda vv, b: dyn.apply(vv, b, mutable=["quant"]), v, [x])
    ref = np.asarray(conv.apply(v, x))
    got = np.asarray(static.apply(v, x))
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert np.median(rel) < 0.03, np.median(rel)


def test_clip_ebc_int8_decoder_param_compat():
    """quant_int8 must not change the ClipEBC param tree (decoder conv
    scope pinned to Conv_0), so trained/converted checkpoints load as-is."""
    from clip_ebc_tpu.config import get_bins_and_anchors
    from clip_ebc_tpu.models import get_model

    bins, anchors = get_bins_and_anchors(
        reduction=8, truncation=4, dataset="qnrf",
        granularity="fine", anchor_points="average",
    )
    kw = dict(input_size=224, reduction=8, bins=bins, anchor_points=anchors,
              num_vpt=2, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    base = get_model("clip_vit_b_16", **kw)
    quant = get_model("clip_vit_b_16", **kw, quant_int8=True)
    v = base.init(jax.random.PRNGKey(0), x, train=False)
    vq = quant.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.map(lambda a: a.shape, v) == jax.tree.map(lambda a: a.shape, vq)


def test_validate_quant_scales_rejects_uncalibrated():
    """Static mode with act_amax==0 would saturate every activation to
    ±127 and silently produce garbage — calibrate_int8 must reject the
    recording (e.g. when a static-mode model was calibrated directly
    instead of its dynamic twin, which never updates amax)."""
    from clip_ebc_tpu.ops.quant import Int8Dense, calibrate_int8, validate_quant_scales

    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)), jnp.float32)
    static = Int8Dense(8, dtype=jnp.float32, quant_mode="static")
    v = dict(static.init(jax.random.PRNGKey(0), x))

    # calibrating the static model directly records nothing but zeros
    with pytest.raises(ValueError, match="uncalibrated"):
        calibrate_int8(lambda vv, b: static.apply(vv, b, mutable=["quant"]), v, [x])

    # the dynamic twin records real ranges and passes
    dyn = Int8Dense(8, dtype=jnp.float32)
    v2 = calibrate_int8(lambda vv, b: dyn.apply(vv, b, mutable=["quant"]), v, [x])
    validate_quant_scales(v2)

    with pytest.raises(ValueError, match="quant"):
        validate_quant_scales({"params": v["params"]})


def test_validate_quant_scales_partial_warns_not_raises(caplog):
    """A quant leaf on a layer the calibration forward never exercised
    (e.g. a config-gated branch) must not abort an otherwise-valid
    calibration: partial zeros WARN with readable paths; strict=True (or
    all-zero) still raises (ADVICE r3 item 3)."""
    import logging

    from clip_ebc_tpu.ops.quant import validate_quant_scales

    quant = {
        "Dense_0": {"act_amax": np.asarray(1.5, np.float32)},
        "gated_branch": {"act_amax": np.asarray(0.0, np.float32)},
    }
    # a prior test may have routed the package logger through its own
    # handler (utils/logging.get_logger sets propagate=False); caplog
    # listens on root, so force propagation for the assertion
    lg = logging.getLogger("clip_ebc_tpu")
    old_propagate = lg.propagate
    lg.propagate = True
    try:
        with caplog.at_level(logging.WARNING, logger="clip_ebc_tpu"):
            validate_quant_scales({"quant": quant})
    finally:
        lg.propagate = old_propagate
    assert any("gated_branch/act_amax" in r.message for r in caplog.records)
    assert not any("DictKey" in r.message for r in caplog.records)

    with pytest.raises(ValueError, match="gated_branch"):
        validate_quant_scales({"quant": quant}, strict=True)


def test_fused_static_mlp_matches_unfused_pair(monkeypatch):
    """ResidualAttentionBlock static-int8 MLP: the XLA-fused path
    (act+re-quantize folded into the fc dot's epilogue, int8 hidden —
    EBC_FUSE_MLP=1, opt-in: measured 33.75 vs 31.18 ms/image on chip, so
    the unfused pair is the default) agrees with the unfused Int8Dense
    pair (EBC_FUSE_MLP=0) within bf16 rounding of the hidden, on the SAME
    params/variables (the trees must be interchangeable)."""
    from clip_ebc_tpu.models.transformer import ResidualAttentionBlock
    from clip_ebc_tpu.ops.quant import calibrate_int8

    d, heads, L, B = 64, 2, 12, 3
    from clip_ebc_tpu.models.transformer import make_dense_cls

    mk = lambda: ResidualAttentionBlock(
        num_heads=heads, dtype=jnp.float32, fused_qkv=True,
        quant_int8=True, quant_mode="static",
        dense_cls=make_dense_cls(True, "static"),
    )
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(B, L, d)), jnp.float32
    )
    variables = dict(mk().init(jax.random.PRNGKey(0), x))
    dyn = ResidualAttentionBlock(
        num_heads=heads, dtype=jnp.float32, fused_qkv=True,
        quant_int8=True, quant_mode="dynamic",
        dense_cls=make_dense_cls(True, "dynamic"),
    )
    variables = calibrate_int8(
        lambda v, b: dyn.apply(v, b, mutable=["quant"]), variables, [x]
    )

    monkeypatch.setenv("EBC_FUSE_MLP", "0")
    ref = np.asarray(mk().apply(variables, x), np.float32)
    monkeypatch.setenv("EBC_FUSE_MLP", "1")
    got = np.asarray(mk().apply(variables, x), np.float32)
    # identical int8 matmul operands except the hidden's bf16 dip on the
    # unfused path -> small relative disagreement
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-2)
    assert np.median(rel) < 0.02, np.median(rel)
    assert np.max(rel) < 0.35, np.max(rel)
