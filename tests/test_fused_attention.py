"""Fused qkv-attention kernel (ops/fused_attention.py).

Oracle is the einsum reference on the same (B, L, 3D) layout; the packed
head-pair zero-masking must be exact, so tolerances are bf16 rounding only.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.ops.fused_attention import (
    _forward,
    _reference,
    fused_qkv_attention,
    supports,
)


def _qkv(b, l, d, dtype=jnp.float32, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, l, 3 * d)), dtype
    )


def test_matches_reference_exact_len():
    b, l, h, d = 3, 256, 12, 768
    qkv = _qkv(b, l, d)
    out = _forward(qkv, h, l, (d // h) ** -0.5, block_b=2, interpret=True)
    ref = _reference(qkv, h, l, (d // h) ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_matches_reference_padded_rows():
    """kv_len < L: padded rows must not affect real tokens."""
    b, l, kv, h, d = 2, 256, 229, 12, 768
    qkv = _qkv(b, l, d, seed=1)
    out = _forward(qkv, h, kv, (d // h) ** -0.5, block_b=2, interpret=True)
    ref = _reference(qkv[:, :kv], h, kv, (d // h) ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out[:, :kv]), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_padding_rows_are_ignored_as_keys():
    """Corrupting padded rows must not change real-token outputs."""
    b, l, kv, h, d = 1, 128, 100, 8, 512
    qkv = np.asarray(_qkv(b, l, d, seed=2))
    qkv2 = qkv.copy()
    qkv2[:, kv:] = 1e3  # garbage in the pad region
    sm = (d // h) ** -0.5
    o1 = _forward(jnp.asarray(qkv), h, kv, sm, block_b=1, interpret=True)
    o2 = _forward(jnp.asarray(qkv2), h, kv, sm, block_b=1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(o1[:, :kv]), np.asarray(o2[:, :kv]), rtol=1e-6, atol=1e-6
    )


def test_bf16_close():
    b, l, h, d = 2, 128, 12, 768
    qkv = _qkv(b, l, d, jnp.bfloat16, seed=3)
    out = _forward(qkv, h, l, (d // h) ** -0.5, block_b=2, interpret=True)
    ref = _reference(qkv.astype(jnp.float32), h, l, (d // h) ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_unsupported_shapes_fall_back():
    assert supports(12, 64) and supports(8, 64)
    assert not supports(11, 64) and not supports(12, 96)
    b, l, h, d = 1, 64, 3, 96 * 3  # dh=96 -> reference path
    qkv = _qkv(b, l, d, seed=4)
    out = fused_qkv_attention(qkv, h, l, (d // h) ** -0.5)
    ref = _reference(qkv, h, l, (d // h) ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_gradients_flow():
    """custom_vjp backward (pair-packed Pallas bwd kernel) matches the
    einsum-path autograd."""
    b, l, h, d = 1, 64, 8, 512
    qkv = _qkv(b, l, d, seed=5)
    sm = (d // h) ** -0.5

    g1 = jax.grad(
        lambda x: fused_qkv_attention(x, h, l, sm, 4, True).sum()
    )(qkv)
    g2 = jax.grad(lambda x: _reference(x, h, l, sm).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


def test_gradients_padded_kv():
    """Backward with kv_len < L: grads of the real-token outputs match the
    einsum path, and padded rows receive no spurious key/value gradient."""
    b, l, kv, h, d = 2, 128, 100, 8, 512
    qkv = _qkv(b, l, d, seed=7)
    sm = (d // h) ** -0.5

    g1 = jax.grad(
        lambda x: fused_qkv_attention(x, h, kv, sm, 2, True)[:, :kv].sum()
    )(qkv)
    g2 = jax.grad(lambda x: _reference(x, h, kv, sm)[:, :kv].sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)
    # masked keys/values contribute nothing -> zero gradient in the pad
    np.testing.assert_allclose(np.asarray(g1[:, kv:, d:]), 0.0, atol=1e-6)


def test_gradients_bf16():
    """bf16 backward (the train-step dtype) stays within bf16 rounding of
    the fp32 einsum autograd."""
    b, l, h, d = 2, 128, 12, 768
    qkv32 = _qkv(b, l, d, seed=8)
    sm = (d // h) ** -0.5

    g1 = jax.grad(
        lambda x: fused_qkv_attention(
            x.astype(jnp.bfloat16), h, l, sm, 2, True
        ).astype(jnp.float32).sum()
    )(qkv32)
    g2 = jax.grad(lambda x: _reference(x, h, l, sm).sum())(qkv32)
    a, b_ = np.asarray(g1, np.float32), np.asarray(g2)
    assert np.median(np.abs(a - b_)) < 2e-2 * (np.abs(b_).max() + 1e-6)


@pytest.mark.parametrize("num_vpt", [0, 32])
def test_clip_vit_padded_trunk_matches_sdpa(num_vpt):
    """The fused/padded trunk (fused_qkv=True, kernel forced to interpret
    mode so it runs on CPU) must equal the unpadded sdpa trunk with the
    same params."""
    from clip_ebc_tpu.models.clip.image_encoder import ClipViT

    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(1, 96, 96, 3)), jnp.float32
    )
    base = ClipViT(variant="vit_b_16", input_size=96, num_vpt=num_vpt)
    v = base.init(jax.random.PRNGKey(0), x, False)
    ref = base.apply(v, x, False)

    # monkeypatch the kernel entry to interpret mode so fused_qkv=True runs
    # on CPU through the same code path as TPU
    import clip_ebc_tpu.ops.fused_attention as FA
    import functools

    orig = FA.fused_qkv_attention
    try:
        FA.fused_qkv_attention = functools.partial(orig, interpret=True)
        fused = ClipViT(variant="vit_b_16", input_size=96, num_vpt=num_vpt,
                        fused_qkv=True)
        got = fused.apply(v, x, False)
    finally:
        FA.fused_qkv_attention = orig

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# fused LN + qkv projection + attention
# ---------------------------------------------------------------------------


def _lnqkv_inputs(b, l, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, l, d)), dtype)
    g = jnp.asarray(rng.uniform(0.8, 1.2, d), jnp.float32)
    be = jnp.asarray(rng.normal(size=d) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=3 * d) * 0.02, jnp.float32)
    return x, g, be, w, bias


def test_fused_ln_qkv_matches_reference():
    from clip_ebc_tpu.ops.fused_attention import (
        _ln_qkv_reference,
        fused_ln_qkv_attention,
    )

    b, l, h, d = 2, 128, 12, 768
    x, g, be, w, bias = _lnqkv_inputs(b, l, d)
    sm = (d // h) ** -0.5
    out = fused_ln_qkv_attention(x, g, be, w, bias, h, l, sm)
    ref = _ln_qkv_reference(
        x, g, be, w, jnp.ones((3 * d,), jnp.float32), bias, h, l, sm, 1e-5
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_ln_qkv_padded_kv():
    from clip_ebc_tpu.ops.fused_attention import (
        _ln_qkv_reference,
        fused_ln_qkv_attention,
    )

    b, l, kv, h, d = 1, 256, 229, 12, 768
    x, g, be, w, bias = _lnqkv_inputs(b, l, d, seed=1)
    sm = (d // h) ** -0.5
    out = fused_ln_qkv_attention(x, g, be, w, bias, h, kv, sm)
    ref = _ln_qkv_reference(
        x[:, :kv], g, be, w, jnp.ones((3 * d,), jnp.float32), bias, h, kv, sm, 1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :kv]), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_fused_ln_qkv_int8_close():
    from clip_ebc_tpu.ops.fused_attention import (
        _ln_qkv_reference,
        fused_ln_qkv_attention_int8,
    )

    b, l, h, d = 1, 128, 12, 768
    x, g, be, w, bias = _lnqkv_inputs(b, l, d, seed=2)
    sm = (d // h) ** -0.5
    # true LN-output max-abs as the calibrated scale
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    y = (xf - mu) / np.sqrt(((xf - mu) ** 2).mean(-1, keepdims=True) + 1e-5)
    y = y * np.asarray(g) + np.asarray(be)
    act_scale = jnp.asarray(np.abs(y).max() / 127.0)
    out = fused_ln_qkv_attention_int8(x, g, be, w, bias, act_scale, h, l, sm)
    ref = _ln_qkv_reference(
        x, g, be, w, jnp.ones((3 * d,), jnp.float32), bias, h, l, sm, 1e-5
    )
    # int8 quantization noise; attention softmax compresses it further
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert np.median(err) < 0.02 * (np.abs(np.asarray(ref)).max() + 1e-6)


def test_fused_ln_qkv_int8_quant_attn_close():
    """quant_attn=True (int8 QK^T/PV inside the kernel) stays close to the
    float reference. Measured SLOWER than the bf16 attention matmuls on v5e
    (3136 vs 3456 w/s pipeline) — kept as an opt-in knob, off by default."""
    from clip_ebc_tpu.ops.fused_attention import (
        _ln_qkv_reference,
        fused_ln_qkv_attention_int8,
    )

    b, l, h, d = 1, 128, 12, 768
    x, g, be, w, bias = _lnqkv_inputs(b, l, d, seed=11)
    sm = (d // h) ** -0.5
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    y = (xf - mu) / np.sqrt(((xf - mu) ** 2).mean(-1, keepdims=True) + 1e-5)
    y = y * np.asarray(g) + np.asarray(be)
    act_scale = jnp.asarray(np.abs(y).max() / 127.0)
    out = fused_ln_qkv_attention_int8(
        x, g, be, w, bias, act_scale, h, l, sm, quant_attn=True
    )
    ref = _ln_qkv_reference(
        x, g, be, w, jnp.ones((3 * d,), jnp.float32), bias, h, l, sm, 1e-5
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert np.median(err) < 0.03 * (np.abs(np.asarray(ref)).max() + 1e-6)


def test_fused_ln_qkv_int8_static_attn_scales_close():
    """attn_scales (CALIBRATED per-{q,k,v} scales -> fully static int8
    attention, no in-kernel reductions) stays close to the float
    reference. This is the production quant_attn path."""
    from clip_ebc_tpu.ops.fused_attention import (
        _ln_qkv_reference,
        fused_ln_qkv_attention_int8,
    )

    b, l, h, d = 2, 128, 12, 768
    x, g, be, w, bias = _lnqkv_inputs(b, l, d, seed=13)
    sm = (d // h) ** -0.5
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    y = (xf - mu) / np.sqrt(((xf - mu) ** 2).mean(-1, keepdims=True) + 1e-5)
    y = y * np.asarray(g) + np.asarray(be)
    act_scale = jnp.asarray(np.abs(y).max() / 127.0)
    # "calibrate" the q/k/v output ranges exactly (float qkv projection)
    qkv_f = y @ np.asarray(w, np.float32) + np.asarray(bias, np.float32)
    amax3 = np.abs(qkv_f.reshape(b * l, 3, d)).max(axis=(0, 2))
    attn_scales = jnp.asarray(amax3 / 127.0, jnp.float32)
    out = fused_ln_qkv_attention_int8(
        x, g, be, w, bias, act_scale, h, l, sm, attn_scales=attn_scales
    )
    ref = _ln_qkv_reference(
        x, g, be, w, jnp.ones((3 * d,), jnp.float32), bias, h, l, sm, 1e-5
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert np.median(err) < 0.03 * (np.abs(np.asarray(ref)).max() + 1e-6)


def test_fused_ln_qkv_static_attn_padded_kv():
    """Padded rows (>= kv_len) must not influence real tokens on the
    static-int8 attention path (they are masked as keys before softmax)."""
    from clip_ebc_tpu.ops.fused_attention import fused_ln_qkv_attention_int8

    b, l, kv, h, d = 1, 128, 100, 12, 768
    x, g, be, w, bias = _lnqkv_inputs(b, l, d, seed=14)
    act_scale = jnp.asarray(3.0 / 127.0)
    scales = jnp.full((3,), 4.0 / 127.0, jnp.float32)
    sm = (d // h) ** -0.5
    out1 = fused_ln_qkv_attention_int8(
        x, g, be, w, bias, act_scale, h, kv, sm, attn_scales=scales
    )
    # wildly different padding content must not change real-row outputs
    x2 = x.at[:, kv:].set(7.7)
    out2 = fused_ln_qkv_attention_int8(
        x2, g, be, w, bias, act_scale, h, kv, sm, attn_scales=scales
    )
    np.testing.assert_array_equal(
        np.asarray(out1[:, :kv]), np.asarray(out2[:, :kv])
    )


def test_fused_ln_qkv_gradients():
    from clip_ebc_tpu.ops.fused_attention import (
        _ln_qkv_reference,
        fused_ln_qkv_attention,
    )

    b, l, h, d = 1, 64, 8, 512
    x, g, be, w, bias = _lnqkv_inputs(b, l, d, seed=3)
    sm = (d // h) ** -0.5
    ones = jnp.ones((3 * d,), jnp.float32)

    g1 = jax.grad(
        lambda xx, ww: fused_ln_qkv_attention(xx, g, be, ww, bias, h, l, sm).sum(),
        argnums=(0, 1),
    )(x, w)
    g2 = jax.grad(
        lambda xx, ww: _ln_qkv_reference(
            xx, g, be, ww, ones, bias, h, l, sm, 1e-5
        ).sum(),
        argnums=(0, 1),
    )(x, w)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_block_fused_ln_path_matches_unfused():
    """ResidualAttentionBlock with fused_qkv=True (fused-LN kernel path)
    must equal the plain sdpa block with the same params."""
    from clip_ebc_tpu.models.transformer import ResidualAttentionBlock

    b, l, h, d = 2, 100, 12, 768
    x = jnp.asarray(np.random.default_rng(4).normal(size=(b, l, d)), jnp.float32)
    base = ResidualAttentionBlock(num_heads=h)
    v = base.init(jax.random.PRNGKey(0), x)
    ref = base.apply(v, x)
    # pad like the trunks do, mark real length
    lp = -(-l // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    fused = ResidualAttentionBlock(num_heads=h, fused_qkv=True, kv_len=l)
    got = fused.apply(v, xp)[:, :l]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4)


def test_block_fused_ln_static_int8_runs():
    """Static-int8 block: calibration (unfused, records in_proj amax) then
    the fused int8 kernel path; output stays close to fp32."""
    import functools

    from clip_ebc_tpu.models.transformer import ResidualAttentionBlock
    from clip_ebc_tpu.ops.quant import Int8Dense, calibrate_int8

    b, l, h, d = 1, 128, 12, 768
    x = jnp.asarray(np.random.default_rng(5).normal(size=(b, l, d)), jnp.float32)
    dense = functools.partial(Int8Dense, quant_mode="static")
    blk = ResidualAttentionBlock(
        num_heads=h, fused_qkv=True, kv_len=l, quant_int8=True,
        quant_mode="static", dense_cls=dense,
    )
    dyn = ResidualAttentionBlock(
        num_heads=h, fused_qkv=True, kv_len=l, quant_int8=True,
        quant_mode="dynamic", dense_cls=Int8Dense,
    )
    v = dict(blk.init(jax.random.PRNGKey(0), x))
    v = calibrate_int8(lambda vv, bb: dyn.apply(vv, bb, mutable=["quant"]), v, [x])
    got = np.asarray(blk.apply(v, x), np.float32)

    ref = np.asarray(
        ResidualAttentionBlock(num_heads=h).apply({"params": v["params"]}, x),
        np.float32,
    )
    err = np.abs(got - ref)
    assert np.median(err) < 0.05 * (np.abs(ref).max() + 1e-6), np.median(err)


def test_block_quant_attn_static_end_to_end():
    """quant_attn=True: calibration records the q/k/v output ranges
    (``qkv_amax``), and the static block runs the fully-int8 attention —
    output stays close to fp32, and the qkv_amax variable really is in
    the calibrated tree."""
    import functools

    from clip_ebc_tpu.models.transformer import ResidualAttentionBlock
    from clip_ebc_tpu.ops.quant import Int8Dense, calibrate_int8

    b, l, h, d = 1, 128, 12, 768
    x = jnp.asarray(np.random.default_rng(6).normal(size=(b, l, d)), jnp.float32)
    dense = functools.partial(Int8Dense, quant_mode="static")
    blk = ResidualAttentionBlock(
        num_heads=h, fused_qkv=True, kv_len=l, quant_int8=True,
        quant_mode="static", dense_cls=dense, quant_attn=True,
    )
    dyn = ResidualAttentionBlock(
        num_heads=h, fused_qkv=True, kv_len=l, quant_int8=True,
        quant_mode="dynamic", dense_cls=Int8Dense,
    )
    v = dict(blk.init(jax.random.PRNGKey(0), x))
    v = calibrate_int8(lambda vv, bb: dyn.apply(vv, bb, mutable=["quant"]), v, [x])
    amax3 = np.asarray(v["quant"]["attn"]["qkv_amax"])
    assert amax3.shape == (3,) and (amax3 > 0).all()
    got = np.asarray(blk.apply(v, x), np.float32)

    ref = np.asarray(
        ResidualAttentionBlock(num_heads=h).apply({"params": v["params"]}, x),
        np.float32,
    )
    err = np.abs(got - ref)
    assert np.median(err) < 0.05 * (np.abs(ref).max() + 1e-6), np.median(err)


def test_fused_ln_mlp_int8_close():
    """x + proj(gelu(fc(LN(x)))) in one int8 kernel vs the fp32 chain."""
    from clip_ebc_tpu.ops.fused_attention import fused_ln_mlp_int8
    from clip_ebc_tpu.models.transformer import quick_gelu

    rng = np.random.default_rng(9)
    b, l, d = 2, 128, 768
    x = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.8, 1.2, d), jnp.float32)
    be = jnp.asarray(rng.normal(size=d) * 0.1, jnp.float32)
    wfc = jnp.asarray(rng.normal(size=(d, 4 * d)) * 0.03, jnp.float32)
    bfc = jnp.asarray(rng.normal(size=4 * d) * 0.02, jnp.float32)
    wpj = jnp.asarray(rng.normal(size=(4 * d, d)) * 0.03, jnp.float32)
    bpj = jnp.asarray(rng.normal(size=d) * 0.02, jnp.float32)

    xf = np.asarray(x)
    mu = xf.mean(-1, keepdims=True)
    y = (xf - mu) / np.sqrt(((xf - mu) ** 2).mean(-1, keepdims=True) + 1e-5)
    y = y * np.asarray(g) + np.asarray(be)
    h = y @ np.asarray(wfc) + np.asarray(bfc)
    act1 = jnp.asarray(np.abs(y).max() / 127.0)
    hg = h * (1.0 / (1.0 + np.exp(-1.702 * h)))
    act2 = jnp.asarray(np.abs(hg).max() / 127.0)
    ref = xf + hg @ np.asarray(wpj) + np.asarray(bpj)

    out = fused_ln_mlp_int8(x, g, be, wfc, bfc, act1, wpj, bpj, act2)
    err = np.abs(np.asarray(out, np.float32) - ref)
    assert np.median(err) < 0.03 * (np.abs(ref).max() + 1e-6), np.median(err)


def test_fused_ln_mlp_int8_padding_passthrough():
    """Padded rows are per-token math only: corrupting them must not change
    real rows."""
    from clip_ebc_tpu.ops.fused_attention import fused_ln_mlp_int8

    rng = np.random.default_rng(10)
    d = 512
    x = rng.normal(size=(1, 128, d)).astype(np.float32)
    x2 = x.copy()
    x2[:, 100:] = 7.7
    args = (
        jnp.ones(d), jnp.zeros(d),
        jnp.asarray(rng.normal(size=(d, 4 * d)) * 0.03, jnp.float32),
        jnp.zeros(4 * d),
        jnp.asarray(0.05),
        jnp.asarray(rng.normal(size=(4 * d, d)) * 0.03, jnp.float32),
        jnp.zeros(d),
        jnp.asarray(0.05),
    )
    o1 = fused_ln_mlp_int8(jnp.asarray(x), *args)
    o2 = fused_ln_mlp_int8(jnp.asarray(x2), *args)
    np.testing.assert_allclose(
        np.asarray(o1[:, :100]), np.asarray(o2[:, :100]), rtol=1e-6, atol=1e-6
    )


def test_fused_trunk_pod_sharded_sliding_window():
    """The Pallas fused path must compose with the pod-sharded sliding
    window (GSPMD partitions the pallas_call over the window batch)."""
    from jax.sharding import Mesh

    from clip_ebc_tpu.models.clip.image_encoder import ClipViT
    from clip_ebc_tpu.ops.sliding_window import sliding_window_predict

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    model = ClipViT(variant="vit_b_16", input_size=96, num_vpt=2, fused_qkv=True)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, False)

    def fwd(variables, images):
        return model.apply(variables, images, False).mean(-1)

    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(192, 288, 3)), jnp.float32
    )
    out = sliding_window_predict(
        fwd, v, img, window=(96, 96), stride=(48, 48), reduction=16,
        strategy="average", mesh=mesh,
    )
    assert out.shape == (12, 18)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_ln_qkv_frozen_backward_matches_reference():
    """frozen=True routes the backward through the single fused Pallas
    kernel (_ln_qkv_bwd_frozen): dx must match the reference recompute,
    and the param cotangents must come back exactly zero (correct because
    the caller stop_gradients the frozen subtree)."""
    from clip_ebc_tpu.ops.fused_attention import (
        _ln_qkv_reference,
        fused_ln_qkv_attention,
    )

    b, l, h, d = 2, 64, 8, 512
    x, g, be, w, bias = _lnqkv_inputs(b, l, d, seed=5)
    sm = (d // h) ** -0.5
    ones = jnp.ones((3 * d,), jnp.float32)

    got = jax.grad(
        lambda xx, gg, bb, ww, bi: fused_ln_qkv_attention(
            xx, gg, bb, ww, bi, h, l, sm, 1e-5, 2, True, True
        ).sum(),
        argnums=(0, 1, 2, 3, 4),
    )(x, g, be, w, bias)
    want_dx = jax.grad(
        lambda xx: _ln_qkv_reference(
            xx, g, be, w, ones, bias, h, l, sm, 1e-5
        ).sum()
    )(x)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want_dx), rtol=1e-4, atol=1e-4
    )
    for t in got[1:]:
        assert float(jnp.abs(t).max()) == 0.0


def test_fused_ln_qkv_frozen_backward_padded_kv():
    """Padded rows (kv_len < L) must receive zero gradient contribution
    from their key role, matching the reference VJP on the real rows."""
    from clip_ebc_tpu.ops.fused_attention import (
        _ln_qkv_reference,
        fused_ln_qkv_attention,
    )

    b, l, kv, h, d = 1, 128, 100, 8, 512
    x, g, be, w, bias = _lnqkv_inputs(b, l, d, seed=6)
    sm = (d // h) ** -0.5
    ones = jnp.ones((3 * d,), jnp.float32)

    def loss_fused(xx):
        out = fused_ln_qkv_attention(xx, g, be, w, bias, h, kv, sm, 1e-5, 2, True, True)
        return (out[:, :kv] ** 2).sum()

    def loss_ref(xx):
        out = _ln_qkv_reference(xx, g, be, w, ones, bias, h, kv, sm, 1e-5)
        return (out[:, :kv] ** 2).sum()

    got = jax.grad(loss_fused)(x)
    want = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(got[:, :kv]), np.asarray(want[:, :kv]), rtol=1e-4, atol=1e-4
    )


def test_fused_ln_qkv_long_seq_falls_back():
    """Padded sequences longer than MAX_FUSED_SEQ must route to the
    reference path (the whole-sequence VMEM kernel would ask for >16 MB —
    the full-image eval crash at L=1664), with gradients intact."""
    from clip_ebc_tpu.ops.fused_attention import (
        MAX_FUSED_SEQ,
        _ln_qkv_reference,
        fused_ln_qkv_attention,
        fused_qkv_attention,
    )

    b, l, h, d = 1, MAX_FUSED_SEQ + 128, 8, 512
    x, g, be, w, bias = _lnqkv_inputs(b, l, d, seed=9)
    sm = (d // h) ** -0.5
    ones = jnp.ones((3 * d,), jnp.float32)

    out = fused_ln_qkv_attention(x, g, be, w, bias, h, l, sm)
    want = _ln_qkv_reference(x, g, be, w, ones, bias, h, l, sm, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)

    # frozen=True long-seq backward also falls back (no Pallas kernel)
    dx = jax.grad(
        lambda xx: fused_ln_qkv_attention(
            xx, g, be, w, bias, h, l, sm, 1e-5, 2, True, True
        ).sum()
    )(x)
    dx_ref = jax.grad(
        lambda xx: _ln_qkv_reference(xx, g, be, w, ones, bias, h, l, sm, 1e-5).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-4)

    # plain fused_qkv_attention long-seq fallback
    rng = np.random.default_rng(10)
    qkv = jnp.asarray(rng.normal(size=(1, l, 3 * d)), jnp.float32)
    from clip_ebc_tpu.ops.fused_attention import _reference

    np.testing.assert_allclose(
        np.asarray(fused_qkv_attention(qkv, h, l, sm)),
        np.asarray(_reference(qkv, h, l, sm)),
        rtol=1e-5, atol=1e-5,
    )


def test_fuse_ln_mode_off_matches_auto():
    """fuse_ln_mode="off" (qkv projection in XLA, attention-only kernel —
    the Mosaic-vs-XLA A/B knob for the decoder-pre ledger) must be
    numerically identical to the default fused LN+qkv path."""
    from clip_ebc_tpu.models.clip.image_encoder import ClipViT

    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(1, 96, 96, 3)), jnp.float32
    )
    auto = ClipViT(variant="vit_b_16", input_size=96, num_vpt=4, fused_qkv=True)
    v = auto.init(jax.random.PRNGKey(0), x, False)
    got_auto = auto.apply(v, x, False)
    off = ClipViT(variant="vit_b_16", input_size=96, num_vpt=4, fused_qkv=True,
                  fuse_ln_mode="off")
    got_off = off.apply(v, x, False)
    np.testing.assert_allclose(
        np.asarray(got_off), np.asarray(got_auto), rtol=2e-4, atol=2e-4
    )
