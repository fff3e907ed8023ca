"""XLA-emitted static-int8 attention (ops/int8_attention.py).

Same quantization scheme as the fused kernel's quant_attn path, so the
tolerances mirror tests/test_fused_attention.py's static-int8 cases.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from clip_ebc_tpu.ops.fused_attention import _reference
from clip_ebc_tpu.ops.int8_attention import xla_int8_qkv_attention


def _qkv(b, l, d, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, l, 3 * d)), jnp.float32
    )


def _scales(qkv, d):
    q = np.asarray(qkv, np.float32).reshape(-1, 3, d)
    return jnp.asarray(np.abs(q).max(axis=(0, 2)) / 127.0, jnp.float32)


def test_matches_reference_within_int8_tolerance():
    b, l, h, d = 2, 128, 12, 768
    qkv = _qkv(b, l, d)
    scales = _scales(qkv, d)
    got = np.asarray(
        xla_int8_qkv_attention(qkv, h, l, (d // h) ** -0.5, scales), np.float32
    )
    ref = np.asarray(_reference(qkv, h, l, (d // h) ** -0.5), np.float32)
    err = np.abs(got - ref)
    assert np.median(err) < 0.03 * (np.abs(ref).max() + 1e-6), np.median(err)


def test_padded_rows_are_masked_as_keys():
    b, l, kv, h, d = 1, 128, 100, 4, 256
    qkv = _qkv(b, l, d, seed=1)
    scales = _scales(qkv, d)
    got = np.asarray(
        xla_int8_qkv_attention(qkv, h, kv, (d // h) ** -0.5, scales), np.float32
    )
    # zeroing the padded rows' k/v must not change real-row outputs: they
    # were already excluded by the kv_len mask
    z = np.asarray(qkv, np.float32).copy()
    z[:, kv:, d:] = 0.0
    got_z = np.asarray(
        xla_int8_qkv_attention(jnp.asarray(z), h, kv, (d // h) ** -0.5, scales),
        np.float32,
    )
    np.testing.assert_allclose(got[:, :kv], got_z[:, :kv], atol=1e-5)
    ref = np.asarray(_reference(qkv, h, kv, (d // h) ** -0.5), np.float32)
    err = np.abs(got[:, :kv] - ref[:, :kv])
    assert np.median(err) < 0.03 * (np.abs(ref[:, :kv]).max() + 1e-6)


def test_block_quant_attn_xla_end_to_end():
    """quant_attn="xla" reuses the same calibrated qkv_amax as the kernel
    path and stays close to the fp32 block; the projection runs as
    Int8Dense (fuse_ln disabled for this mode)."""
    from clip_ebc_tpu.models.transformer import ResidualAttentionBlock
    from clip_ebc_tpu.ops.quant import Int8Dense, calibrate_int8

    b, l, h, d = 1, 128, 12, 768
    x = jnp.asarray(np.random.default_rng(6).normal(size=(b, l, d)), jnp.float32)
    dense = functools.partial(Int8Dense, quant_mode="static")
    blk = ResidualAttentionBlock(
        num_heads=h, fused_qkv=True, kv_len=l, quant_int8=True,
        quant_mode="static", dense_cls=dense, quant_attn="xla",
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


def test_kernel_and_xla_paths_agree():
    """The two static quant_attn backends implement the same math: their
    outputs agree to (independent) int8 rounding."""
    from clip_ebc_tpu.models.transformer import ResidualAttentionBlock
    from clip_ebc_tpu.ops.quant import Int8Dense, calibrate_int8

    b, l, h, d = 1, 128, 12, 768
    x = jnp.asarray(np.random.default_rng(7).normal(size=(b, l, d)), jnp.float32)
    dense = functools.partial(Int8Dense, quant_mode="static")

    def block(qa):
        return ResidualAttentionBlock(
            num_heads=h, fused_qkv=True, kv_len=l, quant_int8=True,
            quant_mode="static", dense_cls=dense, quant_attn=qa,
        )

    dyn = ResidualAttentionBlock(
        num_heads=h, fused_qkv=True, kv_len=l, quant_int8=True,
        quant_mode="dynamic", dense_cls=Int8Dense,
    )
    v = dict(block(True).init(jax.random.PRNGKey(0), x))
    v = calibrate_int8(lambda vv, bb: dyn.apply(vv, bb, mutable=["quant"]), v, [x])
    a = np.asarray(block(True).apply(v, x), np.float32)
    bx = np.asarray(block("xla").apply(v, x), np.float32)
    err = np.abs(a - bx)
    assert np.median(err) < 0.02 * (np.abs(a).max() + 1e-6), np.median(err)
