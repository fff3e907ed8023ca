"""Torch->Flax conversion parity tests against torch stdlib oracles."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clip_ebc_tpu.models import convert as C  # noqa: E402


def test_mha_conversion_matches_torch():
    torch.manual_seed(0)
    d, h, b, l = 32, 4, 2, 7
    mha = tnn.MultiheadAttention(d, h, batch_first=True)
    mha.eval()
    x = torch.randn(b, l, d)
    with torch.no_grad():
        ref, _ = mha(x, x, x, need_weights=False)

    sd = {f"attn.{k}": v for k, v in mha.state_dict().items()}
    builder = C._TreeBuilder()
    builder.attn("attn", sd, "attn")
    params = builder.params["attn"]

    from clip_ebc_tpu.models.transformer import MultiHeadAttention

    mod = MultiHeadAttention(num_heads=h)
    out = mod.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


def test_resblock_conversion_matches_torch_composite():
    """Assemble CLIP's pre-LN block from torch stdlib pieces and compare."""
    torch.manual_seed(1)
    d, h, b, l = 16, 2, 2, 5

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(d)
            self.ln_2 = tnn.LayerNorm(d)
            self.attn = tnn.MultiheadAttention(d, h, batch_first=True)
            self.mlp = tnn.ModuleDict(
                {"c_fc": tnn.Linear(d, 4 * d), "c_proj": tnn.Linear(4 * d, d)}
            )

        def forward(self, x):
            a, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False)
            x = x + a
            hdn = self.mlp["c_fc"](self.ln_2(x))
            hdn = hdn * torch.sigmoid(1.702 * hdn)
            return x + self.mlp["c_proj"](hdn)

    blk = TorchBlock().eval()
    x = torch.randn(b, l, d)
    with torch.no_grad():
        ref = blk(x)

    sd = {f"rb.{k}".replace(".c_fc.", ".c_fc."): v for k, v in blk.state_dict().items()}
    # torch ModuleDict keys: mlp.c_fc.weight -> matches the CLIP naming already
    builder = C._TreeBuilder()
    builder.resblock("rb", sd, "rb")

    from clip_ebc_tpu.models.transformer import ResidualAttentionBlock, quick_gelu

    mod = ResidualAttentionBlock(num_heads=h, act=quick_gelu, ln_epsilon=1e-5)
    out = mod.apply({"params": builder.params["rb"]}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


def test_vgg_features_conversion_matches_torch():
    torch.manual_seed(2)
    cfg = [8, "M", 16, 16]

    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.BatchNorm2d(v), tnn.ReLU()]
            in_ch = v
    seq = tnn.Sequential(*layers).eval()
    # make BN stats non-trivial
    with torch.no_grad():
        for m in seq.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref = seq(x)

    sd = {f"features.{k}": v for k, v in seq.state_dict().items()}
    params, stats = C.convert_vgg_features(sd, use_bn=True)

    from clip_ebc_tpu.models.blocks import VGGStage

    mod = VGGStage(cfg, use_bn=True)
    out = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), atol=2e-5
    )


def test_clip_text_conversion_shapes():
    """Synthesized CLIP-format text state dict loads into ClipTextEncoder."""
    torch.manual_seed(3)
    width, layers, vocab, ctx, embed = 32, 2, 50, 8, 16
    sd = {
        "token_embedding.weight": torch.randn(vocab, width),
        "positional_embedding": torch.randn(ctx, width),
        "ln_final.weight": torch.ones(width),
        "ln_final.bias": torch.zeros(width),
        "text_projection": torch.randn(width, embed),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": torch.ones(width), f"{p}.ln_1.bias": torch.zeros(width),
            f"{p}.ln_2.weight": torch.ones(width), f"{p}.ln_2.bias": torch.zeros(width),
            f"{p}.attn.in_proj_weight": torch.randn(3 * width, width),
            f"{p}.attn.in_proj_bias": torch.zeros(3 * width),
            f"{p}.attn.out_proj.weight": torch.randn(width, width),
            f"{p}.attn.out_proj.bias": torch.zeros(width),
            f"{p}.mlp.c_fc.weight": torch.randn(4 * width, width),
            f"{p}.mlp.c_fc.bias": torch.zeros(4 * width),
            f"{p}.mlp.c_proj.weight": torch.randn(width, 4 * width),
            f"{p}.mlp.c_proj.bias": torch.zeros(width),
        })
    params, _ = C.convert_clip_text(sd)

    from clip_ebc_tpu.models.clip.text_encoder import ClipTextEncoder

    enc = ClipTextEncoder(
        embed_dim=embed, width=width, heads=2, layers=layers,
        vocab_size=vocab, context_length=ctx,
    )
    init = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, ctx), jnp.int32))
    merged = C.merge_params(init["params"], params)
    tokens = jnp.asarray([[1, 5, 7, 49, 0, 0, 0, 0]], jnp.int32)
    out = enc.apply({"params": merged}, tokens)
    assert out.shape == (1, embed)
    assert np.isfinite(np.asarray(out)).all()


def test_merge_params_validates():
    dst = {"a": np.zeros((2, 2)), "sub": {"b": np.zeros(3)}}
    merged = C.merge_params(dst, {"sub": {"b": np.ones(3)}})
    np.testing.assert_allclose(merged["sub"]["b"], 1.0)
    with pytest.raises(KeyError):
        C.merge_params(dst, {"nope": np.zeros(1)})
    with pytest.raises(ValueError):
        C.merge_params(dst, {"a": np.zeros((3, 3))})


def test_clip_vit_conversion_into_model():
    """Synthesized tiny CLIP-ViT visual tower converts & runs."""
    torch.manual_seed(4)
    width, layers, patch = 768, 12, 16
    sd = {
        "visual.conv1.weight": torch.randn(width, 3, patch, patch) * 0.02,
        "visual.class_embedding": torch.randn(width) * 0.02,
        "visual.positional_embedding": torch.randn(197, width) * 0.02,
        "visual.ln_pre.weight": torch.ones(width), "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width), "visual.ln_post.bias": torch.zeros(width),
    }
    for i in range(layers):
        p = f"visual.transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": torch.ones(width), f"{p}.ln_1.bias": torch.zeros(width),
            f"{p}.ln_2.weight": torch.ones(width), f"{p}.ln_2.bias": torch.zeros(width),
            f"{p}.attn.in_proj_weight": torch.randn(3 * width, width) * 0.02,
            f"{p}.attn.in_proj_bias": torch.zeros(3 * width),
            f"{p}.attn.out_proj.weight": torch.randn(width, width) * 0.02,
            f"{p}.attn.out_proj.bias": torch.zeros(width),
            f"{p}.mlp.c_fc.weight": torch.randn(4 * width, width) * 0.02,
            f"{p}.mlp.c_fc.bias": torch.zeros(4 * width),
            f"{p}.mlp.c_proj.weight": torch.randn(width, 4 * width) * 0.02,
            f"{p}.mlp.c_proj.bias": torch.zeros(width),
        })
    params, _ = C.convert_clip_vit(sd)

    from clip_ebc_tpu.models.clip.image_encoder import ClipViT

    enc = ClipViT(variant="vit_b_16", num_vpt=2)
    init = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    merged = C.merge_params(init["params"], params)
    out = enc.apply({"params": merged}, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 2, 2, width)
