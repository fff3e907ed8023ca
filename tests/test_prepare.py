"""Weight-prep manifest CLI (cli/prepare.py) — end-to-end on a fabricated
mini OpenAI-CLIP checkpoint.

Counterpart of the reference's first-import preparation
(reference models/clip/_clip/prepare.py:43-95: download -> sha256 verify ->
split into full/image/text state_dicts + JSON configs; URL/sha table at
reference models/clip/_clip/utils.py:34-60).
"""

import itertools
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clip_ebc_tpu.cli import prepare as P  # noqa: E402
from clip_ebc_tpu.models import convert as C  # noqa: E402
from clip_ebc_tpu.models import get_model  # noqa: E402
from clip_ebc_tpu.models.pretrained import apply_pretrained  # noqa: E402


def _mini_full_clip_sd():
    """A full joint CLIP state dict with real ViT-B/16 dimensions (so
    detect_clip_arch resolves it) but constant-filled tensors — each leaf
    carries a distinct constant, making placement verifiable while the
    file stays small (constants compress) and fast to build. Conversion
    *math* (transposes, qkv splits) is covered by test_convert.py."""
    counter = itertools.count(1)

    def t(*shape):
        return torch.full(shape, next(counter) * 1e-3)

    width, layers, patch = 768, 12, 16
    twidth, tlayers = 512, 12
    embed, vocab, ctx = 512, 49408, 77
    sd = {
        "visual.conv1.weight": t(width, 3, patch, patch),
        "visual.class_embedding": t(width),
        "visual.positional_embedding": t(197, width),
        "visual.ln_pre.weight": t(width), "visual.ln_pre.bias": t(width),
        "visual.ln_post.weight": t(width), "visual.ln_post.bias": t(width),
        "visual.proj": t(width, embed),
        "token_embedding.weight": t(vocab, twidth),
        "positional_embedding": t(ctx, twidth),
        "ln_final.weight": t(twidth), "ln_final.bias": t(twidth),
        "text_projection": t(twidth, embed),
        "logit_scale": torch.tensor(2.6592),
    }
    for i in range(layers):
        p = f"visual.transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": t(width), f"{p}.ln_1.bias": t(width),
            f"{p}.ln_2.weight": t(width), f"{p}.ln_2.bias": t(width),
            f"{p}.attn.in_proj_weight": t(3 * width, width),
            f"{p}.attn.in_proj_bias": t(3 * width),
            f"{p}.attn.out_proj.weight": t(width, width),
            f"{p}.attn.out_proj.bias": t(width),
            f"{p}.mlp.c_fc.weight": t(4 * width, width),
            f"{p}.mlp.c_fc.bias": t(4 * width),
            f"{p}.mlp.c_proj.weight": t(width, 4 * width),
            f"{p}.mlp.c_proj.bias": t(width),
        })
    for i in range(tlayers):
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": t(twidth), f"{p}.ln_1.bias": t(twidth),
            f"{p}.ln_2.weight": t(twidth), f"{p}.ln_2.bias": t(twidth),
            f"{p}.attn.in_proj_weight": t(3 * twidth, twidth),
            f"{p}.attn.in_proj_bias": t(3 * twidth),
            f"{p}.attn.out_proj.weight": t(twidth, twidth),
            f"{p}.attn.out_proj.bias": t(twidth),
            f"{p}.mlp.c_fc.weight": t(4 * twidth, twidth),
            f"{p}.mlp.c_fc.bias": t(4 * twidth),
            f"{p}.mlp.c_proj.weight": t(twidth, 4 * twidth),
            f"{p}.mlp.c_proj.bias": t(twidth),
        })
    return sd


@pytest.fixture(scope="module")
def mini_ckpt(tmp_path_factory):
    sd = _mini_full_clip_sd()
    path = tmp_path_factory.mktemp("ckpt") / "ViT-B-16.pt"
    torch.save(sd, str(path))
    return sd, str(path)


def _tree_leaves(tree, prefix=""):
    for k, v in sorted(tree.items()):
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            yield from _tree_leaves(v, key)
        else:
            yield key, np.asarray(v)


def test_manifest_table():
    """9 models, URLs embed a 64-hex sha256 as the penultimate segment —
    the property the verifier keys on (reference _clip/utils.py:53)."""
    assert len(P.MODEL_URLS) == 9
    assert set(P.MODEL_URLS) == set(P.MODEL_NAME_MAP)
    for name in P.MODEL_URLS:
        sha = P.expected_sha256(name)
        assert len(sha) == 64 and all(c in "0123456789abcdef" for c in sha)
        assert P.MODEL_URLS[name].endswith(".pt")


def test_sha256_verification(tmp_path, mini_ckpt):
    _, ckpt = mini_ckpt
    import hashlib

    blob = tmp_path / "blob.bin"
    blob.write_bytes(b"clip-ebc" * 1000)
    assert P.sha256_file(str(blob)) == hashlib.sha256(b"clip-ebc" * 1000).hexdigest()
    # a fabricated checkpoint cannot match the release manifest
    with pytest.raises(ValueError, match="sha256 mismatch"):
        P.verify_checkpoint("ViT-B/16", ckpt)


def test_prepare_end_to_end(tmp_path, mini_ckpt):
    sd, ckpt = mini_ckpt
    out = str(tmp_path / "prepared")
    # unnamed file + default verify: warns (not a release sha) but converts
    arch = P.prepare_one(ckpt, out)
    assert arch == "vit_b_16"
    for stem in ("clip_vit_b_16", "clip_image_encoder_vit_b_16",
                 "clip_text_encoder_vit_b_16"):
        assert os.path.isfile(os.path.join(out, "weights", f"{stem}.npz"))
        assert os.path.isfile(os.path.join(out, "configs", f"{stem}.json"))

    with open(os.path.join(out, "configs", "clip_vit_b_16.json")) as f:
        cfg = json.load(f)
    assert cfg == {
        "embed_dim": 512, "image_resolution": 224, "vision_layers": 12,
        "vision_width": 768, "vision_patch_size": 16, "context_length": 77,
        "vocab_size": 49408, "transformer_width": 512,
        "transformer_heads": 8, "transformer_layers": 12,
        "backbone": "vit_b_16",
    }

    # the full artifact round-trips to exactly convert_clip_ebc's trees
    p_npz, s_npz, meta = C.load_prepared_tree(
        os.path.join(out, "weights", "clip_vit_b_16.npz"))
    assert meta["backbone"] == "vit_b_16" and meta["split"] == "full"
    p_ref, s_ref = C.convert_clip_ebc(sd, is_vit=True)
    got, want = dict(_tree_leaves(p_npz)), dict(_tree_leaves(p_ref))
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    assert not s_npz and not s_ref  # ViT tower has no batch stats

    # image tower artifact includes the pooled projection
    img_p, _, img_meta = C.load_prepared_tree(
        os.path.join(out, "weights", "clip_image_encoder_vit_b_16.npz"))
    assert img_meta["split"] == "image"
    assert "proj" in img_p


def test_prepare_cli_named_source(tmp_path, mini_ckpt):
    _, ckpt = mini_ckpt
    out = str(tmp_path / "out")
    # named model + verify -> hard sha error for a fabricated file
    with pytest.raises(ValueError, match="sha256 mismatch"):
        P.main(["--src", ckpt, "--models", "ViT-B/16", "--out", out])
    # --no-verify converts it
    P.main(["--src", ckpt, "--models", "ViT-B/16", "--out", out, "--no-verify"])
    assert os.path.isfile(os.path.join(out, "weights", "clip_vit_b_16.npz"))
    # directory source: only manifest basenames are picked up
    d = tmp_path / "cache"
    d.mkdir()
    os.link(ckpt, str(d / "ViT-B-16.pt"))
    out2 = str(tmp_path / "out2")
    P.main(["--src", str(d), "--out", out2, "--no-verify"])
    assert os.path.isfile(os.path.join(out2, "weights", "clip_vit_b_16.npz"))
    with pytest.raises(SystemExit):
        P.main(["--src", str(d), "--models", "RN50", "--out", out2,
                "--no-verify"])


def test_prepared_npz_matches_torch_path(tmp_path, mini_ckpt):
    """--pretrained <prepared .npz> must produce the SAME variables as
    --pretrained <torch ckpt> (the deployment path skips torch entirely)."""
    sd, ckpt = mini_ckpt
    out = str(tmp_path / "prep")
    P.prepare_one(ckpt, out, verify=False)
    npz = os.path.join(out, "weights", "clip_vit_b_16.npz")

    bins = [(0.0, 0.0), (1.0, 1.0), (2.0, float("inf"))]
    anchors = [0.0, 1.0, 2.5]
    model = get_model("clip_vit_b_16", 224, 8, bins=bins, anchor_points=anchors,
                      num_vpt=2, prompt_type="word")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)

    via_torch = apply_pretrained(model, dict(variables), sd,
                                 allow_byte_tokenizer=True)
    via_npz = apply_pretrained(model, dict(variables), npz,
                               allow_byte_tokenizer=True)
    got = dict(_tree_leaves(via_npz["params"]))
    want = dict(_tree_leaves(via_torch["params"]))
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)

    # tower-only artifact is rejected with guidance
    img_npz = os.path.join(out, "weights", "clip_image_encoder_vit_b_16.npz")
    with pytest.raises(ValueError, match="tower-only"):
        apply_pretrained(model, dict(variables), img_npz,
                         allow_byte_tokenizer=True)

    # backbone mismatch is caught from the artifact's metadata
    wrong = str(tmp_path / "wrong.npz")
    p, s, _ = C.load_prepared_tree(npz)
    C.save_prepared_tree(wrong, p, s, {"backbone": "vit_b_32"})
    with pytest.raises(ValueError, match="vit_b_32"):
        apply_pretrained(model, dict(variables), wrong,
                         allow_byte_tokenizer=True)
