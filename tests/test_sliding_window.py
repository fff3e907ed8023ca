import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_ebc_tpu.ops.sliding_window import (
    resize_density_map,
    sliding_window_predict,
    window_grid,
)

RED = 8


def fake_apply(variables, windows):
    """Deterministic 'model': block-sum of channel 0 over reduction blocks.
    (variables unused; matches the (variables, windows) apply contract.)"""
    n, wh, ww, _ = windows.shape
    x = windows[..., 0]
    return x.reshape(n, wh // RED, RED, ww // RED, RED).sum(axis=(2, 4))


def numpy_sliding_oracle(image, window, stride, strategy="average"):
    """Numpy re-implementation of the reference's host-side assembly
    (reference utils/eval_utils.py:59-96) against the same fake model."""
    h, w = image.shape[:2]
    wh, ww = window
    sh, sw = stride
    rows = int(np.ceil((h - wh) / sh) + 1)
    cols = int(np.ceil((w - ww) / sw) + 1)
    acc = np.zeros((h // RED, w // RED), np.float64)
    cnt = np.zeros_like(acc)
    mx = np.full_like(acc, -np.inf)
    for i in range(rows):
        for j in range(cols):
            y, x = min(i * sh, h - wh), min(j * sw, w - ww)
            win = image[y : y + wh, x : x + ww]
            pred = np.asarray(fake_apply(None, win[None]))[0]
            ys, xs = y // RED, x // RED
            acc[ys : ys + wh // RED, xs : xs + ww // RED] += pred
            cnt[ys : ys + wh // RED, xs : xs + ww // RED] += 1
            mx[ys : ys + wh // RED, xs : xs + ww // RED] = np.maximum(
                mx[ys : ys + wh // RED, xs : xs + ww // RED], pred
            )
    return (acc / cnt) if strategy == "average" else mx


def test_window_grid_clamps_edges():
    grid = window_grid((100, 70), (64, 64), (48, 48))
    # rows: ceil(36/48)+1 = 2 -> y in {0, 36}; cols: ceil(6/48)+1=2 -> x in {0, 6}
    np.testing.assert_array_equal(grid, [[0, 0], [0, 6], [36, 0], [36, 6]])


def test_sliding_matches_numpy_oracle_overlapping():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (96, 128, 3)).astype(np.float32)
    out = sliding_window_predict(
        fake_apply, None, jnp.asarray(img), window=(64, 64), stride=(32, 32), reduction=RED
    )
    oracle = numpy_sliding_oracle(img, (64, 64), (32, 32))
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5, atol=1e-5)


def test_sliding_matches_oracle_nondivisible():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (104, 88, 3)).astype(np.float32)
    out = sliding_window_predict(
        fake_apply, None, jnp.asarray(img), window=(64, 64), stride=(48, 48), reduction=RED
    )
    oracle = numpy_sliding_oracle(img, (64, 64), (48, 48))
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5, atol=1e-5)


def test_sliding_window_equals_direct_when_window_is_image():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    out = sliding_window_predict(
        fake_apply, None, jnp.asarray(img), window=(64, 64), stride=(64, 64), reduction=RED
    )
    direct = np.asarray(fake_apply(None, img[None]))[0]
    np.testing.assert_allclose(np.asarray(out), direct, rtol=1e-6)


def test_sliding_max_strategy():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (96, 96, 3)).astype(np.float32)
    out = sliding_window_predict(
        fake_apply, None, jnp.asarray(img), window=(64, 64), stride=(32, 32),
        reduction=RED, strategy="max",
    )
    oracle = numpy_sliding_oracle(img, (64, 64), (32, 32), strategy="max")
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5, atol=1e-5)


def test_count_preserved_nonoverlapping():
    """stride == window: assembly is a partition, total equals direct sum."""
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (128, 192, 3)).astype(np.float32)
    out = sliding_window_predict(
        fake_apply, None, jnp.asarray(img), window=(64, 64), stride=(64, 64), reduction=RED
    )
    np.testing.assert_allclose(float(out.sum()), float(img[..., 0].sum()), rtol=1e-4)


def test_resize_density_map_preserves_mass():
    rng = np.random.default_rng(5)
    d = jnp.asarray(rng.uniform(0, 1, (16, 16)).astype(np.float32))
    out = resize_density_map(d, (37, 23))
    assert float(out.sum()) == pytest.approx(float(d.sum()), rel=1e-5)
    zero = resize_density_map(jnp.zeros((8, 8)), (16, 16))
    assert float(zero.sum()) == 0.0


def test_evaluator_end_to_end():
    from clip_ebc_tpu.models import get_model
    from clip_ebc_tpu.training.evaluate import Evaluator

    bins = [(0.0, 0.0), (1.0, 1.0), (2.0, float("inf"))]
    anchors = [0.0, 1.0, 2.2]
    model = get_model("vgg11_ae", input_size=64, reduction=8, bins=bins, anchor_points=anchors)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True)
    variables = {"params": variables["params"], **(
        {"batch_stats": variables["batch_stats"]} if "batch_stats" in variables else {}
    )}
    rng = np.random.default_rng(6)
    img = rng.normal(size=(64, 96, 3)).astype(np.float32)

    ev_direct = Evaluator(model, reduction=8)
    ev_sw = Evaluator(model, reduction=8, sliding_window=True, window_size=64, stride=64)
    d_direct = np.asarray(ev_direct.predict_density(variables, img))
    assert d_direct.shape == (8, 12)
    c_sw = ev_sw.predict_count(variables, np.concatenate([img, img[:, :32]], axis=1)[:, :128])
    assert np.isfinite(c_sw)
    # window == full width tile: sliding over a 64x128 image with 64-windows
    img128 = rng.normal(size=(64, 128, 3)).astype(np.float32)
    d_sw = np.asarray(ev_sw.predict_density(variables, img128))
    left = np.asarray(ev_direct.predict_density(variables, img128[:, :64]))
    right = np.asarray(ev_direct.predict_density(variables, img128[:, 64:]))
    np.testing.assert_allclose(d_sw, np.concatenate([left, right], axis=1), rtol=2e-3, atol=2e-5)


def test_evaluator_pad_to_multiple_uses_normalized_black():
    from clip_ebc_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    from clip_ebc_tpu.models import get_model
    from clip_ebc_tpu.training.evaluate import Evaluator

    bins = [(0.0, 0.0), (1.0, float("inf"))]
    model = get_model("vgg11", input_size=64, reduction=16, bins=bins, anchor_points=[0.0, 1.5])
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True)
    variables = {k: v for k, v in variables.items() if k in ("params", "batch_stats")}
    ev = Evaluator(model, reduction=16, pad_to_multiple=64)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(48, 80, 3)).astype(np.float32)
    d = ev.predict_density(variables, img)
    # valid-region crop: 48//16=3 x 80//16=5
    assert d.shape == (3, 5)
    # a black-padded (normalized-black) image equals an actually-black image
    black = (-np.asarray(IMAGENET_MEAN) / np.asarray(IMAGENET_STD)).astype(np.float32)
    full_black = np.broadcast_to(black, (64, 128, 3)).copy()
    full_black[:48, :80] = img
    direct = np.asarray(ev._forward(variables, jnp.asarray(full_black)[None])[0])
    np.testing.assert_allclose(np.asarray(d), direct[:3, :5], rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize(
    "hw,window,stride",
    [
        ((96, 128), (64, 64), (64, 64)),   # stride == window, clamped both axes
        ((128, 192), (64, 64), (64, 64)),  # stride == window, fully regular
        ((96, 128), (64, 64), (32, 32)),   # k=2 phases, clamped
        ((160, 160), (64, 64), (32, 32)),  # k=2 phases, regular
        ((100, 70), (64, 64), (16, 16)),   # k=4 phases, clamped, odd sizes
    ],
)
def test_dense_gather_matches_dynamic_slice(hw, window, stride):
    from clip_ebc_tpu.ops.sliding_window import gather_windows_dense

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 1, hw + (3,)).astype(np.float32))
    starts = window_grid(hw, window, stride)

    def one(yx):
        return jax.lax.dynamic_slice(img, (yx[0], yx[1], 0), window + (3,))

    ref = jax.vmap(one)(jnp.asarray(starts))
    dense = gather_windows_dense(img, window, stride)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(ref))


@pytest.mark.parametrize(
    "hw,window,stride",
    [
        ((96, 128), (64, 64), (64, 64)),
        ((128, 192), (64, 64), (64, 64)),
        ((96, 128), (64, 64), (32, 32)),
        ((160, 160), (64, 64), (32, 32)),
        ((104, 88), (64, 64), (16, 16)),
    ],
)
def test_dense_assembly_matches_scatter(hw, window, stride):
    from clip_ebc_tpu.ops.sliding_window import (
        _assemble_windows_dense, window_grid)

    n = window_grid(hw, window, stride).shape[0]
    rng = np.random.default_rng(8)
    preds = jnp.asarray(
        rng.uniform(0, 1, (n, window[0] // RED, window[1] // RED)).astype(np.float32)
    )
    # scatter reference path (force it by calling the internals directly)
    h, w = hw
    bh, bw = window[0] // RED, window[1] // RED
    hr, wr = h // RED, w // RED
    starts_np = window_grid(hw, window, stride) // RED
    oy, ox = np.mgrid[0:bh, 0:bw]
    flat_idx = (
        (starts_np[:, 0, None, None] + oy) * wr + (starts_np[:, 1, None, None] + ox)
    ).astype(np.int32)
    cnt = np.zeros(hr * wr, np.float32)
    np.add.at(cnt, flat_idx.reshape(-1), 1.0)
    acc = (
        jnp.zeros(hr * wr, jnp.float32)
        .at[flat_idx.reshape(-1)]
        .add(preds.reshape(-1))
    )
    ref = np.asarray((acc / jnp.asarray(np.maximum(cnt, 1.0))).reshape(hr, wr))
    dense = np.asarray(_assemble_windows_dense(preds, hw, window, stride, RED))
    np.testing.assert_allclose(dense, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "hw,window,stride",
    [
        ((64, 96), (32, 32), (32, 32)),   # flagship-shaped: stride == window
        ((64, 96), (32, 32), (16, 16)),   # test_nwpu-shaped: stride = window/2
        ((80, 112), (32, 32), (16, 16)),  # edge-clamped last row/col
    ],
)
def test_token_gather_matches_pixel_path(hw, window, stride, monkeypatch):
    """The ViT token fast path (patchify once + token-grid unfold) must
    produce the same density map as the pixel-window path — patchify is a
    per-patch linear map on a non-overlapping grid, so embedding the image
    globally and unfolding tokens is algebraically identical to unfolding
    pixels and embedding per window. (Opt-in: the flagship-shape chip A/B
    measured it slower than the pixel unfold — see _token_gather_ok.)"""
    monkeypatch.setenv("EBC_TOKEN_GATHER", "1")
    from clip_ebc_tpu.models import get_model

    BINS = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, float("inf"))]
    ANCHORS = [0.0, 1.0, 2.0, 3.0, 4.3]
    model = get_model(
        "clip_vit_b_16", input_size=window[0], reduction=16, bins=BINS,
        anchor_points=ANCHORS, num_vpt=4,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + window + (3,)), train=False
    )
    text_feats = model.apply(variables, method="encode_text")

    def forward(v, images):
        return model.apply(
            v, images, train=False, text_feats=text_feats
        ).astype(jnp.float32)

    def embed_fn(v, img):
        return model.apply(v, img, method="embed_patches")

    def token_forward(v, tokens):
        return model.apply(
            v, tokens, train=False, text_feats=text_feats, pre_embedded=True
        ).astype(jnp.float32)

    image = jax.random.normal(jax.random.PRNGKey(1), hw + (3,), jnp.float32)
    kw = dict(window=window, stride=stride, reduction=16, strategy="average")
    pixel = np.asarray(
        sliding_window_predict(forward, variables, image, **kw)
    )
    token = np.asarray(
        sliding_window_predict(
            forward, variables, image, **kw,
            embed_fn=embed_fn, token_apply_fn=token_forward,
            patch=model.encoder_reduction,
        )
    )
    assert pixel.shape == token.shape == (hw[0] // 16, hw[1] // 16)
    np.testing.assert_allclose(token, pixel, rtol=1e-5, atol=1e-5)


def test_token_gather_falls_back_when_unaligned(monkeypatch):
    """A stride that is not a patch multiple must silently use the pixel
    path (the token fns are ignored), still matching the plain call."""
    monkeypatch.setenv("EBC_TOKEN_GATHER", "1")
    from clip_ebc_tpu.models import get_model

    BINS = [(0.0, 0.0), (1.0, float("inf"))]
    ANCHORS = [0.0, 1.5]
    model = get_model(
        "clip_vit_b_16", input_size=32, reduction=16, bins=BINS,
        anchor_points=ANCHORS, num_vpt=2,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    text_feats = model.apply(variables, method="encode_text")

    def forward(v, images):
        return model.apply(
            v, images, train=False, text_feats=text_feats
        ).astype(jnp.float32)

    def embed_fn(v, img):
        return model.apply(v, img, method="embed_patches")

    def token_forward(v, tokens):
        return model.apply(
            v, tokens, train=False, text_feats=text_feats, pre_embedded=True
        ).astype(jnp.float32)

    image = jax.random.normal(jax.random.PRNGKey(1), (56, 80, 3), jnp.float32)
    kw = dict(window=(32, 32), stride=(24, 24), reduction=16, strategy="average")
    plain = np.asarray(sliding_window_predict(forward, variables, image, **kw))
    with_fns = np.asarray(
        sliding_window_predict(
            forward, variables, image, **kw,
            embed_fn=embed_fn, token_apply_fn=token_forward,
            patch=model.encoder_reduction,
        )
    )
    np.testing.assert_allclose(with_fns, plain, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "hw,window,stride",
    [
        ((96, 128), (64, 64), (64, 64)),   # stride == window, clamped both axes
        ((128, 192), (64, 64), (64, 64)),  # stride == window, fully regular
        ((96, 128), (64, 64), (32, 32)),   # k=2 phases, clamped
        ((160, 160), (64, 64), (32, 32)),  # k=2 phases, regular
    ],
)
def test_flat_gather_matches_dense(hw, window, stride):
    """Channel-flattened unfold (lane-packed copies) is bitwise equal to
    the 4-D dense unfold on every grid geometry."""
    from clip_ebc_tpu.ops.sliding_window import (
        gather_windows_dense, gather_windows_flat)

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.uniform(0, 1, hw + (3,)).astype(np.float32))
    dense = gather_windows_dense(img, window, stride)
    flat = gather_windows_flat(
        img.reshape(hw[0], hw[1] * 3),
        (window[0], window[1] * 3), (stride[0], stride[1] * 3),
    ).reshape(dense.shape)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(dense))


@pytest.mark.parametrize("flat_on", ["1", "0"])
def test_flat_gather_pipeline_matches_4d(flat_on, monkeypatch):
    """Full sliding-window pipeline through the real ViT model: the
    flat-pixel path (EBC_FLAT_GATHER=1, 3-D windows into PatchifyMatmul)
    is bitwise equal to the 4-D pixel path — the (p, c) dims are adjacent
    and merge in the same order, so the patchify matmul operand is the
    same array either way."""
    monkeypatch.setenv("EBC_FLAT_GATHER", flat_on)
    from clip_ebc_tpu.models import get_model

    BINS = [(0.0, 0.0), (1.0, 1.0), (2.0, float("inf"))]
    ANCHORS = [0.0, 1.0, 2.5]
    model = get_model(
        "clip_vit_b_16", input_size=32, reduction=16, bins=BINS,
        anchor_points=ANCHORS, num_vpt=2,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    text_feats = model.apply(variables, method="encode_text")

    def forward(v, images):
        return model.apply(
            v, images, train=False, text_feats=text_feats
        ).astype(jnp.float32)

    image = jax.random.normal(jax.random.PRNGKey(1), (64, 96, 3), jnp.float32)
    kw = dict(window=(32, 32), stride=(32, 32), reduction=16,
              strategy="average")
    # patch=0: flat path gated off regardless of env (non-ViT callers)
    ref = np.asarray(sliding_window_predict(forward, variables, image, **kw))
    got = np.asarray(
        sliding_window_predict(
            forward, variables, image, **kw, patch=model.encoder_reduction
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_flat_pixel_forward_matches_4d_forward():
    """ClipEBC forward on (B, H, W*3) flat windows == forward on the same
    (B, H, W, 3) windows (ClipViT/PatchifyMatmul 3-D input path)."""
    from clip_ebc_tpu.models import get_model

    BINS = [(0.0, 0.0), (1.0, float("inf"))]
    ANCHORS = [0.0, 1.5]
    model = get_model(
        "clip_vit_b_16", input_size=32, reduction=16, bins=BINS,
        anchor_points=ANCHORS, num_vpt=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(variables, x, train=False)
    flat = model.apply(variables, x.reshape(2, 32, 32 * 3), train=False)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(ref))
