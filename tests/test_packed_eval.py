"""Cross-image packed sliding-window eval (ops/packed_eval.py) must agree
with the per-image pipeline (ops/sliding_window.py) on a mixed-size image
stream, for every packing geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_ebc_tpu.ops.packed_eval import WindowPacker, packed_predict_densities
from clip_ebc_tpu.ops.sliding_window import sliding_window_predict


WINDOW, STRIDE, RED = (32, 32), (24, 24), 8


def _forward(ctx, windows):
    """Deterministic per-window 'model': mean-pool blocks + a nonlinear
    mix so window identity and content both matter."""
    w = windows.astype(jnp.float32)
    b, wh, ww, c = w.shape
    blocks = w.reshape(b, wh // RED, RED, ww // RED, RED, c).mean((2, 4))
    return blocks[..., 0] + 0.3 * jnp.tanh(blocks[..., 1] * blocks[..., 2])


def _images(seed=0):
    rng = np.random.default_rng(seed)
    sizes = [(64, 96), (32, 32), (128, 160), (56, 72), (96, 64), (40, 120)]
    return [
        jnp.asarray(rng.normal(size=(h, w, 3)), jnp.float32) for h, w in sizes
    ]


def _reference(images, strategy="average"):
    return [
        sliding_window_predict(
            _forward, None, img, window=WINDOW, stride=STRIDE, reduction=RED,
            strategy=strategy,
        )
        for img in images
    ]


@pytest.mark.parametrize("batch_windows,chunk", [(16, 4), (8, 8), (32, 16)])
def test_packed_matches_per_image(batch_windows, chunk):
    images = _images()
    want = _reference(images)
    got = list(
        packed_predict_densities(
            _forward, None, images, WINDOW, STRIDE, RED,
            batch_windows=batch_windows, chunk=chunk, dtype=jnp.float32,
        )
    )
    assert len(got) == len(images)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)


def test_packed_max_strategy():
    images = _images(seed=3)
    want = _reference(images, strategy="max")
    got = list(
        packed_predict_densities(
            _forward, None, images, WINDOW, STRIDE, RED, strategy="max",
            batch_windows=16, chunk=4, dtype=jnp.float32,
        )
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)


def test_packed_streaming_and_reuse_after_flush():
    """Densities arrive in submission order; the packer keeps working for
    images added after a flush."""
    images = _images(seed=5)
    want = _reference(images)
    packer = WindowPacker(
        _forward, None, WINDOW, STRIDE, RED, batch_windows=16, chunk=4,
        dtype=jnp.float32,
    )
    got = []
    for img in images[:3]:
        packer.add(img)
        got.extend(d for _, d in packer.ready())
    packer.flush()
    got.extend(d for _, d in packer.ready())
    assert len(got) == 3  # flush drains everything queued so far
    for img in images[3:]:
        packer.add(img)
        got.extend(d for _, d in packer.ready())
    packer.flush()
    got.extend(d for _, d in packer.ready())
    assert len(got) == len(images)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)


def test_evaluator_packed_matches_per_image():
    """Evaluator.predict_densities_packed (the CLI surface) agrees with
    predict_density per image, including the small-image padding policy."""
    from flax import linen as nn

    from clip_ebc_tpu.training.evaluate import Evaluator

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            b, h, w, c = x.shape
            blocks = x.reshape(b, h // RED, RED, w // RED, RED, c).mean((2, 4))
            k = self.param("k", nn.initializers.ones, (3,), jnp.float32)
            return (blocks * k).sum(-1)

    model = Tiny()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    ev = Evaluator(
        model, reduction=RED, sliding_window=True,
        window_size=WINDOW[0], stride=STRIDE[0],
    )
    rng = np.random.default_rng(11)
    # includes an image smaller than the window (padding policy kicks in)
    images = [
        np.asarray(rng.normal(size=(h, w, 3)), np.float32)
        for h, w in [(64, 96), (24, 16), (96, 128)]
    ]
    want = [np.asarray(ev.predict_density(variables, im)) for im in images]
    got = list(
        ev.predict_densities_packed(variables, images, batch_windows=8, chunk=4)
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5, atol=1e-5)


def test_packed_single_huge_image_spans_batches():
    """One image larger than the whole forward batch spans several
    batches and still assembles correctly."""
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.normal(size=(160, 256, 3)), jnp.float32)
    want = _reference([img])[0]
    got = list(
        packed_predict_densities(
            _forward, None, [img], WINDOW, STRIDE, RED,
            batch_windows=8, chunk=4, dtype=jnp.float32,
        )
    )[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packer_instances_share_compiled_programs():
    """jit caches are per function object: packer programs must come from
    module-level caches so a fresh packer per stream/epoch does NOT
    recompile its programs (through an RPC relay every compile is a
    multi-second round trip; a per-stream packer measured ~47 s/stream of
    pure recompilation, PACKED_EVAL_r05.json)."""
    a = WindowPacker(_forward, None, WINDOW, STRIDE, RED,
                     batch_windows=8, chunk=4, dtype=jnp.float32)
    b = WindowPacker(_forward, None, WINDOW, STRIDE, RED,
                     batch_windows=8, chunk=4, dtype=jnp.float32)
    assert a._fwd is b._fwd
    assert a._shift is b._shift
    assert a._gather_place is b._gather_place
    assert a._collect_jit is b._collect_jit
    # list-typed window/stride hit the same cache entries as tuples
    c = WindowPacker(_forward, None, list(WINDOW), list(STRIDE), RED,
                     batch_windows=8, chunk=4, dtype=jnp.float32)
    assert c._gather_place is a._gather_place
