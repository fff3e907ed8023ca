"""Pod-sharded sliding-window inference on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from clip_ebc_tpu.ops.sliding_window import sliding_window_predict
from clip_ebc_tpu.parallel.mesh import make_mesh
from tests.test_sliding_window import RED, fake_apply, numpy_sliding_oracle


def test_sharded_sliding_window_matches_single_device():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (192, 256, 3)).astype(np.float32)  # 3x4=12 windows
    mesh = make_mesh()
    assert mesh.devices.size == 8
    out_sharded = sliding_window_predict(
        fake_apply, None, jnp.asarray(img), window=(64, 64), stride=(64, 64),
        reduction=RED, mesh=mesh,
    )
    oracle = numpy_sliding_oracle(img, (64, 64), (64, 64))
    np.testing.assert_allclose(np.asarray(out_sharded), oracle, rtol=1e-5, atol=1e-5)


def test_sharded_sliding_window_bucket_respects_mesh():
    """Window count must pad to a multiple of the mesh size for even shards."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (96, 160, 3)).astype(np.float32)  # 2x3=6 windows
    mesh = make_mesh()
    out = sliding_window_predict(
        fake_apply, None, jnp.asarray(img), window=(64, 64), stride=(32, 48),
        reduction=RED, mesh=mesh,
    )
    oracle = numpy_sliding_oracle(img, (64, 64), (32, 48))
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5, atol=1e-5)


def test_sharded_real_model_evaluator():
    from clip_ebc_tpu.models import get_model
    from clip_ebc_tpu.training.evaluate import Evaluator

    bins = [(0.0, 0.0), (1.0, 1.0), (2.0, float("inf"))]
    model = get_model("vgg11", input_size=64, reduction=16, bins=bins, anchor_points=[0.0, 1.0, 2.2])
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True)
    variables = {k: v for k, v in variables.items() if k in ("params", "batch_stats")}
    mesh = make_mesh()
    img = np.random.default_rng(2).normal(size=(128, 192, 3)).astype(np.float32)
    ev_single = Evaluator(model, reduction=16, sliding_window=True, window_size=64, stride=64)
    ev_sharded = Evaluator(model, reduction=16, sliding_window=True, window_size=64, stride=64, mesh=mesh)
    c1 = ev_single.predict_count(variables, img)
    c2 = ev_sharded.predict_count(variables, img)
    np.testing.assert_allclose(c1, c2, rtol=1e-4)


def test_sharded_packed_eval_matches_single_device():
    """Packed cross-image eval under a mesh (window batch sharded over the
    data axis) must produce the same densities as the single-device packed
    path and the per-image path (VERDICT r3 item 7: the packed evaluator
    rides the mesh)."""
    from clip_ebc_tpu.models import get_model
    from clip_ebc_tpu.training.evaluate import Evaluator

    bins = [(0.0, 0.0), (1.0, 1.0), (2.0, float("inf"))]
    model = get_model("vgg11", input_size=64, reduction=16, bins=bins,
                      anchor_points=[0.0, 1.0, 2.2])
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=True)
    variables = {k: v for k, v in variables.items()
                 if k in ("params", "batch_stats")}
    mesh = make_mesh()
    rng = np.random.default_rng(3)
    stream = [
        rng.normal(size=(64, 128, 3)).astype(np.float32),
        rng.normal(size=(128, 128, 3)).astype(np.float32),
        rng.normal(size=(64, 64, 3)).astype(np.float32),
    ]
    kw = dict(reduction=16, sliding_window=True, window_size=64, stride=64)
    ev_single = Evaluator(model, **kw)
    ev_sharded = Evaluator(model, **kw, mesh=mesh)

    single = list(ev_single.predict_densities_packed(
        variables, stream, batch_windows=8, chunk=2))
    sharded = list(ev_sharded.predict_densities_packed(
        variables, stream, batch_windows=8, chunk=2))
    assert len(single) == len(sharded) == 3
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)
    # per-image cross-check
    for img, d in zip(stream, sharded):
        c = float(ev_sharded.predict_count(variables, img))
        np.testing.assert_allclose(float(np.asarray(d).sum()), c, rtol=1e-4)

    # batch_windows must divide by the mesh size
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        list(ev_sharded.predict_densities_packed(
            variables, stream, batch_windows=6, chunk=2))
