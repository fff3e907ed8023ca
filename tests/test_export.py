"""Serving-export tests: jax.export round-trips of the inference surfaces.

The reference has no export/serving artifact at all (its eval drivers
rebuild the torch module per run, reference test_nwpu.py:55-68); these
tests pin the TPU-native replacement: serialized StableHLO programs that
reload and reproduce the live model's outputs (to float-reassociation
noise) on the same platform, including the whole sliding-window pipeline and cross-platform
(tpu-target) lowering from this CPU-only host.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_ebc_tpu.export import (
    export_pipeline,
    export_window_forward,
    load_exported,
    save_exported,
)
from clip_ebc_tpu.models import get_model

BINS = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, float("inf"))]
ANCHORS = [0.0, 1.0, 2.0, 3.0, 4.41]


@pytest.fixture(scope="module")
def tiny_model():
    model = get_model("vgg11_ae", 64, 8, BINS, ANCHORS, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return model, variables


def test_window_export_roundtrip(tiny_model, tmp_path):
    model, variables = tiny_model
    exp = export_window_forward(model, variables, 64, batch=2)
    path = str(tmp_path / "win.jaxexp")
    save_exported(exp, path, {"model": "vgg11_ae"})
    call, manifest = load_exported(path)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32
    )
    direct = model.apply(variables, x, train=False)
    served = call(x)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(served), rtol=1e-5, atol=1e-6
    )
    assert manifest["platforms"] == ["cpu"]
    assert manifest["meta"]["model"] == "vgg11_ae"
    assert manifest["bytes"] == os.path.getsize(path)


def test_window_export_symbolic_batch(tiny_model, tmp_path):
    model, variables = tiny_model
    exp = export_window_forward(model, variables, 64, batch=None)
    path = str(tmp_path / "win_sym.jaxexp")
    save_exported(exp, path)
    call, manifest = load_exported(path)
    assert "b," in manifest["in_avals"][0]  # symbolic leading dim survived

    rng = np.random.default_rng(1)
    for b in (1, 3):
        x = jnp.asarray(rng.normal(size=(b, 64, 64, 3)), jnp.float32)
        direct = model.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(call(x)), rtol=1e-5, atol=1e-6
        )


def test_pipeline_export_matches_live_pipeline(tiny_model, tmp_path):
    from clip_ebc_tpu.ops.sliding_window import sliding_window_predict

    model, variables = tiny_model
    h, w = 96, 128  # non-multiple of the window: exercises edge clamping
    exp = export_pipeline(
        model, variables, (h, w), window=(64, 64), stride=(32, 32), reduction=8
    )
    path = str(tmp_path / "pipe.jaxexp")
    save_exported(exp, path)
    call, _ = load_exported(path)

    image = jnp.asarray(
        np.random.default_rng(2).normal(size=(h, w, 3)), jnp.float32
    )

    def apply_fn(v, windows):
        out = model.apply(v, windows, train=False)
        return out[..., 0] if out.ndim == 4 else out

    live = sliding_window_predict(
        apply_fn, variables, image, window=(64, 64), stride=(32, 32), reduction=8
    )
    served = call(image)
    assert served.shape == (h // 8, w // 8)
    np.testing.assert_allclose(
        np.asarray(live), np.asarray(served), rtol=1e-6, atol=1e-6
    )


def test_text_hoisting_via_encode_text_module(tmp_path):
    """A model exposing encode_text gets its text tower run ONCE at export
    time and baked in: the exported program must contain no token inputs
    and still match the live text_feats forward."""
    import flax.linen as nn

    class TinyCos(nn.Module):
        feat: int = 8
        n_bins: int = 5

        def setup(self):
            self.proj = nn.Dense(self.feat)
            self.text = nn.Embed(self.n_bins, self.feat)

        def encode_text(self):
            t = self.text(jnp.arange(self.n_bins))
            return t / jnp.linalg.norm(t, axis=-1, keepdims=True)

        def __call__(self, x, train=False, text_feats=None):
            if text_feats is None:
                text_feats = self.encode_text()
            v = self.proj(x.mean(axis=(1, 2)))
            v = v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-6)
            return v @ text_feats.T

    model = TinyCos()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)))
    exp = export_window_forward(model, variables, 4, batch=2)
    path = str(tmp_path / "cos.jaxexp")
    save_exported(exp, path)
    call, _ = load_exported(path)

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 4, 3)), jnp.float32)
    tf = model.apply(variables, method="encode_text")
    direct = model.apply(variables, x, text_feats=tf)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(call(x)), rtol=1e-5, atol=1e-6
    )


def test_tpu_platform_export_from_cpu_host(tiny_model, tmp_path):
    """Cross-platform lowering: a TPU serving artifact serializes on this
    CPU-only host (execution is impossible here; loading must still work
    and calling must fail with a platform error, not silently run)."""
    model, variables = tiny_model
    exp = export_window_forward(
        model, variables, 64, batch=1, platforms=("tpu",)
    )
    path = str(tmp_path / "tpu.jaxexp")
    save_exported(exp, path)
    call, manifest = load_exported(path)
    assert manifest["platforms"] == ["tpu"]
    with pytest.raises(Exception, match="(?i)platform|tpu"):
        call(jnp.zeros((1, 64, 64, 3), jnp.float32))


def test_target_platform_override_gates():
    """Platform-keyed lowering gates follow the export target, not the
    build host: under a pinned "tpu" target the fused-attention and
    fused-head gates flip on even though this host is CPU (so a TPU
    serving artifact exported here ships the Mosaic kernels — verified
    end-to-end off-suite: the flagship tpu-platform export contains
    tpu_custom_call)."""
    from clip_ebc_tpu.models.transformer import use_fused_qkv
    from clip_ebc_tpu.utils.platform import (
        target_platform,
        target_platform_override,
    )

    assert target_platform() == "cpu"
    assert not use_fused_qkv("auto")
    with target_platform_override("tpu"):
        assert target_platform() == "tpu"
        assert use_fused_qkv("auto")
        with target_platform_override("cpu"):  # reentrant
            assert target_platform() == "cpu"
        assert target_platform() == "tpu"
    assert target_platform() == "cpu"


def test_tpu_export_embeds_mosaic_kernel(tmp_path):
    """A single-platform tpu export of a module whose auto gate picks the
    Pallas fused path must contain the Mosaic custom call."""
    import flax.linen as nn

    from clip_ebc_tpu.models.transformer import (
        ResidualAttentionBlock,
        use_fused_qkv,
    )

    class Blockish(nn.Module):
        @nn.compact
        def __call__(self, x):
            # the gate is evaluated HERE (trace time), exactly as
            # ClipEBC.setup does — so it follows the export override
            return ResidualAttentionBlock(
                num_heads=4, fused_qkv=use_fused_qkv("auto"), name="blk"
            )(x)

    model = Blockish()
    x0 = jnp.zeros((2, 128, 256), jnp.float32)  # dh=64, even heads
    variables = model.init(jax.random.PRNGKey(0), x0)

    def fwd(x):
        return model.apply(variables, x)

    from clip_ebc_tpu.export import _export_for

    exp_tpu = _export_for(("tpu",))(fwd, jax.ShapeDtypeStruct(x0.shape, x0.dtype))
    exp_cpu = _export_for(("cpu",))(fwd, jax.ShapeDtypeStruct(x0.shape, x0.dtype))
    assert "tpu_custom_call" in exp_tpu.mlir_module()
    assert "tpu_custom_call" not in exp_cpu.mlir_module()


def test_pod_sharded_pipeline_export(tiny_model, tmp_path):
    """A mesh-sharded pipeline export records nr_devices=8, partitions the
    window batch over the data axis (the live mesh-mode decomposition),
    and reproduces the single-device program's output when served on the
    same-size mesh."""
    from clip_ebc_tpu.parallel.mesh import make_mesh

    model, variables = tiny_model
    mesh = make_mesh()
    assert mesh.devices.size == 8
    h, w = 96, 128
    kw = dict(window=(64, 64), stride=(32, 32), reduction=8)
    exp = export_pipeline(model, variables, (h, w), **kw, mesh=mesh)
    assert exp.nr_devices == 8
    path = str(tmp_path / "pod.jaxexp")
    save_exported(exp, path, {"shard_devices": 8})
    call, manifest = load_exported(path)
    assert manifest["nr_devices"] == 8

    image = jnp.asarray(
        np.random.default_rng(4).normal(size=(h, w, 3)), jnp.float32
    )
    exp1 = export_pipeline(model, variables, (h, w), **kw)  # single-device
    single = exp1.call(image)

    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    served = jax.jit(call, in_shardings=rep, out_shardings=rep)(image)
    assert served.shape == (h // 8, w // 8)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(served), rtol=1e-5, atol=1e-6
    )


def test_pod_sharded_export_rejects_wrong_device_count(tiny_model, tmp_path):
    """Serving a pod artifact on the wrong device count must fail loudly
    (jax.export enforces the recorded nr_devices), not silently run."""
    from clip_ebc_tpu.parallel.mesh import make_mesh

    model, variables = tiny_model
    mesh = make_mesh(devices=jax.devices()[:4])
    exp = export_pipeline(
        model, variables, (64, 64), window=(64, 64), stride=(64, 64),
        reduction=8, mesh=mesh,
    )
    assert exp.nr_devices == 4
    path = str(tmp_path / "pod4.jaxexp")
    save_exported(exp, path)
    call, _ = load_exported(path)
    with pytest.raises(Exception, match="4 devices"):
        call(jnp.zeros((64, 64, 3), jnp.float32))  # 1-device context


def test_export_cli_pod_sharded(tmp_path):
    from clip_ebc_tpu.cli.export_model import main

    out = str(tmp_path / "cli_pod.jaxexp")
    main([
        "--model", "vgg11_ae", "--input_size", "64", "--reduction", "8",
        "--truncation", "4", "--bins_dataset", "shb", "--mode", "pipeline",
        "--image_h", "96", "--image_w", "128", "--window_size", "64",
        "--stride", "32", "--random_init", "--shard_devices", "8",
        "--out", out,
    ])
    with open(out + ".json") as f:
        manifest = json.load(f)
    assert manifest["meta"]["shard_devices"] == 8
    assert manifest["nr_devices"] == 8


def test_export_cli_end_to_end(tmp_path):
    from clip_ebc_tpu.cli.export_model import main

    out = str(tmp_path / "cli_win.jaxexp")
    main([
        "--model", "vgg11_ae", "--input_size", "64", "--reduction", "8",
        "--truncation", "4", "--bins_dataset", "shb", "--batch", "2",
        "--random_init", "--out", out,
    ])
    assert os.path.exists(out)
    with open(out + ".json") as f:
        manifest = json.load(f)
    assert manifest["meta"]["mode"] == "window"
    call, _ = load_exported(out)
    y = call(jnp.zeros((2, 64, 64, 3), jnp.float32))
    assert np.asarray(y).shape[0] == 2


def test_export_cli_pipeline_mode(tmp_path):
    from clip_ebc_tpu.cli.export_model import main

    out = str(tmp_path / "cli_pipe.jaxexp")
    main([
        "--model", "vgg11_ae", "--input_size", "64", "--reduction", "8",
        "--truncation", "4", "--bins_dataset", "shb", "--mode", "pipeline",
        "--image_h", "96", "--image_w", "128", "--window_size", "64",
        "--stride", "32", "--random_init", "--out", out,
    ])
    with open(out + ".json") as f:
        manifest = json.load(f)
    assert manifest["meta"]["mode"] == "pipeline"
    assert manifest["meta"]["image_shape"] == [96, 128]
    call, _ = load_exported(out)
    y = call(jnp.zeros((96, 128, 3), jnp.float32))
    assert np.asarray(y).shape == (12, 16)


def test_unbaked_window_export_roundtrip(tiny_model, tmp_path):
    """bake_weights=False: weights ride a sidecar npz and bind as leading
    call args — the program file stays small (no embedded parameters) and
    load_serving_fn reproduces the live model."""
    from clip_ebc_tpu.export import load_serving_fn

    model, variables = tiny_model
    exp, leaves = export_window_forward(
        model, variables, 64, batch=2, bake_weights=False
    )
    path = str(tmp_path / "win_unbaked.jaxexp")
    save_exported(exp, path, {"model": "vgg11_ae"}, weights=leaves)
    assert os.path.exists(path + ".weights.npz")
    n_param_bytes = sum(np.asarray(l).nbytes for l in leaves)
    assert os.path.getsize(path) < n_param_bytes  # weights not embedded

    fn, manifest = load_serving_fn(path)
    assert manifest["n_weight_args"] == len(leaves)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 64, 64, 3)), jnp.float32
    )
    direct = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(fn(x)), rtol=1e-5, atol=1e-6
    )


def test_unbaked_pipeline_export_matches_live(tiny_model, tmp_path):
    from clip_ebc_tpu.export import load_serving_fn
    from clip_ebc_tpu.ops.sliding_window import sliding_window_predict

    model, variables = tiny_model
    exp, leaves = export_pipeline(
        model, variables, (96, 128), window=(64, 64), stride=(32, 32),
        reduction=8, bake_weights=False,
    )
    path = str(tmp_path / "pipe_unbaked.jaxexp")
    save_exported(exp, path, weights=leaves)
    fn, _ = load_serving_fn(path)

    img = jnp.asarray(
        np.random.default_rng(2).normal(size=(96, 128, 3)), jnp.float32
    )
    live = sliding_window_predict(
        lambda v, xs: model.apply(v, xs, train=False), variables, img,
        window=(64, 64), stride=(32, 32), reduction=8,
    )
    np.testing.assert_allclose(
        np.asarray(live), np.asarray(fn(img)), rtol=1e-4, atol=1e-5
    )


def test_export_cli_no_bake_weights(tmp_path):
    import subprocess
    import sys

    out = str(tmp_path / "cli_unbaked.jaxexp")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    res = subprocess.run(
        [sys.executable, "-m", "clip_ebc_tpu.cli.export_model",
         "--model", "vgg11_ae", "--input_size", "64", "--reduction", "8",
         "--truncation", "4", "--bins_dataset", "shb", "--random_init",
         "--batch", "2", "--no_bake_weights", "--out", out],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    with open(out + ".json") as f:
        manifest = json.load(f)
    assert manifest["n_weight_args"] > 0
    assert manifest["meta"]["bake_weights"] is False
    assert os.path.exists(out + ".weights.npz")
    from clip_ebc_tpu.export import load_serving_fn

    fn, _ = load_serving_fn(out)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    assert np.asarray(fn(x)).shape == (2, 8, 8)


def test_sidecar_weights_bf16_roundtrip(tmp_path):
    """bf16 leaves can't round-trip np.savez natively (np.load hands back
    raw '|V2' records, which crashed the first on-chip serving run) —
    save_exported stores them as uint16 + records the true dtype in the
    manifest; load_serving_fn views them back before binding."""
    from jax import export as jax_export

    from clip_ebc_tpu.export import load_serving_fn

    def f(w, b, x):
        return (x @ w).astype(jnp.float32) + b

    w = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 8)), jnp.bfloat16
    )
    b = jnp.asarray([1.5], jnp.float32)
    x = jnp.ones((2, 8), jnp.bfloat16)
    exp = jax_export.export(jax.jit(f))(w, b, x)
    path = str(tmp_path / "bf16.jaxexp")
    save_exported(exp, path, weights=[w, b])
    fn, manifest = load_serving_fn(path)
    assert manifest["weight_dtypes"] == ["bfloat16", "float32"]
    # exported vs eager may accumulate the bf16 dot in different orders
    np.testing.assert_allclose(
        np.asarray(fn(x), np.float32), np.asarray(f(w, b, x), np.float32),
        rtol=2e-2, atol=2e-2,
    )
