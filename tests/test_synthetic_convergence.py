"""Synthetic-crowd generator sanity + a short-horizon convergence run.

Real datasets cannot be mounted here, so training on rendered crowd
scenes and watching val MAE drop is the strongest end-to-end accuracy
signal available (reference trainer.py:149-194 is the loop being
validated). The long-horizon (~100-epoch, real-chip) version lives in
scripts/convergence_run.py with its curve recorded in STATUS; this test
is the marked-slow short-horizon gate: val MAE must improve >=2x over
the untrained model.
"""

import numpy as np
import pytest

import jax


def test_render_crowd_scene_statistics():
    from clip_ebc_tpu.data.synthetic import render_crowd_scene

    rng = np.random.default_rng(1)
    img, pts = render_crowd_scene(rng, size=(256, 384), count=120)
    assert img.shape == (256, 384, 3) and img.dtype == np.uint8
    assert pts.shape == (120, 2)
    assert pts[:, 0].max() < 384 and pts[:, 1].max() < 256
    assert img.std() > 10  # textured, not flat
    # people darken/brighten locally: head pixels differ from background
    counts = [render_crowd_scene(rng, size=(128, 128))[1].shape[0] for _ in range(32)]
    assert min(counts) >= 1 and max(counts) > 20  # heavy-tailed spread


def test_synthetic_dataset_through_production_loader(tmp_path):
    from clip_ebc_tpu.data.crowd import CrowdDataset
    from clip_ebc_tpu.data.synthetic import make_synthetic_crowd_dataset

    make_synthetic_crowd_dataset(str(tmp_path), n_train=4, n_val=2, size=(256, 320))
    ds = CrowdDataset("shb", "train", data_root=str(tmp_path), num_crops=1,
                      check_sizes=False)
    assert len(ds) == 4
    images, labels, density = ds[0]
    assert images.shape == (1, 256, 320, 3)
    # dot-map rasterization is count-preserving
    assert float(density.sum()) == pytest.approx(len(labels[0]), abs=1e-5)
    # ImageNet-normalized
    assert images.min() > -3.0 and images.max() < 3.0 and images.min() < -0.5


@pytest.mark.slow
def test_short_horizon_convergence_val_mae_improves(tmp_path):
    """Train vgg11_ae (128/8/4, dmcount) on synthetic crowds for a few
    epochs on the CPU mesh: val MAE must improve >=2x over the untrained
    model (VERDICT r2 missing #2)."""
    from clip_ebc_tpu.config import ExperimentConfig
    from clip_ebc_tpu.data.crowd import CrowdDataset
    from clip_ebc_tpu.data.loader import TrainLoader
    from clip_ebc_tpu.data.synthetic import make_synthetic_crowd_dataset
    from clip_ebc_tpu.data import make_train_transforms
    from clip_ebc_tpu.losses import make_loss_fn
    from clip_ebc_tpu.models import get_model
    from clip_ebc_tpu.training import Trainer
    from clip_ebc_tpu.training.evaluate import Evaluator, evaluate

    make_synthetic_crowd_dataset(
        str(tmp_path), n_train=32, n_val=8, size=(256, 320), max_count=150, seed=3
    )
    cfg = ExperimentConfig(
        dataset="shb", model="vgg11_ae", input_size=128, reduction=8,
        truncation=4, count_loss="dmcount", batch_size=8, num_crops=1,
        lr=5e-4, warmup_epochs=1, warmup_lr=5e-4, weight_decay=1e-4,
        data_root=str(tmp_path),
    ).normalize()
    model = get_model(cfg.model, cfg.input_size, cfg.reduction, cfg.bins,
                      cfg.bin_anchors)
    trainer = Trainer(cfg, model, make_loss_fn(cfg))

    train_ds = CrowdDataset(
        "shb", "train", data_root=str(tmp_path), num_crops=1,
        transforms=make_train_transforms(cfg), check_sizes=False,
    )
    val_ds = CrowdDataset("shb", "val", data_root=str(tmp_path), num_crops=1,
                          check_sizes=False)
    loader = TrainLoader(train_ds, batch_size=8, reduction=8, seed=0,
                         num_threads=2)

    state = trainer.init_state(jax.random.PRNGKey(0), next(iter(loader)))
    ev = Evaluator(model, reduction=8)

    def val_mae(st):
        variables = {"params": st.params}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        return evaluate(ev, variables, val_ds)["mae"]

    mae0 = val_mae(state)
    losses = []
    for epoch in range(1, 9):
        state, info = trainer.train_epoch(state, loader, epoch)
        losses.append(info["loss"])
    mae = val_mae(state)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert mae < mae0 / 2, f"val MAE {mae:.1f} vs untrained {mae0:.1f}"
