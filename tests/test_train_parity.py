"""Training-math parity against the reference: full-model gradients and a
multi-step Adam loss trajectory on identical converted weights + batch.

Forward/loss-value parity (test_reference_parity.py) cannot catch drift in
the *composition* of the training mechanisms — the frozen-subtree
stop_gradient pruning (training/trainer.py:28-38), VPT prompt gradients
through a frozen trunk, the OT surrogate gradient
(reference losses/dm_loss.py:66-76), and coupled-L2 Adam
(reference utils/train_utils.py:81-85). These tests do: they run torch
autograd through the reference's own model+DACELoss and compare

- the gradient of every trainable leaf (mapped through the same
  converters used for weights — gradients transform identically), and
- a 20-step loss trajectory under matched Adam(lr, weight_decay)

for vgg19_ae (everything trains) and clip_vit_b_16 + deep VPT (frozen
trunk; VPT/decoder/projection/logit_scale train).
Reference hot path: train.py:53-60.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_loader import load_reference, randomize_  # noqa: E402

from clip_ebc_tpu.data.loader import Batch  # noqa: E402
from clip_ebc_tpu.losses import DMCountConfig, dace_loss  # noqa: E402
from clip_ebc_tpu.models import get_model  # noqa: E402
from clip_ebc_tpu.models import convert as C  # noqa: E402
from clip_ebc_tpu.models.pretrained import apply_pretrained  # noqa: E402

BINS = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, float("inf"))]
ANCHORS = [0.0, 1.0, 2.0, 4.2]


def _make_batch(rng, b, input_size, reduction, p_max=12):
    """One fixed batch in both layouts: torch (NCHW image, full-res dot
    density, list-of-points) and ours (NHWC Batch with block-sum density +
    padded points)."""
    x = rng.normal(size=(b, 3, input_size, input_size)).astype(np.float32)
    grid = input_size // reduction
    full = np.zeros((b, 1, input_size, input_size), np.float32)
    points = np.zeros((b, p_max, 2), np.float32)
    mask = np.zeros((b, p_max), bool)
    for i in range(b):
        n = int(rng.integers(1, p_max // 2))
        pts = rng.uniform(0, input_size - 1, (n, 2)).astype(np.float32)
        points[i, :n], mask[i, :n] = pts, True
        for px, py in pts:
            full[i, 0, int(py), int(px)] += 1.0
    block = full[:, 0].reshape(b, grid, reduction, grid, reduction).sum((2, 4))
    t_x = torch.from_numpy(x)
    t_full = torch.from_numpy(full)
    t_pts = [torch.from_numpy(points[i][mask[i]]) for i in range(b)]
    ours = Batch(
        images=x.transpose(0, 2, 3, 1).copy(),
        points=points,
        point_mask=mask,
        density=block,
    )
    return (t_x, t_full, t_pts), ours


def _loss_fn(input_size, reduction, count_loss):
    dm_cfg = DMCountConfig(input_size=input_size, reduction=reduction)
    bins = tuple(tuple(x) for x in BINS)

    def loss_fn(logits, density, batch):
        return dace_loss(
            logits, density, batch.density, batch.points, batch.point_mask,
            bins=bins, weight_count_loss=1.0, count_loss=count_loss,
            dm_cfg=dm_cfg,
        )

    return loss_fn


def _ref_loss_fn(ns, input_size, reduction, count_loss):
    return ns.dace_loss.DACELoss(
        bins=BINS, reduction=reduction, weight_count_loss=1.0,
        count_loss=count_loss, input_size=input_size,
    )


def _torch_backward(ref, ref_loss, t_batch):
    t_x, t_full, t_pts = t_batch
    ref.train()
    ref.zero_grad()
    out = ref(t_x)
    logits, density = out if isinstance(out, tuple) else (None, out)
    loss, _ = ref_loss(logits, density, t_full, t_pts)
    loss.backward()
    grad_sd = {}
    for k, p in ref.named_parameters():
        grad_sd[k] = p.grad.detach().clone() if p.grad is not None else torch.zeros_like(p)
    for k, bmod in ref.named_buffers():
        grad_sd[k] = torch.zeros_like(bmod, dtype=torch.float32)
    return float(loss), grad_sd


def _flax_grads(model, variables, batch, loss_fn):
    """Gradients through the PRODUCTION compute-loss composition: frozen
    subtrees stop_gradient-pruned, hoisted text features."""
    from clip_ebc_tpu.training.trainer import _stop_frozen

    frozen = getattr(model, "frozen_param_predicate", None)
    bs = variables.get("batch_stats", {})
    text_feats = (
        model.apply(variables, method="encode_text")
        if hasattr(type(model), "encode_text")
        else None
    )

    def compute_loss(params):
        if frozen is not None:
            params = _stop_frozen(params, frozen)
        v = {"params": params}
        if bs:
            v["batch_stats"] = bs
        kw = {} if text_feats is None else {"text_feats": text_feats}
        (logits, density), _ = model.apply(
            v, jnp.asarray(batch.images), train=True, mutable=["batch_stats"], **kw
        )
        loss, info = loss_fn(logits, density, batch)
        return loss, info

    (loss, _), grads = jax.value_and_grad(compute_loss, has_aux=True)(
        variables["params"]
    )
    return float(loss), grads


def _leaves(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaves(v, prefix + (k,))
    else:
        yield "/".join(prefix), np.asarray(tree, np.float32)


def _assert_tree_close(got, want, rtol, atol, what):
    got_d = dict(_leaves(got))
    for path, w in _leaves(want):
        assert path in got_d, f"{what}: missing gradient leaf {path}"
        np.testing.assert_allclose(
            got_d[path], w, rtol=rtol, atol=atol,
            err_msg=f"{what}: gradient mismatch at {path}",
        )


@pytest.mark.parametrize("count_loss", ["mae", "dmcount"])
def test_vgg19_ae_full_gradient_parity(count_loss):
    """Every parameter's gradient matches torch autograd through the
    reference vgg19_ae Classifier + DACELoss on identical weights+batch."""
    ns = load_reference()
    input_size, reduction, b = 64, 8, 3
    backbone = ns.ed_vgg.VGG(
        ns.utils.make_vgg_layers(ns.utils.vgg_cfgs["E"]), reduction=reduction
    )
    ref = ns.model.Classifier(backbone, bins=BINS, anchor_points=ANCHORS)
    randomize_(ref, seed=10)

    rng = np.random.default_rng(11)
    t_batch, batch = _make_batch(rng, b, input_size, reduction)
    ref_loss, grad_sd = _torch_backward(
        ref, _ref_loss_fn(ns, input_size, reduction, count_loss), t_batch
    )

    model = get_model("vgg19_ae", input_size, reduction, bins=BINS, anchor_points=ANCHORS)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, input_size, input_size, 3)), train=False
    )
    variables = apply_pretrained(model, dict(variables), dict(ref.state_dict()))
    our_loss, grads = _flax_grads(
        model, variables, batch, _loss_fn(input_size, reduction, count_loss)
    )

    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-3)
    want, _ = C.convert_reference_classifier(grad_sd)
    _assert_tree_close(grads, want, rtol=5e-3, atol=2e-4, what=f"vgg19_ae/{count_loss}")


def test_clip_vit_vpt_gradient_parity():
    """Trainable-leaf gradients (VPT prompts through the frozen trunk,
    decoder, projection, logit_scale) match torch autograd through the
    reference CLIP_EBC ViT-B/16 + DACELoss(dmcount)."""
    ns = load_reference()
    input_size, reduction, b = 32, 8, 2
    ref = ns.clip_model._clip_ebc(
        backbone="vit_b_16", input_size=224, reduction=reduction,
        bins=BINS, anchor_points=ANCHORS,
        freeze_text_encoder=True, num_vpt=4, deep_vpt=True, vpt_drop=0.0,
        prompt_type="word",
    )
    randomize_(ref, seed=12)
    # refresh the cached frozen text features for the randomized weights,
    # using OUR prompt tokens on both sides (reference precomputes at
    # __init__, before randomize_; reference models/clip/model.py:112-114)
    from clip_ebc_tpu.models.clip.prompts import bin_prompts
    from clip_ebc_tpu.models.clip.tokenizer import tokenize

    toks = tokenize(list(bin_prompts(tuple(tuple(x) for x in BINS), "word")))
    ref.text_prompts = torch.as_tensor(np.asarray(toks))
    ref._extract_text_features()

    rng = np.random.default_rng(13)
    t_batch, batch = _make_batch(rng, b, input_size, reduction)
    ref_loss, grad_sd = _torch_backward(
        ref, _ref_loss_fn(ns, input_size, reduction, "dmcount"), t_batch
    )

    model = get_model(
        "clip_vit_b_16", 224, reduction, bins=BINS, anchor_points=ANCHORS,
        num_vpt=4, deep_vpt=True, vpt_drop=0.0, prompt_type="word",
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    variables = apply_pretrained(model, dict(variables), dict(ref.state_dict()),
                                 allow_byte_tokenizer=True)
    our_loss, grads = _flax_grads(
        model, variables, batch, _loss_fn(input_size, reduction, "dmcount")
    )

    np.testing.assert_allclose(our_loss, ref_loss, rtol=2e-3)
    want_p, _ = C.convert_reference_clip_ebc(grad_sd)

    # the reference trains exactly: VPT prompts, decoder, projection,
    # logit_scale (trunk+text frozen, reference models/clip/model.py:63-65,
    # 102-104) — compare those leaves
    trainable = {
        "image_encoder/vpt": want_p["image_encoder"]["vpt"],
        "image_decoder": want_p["image_decoder"],
        "projection": want_p["projection"],
        "logit_scale": want_p["logit_scale"],
    }
    got = {
        "image_encoder/vpt": grads["image_encoder"]["vpt"],
        "image_decoder": grads["image_decoder"],
        "projection": grads["projection"],
        "logit_scale": grads["logit_scale"],
    }
    _assert_tree_close(got, trainable, rtol=5e-3, atol=2e-4, what="clip_vit_vpt")

    # and the frozen trunk's gradients are *pruned*, not just unused
    frozen = getattr(model, "frozen_param_predicate")
    for path, leaf in _leaves(grads):
        keys = tuple(path.split("/"))
        if frozen(keys):
            assert not np.any(leaf), f"frozen leaf {path} received gradient"


def _torch_train_steps(ref, ref_loss, t_batch, steps, lr, weight_decay):
    t_x, t_full, t_pts = t_batch
    ref.train()
    opt = torch.optim.Adam(
        [p for p in ref.parameters() if p.requires_grad], lr=lr,
        weight_decay=weight_decay,
    )
    losses = []
    for _ in range(steps):
        opt.zero_grad()
        out = ref(t_x)
        logits, density = out if isinstance(out, tuple) else (None, out)
        loss, _ = ref_loss(logits, density, t_full, t_pts)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


def _flax_train_steps(model, variables, batch, loss_fn, steps, lr, weight_decay):
    """The PRODUCTION train step: make_train_step + TrainState + the
    coupled-L2 unit-LR Adam from training/optim.py."""
    from clip_ebc_tpu.training.optim import make_optimizer
    from clip_ebc_tpu.training.state import TrainState
    from clip_ebc_tpu.training.trainer import make_train_step

    frozen = getattr(model, "frozen_param_predicate", None)
    tx = make_optimizer(weight_decay=weight_decay, frozen_predicate=frozen)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    text_feats = (
        model.apply(variables, method="encode_text")
        if hasattr(type(model), "encode_text")
        else None
    )
    step = jax.jit(make_train_step(model, loss_fn))
    lr_arr = jnp.asarray(lr, jnp.float32)
    batch_dev = jax.tree_util.tree_map(jnp.asarray, batch)
    losses = []
    for _ in range(steps):
        state, info = step(state, batch_dev, lr_arr, text_feats)
        losses.append(float(info["loss"]))
    return losses


def test_vgg19_ae_adam_trajectory_parity():
    """20 Adam(lr=1e-4, wd=1e-4) steps on a fixed batch: the loss
    trajectory tracks the reference's (same init, coupled-L2 Adam)."""
    ns = load_reference()
    input_size, reduction, b, steps = 64, 8, 3, 20
    backbone = ns.ed_vgg.VGG(
        ns.utils.make_vgg_layers(ns.utils.vgg_cfgs["E"]), reduction=reduction
    )
    ref = ns.model.Classifier(backbone, bins=BINS, anchor_points=ANCHORS)
    randomize_(ref, seed=20)

    rng = np.random.default_rng(21)
    t_batch, batch = _make_batch(rng, b, input_size, reduction)

    model = get_model("vgg19_ae", input_size, reduction, bins=BINS, anchor_points=ANCHORS)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, input_size, input_size, 3)), train=False
    )
    variables = apply_pretrained(model, dict(variables), dict(ref.state_dict()))

    ref_losses = _torch_train_steps(
        ref, _ref_loss_fn(ns, input_size, reduction, "mae"), t_batch,
        steps, lr=1e-4, weight_decay=1e-4,
    )
    our_losses = _flax_train_steps(
        model, variables, batch, _loss_fn(input_size, reduction, "mae"),
        steps, lr=1e-4, weight_decay=1e-4,
    )
    # training must actually move, and both trajectories must agree
    assert ref_losses[-1] < ref_losses[0]
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)


def test_clip_vit_vpt_adam_trajectory_parity():
    """20 Adam steps of the flagship composition (frozen trunk + VPT +
    DMCount loss) track the reference trajectory."""
    ns = load_reference()
    input_size, reduction, b, steps = 32, 8, 2, 20
    ref = ns.clip_model._clip_ebc(
        backbone="vit_b_16", input_size=224, reduction=reduction,
        bins=BINS, anchor_points=ANCHORS,
        freeze_text_encoder=True, num_vpt=4, deep_vpt=True, vpt_drop=0.0,
        prompt_type="word",
    )
    randomize_(ref, seed=22)
    from clip_ebc_tpu.models.clip.prompts import bin_prompts
    from clip_ebc_tpu.models.clip.tokenizer import tokenize

    toks = tokenize(list(bin_prompts(tuple(tuple(x) for x in BINS), "word")))
    ref.text_prompts = torch.as_tensor(np.asarray(toks))
    ref._extract_text_features()

    rng = np.random.default_rng(23)
    t_batch, batch = _make_batch(rng, b, input_size, reduction)

    model = get_model(
        "clip_vit_b_16", 224, reduction, bins=BINS, anchor_points=ANCHORS,
        num_vpt=4, deep_vpt=True, vpt_drop=0.0, prompt_type="word",
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    variables = apply_pretrained(model, dict(variables), dict(ref.state_dict()),
                                 allow_byte_tokenizer=True)

    ref_losses = _torch_train_steps(
        ref, _ref_loss_fn(ns, input_size, reduction, "dmcount"), t_batch,
        steps, lr=1e-4, weight_decay=1e-4,
    )
    our_losses = _flax_train_steps(
        model, variables, batch, _loss_fn(input_size, reduction, "dmcount"),
        steps, lr=1e-4, weight_decay=1e-4,
    )
    assert ref_losses[-1] < ref_losses[0]
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3)
