"""From-scratch CLIP-EBC trainability: ours vs the reference's own torch
stack, same init, same batch, 120 Adam steps of clip_resnet50 at 224^2.

Result (recorded in STATUS.md r3): the two trajectories match to 4-5
significant digits (loss 2474.12 -> 2323.6 torch / 2323.7 ours) and BOTH
plateau predicting ~1340 per crop (true 20-29): without pretrained CLIP
weights the EBC cosine head scores blocks against frozen RANDOM text
embeddings, so the bin logits stay ~uniform. This is an architecture
property shared exactly with the reference (whose trainer always loads
pretrained CLIP, reference models/clip/model.py), not a framework bug —
and it extends the 20-step Adam trajectory parity (tests/
test_train_parity.py) to 120 steps at a realistic shape.

Usage: JAX_PLATFORMS=cpu PYTHONPATH= python scripts/diag_clip_scratch.py
(PYTHONPATH stripped so the axon TPU plugin does not register; ~50 min
of CPU torch.)"""
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "tests"))
import os
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import torch
import jax, jax.numpy as jnp

from reference_loader import load_reference, randomize_
from test_train_parity import _make_batch, _loss_fn, _ref_loss_fn, BINS, ANCHORS
from clip_ebc_tpu.models import get_model
from clip_ebc_tpu.models.pretrained import apply_pretrained

ns = load_reference()
input_size, reduction, b, steps, lr = 224, 8, 4, 120, 4e-4

ref = ns.clip_model._clip_ebc(
    backbone="resnet50", input_size=input_size, reduction=reduction,
    bins=BINS, anchor_points=ANCHORS, freeze_text_encoder=True,
    num_vpt=None, deep_vpt=False, vpt_drop=None, prompt_type="word",
)
randomize_(ref, seed=30)
from clip_ebc_tpu.models.clip.prompts import bin_prompts
from clip_ebc_tpu.models.clip.tokenizer import tokenize
toks = tokenize(list(bin_prompts(tuple(tuple(x) for x in BINS), "word")))
ref.text_prompts = torch.as_tensor(np.asarray(toks))
ref._extract_text_features()

rng = np.random.default_rng(31)
# crowd-like batch: 1-31 points per 224^2 crop (_make_batch p_max=64)
t_batch, batch = _make_batch(rng, b, input_size, reduction, p_max=64)

model = get_model("clip_resnet50", input_size, reduction, bins=BINS, anchor_points=ANCHORS)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, input_size, input_size, 3)), train=False)
variables = apply_pretrained(model, dict(variables), dict(ref.state_dict()), allow_byte_tokenizer=True)

true_counts = batch.point_mask.sum(1)
print("true counts/crop:", true_counts)

# ---- torch ----
ref.train()
opt = torch.optim.Adam([p for p in ref.parameters() if p.requires_grad], lr=lr, weight_decay=1e-4)
ref_loss = _ref_loss_fn(ns, input_size, reduction, "dmcount")
t_x, t_full, t_pts = t_batch
print("== reference torch ==")
for i in range(steps):
    opt.zero_grad()
    out = ref(t_x)
    logits, density = out if isinstance(out, tuple) else (None, out)
    loss, _ = ref_loss(logits, density, t_full, t_pts)
    loss.backward()
    opt.step()
    if i % 10 == 0 or i == steps - 1:
        with torch.no_grad():
            pred = ref(t_x)
            d = pred[1] if isinstance(pred, tuple) else pred
            counts = d.sum(dim=(1, 2, 3)).numpy()
        print(f"step {i:3d} loss {float(loss):9.3f} pred counts {np.round(counts,1)}")

# ---- ours ----
from clip_ebc_tpu.training.optim import make_optimizer
from clip_ebc_tpu.training.state import TrainState
from clip_ebc_tpu.training.trainer import make_train_step

frozen = getattr(model, "frozen_param_predicate", None)
tx = make_optimizer(weight_decay=1e-4, frozen_predicate=frozen)
state = TrainState.create(params=variables["params"], batch_stats=variables.get("batch_stats", {}), tx=tx)
text_feats = model.apply(variables, method="encode_text")
loss_fn = _loss_fn(input_size, reduction, "dmcount")
step = jax.jit(make_train_step(model, loss_fn))
lr_arr = jnp.asarray(lr, jnp.float32)
batch_dev = jax.tree_util.tree_map(jnp.asarray, batch)

@jax.jit
def predict(params, bstats):
    v = {"params": params}
    if bstats: v["batch_stats"] = bstats
    d = model.apply(v, jnp.asarray(batch.images), train=False, text_feats=text_feats)
    return d.sum(axis=(1, 2))

print("== ours (jax) ==")
for i in range(steps):
    state, info = step(state, batch_dev, lr_arr, text_feats)
    if i % 10 == 0 or i == steps - 1:
        counts = np.asarray(predict(state.params, state.batch_stats))
        print(f"step {i:3d} loss {float(info['loss']):9.3f} pred counts {np.round(counts,1)}")
