"""Ahead-of-time export of the inference path via ``jax.export`` (StableHLO).

The reference has no deployment story beyond "run the torch module in
Python" (its eval drivers re-build the model and load a ``.pth`` each run,
reference test_nwpu.py:55-68). On TPU the idiomatic serving artifact is a
serialized StableHLO program: lowered once — on any host, for any target
platform — then loaded and executed by a thin runtime with no Python model
code, no weight files, and no tracing at serving time. This module exports
the two inference surfaces:

* ``export_window_forward`` — the fixed-shape window forward
  ``images (B, S, S, 3) -> density (B, S/r, S/r)``; B may be symbolic so
  one artifact serves every batch size. This is the unit a serving tier
  scales horizontally (the sliding-window decomposition is embarrassingly
  parallel across windows).
* ``export_pipeline`` — the WHOLE single-image sliding-window pipeline at
  a fixed image shape (gather -> bucketed forward -> scatter-add
  overlap assembly, ops/sliding_window.py) as one program:
  ``image (H, W, 3) -> density (H/r, W/r)``.

Weights (and the hoisted frozen text features, for CLIP variants —
the same hoisting as training/evaluate.Evaluator) are baked into the
program as constants, so the ``.jaxexp`` file is fully self-contained.
Cross-platform lowering is first-class: ``platforms=("tpu",)`` exports a
TPU serving artifact from a CPU-only host.

Serialization wraps ``jax.export.Exported.serialize()`` with a JSON
manifest (shapes, dtypes, platforms, metadata) so a serving tier can
validate inputs without deserializing the program.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .utils.platform import target_platform_override

MANIFEST_SUFFIX = ".json"


def _export_for(platforms: Sequence[str]):
    """Export under a pinned target platform when there is exactly one,
    so platform-keyed lowering gates (Pallas fused attention, fused eval
    head — see utils/platform.py) follow the ARTIFACT's platform, not the
    build host's. Multi-platform exports keep the host-neutral paths
    (one program must serve them all)."""

    def run(fn, spec, jit_kwargs=None):
        # fresh function object per export: jit's trace cache is keyed on
        # the function identity, so exporting the SAME fn for a second
        # platform would silently reuse the first platform's trace — and
        # with it the first platform's gate decisions (e.g. a Pallas
        # kernel baked into a cpu lowering).
        def traced(*args):
            return fn(*args)

        specs = spec if isinstance(spec, tuple) else (spec,)
        jitted = jax.jit(traced, **(jit_kwargs or {}))
        if len(platforms) == 1:
            with target_platform_override(platforms[0]):
                return jax_export.export(jitted, platforms=tuple(platforms))(*specs)
        return jax_export.export(jitted, platforms=tuple(platforms))(*specs)

    return run


def _hoisted_forward(model, variables):
    """(images) -> density closure with weights baked in; CLIP text
    features hoisted out of the per-window program exactly as
    training/evaluate.Evaluator does (the frozen text tower runs once at
    export time, not per window)."""
    if hasattr(type(model), "encode_text"):
        text_feats = jax.jit(lambda v: model.apply(v, method="encode_text"))(
            variables
        )

        def forward(images):
            return model.apply(
                variables, images, train=False, text_feats=text_feats
            )

    else:

        def forward(images):
            return model.apply(variables, images, train=False)

    return forward


def _unbaked_forward(model, variables):
    """Weights-as-arguments variant of :func:`_hoisted_forward`.

    Returns ``(forward(*leaves, images), leaves)`` where ``leaves`` is the
    flat list of weight arrays (model variables + the hoisted frozen text
    features for CLIP variants). The exported program then takes the
    weights at CALL time instead of baking them in as constants, which

    * keeps the serialized program small (KBs of StableHLO instead of the
      full parameter set),
    * allows weight hot-swap on a serving tier without re-export, and
    * keeps the compile payload tiny on RPC-fronted device runtimes that
      cap request sizes (constants ship with the program; arguments ship
      once as device buffers).
    """
    bundle: Dict[str, Any] = {"variables": variables}
    has_text = hasattr(type(model), "encode_text")
    if has_text:
        bundle["text_feats"] = jax.jit(
            lambda v: model.apply(v, method="encode_text")
        )(variables)
    leaves, treedef = jax.tree_util.tree_flatten(bundle)

    def forward(*args):
        *ws, images = args
        b = jax.tree_util.tree_unflatten(treedef, list(ws))
        if has_text:
            return model.apply(
                b["variables"], images, train=False, text_feats=b["text_feats"]
            )
        return model.apply(b["variables"], images, train=False)

    return forward, leaves


def _weight_specs(leaves) -> Tuple[Any, ...]:
    return tuple(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves)


def export_window_forward(
    model,
    variables,
    window_size: int,
    *,
    batch: Optional[int] = None,
    dtype=jnp.float32,
    platforms: Sequence[str] = ("cpu",),
    bake_weights: bool = True,
):
    """Export ``images (B, S, S, 3) -> density (B, S/r, S/r)``.

    ``batch=None`` exports a symbolic batch dimension ("b"): the one
    artifact then serves any batch size (XLA specializes per concrete
    shape at call time). A fixed ``batch`` pins it static.

    ``bake_weights=False`` exports the program with the weights (and
    hoisted text features) as leading call arguments instead of embedded
    constants, and returns ``(exported, weight_leaves)`` — pass the leaves
    to :func:`save_exported` so they land in the ``.weights.npz`` sidecar.
    """
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        shape: Tuple[Any, ...] = (b, window_size, window_size, 3)
    else:
        shape = (batch, window_size, window_size, 3)
    img_spec = jax.ShapeDtypeStruct(shape, dtype)
    if bake_weights:
        forward = _hoisted_forward(model, variables)
        return _export_for(platforms)(forward, img_spec)
    forward, leaves = _unbaked_forward(model, variables)
    exp = _export_for(platforms)(forward, _weight_specs(leaves) + (img_spec,))
    return exp, leaves


def export_pipeline(
    model,
    variables,
    image_shape: Tuple[int, int],
    *,
    window: Tuple[int, int],
    stride: Tuple[int, int],
    reduction: int,
    strategy: str = "average",
    dtype=jnp.float32,
    platforms: Sequence[str] = ("cpu",),
    mesh=None,
    bake_weights: bool = True,
):
    """Export the full sliding-window pipeline at a fixed image shape.

    With ``mesh`` the exported program is pod-sharded: the window batch is
    partitioned over the mesh's ``data`` axis exactly as the live
    mesh-mode pipeline (ops/sliding_window.py), the input image is
    replicated, and the artifact records ``nr_devices = mesh.size`` — it
    must be served on that many devices (jax.export replays the recorded
    GSPMD partitioning on the caller's mesh).

    ``bake_weights=False`` as in :func:`export_window_forward` (returns
    ``(exported, weight_leaves)``; the image is the LAST argument)."""
    from .ops.sliding_window import sliding_window_predict

    def _pipeline_of(forward):
        def ndim_normalized(images):
            out = forward(images)
            return out[..., 0] if out.ndim == 4 else out

        def pipeline(image):
            return sliding_window_predict(
                lambda _, images: ndim_normalized(images),
                (),  # weights already bound; the variables slot is unused
                image,
                window=window,
                stride=stride,
                reduction=reduction,
                strategy=strategy,
                mesh=mesh,
            )

        return pipeline

    h, w = image_shape
    img_spec = jax.ShapeDtypeStruct((h, w, 3), dtype)
    jit_kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        # Pin the input replicated over the mesh so the export records the
        # device assignment (nr_devices) even before the first internal
        # sharding constraint.
        jit_kwargs = {
            "in_shardings": NamedSharding(mesh, PartitionSpec()),
            "out_shardings": NamedSharding(mesh, PartitionSpec()),
        }
    if bake_weights:
        pipeline = _pipeline_of(_hoisted_forward(model, variables))
        return _export_for(platforms)(pipeline, img_spec, jit_kwargs=jit_kwargs)

    fwd, leaves = _unbaked_forward(model, variables)

    def pipeline_w(*args):
        *ws, image = args
        return _pipeline_of(lambda images: fwd(*ws, images))(image)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(mesh, PartitionSpec())
        jit_kwargs = {
            "in_shardings": tuple(repl for _ in leaves) + (repl,),
            "out_shardings": repl,
        }
    exp = _export_for(platforms)(
        pipeline_w, _weight_specs(leaves) + (img_spec,), jit_kwargs=jit_kwargs
    )
    return exp, leaves


WEIGHTS_SUFFIX = ".weights.npz"


def save_exported(
    exp: jax_export.Exported,
    path: str,
    meta: Optional[Dict[str, Any]] = None,
    weights: Optional[Sequence[Any]] = None,
) -> str:
    """Write ``path`` (serialized program) + ``path.json`` (manifest).

    The manifest carries everything a serving tier needs to validate a
    request without deserializing the program.

    ``weights`` (from a ``bake_weights=False`` export) lands in a
    ``path.weights.npz`` sidecar; the manifest records the leaf count so a
    loader can bind them as the program's leading arguments.
    """
    data = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    manifest = {
        "format": "jax.export.Exported",
        "fn_name": exp.fun_name,
        "platforms": list(exp.platforms),
        "calling_convention_version": exp.calling_convention_version,
        "nr_devices": exp.nr_devices,
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
        "bytes": len(data),
        "meta": meta or {},
    }
    if weights is not None:
        import numpy as np

        # numpy can't round-trip the ML extension dtypes (bfloat16, fp8):
        # np.savez stores them as raw void records that np.load hands back
        # as '|V2'. Store such leaves as same-width uints and record the
        # true dtype in the manifest so the loader can view them back.
        arrs: Dict[str, Any] = {}
        wdtypes = []
        for i, w in enumerate(weights):
            a = np.asarray(w)
            wdtypes.append(str(a.dtype))
            if a.dtype.kind == "V" or not a.dtype.isbuiltin:
                a = a.view({1: np.uint8, 2: np.uint16, 4: np.uint32}[a.dtype.itemsize])
            arrs[f"w{i:05d}"] = a
        np.savez(path + WEIGHTS_SUFFIX, **arrs)
        manifest["weights_file"] = os.path.basename(path) + WEIGHTS_SUFFIX
        manifest["n_weight_args"] = len(weights)
        manifest["weight_dtypes"] = wdtypes
    with open(path + MANIFEST_SUFFIX, "w") as f:
        json.dump(manifest, f, indent=1)
    return path


def load_exported(path: str):
    """Deserialize ``path`` -> (callable, manifest dict).

    The callable is the exported program's ``.call`` — jit-compatible and
    composable (it can be called inside larger jitted programs).
    """
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    manifest = {}
    if os.path.exists(path + MANIFEST_SUFFIX):
        with open(path + MANIFEST_SUFFIX) as f:
            manifest = json.load(f)
    return exp.call, manifest


def load_serving_fn(path: str):
    """Load an artifact as a ready-to-call ``fn(images_or_image)``.

    Handles both artifact flavors: baked weights (``fn == program.call``)
    and sidecar weights (``bake_weights=False`` exports — the
    ``.weights.npz`` leaves are loaded and bound as the program's leading
    arguments; they ship to the device once as buffers, not as program
    constants). Returns ``(fn, manifest)``.
    """
    call, manifest = load_exported(path)
    n = manifest.get("n_weight_args", 0)
    if not n:
        return call, manifest
    import numpy as np

    wpath = os.path.join(
        os.path.dirname(os.path.abspath(path)), manifest["weights_file"]
    )
    wdtypes = manifest.get("weight_dtypes")

    def _true_dtype(name: str) -> "np.dtype":
        try:
            return np.dtype(name)
        except TypeError:
            import ml_dtypes

            return np.dtype(getattr(ml_dtypes, name))

    leaves = []
    with np.load(wpath) as z:
        for i in range(n):
            raw = z[f"w{i:05d}"]
            if wdtypes is not None:
                dt = _true_dtype(wdtypes[i])
                if raw.dtype != dt:
                    raw = raw.view(dt)
            leaves.append(jnp.asarray(raw))

    def fn(images):
        return call(*leaves, images)

    return fn, manifest
