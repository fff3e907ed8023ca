"""Serve exported StableHLO artifacts on the live TPU and validate counts.

VERDICT r4 item 4: the one untested leg of the export subsystem was
loading a TPU-platform artifact on real hardware. This script exports the
flagship window-forward and whole-pipeline programs with
``bake_weights=False`` (weights ride a sidecar npz and bind as call-time
device buffers — baked-constant programs exceed the relay's compile
request cap), loads them back via ``load_serving_fn``, compares densities
against the eager bf16 path with the SAME weights, and records
wall-clock. Writes SERVING_r05.json.

Usage: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
           python scripts/serving_on_chip.py [--out SERVING_r05.json]
Env: SERVE_BATCH (default 16), SERVE_H/SERVE_W (pipeline image,
default 448x672), SERVE_ITERS.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed_min(fn, iters, repeats=3):
    fn()  # compile/warm
    fn()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="SERVING_r05.json")
    p.add_argument("--dir", type=str, default="/tmp/serve_r5")
    args = p.parse_args()
    os.makedirs(args.dir, exist_ok=True)

    batch = int(os.environ.get("SERVE_BATCH", "16"))
    H = int(os.environ.get("SERVE_H", "448"))
    W = int(os.environ.get("SERVE_W", "672"))
    iters = int(os.environ.get("SERVE_ITERS", "5"))
    WIN, STRIDE, RED = 224, 224, 8

    dev = jax.devices()[0]
    platform = dev.platform
    print(f"device: {dev.device_kind} ({platform})")

    from __graft_entry__ import _flagship
    from clip_ebc_tpu.export import (
        export_pipeline, export_window_forward, load_serving_fn, save_exported)
    from clip_ebc_tpu.ops.sliding_window import sliding_window_predict, window_grid

    model, _ = _flagship(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, WIN, WIN, 3), jnp.bfloat16),
        train=False)
    text_feats = jax.jit(lambda v: model.apply(v, method="encode_text"))(variables)

    result = {
        "note": "Exported TPU StableHLO artifacts loaded and executed on the "
                "live chip (bake_weights=False: weights bound as call-time "
                "buffers), counts compared vs the eager bf16 path with "
                "identical weights.",
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "device": f"{dev.device_kind} ({platform})",
        "artifacts": {},
    }

    # ---- window-forward artifact -------------------------------------------
    t0 = time.time()
    exp, leaves = export_window_forward(
        model, variables, WIN, batch=batch, dtype=jnp.bfloat16,
        platforms=(platform,), bake_weights=False)
    wpath = os.path.join(args.dir, "window_tpu.jaxexp")
    save_exported(exp, wpath, {"mode": "window"}, weights=leaves)
    export_s = time.time() - t0
    fn, manifest = load_serving_fn(wpath)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, WIN, WIN, 3)), jnp.bfloat16)

# weights/text feats MUST be jit arguments: closures bake them into
    # the compile request as constants, which exceeds the relay's
    # request-size cap (HTTP 413)
    def eager(v, tf, xs):
        return model.apply(v, xs, train=False, text_feats=tf)

    jit_eager = jax.jit(eager)
    eag = np.asarray(jit_eager(variables, text_feats, x), np.float32)
    srv = np.asarray(fn(x), np.float32)
    cnt_e, cnt_s = eag.sum(axis=(1, 2)), srv.sum(axis=(1, 2))
    rel = float(np.max(np.abs(cnt_s - cnt_e) / np.maximum(np.abs(cnt_e), 1e-6)))
    t_srv = timed_min(lambda: np.asarray(fn(x)).sum(), iters)
    t_eag = timed_min(
        lambda: np.asarray(jit_eager(variables, text_feats, x)).sum(), iters)
    print(f"window: program {manifest['bytes']/1e6:.1f} MB, export {export_s:.0f}s, "
          f"count rel-delta {rel:.2e}, served {t_srv*1e3:.1f} ms/call vs "
          f"eager {t_eag*1e3:.1f} ms/call ({batch} windows)")
    result["artifacts"]["window"] = {
        "program_mb": round(manifest["bytes"] / 1e6, 2),
        "n_weight_args": manifest["n_weight_args"],
        "batch": batch, "export_s": round(export_s, 1),
        "max_count_rel_delta_vs_eager": rel,
        "served_ms_per_call": round(t_srv * 1e3, 2),
        "eager_ms_per_call": round(t_eag * 1e3, 2),
        "windows_per_s_served": round(batch / t_srv, 1),
    }

    # ---- whole-pipeline artifact -------------------------------------------
    n_windows = window_grid((H, W), (WIN, WIN), (STRIDE, STRIDE)).shape[0]
    t0 = time.time()
    exp2, leaves2 = export_pipeline(
        model, variables, (H, W), window=(WIN, WIN), stride=(STRIDE, STRIDE),
        reduction=RED, dtype=jnp.bfloat16, platforms=(platform,),
        bake_weights=False)
    ppath = os.path.join(args.dir, "pipeline_tpu.jaxexp")
    save_exported(exp2, ppath, {"mode": "pipeline"}, weights=leaves2)
    export2_s = time.time() - t0
    fn2, manifest2 = load_serving_fn(ppath)

    img = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.bfloat16)

    def fwd(v, xs):
        return model.apply(v, xs, train=False, text_feats=text_feats
                           ).astype(jnp.float32)

    live = np.asarray(jax.jit(
        lambda v, im: sliding_window_predict(
            fwd, v, im, window=(WIN, WIN), stride=(STRIDE, STRIDE),
            reduction=RED, strategy="average")
    )(variables, img), np.float32)
    served = np.asarray(fn2(img), np.float32)
    rel2 = float(abs(served.sum() - live.sum()) / max(abs(live.sum()), 1e-6))
    t_srv2 = timed_min(lambda: np.asarray(fn2(img)).sum(), iters)
    print(f"pipeline: program {manifest2['bytes']/1e6:.1f} MB, export "
          f"{export2_s:.0f}s, {H}x{W} ({n_windows} windows), count rel-delta "
          f"{rel2:.2e}, served {t_srv2*1e3:.1f} ms/image")
    result["artifacts"]["pipeline"] = {
        "program_mb": round(manifest2["bytes"] / 1e6, 2),
        "image": f"{H}x{W}", "n_windows": n_windows,
        "export_s": round(export2_s, 1),
        "count_rel_delta_vs_live_pipeline": rel2,
        "served_ms_per_image": round(t_srv2 * 1e3, 2),
        "served_windows_per_s": round(n_windows / t_srv2, 1),
    }

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
