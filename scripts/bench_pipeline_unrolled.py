"""Measure the sliding-window pipeline UNDER the relay's latency floor.

The axon relay adds a fixed ~28-30 ms round-trip per call that does NOT
overlap across async dispatches (measured r5: a 0.2 ms gather times at
30 ms/call). Any pipeline faster than ~4700 w/s is invisible to per-call
timing. Remedy per the repo verify playbook: unroll K pipeline reps
inside ONE jit, chained through a scalar carry so nothing hoists or
dedupes, and difference against a K=1 control:

    per_image = (t_K - t_1) / (K - 1)        (latency cancels)

Usage: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
           python scripts/bench_pipeline_unrolled.py
Env: UNROLL_K (default 5), UNROLL_QUANT, UNROLL_DENSE=0|1 (A/B the dense
gather/assembly), UNROLL_ITERS, UNROLL_REPEATS, UNROLL_H/W.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed_min(fn, iters, repeats):
    float(fn(0))
    float(fn(1))
    best = float("inf")
    k = 10
    for _ in range(repeats):
        t0 = time.perf_counter()
        vals = [fn(k + i) for i in range(iters)]
        for v in vals:
            float(v)
        best = min(best, (time.perf_counter() - t0) / iters)
        k += iters
    return best


def main():
    os.environ.setdefault("EBC_DENSE_WINDOWS", os.environ.get("UNROLL_DENSE", "1"))
    quant_env = os.environ.get("UNROLL_QUANT", "int8_static")
    quant = quant_env.startswith("int8")
    K = int(os.environ.get("UNROLL_K", "5"))
    H = int(os.environ.get("UNROLL_H", "2048"))
    W = int(os.environ.get("UNROLL_W", "3072"))
    iters = int(os.environ.get("UNROLL_ITERS", "6"))
    repeats = int(os.environ.get("UNROLL_REPEATS", "3"))
    WIN, RED = 224, 8
    STRIDE = int(os.environ.get("UNROLL_STRIDE", "224"))  # 112 = test_nwpu cfg
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}), quant={quant_env}, "
          f"dense={os.environ['EBC_DENSE_WINDOWS']}, K={K}, image {H}x{W}")

    from __graft_entry__ import _flagship
    from clip_ebc_tpu.ops.sliding_window import sliding_window_predict, window_grid

    qa_env = os.environ.get("UNROLL_QUANT_ATTN", "0")
    q_attn = {"0": False, "1": True, "xla": "xla"}.get(qa_env, False)
    fuse_ln = os.environ.get("UNROLL_FUSE_LN", "auto")
    model, _ = _flagship(
        dtype=jnp.bfloat16, quant_int8=quant,
        quant_mode="static" if quant_env == "int8_static" else "dynamic",
        decoder_before_upsample=True,
        quant_attn=q_attn if quant_env == "int8_static" else False,
        fuse_ln_mode=fuse_ln,
    )
    n = window_grid((H, W), (WIN, WIN), (STRIDE, STRIDE)).shape[0]
    print(f"{n} windows/image, quant_attn={qa_env}, fuse_ln={fuse_ln}")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, WIN, WIN, 3), jnp.bfloat16),
        train=False)
    if quant_env == "int8_static":
        from clip_ebc_tpu.ops.quant import calibrate_int8

        dyn, _ = _flagship(dtype=jnp.bfloat16, quant_int8=True,
                           decoder_before_upsample=True)
        calib = jax.random.normal(jax.random.PRNGKey(2), (16, WIN, WIN, 3),
                                  jnp.bfloat16)
        variables = calibrate_int8(
            jax.jit(lambda v, b: dyn.apply(v, b, train=False, mutable=["quant"])),
            dict(variables), [calib])
    text_feats = jax.jit(lambda v: model.apply(v, method="encode_text"))(variables)

    def forward(v, images):
        return model.apply(v, images, train=False, text_feats=text_feats
                           ).astype(jnp.float32)

    # Token fast path (patchify once + token-grid unfold); EBC_TOKEN_GATHER=0
    # falls back to the pixel unfold inside sliding_window_predict.
    def embed_fn(v, img):
        return model.apply(v, img, method="embed_patches")

    def token_forward(v, tokens):
        return model.apply(v, tokens, train=False, text_feats=text_feats,
                           pre_embedded=True).astype(jnp.float32)

    patch = model.encoder_reduction

    image = jnp.asarray(jax.random.normal(jax.random.PRNGKey(0), (H, W, 3)),
                        jnp.bfloat16)

    def make_unrolled(k):
        @jax.jit
        def run(v, img, i):
            s = i * 1e-6
            for _ in range(k):
                d = sliding_window_predict(
                    forward, v, img + s.astype(img.dtype) * 1e-4,
                    window=(WIN, WIN), stride=(STRIDE, STRIDE),
                    reduction=RED, strategy="average",
                    embed_fn=embed_fn, token_apply_fn=token_forward,
                    patch=patch)
                s = d.sum() * 1e-12 + s  # chain: rep j+1 depends on rep j
            return s

        return run

    run1 = make_unrolled(1)
    runK = make_unrolled(K)
    t1 = timed_min(lambda i: run1(variables, image, jnp.asarray(float(i))),
                   iters, repeats)
    tK = timed_min(lambda i: runK(variables, image, jnp.asarray(float(i))),
                   iters, repeats)
    per_img = (tK - t1) / (K - 1)
    print(f"\nK=1: {t1 * 1e3:8.2f} ms/call ({n / t1:7.0f} w/s raw)")
    print(f"K={K}: {tK * 1e3:8.2f} ms/call ({K * n / tK:7.0f} w/s raw)")
    print(f"latency-cancelled per-image: {per_img * 1e3:8.2f} ms "
          f"({n / per_img:7.0f} w/s)")


if __name__ == "__main__":
    main()
