"""Component-level timing of the flagship sliding-window pipeline.

Times each stage of the eval path in isolation on the attached device to
show where the per-window milliseconds go (trunk / decoder+head / gather /
assembly). Relay-safe methodology: perturbed inputs, scalar fetches.

Usage: python scripts/profile_pipeline.py [n_iters]
Env: PROFILE_QUANT=int8_static|int8 quantizes trunk matmuls + decoder
convs like the bench's deployment path (static mode self-calibrates on
one random batch first).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, args_for, iters=8, warmup=2):
    float(fn(*args_for(0)))
    for i in range(warmup):
        float(fn(*args_for(i + 1)))
    t0 = time.perf_counter()
    vals = [fn(*args_for(10 + i)) for i in range(iters)]
    for v in vals:
        float(v)
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    from __graft_entry__ import _flagship
    from clip_ebc_tpu.ops.sliding_window import sliding_window_predict, window_grid

    h, w = 2048, 3072
    window, stride, reduction = (224, 224), (112, 112), 8
    n = window_grid((h, w), window, stride).shape[0]
    bucket = -(-n // 16) * 16
    print(f"{n} windows/img (bucketed {bucket})")

    image = jnp.asarray(jax.random.normal(jax.random.PRNGKey(0), (h, w, 3)), jnp.bfloat16)
    windows = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (bucket, 224, 224, 3)), jnp.bfloat16
    )

    quant_env = os.environ.get("PROFILE_QUANT", "none")
    for dec_pre in (False, True):
        model, _ = _flagship(
            dtype=jnp.bfloat16, decoder_before_upsample=dec_pre,
            quant_int8=quant_env.startswith("int8"),
            quant_mode="static" if quant_env == "int8_static" else "dynamic",
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.bfloat16), train=False
        )
        if quant_env == "int8_static":
            from clip_ebc_tpu.ops.quant import calibrate_int8

            dyn, _ = _flagship(
                dtype=jnp.bfloat16, decoder_before_upsample=dec_pre, quant_int8=True
            )
            calib = jax.random.normal(
                jax.random.PRNGKey(2), (16, 224, 224, 3), jnp.bfloat16
            )
            variables = calibrate_int8(
                jax.jit(lambda v, b: dyn.apply(v, b, train=False, mutable=["quant"])),
                dict(variables), [calib],
            )
        text_feats = jax.jit(lambda v: model.apply(v, method="encode_text"))(variables)

        def forward(v, images):
            return model.apply(v, images, train=False, text_feats=text_feats).astype(
                jnp.float32
            )

        # trunk only (ViT features, no decoder/head)
        @jax.jit
        def trunk_only(v, x, i):
            feats = model.apply(
                v, x + i.astype(x.dtype) * 1e-4, train=False,
                method=lambda m, xx, train: m.image_encoder(xx, train),
            )
            return feats.sum()

        @jax.jit
        def full_forward(v, x, i):
            return forward(v, x + i.astype(x.dtype) * 1e-4).sum()

        @jax.jit
        def pipeline(v, img, i):
            d = sliding_window_predict(
                forward, v, img + i.astype(img.dtype) * 1e-4,
                window=window, stride=stride, reduction=reduction, strategy="average",
            )
            return d.sum()

        t_trunk = timed(
            lambda i: trunk_only(variables, windows, i),
            lambda i: (jnp.asarray(float(i)),), iters,
        )
        t_fwd = timed(
            lambda i: full_forward(variables, windows, i),
            lambda i: (jnp.asarray(float(i)),), iters,
        )
        t_pipe = timed(
            lambda i: pipeline(variables, image, i),
            lambda i: (jnp.asarray(float(i)),), iters,
        )
        tag = "decoder-pre " if dec_pre else "reference-order"
        print(
            f"[{tag}] trunk {t_trunk*1e3:7.1f} ms | +decoder/head "
            f"{(t_fwd-t_trunk)*1e3:7.1f} ms | full fwd {t_fwd*1e3:7.1f} ms | "
            f"pipeline {t_pipe*1e3:7.1f} ms (gather+assembly "
            f"{(t_pipe-t_fwd)*1e3:+7.1f} ms) | {n/t_pipe:7.1f} windows/s"
        )


if __name__ == "__main__":
    main()
