"""Where does the real ClipViT module spend time beyond the raw layer math?

scripts/bisect_trunk2.py measures the pure 12-layer transformer math at
~145 ms for the flagship eval shape; the full module trunk profiles at
~195-220 ms. This times ClipViT variants (VPT on/off, deep/shallow,
patchify alone) to attribute the difference.

Usage: python scripts/bisect_vit_module.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, iters=6, warmup=2):
    for i in range(warmup + 1):
        float(fn(i))
    t0 = time.perf_counter()
    vals = [fn(10 + i) for i in range(iters)]
    for v in vals:
        float(v)
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    from flax import linen as nn

    from clip_ebc_tpu.models.clip.image_encoder import ClipViT
    from clip_ebc_tpu.models.transformer import resolve_attn_impl

    B = 496
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 224, 224, 3), jnp.bfloat16)

    def run_case(name, **kw):
        model = ClipViT(
            variant="vit_b_16", input_size=224, dtype=jnp.bfloat16,
            attn_impl=resolve_attn_impl("auto"), fused_qkv=True, **kw,
        )
        v = model.init(jax.random.PRNGKey(0), x[:1], train=False)

        @jax.jit
        def fwd(v, xx, i):  # traced args, not baked-in constants (relay 413)
            out = model.apply(v, xx + i.astype(xx.dtype) * 1e-4, train=False)
            return out.astype(jnp.float32).sum()

        t = timed(lambda i: fwd(v, x, jnp.asarray(float(i))), iters)
        print(f"{name:34s} {t * 1e3:8.1f} ms")
        return t

    t_vpt = run_case("ClipViT vpt=32 deep (flagship)", num_vpt=32, deep_vpt=True)
    t_shallow = run_case("ClipViT vpt=32 shallow", num_vpt=32, deep_vpt=False)
    t_novpt = run_case("ClipViT vpt=0", num_vpt=0)

    # patchify conv alone at the same shape
    conv = nn.Conv(768, (16, 16), strides=(16, 16), padding="VALID",
                   use_bias=False, dtype=jnp.bfloat16)
    vc = conv.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def patchify(vc, xx, i):
        return conv.apply(vc, xx + i.astype(xx.dtype) * 1e-4).astype(jnp.float32).sum()

    t_patch = timed(lambda i: patchify(vc, x, jnp.asarray(float(i))), iters)
    print(f"{'patchify conv alone':34s} {t_patch * 1e3:8.1f} ms")

    print(f"\ndeep-VPT per-layer overwrite cost:  {(t_vpt - t_shallow) * 1e3:+7.1f} ms")
    print(f"prompt insertion (shallow vs none): {(t_shallow - t_novpt) * 1e3:+7.1f} ms")


if __name__ == "__main__":
    main()
