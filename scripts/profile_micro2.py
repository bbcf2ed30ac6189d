"""Second micro pass: updateformer glue bisect + instance-norm / resize variants."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_components import timed_scan  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import flax.linen as nn

    from mvtracker_tpu.models.updateformer import EfficientUpdateFormer

    rng = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16
    report = {}

    # ---------------- updateformer bisect ----------------
    d_in, n, s = 581, 256, 12
    x_uf = jnp.ones((1, n, s, d_in), jnp.float32)
    active = jnp.ones((1, n), bool)

    def time_uf(name, **kw):
        uf = EfficientUpdateFormer(
            space_depth=6, time_depth=6, input_dim=d_in, hidden_size=384,
            num_heads=6, output_dim=131, mlp_ratio=4.0, num_virtual_tracks=64,
            dtype=bf16, **kw,
        )
        p = jax.jit(uf.init)(rng, x_uf)

        def step(x):
            return x + jnp.mean(uf.apply(p, x, track_mask=active)) * 0.0

        report[name] = timed_scan(step, x_uf, inner=32)

    time_uf("uf full (space+time)")
    time_uf("uf time-only", add_space_attn=False)

    # fp32 input assembly vs bf16 input
    uf = EfficientUpdateFormer(
        space_depth=6, time_depth=6, input_dim=d_in, hidden_size=384,
        num_heads=6, output_dim=131, mlp_ratio=4.0, num_virtual_tracks=64, dtype=bf16,
    )
    p = jax.jit(uf.init)(rng, x_uf)
    x_bf = x_uf.astype(bf16)
    report["uf full bf16-input"] = timed_scan(
        lambda x: x + jnp.mean(uf.apply(p, x, track_mask=active)).astype(bf16) * 0,
        x_bf, inner=32,
    )

    # ---------------- instance norm variants ----------------
    vt = 96
    xn = jnp.ones((vt, 128, 128, 64), bf16)

    def in_current(x, eps=1e-5):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = jnp.maximum(x.var(axis=(1, 2), keepdims=True), 0.0)
        return (x - mean) * jax.lax.rsqrt(var + eps)

    def in_moment(x, eps=1e-5):
        xf = x.astype(jnp.float32)
        m1 = xf.mean(axis=(1, 2), keepdims=True)
        m2 = (xf * xf).mean(axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - m1 * m1, 0.0)
        return ((xf - m1) * jax.lax.rsqrt(var + eps)).astype(x.dtype)

    def in_moment_bf(x, eps=1e-5):
        m1 = x.mean(axis=(1, 2), keepdims=True)
        m2 = (x.astype(jnp.float32) ** 2).mean(axis=(1, 2), keepdims=True).astype(x.dtype)
        var = jnp.maximum(m2 - m1 * m1, 0.0)
        return (x - m1) * jax.lax.rsqrt(var + eps)

    report["instnorm current @128x64"] = timed_scan(lambda x: x + in_current(x) * 0, xn, inner=16)
    report["instnorm E[x2] f32 @128x64"] = timed_scan(lambda x: x + in_moment(x) * 0, xn, inner=16)
    report["instnorm E[x2] bf16 @128x64"] = timed_scan(lambda x: x + in_moment_bf(x) * 0, xn, inner=16)

    # ---------------- resize variants (128 -> 64, align_corners) ----------------
    from mvtracker_tpu.models.encoder import bilinear_resize_align_corners

    xr = jnp.ones((vt, 128, 128, 64), bf16)
    report["resize einsum 128->64"] = timed_scan(
        lambda x: x + jnp.mean(bilinear_resize_align_corners(x, 64, 64)).astype(bf16),
        xr, inner=16,
    )

    def resize_gather(x, out_h, out_w):
        # two-tap gather formulation: out[i] = (1-f)*x[lo] + f*x[lo+1]
        _, h, w, _ = x.shape

        def taps(n_out, n_in):
            pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
            lo = np.floor(pos).astype(np.int32)
            hi = np.minimum(lo + 1, n_in - 1)
            f = (pos - lo).astype(np.float32)
            return lo, hi, jnp.asarray(f, x.dtype)

        lo, hi, f = taps(out_h, h)
        x = x[:, lo] * (1 - f)[None, :, None, None] + x[:, hi] * f[None, :, None, None]
        lo, hi, f = taps(out_w, w)
        x = x[:, :, lo] * (1 - f)[None, None, :, None] + x[:, :, hi] * f[None, None, :, None]
        return x

    report["resize gather 128->64"] = timed_scan(
        lambda x: x + jnp.mean(resize_gather(x, 64, 64)).astype(bf16), xr, inner=16
    )

    # upsample direction used for d (16 -> 64)
    xd = jnp.ones((vt, 16, 16, 128), bf16)
    report["resize einsum 16->64 (128ch)"] = timed_scan(
        lambda x: x + jnp.mean(bilinear_resize_align_corners(x, 64, 64)).astype(bf16),
        xd, inner=16,
    )
    report["resize gather 16->64 (128ch)"] = timed_scan(
        lambda x: x + jnp.mean(resize_gather(x, 64, 64)).astype(bf16), xd, inner=16
    )

    # ---------------- knn at REAL level shapes ----------------
    from mvtracker_tpu.ops import knn as knn_ops

    for lvl, ppf in enumerate([16384, 4096, 1024, 256]):
        ref = jax.random.normal(jax.random.PRNGKey(lvl), (12, ppf, 3), jnp.float32)
        q = jax.random.normal(jax.random.PRNGKey(lvl + 9), (12, 256, 3), jnp.float32)

        def knn_step(qc, ref=ref):
            d, _ = knn_ops.knn(ref, qc, 16, backend="auto")
            return qc + d[..., :3] * 0.0

        report[f"knn lvl{lvl} 12x{ppf}x256"] = timed_scan(knn_step, q, inner=32)

    print("\n== micro2 ==")
    for kname, val in report.items():
        print(f"{kname:36s} {val * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
