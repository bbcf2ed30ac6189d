"""Micro-profiling of encoder / updateformer / kNN internals (on-chip).

Uses the in-graph scan-loop methodology of profile_components.py.
"""

from __future__ import annotations

import os
import sys
import time

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

    from mvtracker_tpu.models import encoder as enc_mod
    from mvtracker_tpu.models.updateformer import AttnBlock, CrossAttnBlock
    from mvtracker_tpu.ops import knn as knn_ops

    rng = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16
    report = {}

    # ---------------- encoder stages (96 images, 256x256) ----------------
    vt = 96

    def conv_stage(cin, cout, hw, ksize, stride, name, n_conv=1, norm=True):
        conv = nn.Conv(cout, (ksize, ksize), strides=(stride, stride), padding="SAME", dtype=bf16)
        x0 = jnp.ones((vt, hw, hw, cin), bf16)
        p = conv.init(rng, x0)

        def step(x):
            y = x
            for _ in range(n_conv):
                y = conv.apply(p, y[:, : x0.shape[1], : x0.shape[2], :].astype(bf16))
                if norm:
                    y = nn.relu(enc_mod.instance_norm(y))
            # keep shape stable for the scan carry
            return x + jnp.mean(y).astype(x.dtype)

        return timed_scan(step, x0, inner=16, reps=2)

    report["stem 7x7/2 3->64 @256"] = conv_stage(3, 64, 256, 7, 2, "stem")
    report["conv3x3 64->64 @128"] = conv_stage(64, 64, 128, 3, 1, "l1")
    report["conv3x3 96->96 @64"] = conv_stage(96, 96, 64, 3, 1, "l2")
    report["conv3x3 128->128 @32"] = conv_stage(128, 128, 32, 3, 1, "l3")
    report["conv3x3 416->256 @64 (head)"] = conv_stage(416, 256, 64, 3, 1, "head")

    # instance-norm alone at the stem scale
    xn = jnp.ones((vt, 128, 128, 64), bf16)
    report["instance_norm @128x64ch"] = timed_scan(
        lambda x: x + enc_mod.instance_norm(x) * 0, xn, inner=16, reps=2
    )

    # bilinear resize matmuls
    xr = jnp.ones((vt, 128, 128, 64), bf16)
    report["resize 128->64 (64ch)"] = timed_scan(
        lambda x: x + jnp.mean(enc_mod.bilinear_resize_align_corners(x, 64, 64)).astype(bf16),
        xr, inner=16, reps=2,
    )

    # ---------------- updateformer blocks ----------------
    hidden, heads = 384, 6
    n_tot, t = 320, 12

    tb = AttnBlock(hidden, heads, 4.0, dtype=bf16)
    xt = jnp.ones((n_tot, t, hidden), bf16)
    pt = tb.init(rng, xt)
    report["time AttnBlock (320x12)"] = timed_scan(
        lambda x: x + jnp.mean(tb.apply(pt, x)).astype(bf16) * 0, xt, inner=32
    )

    v2p = CrossAttnBlock(hidden, heads, 4.0, dtype=bf16)
    xv = jnp.ones((t, 64, hidden), bf16)
    xp = jnp.ones((t, 256, hidden), bf16)
    pv = v2p.init(rng, xv, xp)
    report["space v2p cross (12: 64<-256)"] = timed_scan(
        lambda x: x + jnp.mean(v2p.apply(pv, x, xp)).astype(bf16) * 0, xv, inner=32
    )
    p2v = CrossAttnBlock(hidden, heads, 4.0, dtype=bf16)
    pp = p2v.init(rng, xp, xv)
    report["space p2v cross (12: 256<-64)"] = timed_scan(
        lambda x: x + jnp.mean(p2v.apply(pp, x, xv)).astype(bf16) * 0, xp, inner=32
    )
    vs = AttnBlock(hidden, heads, 4.0, dtype=bf16)
    ps = vs.init(rng, xv)
    report["space vself (12x64)"] = timed_scan(
        lambda x: x + jnp.mean(vs.apply(ps, x)).astype(bf16) * 0, xv, inner=32
    )

    # big dense matmul reference point: [3840, 384] @ [384, 1536]
    wd = jnp.ones((hidden, 4 * hidden), bf16)
    xd = jnp.ones((n_tot * t, hidden), bf16)
    report["dense 3840x384@384x1536"] = timed_scan(
        lambda x: x + (x @ wd)[:, :hidden] * 0, xd, inner=64
    )

    # ---------------- kNN per level ----------------
    s, n, k = 12, 256, 16
    for lvl, p_per_frame in enumerate([16384 * 4 // (4**0), 16384 * 4 // 4, 16384 * 4 // 16, 16384 * 4 // 64]):
        ref = jax.random.normal(jax.random.PRNGKey(lvl), (s, p_per_frame, 3), jnp.float32)
        q = jax.random.normal(jax.random.PRNGKey(lvl + 9), (s, n, 3), jnp.float32)

        def knn_step(qc, ref=ref):
            d, _ = knn_ops.knn(ref, qc, k, backend="auto")
            return qc + d[..., :3] * 0.0

        report[f"knn lvl{lvl} (12x{p_per_frame}ref x256q)"] = timed_scan(knn_step, q, inner=32)

    print("\n== micro timing ==")
    for kname, val in report.items():
        print(f"{kname:40s} {val * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
