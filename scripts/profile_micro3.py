"""Third micro pass: time-attention einsum formulations + corr dtype."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_components import timed_scan  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    bf16 = jnp.bfloat16
    report = {}
    b, t, h, d = 320, 12, 6, 48  # time-attention shapes (flagship)

    q = jnp.ones((b, t, h, d), bf16)
    k = jnp.ones((b, t, h, d), bf16)
    v = jnp.ones((b, t, h, d), bf16)

    # 1. batched-matmul einsum (current)
    def scores_mxu(qc):
        sim = jnp.einsum("bqhd,bkhd->bhqk", qc, k)
        out = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(bf16), v)
        return qc + out * 0.0

    report["time-attn einsum (mxu batched)"] = timed_scan(scores_mxu, q, inner=64)

    # 2. VPU broadcast-reduce formulation
    def scores_vpu(qc):
        # sim[b,q,k,h] = sum_d q[b,q,h,d] * k[b,k,h,d]
        sim = jnp.sum(
            qc[:, :, None].astype(bf16) * k[:, None, :, :, :], axis=-1
        )  # [b, q, k, h]
        a = jax.nn.softmax(sim.astype(jnp.float32), axis=2).astype(bf16)
        out = jnp.sum(a[..., None] * v[:, None], axis=2)  # [b, q, h, d]
        return qc + out * 0.0

    report["time-attn broadcast (vpu)"] = timed_scan(scores_vpu, q, inner=64)

    # 3. single flattened matmul: fold heads into contraction via block mask?
    #    cheaper alternative: merge (h, d) and do full 288-dim contraction per
    #    head via reshape to put head in batch of the LEFT operand only:
    qf = jnp.ones((b * h, t, d), bf16)
    kf = jnp.ones((b * h, t, d), bf16)

    def scores_bhead(qc):
        sim = jnp.einsum("btd,bsd->bts", qc, kf)
        return qc + jnp.mean(sim).astype(bf16) * 0.0

    report["time-attn scores batch=b*h"] = timed_scan(scores_bhead, qf, inner=64)

    # 4. Mlp alone and AttnBlock alone
    import flax.linen as nn

    from mvtracker_tpu.models.updateformer import AttnBlock, Mlp

    x = jnp.ones((b, t, 384), bf16)
    mlp = Mlp(1536, 384, dtype=bf16)
    pm = mlp.init(jax.random.PRNGKey(0), x)
    report["mlp 3840x384->1536->384"] = timed_scan(
        lambda a: a + mlp.apply(pm, a) * 0.0, x, inner=64
    )

    blk = AttnBlock(384, 6, 4.0, dtype=bf16)
    pb = blk.init(jax.random.PRNGKey(0), x)
    report["AttnBlock full (320x12)"] = timed_scan(
        lambda a: a + blk.apply(pb, a) * 0.0, x, inner=64
    )

    # 5. corr kernel dtype: f32 vs bf16 streams
    from mvtracker_tpu.ops.corr_pallas import corr_select_pallas

    s, n, kk, c, p = 12, 256, 16, 128, 16384
    fvec = jax.random.normal(jax.random.PRNGKey(1), (s, p, c), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (s, n, c), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(3), (s, n, kk), 0, p)

    def corr_f32(tc):
        out = corr_select_pallas(fvec, tc, idx)
        return tc + out[..., :1] * 0.0

    report["corr pallas f32 lvl0"] = timed_scan(corr_f32, tgt, inner=32)

    print("\n== micro3 ==")
    for kname, val in report.items():
        print(f"{kname:36s} {val * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
