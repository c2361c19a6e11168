"""DINOv2 ViT-L per-component profile at the RoMa coarse shape (real TPU).

The encoder coarse pass (~300 ms at decoder batch 16) is the biggest
single bucket after the kernel work; ViT-L matmul FLOPs say ~104 ms at
peak / ~210 ms at 50% util. This measures where the rest goes:
full model / 24-block stack (rolled vs remat vs unrolled scan) /
single block / attention / mlp, all at (B=16, N=1664, D=1024, H=16).

nohup python tools/profile_dinov2.py > /tmp/pdv.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_window import timeit

from roma_tpu.models.vit import Block, DinoV2, ScannedBlocks
from roma_tpu.ops.attention import sdpa

B, N, D, H = 16, 1664, 1024, 16
NVALID = 1601


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, N, D) * 0.02, jnp.bfloat16)
    img = jnp.asarray(rs.randn(B, 560, 560, 3), jnp.bfloat16)

    dv = DinoV2(dtype=jnp.bfloat16)
    vs = jax.jit(dv.init)(jax.random.PRNGKey(0), img[:1])
    t = timeit(lambda v, a: dv.apply(v, a), vs, img, iters=10)
    print(f"  DinoV2 full 560^2: {t*1e3:8.2f} ms", flush=True)

    for tag, kw in (
        ("rolled+remat (prod)", dict(remat=True)),
        ("rolled no-remat", dict(remat=False)),
        ("unroll=4 no-remat", dict(remat=False, unroll=4)),
        ("unroll=24 no-remat", dict(remat=False, unroll=24)),
    ):
        sb = ScannedBlocks(
            depth=24, dim=D, num_heads=H, n_valid=NVALID, dtype=jnp.bfloat16, **kw
        )
        vs = jax.jit(sb.init)(jax.random.PRNGKey(0), x[:1])
        t = timeit(lambda v, a: sb.apply(v, a), vs, x, iters=10)
        print(f"  24 blocks [{tag}]: {t*1e3:8.2f} ms = {t*1e3/24:6.2f} ms/block", flush=True)

    blk = Block(dim=D, num_heads=H, n_valid=NVALID, dtype=jnp.bfloat16)
    vs = jax.jit(blk.init)(jax.random.PRNGKey(0), x[:1])
    t = timeit(lambda v, a: blk.apply(v, a), vs, x, iters=30)
    print(f"  single Block: {t*1e3:8.2f} ms (x24 = {24*t*1e3:.1f})", flush=True)

    q = jnp.asarray(rs.randn(B, H, N, D // H) * 0.05, jnp.bfloat16)
    t = timeit(lambda q: sdpa(q, q, q, n_valid=NVALID), q, iters=30)
    print(f"  sdpa (fused pallas): {t*1e3:8.2f} ms/block", flush=True)

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, a):
            a = nn.Dense(4 * D, dtype=jnp.bfloat16, param_dtype=jnp.float32)(a)
            a = nn.gelu(a, approximate=False)
            return nn.Dense(D, dtype=jnp.bfloat16, param_dtype=jnp.float32)(a)

    mlp = MLP()
    vs = jax.jit(mlp.init)(jax.random.PRNGKey(0), x[:1])
    t = timeit(lambda v, a: mlp.apply(v, a), vs, x, iters=30)
    print(f"  mlp (fc1+gelu_erf+fc2): {t*1e3:8.2f} ms/block", flush=True)

    class MLPtanh(nn.Module):
        @nn.compact
        def __call__(self, a):
            a = nn.Dense(4 * D, dtype=jnp.bfloat16, param_dtype=jnp.float32)(a)
            a = nn.gelu(a, approximate=True)
            return nn.Dense(D, dtype=jnp.bfloat16, param_dtype=jnp.float32)(a)

    mlp2 = MLPtanh()
    vs2 = jax.jit(mlp2.init)(jax.random.PRNGKey(0), x[:1])
    t = timeit(lambda v, a: mlp2.apply(v, a), vs2, x, iters=30)
    print(f"  mlp (gelu tanh-approx): {t*1e3:8.2f} ms/block", flush=True)

    class QKV(nn.Module):
        @nn.compact
        def __call__(self, a):
            qkv = nn.Dense(3 * D, dtype=jnp.bfloat16, param_dtype=jnp.float32)(a)
            b_, n_, _ = a.shape
            return qkv.reshape(b_, n_, 3, H, D // H).transpose(2, 0, 3, 1, 4)

    qkv = QKV()
    vs = jax.jit(qkv.init)(jax.random.PRNGKey(0), x[:1])
    t = timeit(lambda v, a: qkv.apply(v, a), vs, x, iters=30)
    print(f"  qkv dense+transpose: {t*1e3:8.2f} ms/block", flush=True)


if __name__ == "__main__":
    main()
