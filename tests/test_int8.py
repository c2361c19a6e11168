"""Dynamic-int8 Dense path for the frozen ViT (ops/int8.py, vit.QDense).

Serving-only opt-in (RoMaConfig.vit_int8); these pin (a) the quantized
matmul's accuracy envelope, (b) QDense's param-tree compatibility with
nn.Dense (checkpoints must be oblivious), (c) end-to-end closeness of an
int8 ViT to its f32 twin with shared weights.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roma_tpu.models.vit import DinoV2, QDense
from roma_tpu.ops.int8 import int8_matmul


@pytest.mark.parametrize("k,n", [(256, 128), (1024, 4096), (4096, 1024)])
def test_int8_matmul_accuracy(k, n):
    # (1024, 4096)/(4096, 1024) are the ViT-L MLP contraction dims
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(64, k), jnp.float32)
    w = jnp.asarray(rs.randn(k, n) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(n), jnp.float32)
    got = int8_matmul(x, w, b)
    want = x @ w + b
    # quant noise and signal both grow ~sqrt(K), so max-error normalized
    # by the output RMS is the stable envelope: measured 0.025 / 0.047 /
    # 0.054 at these dims
    rms = float(jnp.sqrt(jnp.mean(want**2)))
    err = float(jnp.max(jnp.abs(got - want))) / rms
    assert err < 0.08, err


def test_int8_matmul_extreme_rows():
    # all-zero rows and huge-dynamic-range rows must not NaN/Inf
    x = jnp.zeros((4, 32), jnp.float32)
    w = jnp.ones((32, 16), jnp.float32)
    out = int8_matmul(x, w)
    assert np.all(np.isfinite(np.asarray(out))) and float(jnp.max(jnp.abs(out))) == 0.0
    x2 = jnp.asarray([[1e-30] * 31 + [1e6]], jnp.float32)
    out2 = int8_matmul(x2, w)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_qdense_param_tree_matches_dense():
    x = jnp.ones((2, 8, 48))
    vd = nn.Dense(32, param_dtype=jnp.float32).init(jax.random.PRNGKey(0), x)
    vq = QDense(32).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vd) == jax.tree_util.tree_structure(vq)
    assert jax.tree.map(lambda a: a.shape, vd) == jax.tree.map(lambda a: a.shape, vq)
    # identical init (same initializers + rng)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        vd, vq,
    )


def test_vit_int8_end_to_end_close():
    """Same weights, int8 vs f32 DinoV2: outputs stay strongly correlated."""
    kw = dict(embed_dim=128, depth=2, num_heads=2, patch_size=14,
              pretrain_img_size=56)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 56, 56, 3), jnp.float32)
    vit = DinoV2(**kw)
    variables = vit.init(jax.random.PRNGKey(0), x)
    ref = vit.apply(variables, x)
    got = DinoV2(**kw, int8=True).apply(variables, x)
    assert got.shape == ref.shape
    a = np.asarray(ref, np.float64).ravel()
    b = np.asarray(got, np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.995, corr
    # int8 variables init to the same tree (param-compat both directions)
    v2 = DinoV2(**kw, int8=True).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(variables)


def test_vit_gelu_tanh_close():
    """Serving knob RoMaConfig.vit_gelu_tanh: tanh-GELU DinoV2 vs exact-erf
    twin with shared weights. The pointwise |d gelu| bound is ~3e-4 abs /
    ~1e-3 rel; through 2 blocks the token map must stay tightly correlated
    (far tighter than the int8 envelope)."""
    kw = dict(embed_dim=128, depth=2, num_heads=2, patch_size=14,
              pretrain_img_size=56)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 56, 56, 3), jnp.float32)
    vit = DinoV2(**kw)
    variables = vit.init(jax.random.PRNGKey(0), x)
    ref = vit.apply(variables, x)
    got = DinoV2(**kw, gelu_approx=True).apply(variables, x)
    a = np.asarray(ref, np.float64).ravel()
    b = np.asarray(got, np.float64).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99999
    drift = np.max(np.abs(a - b)) / (np.sqrt(np.mean(a**2)) + 1e-12)
    assert drift < 0.02, drift
    # pointwise: the raw gelu forms agree to ~3e-4 abs over the active range
    z = jnp.linspace(-6, 6, 4097, dtype=jnp.float32)
    d = np.max(np.abs(np.asarray(nn.gelu(z, approximate=True))
                      - np.asarray(nn.gelu(z, approximate=False))))
    assert d < 5e-4, d


def test_refiner_block_int8_close():
    """RefinerBlock(int8=True): same param tree, close output (serving
    knob for the wide-C 1x1-dominated stacks)."""
    from roma_tpu.models.matcher import RefinerBlock

    x = jnp.asarray(np.random.RandomState(2).randn(1, 16, 16, 32), jnp.float32)
    blk = RefinerBlock(out_dim=32)
    v = blk.init(jax.random.PRNGKey(0), x)
    v8 = RefinerBlock(out_dim=32, int8=True).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v8)
    ref = blk.apply(v, x)
    got = RefinerBlock(out_dim=32, int8=True).apply(v, x)
    a, b = np.asarray(ref).ravel(), np.asarray(got).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.995
    # train mode ignores the flag (zero-grad round would kill training)
    vt = RefinerBlock(out_dim=32, int8=True, train=True).init(jax.random.PRNGKey(0), x)
    out_t, _ = RefinerBlock(out_dim=32, int8=True, train=True).apply(
        vt, x, mutable=["batch_stats"]
    )
    out_f, _ = RefinerBlock(out_dim=32, int8=False, train=True).apply(
        vt, x, mutable=["batch_stats"]
    )
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out_f))
