"""Op-level parity tests against torch (CPU) golden behavior.

The reference model's fidelity hinges on exact F.grid_sample / F.interpolate
semantics (SURVEY.md §7 'hard parts'); these tests pin them bit-close.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from roma_tpu.ops import (
    cls_to_flow_refine,
    corr_volume,
    grid_sample,
    interpolate,
    kde,
    local_correlation,
    multinomial_no_replacement,
    normalized_grid,
    sdpa,
)

RNG = np.random.default_rng(0)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


# ---------------------------------------------------------------- grid_sample
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_matches_torch(mode, padding):
    b, h, w, c = 2, 13, 17, 5
    x = _rand(b, h, w, c)
    # grid includes in-bounds, out-of-bounds and exactly-on-edge points
    grid = (RNG.uniform(-1.4, 1.4, (b, 7, 9, 2))).astype(np.float32)
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    grid[0, 0, 2] = [0.0, 0.0]

    ours = grid_sample(
        jnp.asarray(x), jnp.asarray(grid), mode=mode, padding_mode=padding
    )
    theirs = tF.grid_sample(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode=mode,
        padding_mode=padding,
        align_corners=False,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_grid_sample_point_shape():
    # (B, N, 1, 2) style grids used by warp_kpts depth sampling
    x = _rand(2, 8, 8, 1)
    grid = RNG.uniform(-1, 1, (2, 11, 1, 2)).astype(np.float32)
    out = grid_sample(jnp.asarray(x), jnp.asarray(grid))
    assert out.shape == (2, 11, 1, 1)


# ---------------------------------------------------------------- interpolate
@pytest.mark.parametrize(
    "mode,in_hw,out_hw",
    [
        ("bilinear", (35, 35), (70, 70)),
        ("bilinear", (70, 70), (35, 35)),
        ("bilinear", (40, 40), (70, 70)),  # non-integer scale (16->8 pyramid)
        ("bicubic", (16, 16), (37, 29)),
        ("nearest", (20, 30), (11, 17)),
        ("nearest-exact", (20, 30), (11, 17)),
    ],
)
def test_interpolate_matches_torch(mode, in_hw, out_hw):
    b, c = 2, 3
    x = _rand(b, *in_hw, c)
    ours = interpolate(jnp.asarray(x), out_hw, mode=mode)
    theirs = tF.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=out_hw,
        mode=mode,
        **({"align_corners": False} if mode in ("bilinear", "bicubic") else {}),
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def test_interpolate_scale_factor_semantics():
    # DINOv2 pos-embed path: bicubic with explicit scale_factor (dinov2.py:166-190)
    x = _rand(1, 37, 37, 8)
    sf = (40.1 / 37.0, 40.1 / 37.0)
    ours = interpolate(jnp.asarray(x), (40, 40), mode="bicubic", scale_factor=sf)
    theirs = tF.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        scale_factor=sf,
        mode="bicubic",
    ).permute(0, 2, 3, 1)
    assert theirs.shape[1:3] == (40, 40)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


# ---------------------------------------------------------------- local corr
def _torch_local_corr(f0, f1, radius, warp):
    """Direct port of the reference torch fallback semantics for testing only."""
    B, c, h, w = f0.shape
    r = radius
    K = (2 * r + 1) ** 2
    ys = torch.linspace(-2 * r / h, 2 * r / h, 2 * r + 1)
    xs = torch.linspace(-2 * r / w, 2 * r / w, 2 * r + 1)
    wy, wx = torch.meshgrid(ys, xs, indexing="ij")
    local_window = torch.stack((wx, wy), dim=-1).reshape(1, K, 2)
    warp_hw = warp.permute(0, 2, 3, 1)
    corr = torch.empty(B, K, h, w)
    for i in range(B):
        coords = (warp_hw[i, :, :, None] + local_window[:, None, None]).reshape(
            1, h, w * K, 2
        )
        feat = tF.grid_sample(
            f1[i : i + 1], coords, padding_mode="zeros", align_corners=False
        ).reshape(c, h, w, K)
        corr[i] = (f0[i, ..., None] / (c**0.5) * feat).sum(dim=0).permute(2, 0, 1)
    return corr


@pytest.mark.parametrize("method", ["corrvol", "patch"])
def test_local_correlation_matches_reference_semantics(method):
    b, h, w, c = 2, 12, 14, 16
    radius = 2
    f0 = _rand(b, h, w, c)
    f1 = _rand(b, h, w, c)
    # warp: mostly valid coords with some pointing off-image
    warp = RNG.uniform(-1.2, 1.2, (b, h, w, 2)).astype(np.float32)

    ours = local_correlation(
        jnp.asarray(f0), jnp.asarray(f1), radius, jnp.asarray(warp), method=method
    )
    theirs = _torch_local_corr(
        torch.from_numpy(f0).permute(0, 3, 1, 2),
        torch.from_numpy(f1).permute(0, 3, 1, 2),
        radius,
        torch.from_numpy(warp).permute(0, 3, 1, 2),
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def test_corr_volume_matches_reference():
    b, c, h, w = 2, 8, 6, 5
    f0 = _rand(b, h, w, c)
    f1 = _rand(b, h, w, c)
    ours = corr_volume(jnp.asarray(f0), jnp.asarray(f1))
    theirs = torch.einsum(
        "bci,bcj->bji",
        torch.from_numpy(f0).permute(0, 3, 1, 2).reshape(b, c, h * w),
        torch.from_numpy(f1).permute(0, 3, 1, 2).reshape(b, c, h * w),
    ).reshape(b, h, w, h, w) / (c**0.5)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


# ---------------------------------------------------------------- cls_to_flow
def test_cls_to_flow_refine_matches_torch():
    b, h, w, res = 2, 5, 6, 8
    c = res * res
    logits = _rand(b, h, w, c) * 3

    ours = cls_to_flow_refine(jnp.asarray(logits))

    t = torch.from_numpy(logits).permute(0, 3, 1, 2)
    G = torch.meshgrid(
        *[torch.linspace(-1 + 1 / res, 1 - 1 / res, steps=res) for _ in range(2)],
        indexing="ij",
    )
    G = torch.stack([G[1], G[0]], dim=-1).reshape(c, 2)
    probs = t.softmax(dim=1)
    mode = probs.max(dim=1).indices
    index = torch.stack(
        (mode - 1, mode, mode + 1, mode - res, mode + res), dim=1
    ).clamp(0, c - 1).long()
    neighbours = torch.gather(probs, dim=1, index=index)[..., None]
    flow = sum(neighbours[:, i] * G[index[:, i]] for i in range(5))
    flow = flow / neighbours.sum(dim=1)
    np.testing.assert_allclose(np.asarray(ours), flow.numpy(), atol=1e-5)


# ---------------------------------------------------------------- kde
def test_kde_matches_dense():
    x = RNG.uniform(-1, 1, (500, 4)).astype(np.float32)
    ours = kde(jnp.asarray(x), std=0.1, chunk=128)
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    dense = np.exp(-d2 / (2 * 0.1**2)).sum(-1)
    np.testing.assert_allclose(np.asarray(ours), dense, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------- sampling
def test_multinomial_no_replacement_respects_zero_weights():
    w = np.zeros(1000, dtype=np.float32)
    w[100:200] = 1.0
    idx = multinomial_no_replacement(jax.random.key(0), jnp.asarray(w), 50)
    idx = np.asarray(idx)
    assert len(np.unique(idx)) == 50
    assert ((idx >= 100) & (idx < 200)).all()


def test_multinomial_distribution_bias():
    # heavier weights should be picked more often
    w = np.ones(100, dtype=np.float32)
    w[:10] = 50.0
    counts = np.zeros(100)
    for s in range(200):
        idx = np.asarray(
            multinomial_no_replacement(jax.random.key(s), jnp.asarray(w), 10)
        )
        counts[idx] += 1
    assert counts[:10].mean() > 5 * counts[10:].mean()


# ---------------------------------------------------------------- attention
def test_sdpa_matches_torch():
    b, h, n, d = 2, 4, 100, 16
    q, k, v = _rand(b, h, n, d), _rand(b, h, n, d), _rand(b, h, n, d)
    ours = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), q_chunk=32)
    theirs = tF.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    )
    # sdpa intentionally runs its matmuls at default (bf16-ish) MXU precision —
    # the reference runs this path in fp16 autocast, so tolerance is loose.
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-2)


def test_normalized_grid_convention():
    g = np.asarray(normalized_grid(4, 8))
    assert g.shape == (4, 8, 2)
    np.testing.assert_allclose(g[0, 0], [-1 + 1 / 8, -1 + 1 / 4], atol=1e-7)
    np.testing.assert_allclose(g[-1, -1], [1 - 1 / 8, 1 - 1 / 4], atol=1e-7)


def test_pallas_attention_interpret_matches_einsum():
    """Pallas fused attention vs the einsum reference (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from roma_tpu.ops.pallas_attention import fused_attention

    b, h, n, d = 2, 4, 200, 64
    q, k, v = _rand(b, h, n, d), _rand(b, h, n, d), _rand(b, h, n, d)
    ref = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        out = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_pallas_attention_grad_matches_einsum():
    """Custom VJP (recompute backward) vs autodiff through the einsum path."""
    from jax.experimental.pallas import tpu as pltpu

    from roma_tpu.ops.pallas_attention import fused_attention

    b, h, n, d = 1, 2, 64, 64
    q = jnp.asarray(_rand(b, h, n, d))
    k = jnp.asarray(_rand(b, h, n, d))
    v = jnp.asarray(_rand(b, h, n, d))
    with pltpu.force_tpu_interpret_mode():
        gq, gk, gv = jax.grad(
            lambda q, k, v: fused_attention(q, k, v).sum(), argnums=(0, 1, 2)
        )(q, k, v)
    rq, rk, rv = jax.grad(
        lambda q, k, v: sdpa(q, k, v, use_pallas=False).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-4)


@pytest.mark.parametrize(
    "name,shape,warp_sigma,wild_frac,fixup_k",
    [
        ("smooth", (2, 32, 48, 6, 32, 48), 0.01, 0.0, 64),
        ("wild-2pct", (2, 32, 32, 4, 32, 32), 0.02, 0.02, 64),
        ("overflow-fallback", (1, 32, 32, 4, 32, 32), 0.02, 0.5, 16),
        ("nonmult-tiles", (1, 36, 44, 5, 28, 36), 0.02, 0.0, 64),
        ("tiny-img", (1, 12, 12, 3, 20, 20), 0.1, 0.0, 64),
    ],
)
def test_windowed_grid_sample_matches_plain(name, shape, warp_sigma, wild_frac, fixup_k):
    """Windowed one-hot warp kernel (interpret mode) vs the reference gather
    path — incl. out-of-window fixup and the cond full-fallback."""
    from roma_tpu.ops import grid_sample
    from graveyard.window_warp_v1 import WindowSpec, windowed_grid_sample

    rs = np.random.RandomState(0)
    spec = WindowSpec(th=8, tw=8, wh=24, ww=40, xq=8, pm=8, kf=fixup_k)
    b, h, w, c, hq, wq = shape
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    gy, gx = np.meshgrid(np.linspace(-1, 1, hq), np.linspace(-1, 1, wq), indexing="ij")
    g = np.stack([gx, gy], -1)[None].repeat(b, 0) + warp_sigma * rs.randn(b, hq, wq, 2)
    if wild_frac:
        m = rs.rand(b, hq, wq) < wild_frac
        g[m] = rs.uniform(-2.5, 2.5, (int(m.sum()), 2))
    g = jnp.asarray(g, jnp.float32)
    got = windowed_grid_sample(x, g, spec=spec, interpret=True)
    ref = grid_sample(x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_grid_sample_per_image_map_paths():
    """The big-table per-image lax.map branches must match the batched ones
    (threshold patched down so small test shapes take the map path)."""
    import importlib

    gs_mod = importlib.import_module("roma_tpu.ops.grid_sample")

    rs = np.random.RandomState(3)
    x9 = jnp.asarray(rs.randn(3, 20, 24, 9), jnp.float32)     # packed path
    x256 = jnp.asarray(rs.randn(3, 20, 24, 160), jnp.float32)  # 4-tap path
    g = jnp.asarray(rs.uniform(-1.4, 1.4, (3, 15, 17, 2)), jnp.float32)
    ref9 = gs_mod.grid_sample(x9, g)
    ref256 = gs_mod.grid_sample(x256, g)
    old = gs_mod.BIG_TABLE_BYTES
    try:
        gs_mod.BIG_TABLE_BYTES = 1
        np.testing.assert_allclose(
            np.asarray(gs_mod.grid_sample(x9, g)), np.asarray(ref9), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gs_mod.grid_sample(x256, g)), np.asarray(ref256), atol=1e-6
        )
    finally:
        gs_mod.BIG_TABLE_BYTES = old


@pytest.mark.parametrize("shape", [(10, 12, 8, 2), (6, 9, 256, 3)])  # texel, runs
def test_local_correlation_return_lookup_matches_grid_sample(shape):
    """The fused x_hat from the patch gather must equal grid_sample(f1, warp)."""
    h, w, c, r = shape
    rs = np.random.RandomState(0)
    f0 = jnp.asarray(rs.randn(2, h, w, c), jnp.float32)
    f1 = jnp.asarray(rs.randn(2, h, w, c), jnp.float32)
    warp = jnp.asarray(rs.uniform(-1.9, 1.9, (2, h, w, 2)), jnp.float32)
    corr_ref = local_correlation(f0, f1, r, warp, method="patch")
    corr, xh = local_correlation(f0, f1, r, warp, method="patch", return_lookup=True)
    np.testing.assert_allclose(np.asarray(corr), np.asarray(corr_ref), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(xh), np.asarray(grid_sample(f1, warp)), atol=1e-5
    )
    _, none_xh = local_correlation(f0, f1, r, warp, method="corrvol", return_lookup=True)
    assert none_xh is None


def test_pallas_attention_n_valid_masks_padded_keys():
    """Explicit n_valid (lane-padded token stacks): output rows < n_valid
    must match the einsum attention over the REAL tokens only — the padded
    keys' analytic denominator correction must be exact."""
    from jax.experimental.pallas import tpu as pltpu

    from roma_tpu.ops.pallas_attention import fused_attention

    b, h, n, d = 1, 2, 256, 64
    nv = 187
    q, k, v = _rand(b, h, n, d), _rand(b, h, n, d), _rand(b, h, n, d)
    # padded rows carry ARBITRARY content: in the model the zero padding
    # drifts non-zero after the first block (a padded row's attention
    # output is a weighted average of valid V rows), so the kernel must
    # mask padded keys regardless of what they hold. Scale them up to make
    # any leak loud.
    for a in (k, v):
        a[:, :, nv:] *= 7.0
    ref = sdpa(
        jnp.asarray(q[:, :, :nv]), jnp.asarray(k[:, :, :nv]), jnp.asarray(v[:, :, :nv]),
        use_pallas=False,
    )
    with pltpu.force_tpu_interpret_mode():
        out = fused_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), n_valid=nv
        )
    np.testing.assert_allclose(np.asarray(out[:, :, :nv]), np.asarray(ref), atol=2e-2)

    with pltpu.force_tpu_interpret_mode():
        gq, gk, gv = jax.grad(
            lambda q, k, v: (fused_attention(q, k, v, n_valid=nv)[:, :, :nv] ** 2).sum(),
            argnums=(0, 1, 2),
        )(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    rq, rk, rv = jax.grad(
        lambda q, k, v: (sdpa(q, k, v, use_pallas=False) ** 2).sum(), argnums=(0, 1, 2)
    )(jnp.asarray(q[:, :, :nv]), jnp.asarray(k[:, :, :nv]), jnp.asarray(v[:, :, :nv]))
    np.testing.assert_allclose(np.asarray(gq[:, :, :nv]), np.asarray(rq), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk[:, :, :nv]), np.asarray(rk), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gv[:, :, :nv]), np.asarray(rv), atol=1e-3)


@pytest.mark.parametrize("heads,c", [(4, 256), (2, 256)])  # d=64, d=128
def test_packed_attention_matches_einsum(heads, c):
    """fused_attention_packed consumes the raw (B, N, 3C) qkv Dense output
    and must match the per-head einsum attention, padded keys masked."""
    from jax.experimental.pallas import tpu as pltpu

    from roma_tpu.ops.pallas_attention import fused_attention_packed

    b, n, nv = 2, 256, 201
    d = c // heads
    rs = np.random.RandomState(3)
    qkv = rs.randn(b, n, 3 * c).astype(np.float32) * 0.3
    qkv[:, nv:] *= 5.0  # arbitrary padded-token content must be inert

    def unpack(x):
        q, k, v = (
            x[:, :, i * c:(i + 1) * c].reshape(b, n, heads, d).transpose(0, 2, 1, 3)
            for i in range(3)
        )
        return q, k, v

    q, k, v = unpack(jnp.asarray(qkv))
    ref = sdpa(q[:, :, :nv], k[:, :, :nv], v[:, :, :nv], use_pallas=False)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, nv, c)

    with pltpu.force_tpu_interpret_mode():
        out = fused_attention_packed(jnp.asarray(qkv), heads, n_valid=nv)
    np.testing.assert_allclose(np.asarray(out[:, :nv]), np.asarray(ref), atol=2e-5)

    # grads: packed backward (unpack -> per-head recompute kernel -> repack)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(
            lambda x: (fused_attention_packed(x, heads, n_valid=nv)[:, :nv] ** 2).sum()
        )(jnp.asarray(qkv))

    def ref_loss(x):
        q, k, v = unpack(x)
        o = sdpa(q[:, :, :nv], k[:, :, :nv], v[:, :, :nv], use_pallas=False)
        return (o.transpose(0, 2, 1, 3).reshape(b, nv, c) ** 2).sum()

    gr = jax.grad(ref_loss)(jnp.asarray(qkv))
    np.testing.assert_allclose(
        np.asarray(g[:, :nv]), np.asarray(gr[:, :nv]), atol=2e-3
    )
