"""Train-mode BatchNorm running-stat evolution vs the torch spec.

The Decoder applies the same per-scale projection (Conv1x1 + BN) to f1_s and
then f2_s (roma_tpu/models/matcher.py Decoder.__call__; reference
romatch/models/matcher.py:441-450), so in train mode the BN running stats
receive TWO sequential momentum updates per step. Flax mutates the
batch_stats variable in place during apply, so the second call compounds on
the first exactly like torch's sequential updates — pinned here against a
real torch Conv+BN pair.

Known, accepted residual: torch updates running_var with the UNBIASED batch
variance (correction N/(N-1)) while flax uses the biased one. At real
feature-map sizes N = B*H*W is >1e5 and the ratio is <1e-5; the test applies
the correction explicitly so everything else is pinned tight.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from roma_tpu.models.blocks import torch_bn, torch_conv


def test_double_projection_bn_updates_match_torch_sequential():
    import flax.linen as nn

    cin, cout, b, h, w = 5, 7, 3, 6, 8
    rs = np.random.RandomState(0)
    f1 = rs.randn(b, h, w, cin).astype(np.float32)
    f2 = (rs.randn(b, h, w, cin) * 2.0 + 1.5).astype(np.float32)

    # torch: train-mode Conv1x1 + BN applied to f1 then f2 (two momentum steps)
    tconv = torch.nn.Conv2d(cin, cout, 1)
    tbn = torch.nn.BatchNorm2d(cout, eps=1e-5, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        t1 = tbn(tconv(torch.from_numpy(f1).permute(0, 3, 1, 2)))
        t2 = tbn(tconv(torch.from_numpy(f2).permute(0, 3, 1, 2)))

    class Proj(nn.Module):
        @nn.compact
        def __call__(self, a, b):
            conv = torch_conv(cout, kernel=1, padding=0, name="conv")
            bn = torch_bn(affine=True, train=True, name="bn")
            return bn(conv(a)), bn(conv(b))

    mod = Proj()
    vs = mod.init(jax.random.PRNGKey(0), jnp.asarray(f1), jnp.asarray(f2))
    params = {
        "conv": {
            "kernel": jnp.asarray(
                tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        },
        "bn": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
    }
    (j1, j2), upd = mod.apply(
        {"params": params, "batch_stats": vs["batch_stats"]},
        jnp.asarray(f1),
        jnp.asarray(f2),
        mutable=["batch_stats"],
    )

    np.testing.assert_allclose(
        np.asarray(j1),
        t1.numpy().transpose(0, 2, 3, 1),
        atol=2e-5,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(j2),
        t2.numpy().transpose(0, 2, 3, 1),
        atol=2e-5,
        rtol=1e-5,
    )

    # running mean: exact sequential compounding r2 = 0.9*(0.9*r0 + 0.1*mu1) + 0.1*mu2
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.numpy(),
        atol=1e-6,
        rtol=1e-6,
    )
    # running var: same compounding; torch uses unbiased batch var, flax
    # biased. Reconstruct torch's value from the flax updates with the
    # N/(N-1) correction to pin the momentum arithmetic itself.
    n = b * h * w
    corr = n / (n - 1)
    with torch.no_grad():
        c1 = tconv(torch.from_numpy(f1).permute(0, 3, 1, 2))
        c2 = tconv(torch.from_numpy(f2).permute(0, 3, 1, 2))
    v1 = c1.var(dim=(0, 2, 3), unbiased=False).numpy()
    v2 = c2.var(dim=(0, 2, 3), unbiased=False).numpy()
    expected_torch = 0.9 * (0.9 * 1.0 + 0.1 * v1 * corr) + 0.1 * v2 * corr
    np.testing.assert_allclose(
        tbn.running_var.numpy(), expected_torch, atol=1e-5, rtol=1e-5
    )
    expected_flax = 0.9 * (0.9 * 1.0 + 0.1 * v1) + 0.1 * v2
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["bn"]["var"]),
        expected_flax,
        atol=1e-5,
        rtol=1e-5,
    )


def test_drop_path_distribution_and_eval_identity():
    """DropPath (roma_tpu/models/vit.py): eval/deterministic = identity;
    train mode drops whole samples and rescales survivors by 1/keep
    (reference layers/drop_path.py:15-32 semantics, static-shape mask)."""
    import jax

    from roma_tpu.models.vit import DropPath

    x = jnp.asarray(np.random.RandomState(0).randn(64, 5, 3), jnp.float32)
    ident = DropPath(rate=0.5, deterministic=True).apply({}, x)
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(x))

    out = DropPath(rate=0.5, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    out = np.asarray(out)
    per_sample = np.abs(out).sum(axis=(1, 2))
    dropped = per_sample == 0
    kept = ~dropped
    assert dropped.any() and kept.any()
    np.testing.assert_allclose(out[kept], 2.0 * np.asarray(x)[kept], rtol=1e-6)
    # E[kept fraction] = 0.5; with 64 samples this is a >6-sigma bound
    assert 0.2 < kept.mean() < 0.8
