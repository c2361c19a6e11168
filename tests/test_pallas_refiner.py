"""Fused Pallas refiner kernels vs the folded XLA reference.

Covers both kernels (channel-major C<=32, lane-major C>32) in interpreter
mode on CPU, including BN folding from a real flax ConvRefiner tree.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roma_tpu.ops import pallas_refiner as pr


def _blocks(c, n, seed=0):
    rs = np.random.RandomState(seed)
    blocks = []
    for i in range(n):
        blocks.append(
            pr.fold_block(
                jnp.asarray(rs.randn(5, 5, 1, c) * 0.2, jnp.float32),
                jnp.asarray(rs.randn(c) * 0.1, jnp.float32),
                jnp.asarray(1 + 0.1 * rs.randn(c), jnp.float32),
                jnp.asarray(0.1 * rs.randn(c), jnp.float32),
                jnp.asarray(0.05 * rs.randn(c), jnp.float32),
                jnp.asarray(np.abs(1 + 0.2 * rs.randn(c)), jnp.float32),
                jnp.asarray(rs.randn(1, 1, c, c) * (1.5 / np.sqrt(c)), jnp.float32),
                jnp.asarray(rs.randn(c) * 0.1, jnp.float32),
            )
        )
    return blocks


@pytest.mark.parametrize(
    "c,h,w,nb",
    [
        (24, 18, 22, 3),   # channel-major kernel (C <= 32)
        (16, 40, 31, 9),   # full-depth chunked stack
    ],
)
def test_fused_refiner_stack_matches_reference(c, h, w, nb):
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, h, w, c), jnp.float32)
    blocks = _blocks(c, nb)
    ref = pr.refiner_stack_reference(x, blocks)
    got = pr.fused_refiner_stack(x, blocks, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize(
    "c,h,w,nb,cg",
    [
        (24, 18, 22, 3, 8),   # chunk divides C
        (24, 40, 31, 3, 7),   # ragged last chunk
        (9, 33, 40, 2, 8),    # C < chunk (s1 proj width)
    ],
)
def test_packed_cmajor_bitexact_vs_cmajor(c, h, w, nb, cg):
    """The packed (channel-chunk whole-tensor) kernel is a bit-exact drop-in
    for the per-channel cmajor kernel: same strip layout, same f32 summation
    order, same io-dtype round-trips between stages."""
    rs = np.random.RandomState(3)
    blocks = _blocks(c, nb)
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rs.randn(2, h, w, c), dt)
        old = pr._fused_cmajor(x, blocks, interpret=True)
        got = pr._fused_cmajor_packed(x, blocks, interpret=True, cg=cg)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(old))


@pytest.mark.parametrize(
    "c,h,w,nb",
    [
        (40, 14, 19, 2),   # pads to 128 lanes
        (144, 11, 9, 2),   # multi-vreg lanes
    ],
)
def test_lane_refiner_stack_matches_reference(c, h, w, nb):
    """The lane-major kernel is not routed by fused_refiner_stack (measured
    slower than XLA's scanned convs at RoMa's wide-C shapes; relocated to
    the graveyard) — exercise it directly so the documented experiment
    stays parity-true."""
    from graveyard.pallas_refiner_lanemajor import lane_refiner_stack

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, h, w, c), jnp.float32)
    blocks = _blocks(c, nb)
    ref = pr.refiner_stack_reference(x, blocks)
    got = lane_refiner_stack(x, blocks, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3
    )


def test_scanned_blocks_lane_padding_equivalence():
    """Lane-padded token stacks (n_valid masking) must match unpadded."""
    from roma_tpu.models.vit import ScannedBlocks

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 65, 64), jnp.float32)
    mod = ScannedBlocks(depth=2, dim=64, num_heads=4, dtype=jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(vs, x)
    modp = ScannedBlocks(depth=2, dim=64, num_heads=4, dtype=jnp.float32, n_valid=65)
    got = modp.apply(vs, jnp.pad(x, ((0, 0), (0, 63), (0, 0))))[:, :65]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fold_refiner_tree_matches_module_eval():
    """BN folding from a real flax ConvRefiner tree: the folded XLA chain
    must equal the module's eval-mode block stack (the wiring the TPU fused
    path reads from matcher.py's variable tree)."""
    import flax.linen as nn

    from roma_tpu.models.matcher import RefinerBlock, ScannedRefinerBlocks

    c, h, w, nb = 12, 10, 14, 3
    blk = dict(out_dim=c, kernel=5, dtype=jnp.float32)

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, d):
            d = RefinerBlock(**blk, name="block1")(d)
            return ScannedRefinerBlocks(
                length=nb - 1, block_kwargs=blk, unroll=True, name="hidden"
            )(d)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, h, w, c), jnp.float32)
    mod = Stack()
    vs = mod.init(jax.random.PRNGKey(0), x)
    # perturb batch_stats so folding is non-trivial
    vs = jax.tree.map(lambda a: a, vs)
    bs = jax.tree.map(lambda a: a + 0.1 * rs.randn(*a.shape).astype(a.dtype),
                      vs["batch_stats"])
    bs = jax.tree.map(lambda a: jnp.abs(a) + 0.05, bs)  # keep vars positive
    vs = {"params": vs["params"], "batch_stats": bs}
    ref = mod.apply(vs, x)
    folded = pr.fold_refiner_tree(vs["params"], vs["batch_stats"])
    got = pr.refiner_stack_reference(x, folded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "c,h,w,nb",
    [
        (40, 14, 19, 2),    # pads to 128 lanes
        (144, 11, 9, 3),    # multi-vreg sublanes
        (16, 23, 31, 2),
        (29, 10, 13, 2),    # non-8-aligned C (zero-pad to sublane tiling)
    ],
)
def test_hcw_refiner_stack_matches_reference(c, h, w, nb):
    """(B, H, C, W)-layout wide-channel block kernel (graveyard negative
    result) vs the folded XLA reference."""
    from graveyard.pallas_hcw_refiner import hcw_refiner_stack

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, h, w, c), jnp.float32)
    blocks = _blocks(c, nb)
    ref = pr.refiner_stack_reference(x, blocks)
    got = hcw_refiner_stack(x, blocks, interpret=True, s_rows=5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3
    )
