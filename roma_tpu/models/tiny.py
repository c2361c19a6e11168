"""Tiny RoMa — the lightweight matcher (XFeat backbone + global correlation
+ coarse/fine refinement CNNs).

TPU-native re-design of the reference `romatch/models/tiny.py:30-304`:
  * NHWC layout end to end; the global correlation and softmax-matching run as
    one (N0, N1) MXU matmul with the softmax over the lane dimension.
  * All shapes static per input resolution: `match` jit-compiles one XLA
    program per (B, H, W) and caches it.
  * The approximate eval-mode softmax matching (reference tiny.py:124-136,
    `down=4` subsampled grid + argmax channel) is reproduced exactly.
"""
from __future__ import annotations

import math
from functools import partial
from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..ops import balanced_sample, grid_sample, interpolate, normalized_grid
from ..utils.image import load_image, to_array
from .blocks import ConvStack
from .xfeat import XFeatBackbone

Dtype = Any


def corr_volume_qmajor(f0: jnp.ndarray, f1: jnp.ndarray) -> jnp.ndarray:
    """(B, N0, N1) correlation <f0_i, f1_j>/sqrt(C) from NHWC feature maps.

    Query(A)-major layout so the matching softmax reduces over the lane
    dimension. Transposed view of reference tiny.py:178-191.
    """
    b, h0, w0, c = f0.shape
    _, h1, w1, _ = f1.shape
    return jnp.einsum(
        "bic,bjc->bij",
        f0.reshape(b, h0 * w0, c).astype(jnp.float32),
        f1.reshape(b, h1 * w1, c).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(c))


def softmax_pos_embed(
    cvt: jnp.ndarray, grid_hw: tuple[int, int], exact: bool, down: int = 4
) -> jnp.ndarray:
    """Expected B-image coordinate per A-pixel from the correlation volume.

    cvt: (B, N0, N1) query-major correlation. Returns (B, N0, 2) in [-1, 1].
    Exact mode: full softmax over N1 (reference tiny.py:138-139). Approx mode
    (eval): softmax over the `down`-subsampled grid plus the argmax channel
    (reference tiny.py:124-136) — O(N0 * N1/16) instead of O(N0 * N1).
    """
    h1, w1 = grid_hw
    b, n0, n1 = cvt.shape
    grid = normalized_grid(h1, w1).reshape(n1, 2)
    if exact:
        p = jax.nn.softmax(cvt, axis=-1)
        return jnp.einsum("bij,jd->bid", p, grid, preferred_element_type=jnp.float32)

    grid_lr = normalized_grid(h1 // down, w1 // down).reshape(-1, 2)
    best = jnp.argmax(cvt, axis=-1)  # (B, N0)
    best_val = jnp.max(cvt, axis=-1, keepdims=True)  # (B, N0, 1)
    low = cvt.reshape(b, n0, h1, w1)[:, :, ::down, ::down].reshape(b, n0, -1)
    logits = jnp.concatenate((low, best_val), axis=-1)
    p = jax.nn.softmax(logits, axis=-1)
    pos = jnp.einsum(
        "bij,jd->bid", p[..., :-1], grid_lr, preferred_element_type=jnp.float32
    )
    return pos + p[..., -1:] * grid[best]


class TinyRoMaNet(nn.Module):
    """Flax module producing the corresps pyramid {8: ..., 4: ...}.

    Inputs are (B, H, W, 3) float images in [0, 1] with H, W % 32 == 0
    (the caller resizes — reference preprocess_tensor, tiny.py:72-79).
    """

    exact_softmax: bool = False
    train_mode: bool = False
    freeze_xfeat: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, im_A: jnp.ndarray, im_B: jnp.ndarray):
        b, h, w, _ = im_B.shape
        backbone = XFeatBackbone(
            dtype=self.dtype,
            train=self.train_mode and not self.freeze_xfeat,
            name="xfeat",
        )
        # batched A|B concat when same-size (reference tiny.py:283-287)
        if im_A.shape == im_B.shape:
            fine, coarse = backbone(jnp.concatenate((im_A, im_B), axis=0))
            f_a_f, f_b_f = jnp.split(fine, 2, axis=0)
            f_a_c, f_b_c = jnp.split(coarse, 2, axis=0)
        else:
            f_a_f, f_a_c = backbone(im_A)
            f_b_f, f_b_c = backbone(im_B)
        if self.freeze_xfeat:
            f_a_f, f_a_c = jax.lax.stop_gradient((f_a_f, f_a_c))
            f_b_f, f_b_c = jax.lax.stop_gradient((f_b_f, f_b_c))

        hc, wc = f_a_c.shape[1], f_a_c.shape[2]
        cvt = corr_volume_qmajor(f_a_c, f_b_c)
        exact = self.exact_softmax or self.train_mode
        # matching grid lives on B's coarse feature map (reference pos_embed
        # uses H1/W1, tiny.py:116-122) — differs from A's when sizes differ
        hc_b, wc_b = f_b_c.shape[1], f_b_c.shape[2]
        coarse_warp = softmax_pos_embed(cvt, (hc_b, wc_b), exact).reshape(b, hc, wc, 2)

        to_norm = jnp.asarray([2.0 / w, 2.0 / h, 1.0], dtype=jnp.float32)

        f_b_c_w = grid_sample(f_b_c, coarse_warp)
        delta = ConvStack(
            specs=[dict(features=256)] * 4,
            head_features=3,
            train=self.train_mode,
            dtype=self.dtype,
            name="coarse_matcher",
        )(jnp.concatenate((f_a_c, f_b_c_w, coarse_warp.astype(f_a_c.dtype)), axis=-1))
        coarse = jnp.concatenate(
            (coarse_warp, jnp.zeros_like(coarse_warp[..., :1])), axis=-1
        ) + delta.astype(jnp.float32) * to_norm
        corresps = {
            8: {"flow": coarse[..., :2], "certainty": coarse[..., 2:]},
        }
        if self.train_mode:
            # query-major (B, N_A, N_B) volume for the InfoNCE loss
            # (train/losses_tiny.py; reference robust_loss_tiny_roma.py:50-61)
            corresps[8]["corr_volume"] = cvt

        hf, wf = f_a_f.shape[1], f_a_f.shape[2]
        coarse_up = interpolate(coarse, (hf, wf), mode="bilinear")
        coarse_up = jax.lax.stop_gradient(coarse_up)  # reference tiny.py:299
        f_b_f_w = grid_sample(f_b_f, coarse_up[..., :2])
        fine_delta = ConvStack(
            specs=[dict(features=64)] * 4,
            head_features=3,
            train=self.train_mode,
            dtype=self.dtype,
            name="fine_matcher",
        )(
            jnp.concatenate(
                (f_a_f, f_b_f_w, coarse_up[..., :2].astype(f_a_f.dtype)), axis=-1
            )
        )
        fine = coarse_up + fine_delta.astype(jnp.float32) * to_norm
        corresps[4] = {"flow": fine[..., :2], "certainty": fine[..., 2:]}
        return corresps


class TinyRoMa:
    """Public Tiny RoMa matcher API (reference tiny.py:30-304).

    Methods mirror the reference contract: ``match`` returns (warp, certainty)
    with warp (B, H, W, 4) = (x_A, y_A, x_B, y_B) in [-1,1] and certainty
    (B, H, W); ``sample`` draws threshold-balanced sparse matches;
    ``to_pixel_coordinates`` converts to pixel coords.
    """

    def __init__(
        self,
        variables,
        sample_mode: str = "threshold_balanced",
        symmetric: bool = False,
        exact_softmax: bool = False,
        dtype: Dtype = jnp.float32,
        seed: int = 0,
    ):
        self.variables = variables
        self.sample_mode = sample_mode
        self.sample_thresh = 0.05
        self.symmetric = symmetric
        self.exact_softmax = exact_softmax
        self.dtype = dtype
        self.net = TinyRoMaNet(exact_softmax=exact_softmax, dtype=dtype)
        self._key = jax.random.PRNGKey(seed)

    @staticmethod
    def init_variables(key=None, dtype: Dtype = jnp.float32, fast: bool = False):
        """Random-init parameters (testing / training-from-scratch).
        ``fast=True`` fills shapes host-side without compiling the init
        program (utils.fast_init) — for smoke tests and benchmarks."""
        key = key if key is not None else jax.random.PRNGKey(0)
        net = TinyRoMaNet(dtype=dtype)
        dummy = jnp.zeros((1, 64, 64, 3), dtype)
        if fast:
            from ..utils.fast_init import shape_init

            return shape_init(net.init, key, dummy, dummy)
        return jax.jit(net.init)(key, dummy, dummy)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # -- core jitted pipeline (one program per (B, H_A, W_A, H_B, W_B)) ----
    @partial(jax.jit, static_argnums=(0, 2, 3, 4))
    def _match_jit(
        self,
        variables,
        hw: tuple[int, int],
        proc_hw_A: tuple[int, int],
        proc_hw_B: tuple[int, int],
        im_A,
        im_B,
    ):
        """Each image is resized to its OWN nearest /32 grid (reference
        preprocess_tensor per image, tiny.py:72-79,277-278) — resizing A to
        B's grid would silently change A's aspect when sizes differ."""
        h0, w0 = hw
        im_A = interpolate(im_A, proc_hw_A, mode="bilinear")
        im_B = interpolate(im_B, proc_hw_B, mode="bilinear")
        corresps = self.net.apply(variables, im_A, im_B)
        flow = interpolate(corresps[4]["flow"], (h0, w0), mode="bilinear")
        cert = interpolate(corresps[4]["certainty"], (h0, w0), mode="bilinear")
        b = flow.shape[0]
        grid = jnp.broadcast_to(normalized_grid(h0, w0), (b, h0, w0, 2))
        warp = jnp.concatenate((grid, flow), axis=-1)
        return warp, jax.nn.sigmoid(cert[..., 0])

    @staticmethod
    def _proc_hw(x) -> tuple[int, int]:
        return (x.shape[1] // 32) * 32, (x.shape[2] // 32) * 32

    def forward(self, batch):
        """corresps pyramid from a batch dict {im_A, im_B} (NHWC, [0,1])."""
        im_A, im_B = jnp.asarray(batch["im_A"]), jnp.asarray(batch["im_B"])
        im_A = interpolate(im_A, self._proc_hw(im_A), mode="bilinear")
        im_B = interpolate(im_B, self._proc_hw(im_B), mode="bilinear")
        return self.net.apply(self.variables, im_A, im_B)

    def match(self, im_A, im_B, *, batched: bool = True):
        """Dense match. Accepts paths / PIL images / NHWC arrays in [0,1]."""
        if isinstance(im_A, (str, Path, Image.Image)):
            im_A = to_array(load_image(im_A))[None]
            im_B = to_array(load_image(im_B))[None]
            batched = False
        im_A = jnp.asarray(im_A, self.dtype)
        im_B = jnp.asarray(im_B, self.dtype)
        if im_A.ndim == 3:
            im_A, im_B = im_A[None], im_B[None]
            batched = False
        h0, w0 = im_A.shape[1], im_A.shape[2]
        warp, cert = self._match_jit(
            self.variables, (h0, w0), self._proc_hw(im_A), self._proc_hw(im_B), im_A, im_B
        )
        if batched:
            return warp, cert
        return warp[0], cert[0]

    def sample(self, matches, certainty, num: int = 5000, key=None):
        """Threshold-balanced sparse sampling (reference tiny.py:234-264).

        ``key``: explicit PRNG key for reproducible sampling (benchmarks own
        the seed); default falls back to the instance key stream."""
        m = jnp.asarray(matches).reshape(-1, 4)
        c = jnp.asarray(certainty).reshape(-1)
        return balanced_sample(
            key if key is not None else self._next_key(),
            m, c, num, thresh=self.sample_thresh, mode=self.sample_mode,
        )

    @staticmethod
    def _to_pixel(coords, h, w):
        return jnp.stack(
            (w / 2 * (coords[..., 0] + 1), h / 2 * (coords[..., 1] + 1)), axis=-1
        )

    def to_pixel_coordinates(self, coords, H_A, W_A, H_B=None, W_B=None):
        coords = jnp.asarray(coords)
        if coords.shape[-1] == 2:
            return self._to_pixel(coords, H_A, W_A)
        kpts_A, kpts_B = coords[..., :2], coords[..., 2:]
        return self._to_pixel(kpts_A, H_A, W_A), self._to_pixel(kpts_B, H_B, W_B)

    def visualize_warp(self, warp, certainty, im_A, im_B, save_path=None,
                       symmetric: bool = False):
        """Warp image B into A's frame weighted by certainty (tiny.py:142-176).

        ``symmetric=True`` takes a side-by-side (H, 2W, 4) warp (e.g. from two
        stacked directional matches, reference demo_match_tiny) and renders
        A<-B | B<-A panels like the reference's ``symmetric`` branch
        (tiny.py:155-170). The default is False because TinyRoMa.match
        returns a one-directional (H, W, 4) warp.
        """
        warp = jnp.asarray(warp)
        h, w2 = warp.shape[0], warp.shape[1]
        w = w2 // 2 if symmetric else w2
        x_b = jnp.asarray(to_array(resize_pil(im_B, (h, w))))
        transfer = grid_sample(x_b[None], warp[None, :, :w, 2:])[0]
        if symmetric:
            x_a = jnp.asarray(to_array(resize_pil(im_A, (h, w))))
            transfer_b = grid_sample(x_a[None], warp[None, :, w:, :2])[0]
            transfer = jnp.concatenate((transfer, transfer_b), axis=1)
        cert = jnp.asarray(certainty)[..., None]
        vis = cert * transfer + (1 - cert) * jnp.ones_like(transfer)
        if save_path is not None:
            arr = np.asarray(jnp.clip(vis, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(save_path)
        return vis


def resize_pil(im, size_hw):
    im = load_image(im)
    return im.resize((size_hw[1], size_hw[0]))
