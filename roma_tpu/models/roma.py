"""RegressionMatcher — the public big-RoMa API (reference matcher.py:550-986).

Semantics preserved exactly:
  * ``match`` runs the two-pass pipeline: coarse 560x560 (DINOv2+GP+decoder,
    scales 16..1) then refine-only at upsample_res 864x864 (scales 8..1 seeded
    with the finest coarse corresps), certainty attenuation from the
    first pass's scale-16 logits, out-of-range -> certainty 0, clamp to
    [-1,1], symmetric side-by-side warp assembly (matcher.py:779-934).
  * ``sample`` threshold-balanced KDE sampling (matcher.py:598-629).
  * ``to_pixel_coordinates`` / ``to_normalized_coordinates`` /
    ``match_keypoints`` / ``conf_from_fb_consistency`` (matcher.py:672-773).

TPU design: the full two-pass pipeline compiles to ONE XLA program per
(batch, coarse_res, upsample_res, symmetric) signature, cached on the
instance; host work is only PIL decode/resize/normalize.
"""
from __future__ import annotations

import math
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..ops import balanced_sample, grid_sample, interpolate, normalized_grid
from ..utils.image import imagenet_normalize, load_image, resize, to_array
from .config import RoMaConfig
from .matcher import RoMaNet

Dtype = Any


class RegressionMatcher:
    def __init__(
        self,
        variables,
        h: int = 560,
        w: int = 560,
        sample_mode: str = "threshold_balanced",
        upsample_preds: bool = True,
        symmetric: bool = True,
        sample_thresh: float = 0.05,
        attenuate_cert: bool = True,
        upsample_res: tuple[int, int] = (864, 864),
        dtype: Dtype = jnp.float32,
        coarse_dtype: Dtype | None = None,
        seed: int = 0,
        config: RoMaConfig = RoMaConfig(),
    ):
        assert h % 14 == 0 and w % 14 == 0, "coarse res must be a multiple of 14"
        self.variables = variables
        self.h_resized = h
        self.w_resized = w
        self.sample_mode = sample_mode
        self.upsample_preds = upsample_preds
        self.symmetric = symmetric
        self.sample_thresh = sample_thresh
        self.attenuate_cert = attenuate_cert
        self.upsample_res = upsample_res
        self.dtype = dtype
        self.net = RoMaNet(config=config, dtype=dtype, coarse_dtype=coarse_dtype or dtype)
        self._key = jax.random.PRNGKey(seed)

    @staticmethod
    def init_variables(
        key=None,
        dtype: Dtype = jnp.float32,
        res: int = 56,
        config: RoMaConfig = RoMaConfig(),
        fast: bool = False,
    ):
        """Random-init variables (testing / from-scratch training). ``res``
        is the init trace resolution (must be %14). ``fast=True`` skips the
        init-program compile and fills shapes host-side (utils.fast_init) —
        right for smoke tests and benchmarks, not for from-scratch training."""
        from ..utils.fast_init import shape_init

        key = key if key is not None else jax.random.PRNGKey(0)
        net = RoMaNet(config=config, dtype=dtype)
        dummy = jnp.zeros((1, res, res, 3), dtype)
        if fast:
            return shape_init(net.init, key, dummy, dummy)
        return jax.jit(net.init)(key, dummy, dummy)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def get_output_resolution(self):
        return self.upsample_res if self.upsample_preds else (self.h_resized, self.w_resized)

    # ------------------------------------------------------------------ #
    # jitted pipeline
    # ------------------------------------------------------------------ #

    @partial(jax.jit, static_argnums=(0, 1, 5))
    def _match_coarse(
        self, symmetric: bool, variables, im_A, im_B, out_hw, gm_logit_bias=None
    ):
        """Single-pass match at coarse res -> (flow, certainty, low_res_cert).

        ``gm_logit_bias``: the Decoder's diagnostic logit-injection hook
        (matcher.py Decoder.__call__) threaded through the public match
        pipeline — used by the cross-implementation AUC equivalence proof
        (tools/crossimpl_auc.py) to pin a known warp into the coarse
        classifier. Never set on the production path."""
        hs, ws = im_A.shape[1:3]
        sf = math.sqrt(hs * ws / 560.0**2)
        corresps = self.net.apply(
            variables, im_A, im_B, symmetric=symmetric, scale_factor=sf,
            gm_logit_bias=gm_logit_bias,
        )
        low = interpolate(corresps[16]["certainty"], out_hw, mode="bilinear")
        low = 0.5 * low * (low < 0)
        flow = interpolate(corresps[1]["flow"], out_hw, mode="bilinear")
        cert = interpolate(corresps[1]["certainty"], out_hw, mode="bilinear")
        return flow, cert, low, corresps[1]["flow"], corresps[1]["certainty"]

    @partial(jax.jit, static_argnums=(0, 1))
    def _match_upsample(self, symmetric: bool, variables, im_A, im_B, flow, certainty):
        hs, ws = im_A.shape[1:3]
        sf = math.sqrt(hs * ws / 560.0**2)
        corresps = self.net.apply(
            variables,
            im_A,
            im_B,
            symmetric=symmetric,
            upsample=True,
            flow=flow,
            certainty=certainty,
            scale_factor=sf,
        )
        return corresps[1]["flow"], corresps[1]["certainty"]

    @partial(jax.jit, static_argnums=(0, 1))
    def _assemble(self, symmetric: bool, flow, certainty, low_res_certainty):
        """Final warp assembly (reference matcher.py:891-929)."""
        b, hs, ws, _ = flow.shape
        certainty = certainty - low_res_certainty
        cert = jax.nn.sigmoid(certainty[..., 0])
        wrong = jnp.sum(jnp.abs(flow) > 1, axis=-1) > 0
        cert = jnp.where(wrong, 0.0, cert)
        flow = jnp.clip(flow, -1, 1)
        grid = jnp.broadcast_to(normalized_grid(hs, ws), (b, hs, ws, 2))
        if symmetric:
            a2b, b2a = jnp.split(flow, 2, axis=0)
            q_warp = jnp.concatenate((grid[: b // 2], a2b), axis=-1)
            s_warp = jnp.concatenate((b2a, grid[: b // 2]), axis=-1)
            warp = jnp.concatenate((q_warp, s_warp), axis=2)
            cert = jnp.concatenate(jnp.split(cert, 2, axis=0), axis=2)
        else:
            warp = jnp.concatenate((grid, flow), axis=-1)
        return warp, cert

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #

    def _prep_pair(self, im_A, im_B, hw):
        a = imagenet_normalize(to_array(resize(im_A, hw)))
        b = imagenet_normalize(to_array(resize(im_B, hw)))
        return jnp.asarray(a, self.dtype)[None], jnp.asarray(b, self.dtype)[None]

    def match(
        self,
        im_A_input,
        im_B_input,
        *,
        im_A_high_res=None,
        im_B_high_res=None,
        batched: bool = True,
        gm_logit_bias=None,
    ):
        """Dense two-view match -> (warp, certainty).

        Accepts paths / PIL images (resized on host) or pre-normalized NHWC
        arrays at the model's coarse resolution. Returns warp (B, H, W, 4)
        ((x_A, y_A, x_B, y_B) in [-1,1]; symmetric mode returns the
        side-by-side (B, H, 2W, 4) layout) and certainty (B, H, W[, 2W]).
        """
        symmetric = self.symmetric
        from_pil = isinstance(im_A_input, (str, Path, Image.Image))
        if from_pil:
            pil_A, pil_B = load_image(im_A_input), load_image(im_B_input)
            im_A, im_B = self._prep_pair(pil_A, pil_B, (self.h_resized, self.w_resized))
            unbatch = True
        else:
            im_A = jnp.asarray(im_A_input, self.dtype)
            im_B = jnp.asarray(im_B_input, self.dtype)
            unbatch = im_A.ndim == 3
            if unbatch:
                im_A, im_B = im_A[None], im_B[None]
            assert im_A.shape == im_B.shape, "batched images must share a size"
            assert im_A.shape[-1] == 3, "array inputs must be NHWC RGB"
            # reference matcher.py:544-545: coarse input must divide the
            # DINOv2 patch size
            assert im_A.shape[1] % 14 == 0 and im_A.shape[2] % 14 == 0, (
                "array inputs must have H, W divisible by 14"
            )
        unbatch = unbatch or not batched

        out_hw = self.get_output_resolution()
        flow, cert, low, flow_fine, cert_fine = self._match_coarse(
            symmetric, self.variables, im_A, im_B, out_hw, gm_logit_bias
        )
        if not self.attenuate_cert:
            low = jnp.zeros_like(low)

        if self.upsample_preds:
            if from_pil:
                im_A_u, im_B_u = self._prep_pair(pil_A, pil_B, out_hw)
            elif im_A_high_res is not None:
                im_A_u = jnp.asarray(im_A_high_res, self.dtype)
                im_B_u = jnp.asarray(im_B_high_res, self.dtype)
                if im_A_u.ndim == 3:
                    im_A_u, im_B_u = im_A_u[None], im_B_u[None]
            else:
                # array input without high-res copies: device bicubic upsample
                im_A_u = interpolate(im_A, out_hw, mode="bicubic")
                im_B_u = interpolate(im_B, out_hw, mode="bicubic")
            flow, cert = self._match_upsample(
                symmetric, self.variables, im_A_u, im_B_u, flow_fine, cert_fine
            )

        warp, certainty = self._assemble(symmetric, flow, cert, low)
        if unbatch:
            return warp[0], certainty[0]
        return warp, certainty

    def sample(self, matches, certainty, num: int = 10000, key=None):
        """Balanced sparse sampling (reference matcher.py:552-573).

        ``key``: explicit PRNG key for reproducible sampling — pass one per
        (pair, repeat) in benchmarks so results don't depend on the model
        instance's call history. Default: the instance's stateful key stream
        (matches the reference's global-torch-RNG behavior)."""
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
        return (
            self._to_pixel(coords[..., :2], H_A, W_A),
            self._to_pixel(coords[..., 2:], H_B, W_B),
        )

    def to_normalized_coordinates(self, coords, H_A, W_A, H_B, W_B):
        if isinstance(coords, (list, tuple)):
            k_A, k_B = jnp.asarray(coords[0]), jnp.asarray(coords[1])
        else:
            coords = jnp.asarray(coords)
            k_A, k_B = coords[..., :2], coords[..., 2:]
        k_A = jnp.stack((2 / W_A * k_A[..., 0] - 1, 2 / H_A * k_A[..., 1] - 1), axis=-1)
        k_B = jnp.stack((2 / W_B * k_B[..., 0] - 1, 2 / H_B * k_B[..., 1] - 1), axis=-1)
        return k_A, k_B

    def match_keypoints(
        self, x_A, x_B, warp, certainty, return_tuple=True, return_inds=False,
        max_dist=0.005, cert_th=0,
    ):
        """Warp-based mutual-nearest keypoint matching (matcher.py:732-773).

        x_A, x_B: (N, 2) / (M, 2) normalized keypoints. Returns matched pairs
        (or indices) as numpy arrays — ragged output is host-side by nature.
        """
        x_A = jnp.asarray(x_A)
        x_B = jnp.asarray(x_B)
        warp = jnp.asarray(warp)
        certainty = jnp.asarray(certainty)
        a2b = grid_sample(warp[None, ..., -2:], x_A[None, None])[0, 0]  # (N, 2)
        cert = grid_sample(certainty[None, ..., None], x_A[None, None])[0, 0, :, 0]
        d = jnp.linalg.norm(a2b[:, None] - x_B[None], axis=-1)  # (N, M)
        mnn = (
            (d == d.min(axis=-1, keepdims=True))
            & (d == d.min(axis=-2, keepdims=True))
            & (cert[:, None] > cert_th)
            & (d < max_dist)
        )
        inds_A, inds_B = np.nonzero(np.asarray(mnn))
        if return_tuple:
            if return_inds:
                return inds_A, inds_B
            return np.asarray(x_A)[inds_A], np.asarray(x_B)[inds_B]
        if return_inds:
            return np.concatenate((inds_A, inds_B), axis=-1)
        return np.concatenate((np.asarray(x_A)[inds_A], np.asarray(x_B)[inds_B]), axis=-1)

    def conf_from_fb_consistency(self, flow_forward, flow_backward, th=2):
        """Forward-backward consistency mask (matcher.py:672-699)."""
        ff = jnp.asarray(flow_forward)
        fb = jnp.asarray(flow_backward)
        has_batch = ff.ndim == 4
        if not has_batch:
            ff, fb = ff[None], fb[None]
        h, w = ff.shape[1:3]
        th_n = 2 * th / max(h, w)
        coords = normalized_grid(h, w)
        coords_fb = grid_sample(fb, ff)
        diff = jnp.linalg.norm(coords - coords_fb, axis=-1)
        in_th = (diff < th_n).astype(jnp.float32)
        return in_th if has_batch else in_th[0]

    def visualize_warp(self, warp, certainty, im_A, im_B, symmetric=True, save_path=None):
        """Certainty-weighted cross-warped image pair (matcher.py:936-986)."""
        warp = jnp.asarray(warp)
        h, w2 = warp.shape[0], warp.shape[1]
        w = w2 // 2 if symmetric else w2
        pil_A, pil_B = load_image(im_A), load_image(im_B)
        x_A = jnp.asarray(to_array(pil_A.resize((w, h))))
        x_B = jnp.asarray(to_array(pil_B.resize((w, h))))
        im_A_transfer = grid_sample(x_B[None], warp[None, :, :w, 2:])[0]
        if symmetric:
            im_B_transfer = grid_sample(x_A[None], warp[None, :, w:, :2])[0]
            warp_im = jnp.concatenate((im_A_transfer, im_B_transfer), axis=1)
        else:
            warp_im = im_A_transfer
        cert = jnp.asarray(certainty)[..., None]
        vis = cert * warp_im + (1 - cert) * jnp.ones_like(warp_im)
        if save_path is not None:
            arr = np.asarray(jnp.clip(vis, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(save_path)
        return vis
