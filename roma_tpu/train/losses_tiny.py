"""Tiny RoMa training losses (reference romatch/losses/robust_loss_tiny_roma.py).

Two terms:
  * ``corr_volume_loss``: bidirectional InfoNCE-style NLL (log_softmax over
    both axes of the global correlation volume, inv_temp=10) on
    mutual-nearest GT cells computed from forward/backward GT warps
    (robust_loss_tiny_roma.py:50-61, 129-152). The ragged index selection of
    the reference becomes a dense mask (same mean).
  * regression loss with optional ``epe_mask_prob_th`` certainty gating and
    ``cert_only_on_consistent_depth`` masking (robust_loss_tiny_roma.py:64-92).

NOTE on index order: the reference indexes the NLL volume as
``nll[b, i_A, j_B]`` while the volume's axis 1 is B-pixels — we reproduce
that exact indexing for parity (see comment at the call site).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import batched_grid
from .gt_warp import get_gt_warp
from .losses import masked_mean


def bce_with_logits_masked(logits, targets, mask=None):
    z = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    elem = jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
    if mask is None:
        return jnp.mean(elem)
    return masked_mean(elem, mask)


def mutual_nearest_mask(gt_warp, gt_warp_back, grid, thresh: float = 0.01):
    """(B, N_A, N_B) mask of mutually-nearest GT cell pairs.

    gt_warp: (B, N_A, 2) A-pixels mapped into B coords; gt_warp_back:
    (B, N_B, 2) B-pixels mapped into A coords; grid: (N, 2) cell centers.
    """
    d_b = jnp.linalg.norm(gt_warp[:, :, None] - grid[None, None], axis=-1)  # (B,NA,NB)
    d_a = jnp.linalg.norm(grid[None, :, None] - gt_warp_back[:, None], axis=-1)
    mnn = (
        (d_b == jnp.min(d_b, axis=-1, keepdims=True))
        & (d_a == jnp.min(d_a, axis=-2, keepdims=True))
        & (d_b < thresh)
        & (d_a < thresh)
    )
    return mnn


@dataclasses.dataclass(frozen=True)
class TinyRobustLosses:
    ce_weight: float = 0.01
    local_dist: tuple[tuple[int, float], ...] = ()
    depth_interpolation_mode: str = "bilinear"
    relative_depth_error_threshold: float = 0.05
    alpha: float = 0.5
    c: float = 1e-4
    epe_mask_prob_th: float | None = None
    cert_only_on_consistent_depth: bool = False
    inv_temp: float = 10.0

    def corr_volume_loss(self, mnn_mask, cvt):
        """cvt: (B, N_A, N_B) query-major correlation (models/tiny.py layout).

        The reference's ``nll[b, i_A, j_B]`` on its (B, N_B, N_A) volume
        corresponds to ``nll_t[b, j_B, i_A]`` here; with the dense-mask
        formulation that is a transpose of the mask.
        """
        z = self.inv_temp * cvt.astype(jnp.float32)
        nll = -jax.nn.log_softmax(z, axis=-1) - jax.nn.log_softmax(z, axis=-2)
        # reference indexing quirk: mask indexed as [b, i_A, j_B] against the
        # (B, N_B, N_A) volume == transpose the mask against ours.
        mask = jnp.swapaxes(mnn_mask, -1, -2)
        return masked_mean(nll, mask)

    def regression_loss(self, x2, prob, flow, certainty, scale):
        epe = jnp.linalg.norm(flow.astype(jnp.float32) - x2, axis=-1)
        local_dist = dict(self.local_dist)
        if scale in local_dist:
            prob = prob * (epe < (2 / 512) * (local_dist[scale] * scale)).astype(prob.dtype)
        if self.epe_mask_prob_th is not None:
            gt_cert = prob * (epe < scale * self.epe_mask_prob_th).astype(prob.dtype)
        else:
            gt_cert = prob
        if self.cert_only_on_consistent_depth:
            ce_loss = bce_with_logits_masked(certainty[..., 0], gt_cert, prob > 0)
        else:
            ce_loss = bce_with_logits_masked(certainty[..., 0], gt_cert)
        cs = self.c * scale
        reg = cs**self.alpha * ((epe / cs) ** 2 + 1.0) ** (self.alpha / 2)
        reg_loss = masked_mean(reg, prob > 0.99)
        pck_05 = masked_mean((epe < 0.5 * (2 / 512)).astype(jnp.float32), prob > 0.99)
        return reg_loss, ce_loss, pck_05

    def __call__(self, corresps: dict, batch: dict):
        tot = 0.0
        metrics: dict[str, jnp.ndarray] = {}
        for scale in sorted(corresps.keys(), reverse=True):
            sc = corresps[scale]
            flow, certainty = sc["flow"], sc["certainty"]
            b, h, w, _ = flow.shape
            x2, prob = get_gt_warp(
                batch["im_A_depth"], batch["im_B_depth"], batch["T_1to2"],
                batch["K1"], batch["K2"],
                depth_interpolation_mode=self.depth_interpolation_mode,
                relative_depth_error_threshold=self.relative_depth_error_threshold,
                H=h, W=w,
            )
            x2 = jax.lax.stop_gradient(x2)
            prob = jax.lax.stop_gradient(prob)

            if "corr_volume" in sc:
                t_inv = jnp.linalg.inv(batch["T_1to2"].astype(jnp.float32))
                x2_back, _ = get_gt_warp(
                    batch["im_B_depth"], batch["im_A_depth"], t_inv,
                    batch["K2"], batch["K1"],
                    depth_interpolation_mode=self.depth_interpolation_mode,
                    relative_depth_error_threshold=self.relative_depth_error_threshold,
                    H=h, W=w,
                )
                grid = batched_grid(1, h, w)[0].reshape(h * w, 2)
                mnn = mutual_nearest_mask(
                    x2.reshape(b, h * w, 2),
                    jax.lax.stop_gradient(x2_back).reshape(b, h * w, 2),
                    grid,
                )
                cv_loss = self.corr_volume_loss(jax.lax.stop_gradient(mnn), sc["corr_volume"])
                metrics[f"gm_corr_volume_loss_{scale}"] = cv_loss
                tot = tot + cv_loss

            reg_loss, ce_loss, pck = self.regression_loss(x2, prob, flow, certainty, scale)
            metrics[f"delta_regression_loss_{scale}"] = reg_loss
            metrics[f"delta_certainty_loss_{scale}"] = ce_loss
            if scale == 1:
                metrics["train_pck_05"] = pck
            tot = tot + self.ce_weight * ce_loss + reg_loss
        metrics["total_loss"] = tot
        return tot, metrics
