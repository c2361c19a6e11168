"""Robust multi-scale losses for big RoMa (reference
romatch/losses/robust_loss.py:10-161).

Per scale (iterating coarse -> fine so the previous scale's EPE can gate the
finer scale's supervision):
  * coarse (16): cross-entropy of the 64x64 anchor classification to the
    nearest anchor of the GT warp, masked to prob > 0.99, plus certainty BCE;
  * finer scales: generalized Charbonnier regression ``cs^a ((x/cs)^2+1)^(a/2)``
    on the EPE, masked, plus certainty BCE;
  * local gating: for scales <= local_largest_scale, supervision is disabled
    where the previous scale's EPE exceeded ``2/512 * local_dist[scale]*scale``.

Pure function returning (total_loss, metrics) — no global step state, no
logger coupling (the reference logs to wandb inside the loss; here the caller
logs the returned metrics).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops import interpolate, normalized_grid
from .gt_warp import get_gt_warp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over mask; 0 when the mask is empty (reference guards with
    `if not torch.any(...)`)."""
    m = mask.astype(jnp.float32)
    total = jnp.sum(m)
    return jnp.where(total > 0, jnp.sum(x * m) / jnp.maximum(total, 1.0), 0.0)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    z = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.mean(jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z))))


@dataclasses.dataclass(frozen=True)
class RobustLosses:
    """Loss configuration (defaults from experiments/train_roma_outdoor.py:214-220)."""

    ce_weight: float = 0.01
    local_dist: tuple[tuple[int, float], ...] = ((1, 4.0), (2, 4.0), (4, 8.0), (8, 8.0))
    local_largest_scale: int = 8
    depth_interpolation_mode: str = "bilinear"
    relative_depth_error_threshold: float = 0.05
    alpha: float = 0.5
    c: float = 1e-4

    def gm_cls_loss(self, x2, prob, cls_logits, certainty):
        """Coarse anchor classification loss (robust_loss.py:43-61)."""
        b, h, w, c = cls_logits.shape
        res = round(math.sqrt(c))
        anchors = normalized_grid(res, res).reshape(c, 2)
        # nearest anchor to the GT warp per pixel
        d2 = jnp.sum(
            (anchors[None, None, None] - x2[..., None, :]) ** 2, axis=-1
        )  # (B, H, W, C)
        gt = jnp.argmin(d2, axis=-1)
        gt = jax.lax.stop_gradient(gt)
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]
        cls_loss = masked_mean(ce, prob > 0.99)
        certainty_loss = bce_with_logits(certainty[..., 0], prob)
        return cls_loss, certainty_loss

    def regression_loss(self, x2, prob, flow, certainty, scale):
        """Generalized Charbonnier EPE loss (robust_loss.py:82-100)."""
        epe = jnp.linalg.norm(flow.astype(jnp.float32) - x2, axis=-1)
        ce_loss = bce_with_logits(certainty[..., 0], prob)
        a = self.alpha
        cs = self.c * scale
        reg = cs**a * ((epe / cs) ** 2 + 1.0) ** (a / 2)
        reg_loss = masked_mean(reg, prob > 0.99)
        return reg_loss, ce_loss, epe

    def __call__(self, corresps: dict, batch: dict):
        """corresps: {scale: {...}} NHWC; batch: im_A_depth/im_B_depth (B,H,W),
        T_1to2 (B,4,4), K1/K2 (B,3,3). Returns (loss, metrics)."""
        local_dist = dict(self.local_dist)
        scales = sorted(corresps.keys(), reverse=True)
        tot = 0.0
        metrics: dict[str, jnp.ndarray] = {}
        prev_epe = None
        for scale in scales:
            sc = corresps[scale]
            flow = sc["flow"]
            certainty = sc["certainty"]
            b, h, w, _ = flow.shape
            x2, prob = get_gt_warp(
                batch["im_A_depth"],
                batch["im_B_depth"],
                batch["T_1to2"],
                batch["K1"],
                batch["K2"],
                depth_interpolation_mode=self.depth_interpolation_mode,
                relative_depth_error_threshold=self.relative_depth_error_threshold,
                H=h,
                W=w,
            )
            x2 = jax.lax.stop_gradient(x2)
            prob = jax.lax.stop_gradient(prob)

            if self.local_largest_scale >= scale and prev_epe is not None:
                gate = (
                    interpolate(prev_epe[..., None], (h, w), mode="nearest-exact")[..., 0]
                    < (2 / 512) * (local_dist[scale] * scale)
                )
                prob = prob * gate.astype(prob.dtype)

            if "gm_cls" in sc:
                cls_loss, cert_loss = self.gm_cls_loss(
                    x2, prob, sc["gm_cls"], sc["gm_certainty"]
                )
                metrics[f"gm_cls_loss_{scale}"] = cls_loss
                metrics[f"gm_certainty_loss_{scale}"] = cert_loss
                tot = tot + self.ce_weight * cert_loss + cls_loss

            reg_loss, cert_loss, epe = self.regression_loss(
                x2, prob, flow, certainty, scale
            )
            metrics[f"delta_regression_loss_{scale}"] = reg_loss
            metrics[f"delta_certainty_loss_{scale}"] = cert_loss
            if scale == 1:
                metrics["train_pck_05"] = masked_mean(
                    (epe < 0.5 * (2 / 512)).astype(jnp.float32), prob > 0.99
                )
            tot = tot + self.ce_weight * cert_loss + reg_loss
            prev_epe = jax.lax.stop_gradient(epe)
        metrics["total_loss"] = tot
        return tot, metrics
