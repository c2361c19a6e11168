"""Cross-implementation end-to-end AUC equivalence (VERDICT r4 item 1).

The parity chain existed only in pieces (op pins, full-dims flow deltas,
synthetic-geometry benchmark pins). This tool composes it into ONE number
per implementation and compares them: the independently written torch spec
(tests/test_roma_parity.py) and the JAX model, loaded with IDENTICAL
converted random weights and fed an IDENTICAL peaked ``gm_logit_bias``
encoding each synthetic scene's TRUE two-view geometry, are run through the
IDENTICAL downstream pipeline

    match -> balanced sample -> to-pixel -> RANSAC -> pose error -> AUC

(the production engine, ``roma_tpu.benchmarks.pose_bench``). The acceptance
bar is the reference's own: a composed AUC difference > 0.5 pp means a bug
(reference README.md:151; the authoritative regression constants live in
reference tests/test_mega1500.py:17-22).

Why this is meaningful with random weights: the logit-aware bias pins the
coarse classifier's 64^2-way decode to the scene's ground-truth warp
(solved per cell against the model's own captured cls_logits, so the
decoded coarse flow lands <0.1 px from GT — the regime trained weights
operate in; PARITY_FULLRES.json "peaked"), while every other module (VGG
pyramid, DINOv2 ViT-L, GP, transformer decoder, all five refiners, both
certainty paths, the two-pass upsample plumbing, warp assembly, sampling,
RANSAC) still runs with live data-dependent values (refiner FLOW rows
gain-suppressed — see build_impls — because random-init refiners emit
px-scale structured fields that make 0.5 px RANSAC chaotic; trained
refiners correct rather than corrupt). Any composed semantic divergence
between the implementations lands in the AUC; sub-0.1 px numeric deltas
stay covered by the direct flow pins.

Geometry: each scene is a smooth height-field surface observed by two
cameras with a known relative pose. Ground-truth dense warps in BOTH
directions come from exact ray/surface intersection (fixed-point on the ray
parameter), so the symmetric pass's B->A direction is as exact as A->B and
the scene is non-planar (planes are degenerate for essential-matrix
estimation).

Phases (the torch full-dims pass is minutes/pair on this 1-core host, so
results are cached per scene under /tmp):

    python tools/crossimpl_auc.py              # 560->864, 3 scenes, both impls
    python tools/crossimpl_auc.py --golden     # 672->1344 golden config
    python tools/crossimpl_auc.py --bf16       # also score the JAX bf16 path

Writes CROSSIMPL_AUC.json {config: {auc_torch, auc_jax, delta_pp, ...}}.
The slow-tier test (tests/test_crossimpl_auc.py) runs the same machinery.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

# --------------------------------------------------------------------------
# Synthetic two-view scenes: height-field surface + known relative pose.
# --------------------------------------------------------------------------


@dataclasses.dataclass
class Scene:
    """One synthetic evaluation scene (all geometry in camera-A frame)."""

    K1: np.ndarray  # (3,3)
    K2: np.ndarray
    R: np.ndarray   # X_B = R @ X_A + t
    t: np.ndarray
    hw_A: tuple[int, int]
    hw_B: tuple[int, int]
    amp: float      # surface relief amplitude
    phase: float    # surface phase (varies per scene)

    def surface_z(self, x, y):
        """Height field z = f(x, y) in the A frame — smooth, non-planar."""
        return (
            5.0
            + self.amp * np.sin(0.45 * x + self.phase)
            + 0.8 * self.amp * np.cos(0.6 * y - 0.7 * self.phase)
        )


def make_scene(idx: int, hw: tuple[int, int]) -> Scene:
    """``hw`` must be the resolution the benchmark's keypoints live at (the
    upsample resolution) so K matches the to-pixel scale.

    The baseline is ~15% of the scene depth (|t| ~ 0.8 at z ~ 5). The first
    cut of these scenes used a 5% baseline, and the essential-matrix problem
    was measurably ill-conditioned there: the native estimator's pose error
    on a FIXED 5000-match set varied 1.5-73 degrees across RANSAC seeds.
    At 15% the translation direction is strongly observable and the
    estimator's seed spread collapses below 0.1 degrees in the low-noise
    match regime this tool runs in (see run_crossimpl). ~80% of each view
    still maps inside the other; out-of-view targets are cert-zeroed
    identically on both sides."""
    h, w = hw
    f = 0.95 * max(h, w) * (1.0 + 0.05 * (idx % 3))
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float64)
    ay = 0.04 + 0.01 * idx           # yaw
    ax = 0.012 * ((idx % 2) * 2 - 1)  # slight pitch, alternating sign
    cy, sy = np.cos(ay), np.sin(ay)
    cx, sx = np.cos(ax), np.sin(ax)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    R = Rx @ Ry
    t = np.array([0.75 + 0.09 * idx, 0.24, 0.12])
    # relief ~24% of depth: strong non-planarity + parallax kill the
    # rotation/translation near-ambiguity that shallow scenes leave in the
    # estimator (residual 0.1-0.6 deg wander in the weakly-observable
    # direction at the old amp=0.5)
    return Scene(K1=K, K2=K.copy(), R=R, t=t, hw_A=hw, hw_B=hw,
                 amp=1.2, phase=0.9 * idx)


def _raycast(scene: Scene, dirs: np.ndarray, origin: np.ndarray) -> np.ndarray:
    """Intersect rays X = origin + lam * dirs with z = f(x, y).

    Fixed-point on lam: lam <- (f(x, y) - o_z) / d_z. The surface relief
    (|df| <= ~0.5) is small against z ~ 5 and rays are near-axial, so this
    converges geometrically; 25 iterations leave the residual below 1e-9.
    Returns the 3D intersection points, shape of ``dirs``.
    """
    dz = dirs[..., 2]
    lam = (5.0 - origin[2]) / dz
    for _ in range(25):
        x = origin[0] + lam * dirs[..., 0]
        y = origin[1] + lam * dirs[..., 1]
        lam = (scene.surface_z(x, y) - origin[2]) / dz
    return origin + lam[..., None] * dirs


def gt_warp(scene: Scene, pts_norm: np.ndarray, direction: str) -> np.ndarray:
    """Exact warp at normalized points [-1,1]^2 -> normalized target coords.

    direction "AtoB": cast rays from camera A (identity pose), project the
    surface points into B. "BtoA": rays from camera B expressed in the A
    frame (d_A = R^T d_B, origin -R^T t), project into A.
    """
    if direction == "AtoB":
        K_src, K_dst, (h, w) = scene.K1, scene.K2, scene.hw_A
        (hd, wd) = scene.hw_B
    else:
        K_src, K_dst, (h, w) = scene.K2, scene.K1, scene.hw_B
        (hd, wd) = scene.hw_A
    # normalized [-1,1] -> pixel centers (the matcher's convention:
    # x_px = w/2 * (x + 1), i.e. -1+1/w maps to pixel center 0.5)
    px = np.stack(
        (
            (pts_norm[..., 0] + 1) * w / 2,
            (pts_norm[..., 1] + 1) * h / 2,
            np.ones_like(pts_norm[..., 0]),
        ),
        axis=-1,
    )
    rays = px @ np.linalg.inv(K_src).T
    if direction == "AtoB":
        X = _raycast(scene, rays, np.zeros(3))
        Xd = X @ scene.R.T + scene.t
    else:
        origin = -scene.R.T @ scene.t
        X = _raycast(scene, rays @ scene.R, origin)  # d_A = R^T d_B
        Xd = X
    proj = Xd @ K_dst.T
    uv = proj[..., :2] / proj[..., 2:3]
    return np.stack(
        (2 * uv[..., 0] / wd - 1, 2 * uv[..., 1] / hd - 1), axis=-1
    )


def _decode_cls(logits: np.ndarray, cls_res: int) -> np.ndarray:
    """numpy mirror of ops/cls_to_flow.py cls_to_flow_refine (softmax over
    all anchors, argmax + clamped {x±1, y±res} cross, prob-weighted anchor
    mean). logits (..., cls_res^2) -> flow (..., 2)."""
    c = cls_res * cls_res
    anchors1 = np.linspace(-1 + 1 / cls_res, 1 - 1 / cls_res, cls_res)
    a_y, a_x = np.meshgrid(anchors1, anchors1, indexing="ij")
    axy = np.stack((a_x.reshape(-1), a_y.reshape(-1)), -1)  # (C, 2) xy
    z = logits - logits.max(-1, keepdims=True)
    p = np.exp(z, dtype=np.float64)
    p /= p.sum(-1, keepdims=True)
    mode = p.argmax(-1)
    idx = np.stack(
        (mode - 1, mode, mode + 1, mode - cls_res, mode + cls_res), -1
    ).clip(0, c - 1)
    np_ = np.take_along_axis(p, idx, axis=-1)  # (..., 5)
    nxy = axy[idx]                             # (..., 5, 2)
    return (np_[..., None] * nxy).sum(-2) / np_.sum(-1, keepdims=True)


def render_gt_bias(scene: Scene, grid_hw: tuple[int, int], cls_res: int = 64,
                   amp: float = 14.0, sigma_cells: float = 1.0,
                   model_logits: np.ndarray | None = None,
                   verbose: bool = False) -> np.ndarray:
    """GT warp -> (2, H16, W16, cls_res^2) peaked logits for the symmetric
    pass (batch el 0: A->B, el 1: B->A). Anchor coords follow
    cls_to_flow_refine: linspace(-1+1/res, 1-1/res).

    ``model_logits`` (2, gh, gw, cls_res^2): the model's own scale-16
    cls_logits (bias-independent — they are computed before the hook adds
    the bias). When given, the bias is DESIGNED rather than Gaussian:
    bias = T - model_logits, where T places ln-weights on the target cell's
    decode cross ({m, m±1, m±res}) such that the prob-weighted anchor mean
    equals the GT warp exactly. A plain GT-centered Gaussian decodes with
    ~0.2-cell systematic error (the 5-anchor mean is a biased sub-cell
    estimator, and at useful amps the softmax is a near-step function of
    the center — the inverse problem is stiff) plus ~0.1 cell of
    model-logit perturbation, i.e. ~1.5-3 px at 864 — noisy enough to make
    0.5 px-threshold RANSAC chaotic. The designed bias brings the decoded
    coarse flow to <1e-3 px of GT on the torch side, while the jax side
    decodes T + (L_jax - L_torch): any genuine cross-impl divergence in the
    GP/decoder path still lands in the metric. Both implementations receive
    the IDENTICAL bias array.

    Out-of-grid targets clamp to the border anchors (cell offsets clipped
    toward the interior), so ~20% of each view becomes border-pinned
    outliers — identically on both sides, absorbed by RANSAC exactly as the
    old Gaussian construction's out-of-view cells were."""
    gh, gw = grid_hw
    ys, xs = np.meshgrid(
        np.linspace(-1 + 1 / gh, 1 - 1 / gh, gh),
        np.linspace(-1 + 1 / gw, 1 - 1 / gw, gw),
        indexing="ij",
    )
    pts = np.stack((xs, ys), axis=-1)
    anchors = np.linspace(-1 + 1 / cls_res, 1 - 1 / cls_res, cls_res)
    ay, ax = np.meshgrid(anchors, anchors, indexing="ij")
    ax, ay = ax.reshape(-1), ay.reshape(-1)
    sigma = sigma_cells * 2.0 / cls_res
    res = cls_res
    out = np.empty((2, gh, gw, res * res), np.float32)
    for bi, direction in enumerate(("AtoB", "BtoA")):
        wxy = gt_warp(scene, pts, direction)
        if model_logits is None:
            d2 = (wxy[..., 0:1] - ax) ** 2 + (wxy[..., 1:2] - ay) ** 2
            out[bi] = amp * np.exp(-d2 / (2 * sigma * sigma))
            continue
        # --- designed logit field T: decode(T) == wxy exactly ---
        # nearest anchor per axis; sub-cell offsets in cell units
        kx = np.clip(np.round((wxy[..., 0] + 1) * res / 2 - 0.5), 0, res - 1)
        ky = np.clip(np.round((wxy[..., 1] + 1) * res / 2 - 0.5), 0, res - 1)
        dx = (wxy[..., 0] - (-1 + (2 * kx + 1) / res)) * res / 2
        dy = (wxy[..., 1] - (-1 + (2 * ky + 1) / res)) * res / 2
        # clip toward the interior: border cells lose the outward arm
        dx = np.clip(dx, np.where(kx == 0, 0, -0.5),
                     np.where(kx == res - 1, 0, 0.5))
        dy = np.clip(dy, np.where(ky == 0, 0, -0.5),
                     np.where(ky == res - 1, 0, 0.5))
        # project onto the decode's representable set. argmax must stay at
        # the center anchor (w_c >= mu * max arm, mu = e^0.05 margin so
        # cross-impl logit deltas ~1e-3 cannot flip it), which bounds the
        # offset region by mu*|major| + |dx| + |dy| <= 1 per axis — targets
        # near cell CORNERS are unrepresentable by the 5-point cross (an
        # inherent property of the reference decode, reference
        # utils.py:300-322; trained refiners correct it). Euclidean
        # projection: worst case (0.5, 0.5) -> ~(1/3, 1/3), a 0.24-cell
        # (3.2 px at 864) high-frequency error confined to corner loci.
        mu = np.exp(0.05)
        sx, sy = np.sign(dx), np.sign(dy)
        px_, py_ = np.abs(dx), np.abs(dy)
        for _ in range(2):  # two half-space projections + vertex fallback
            viol = (mu + 1) * px_ + py_ - 1
            scale = (mu + 1) ** 2 + 1
            px_ = np.where(viol > 0, px_ - (mu + 1) * viol / scale, px_)
            py_ = np.where(viol > 0, py_ - viol / scale, py_)
            px_, py_ = np.maximum(px_, 0), np.maximum(py_, 0)
            px_, py_ = py_, px_  # swap axes to apply the symmetric constraint
        both = ((mu + 1) * px_ + py_ > 1) & (px_ + (mu + 1) * py_ > 1)
        vtx = 1.0 / (mu + 2)
        px_ = np.where(both, vtx, px_)
        py_ = np.where(both, vtx, py_)
        dx, dy = sx * px_, sy * py_
        m = (ky * res + kx).astype(np.int64)
        w_l, w_r = np.maximum(-dx, 0), np.maximum(dx, 0)
        w_u, w_d = np.maximum(-dy, 0), np.maximum(dy, 0)
        w_c = 1.0 - (w_l + w_r + w_u + w_d)
        T = np.zeros((gh, gw, res * res), np.float64)
        lw = lambda w: amp + np.log(np.maximum(w, 1e-9))
        # center written LAST so it wins border-clip index collisions
        for off, wgt in ((-1, w_l), (1, w_r), (-res, w_u), (res, w_d),
                         (0, w_c)):
            np.put_along_axis(
                T, np.clip(m + off, 0, res * res - 1)[..., None],
                lw(wgt)[..., None], axis=-1,
            )
        out[bi] = T - model_logits[bi].astype(np.float64)
        if verbose:
            dec = _decode_cls(model_logits[bi].astype(np.float64) + out[bi],
                              res)
            inview = (np.abs(wxy) < 1.0).all(-1)
            r = np.abs(dec - wxy).max(-1)[inview].max() * res / 2
            print(f"  bias design [{direction}]: max in-view decode "
                  f"residual {r:.5f} cells", flush=True)
    return out


def scene_images(idx: int, coarse: int, up: int):
    """Deterministic pseudo-image content per scene — identical arrays feed
    both implementations; the geometry lives in the bias, the images only
    drive the data-dependent module numerics."""
    rs = np.random.RandomState(100 + idx)
    mk = lambda r: (rs.randn(1, r, r, 3) * 0.5).astype(np.float32)
    return mk(coarse), mk(coarse), mk(up), mk(up)


# --------------------------------------------------------------------------
# torch-side match pipeline (mirrors reference matcher.py:779-934 semantics)
# --------------------------------------------------------------------------


def torch_match(spec, im_A, im_B, im_A_u, im_B_u, bias):
    """Two-pass symmetric match through the torch spec -> (warp, cert).

    Replicates the reference RegressionMatcher.match pipeline: coarse pass
    with certainty attenuation from the scale-16 logits
    (matcher.py:828-837), upsample pass seeded with the finest coarse
    corresps (matcher.py:852-877), sigmoid + out-of-range zeroing + clamp +
    symmetric side-by-side assembly (matcher.py:891-929). Returns numpy
    (h, 2w, 4) warp and (h, 2w) certainty."""
    import math

    import torch
    import torch.nn.functional as F

    nhwc = lambda a: torch.tensor(a).permute(0, 3, 1, 2)
    coarse = im_A.shape[1]
    up_hw = (im_A_u.shape[1], im_A_u.shape[2])
    sf_c = math.sqrt(coarse * coarse / 560.0**2)
    sf_u = math.sqrt(up_hw[0] * up_hw[1] / 560.0**2)
    with torch.no_grad():
        tc = spec(
            nhwc(im_A), nhwc(im_B), symmetric=True, scale_factor=sf_c,
            gm_logit_bias=torch.tensor(bias).permute(0, 3, 1, 2),
        )
        low = F.interpolate(
            tc[16]["certainty"], size=up_hw, mode="bilinear", align_corners=False
        )
        low = 0.5 * low * (low < 0)
        tu = spec(
            nhwc(im_A_u), nhwc(im_B_u), symmetric=True, upsample=True,
            flow=tc[1]["flow"], certainty=tc[1]["certainty"], scale_factor=sf_u,
        )
        flow, cert = tu[1]["flow"], tu[1]["certainty"]
        cert = torch.sigmoid(cert - low)[:, 0]
        wrong = (flow.abs() > 1).sum(dim=1) > 0
        cert = torch.where(wrong, torch.zeros_like(cert), cert)
        flow = flow.clamp(-1, 1).permute(0, 2, 3, 1)

        import tests.test_roma_parity as trp  # grid_t: the spec's own grid

        h, w = up_hw
        grid = trp.grid_t(h, w)[None]
        a2b, b2a = flow[0:1], flow[1:2]
        q_warp = torch.cat((grid, a2b), dim=-1)
        s_warp = torch.cat((b2a, grid), dim=-1)
        warp = torch.cat((q_warp, s_warp), dim=2)[0]
        certainty = torch.cat((cert[0:1], cert[1:2]), dim=2)[0]
    return warp.numpy(), certainty.numpy()


def torch_capture_cls_logits(spec, im_A, im_B, scale_factor):
    """One symmetric coarse pass with no bias; hook the embedding decoder's
    raw cls_logits (2, C, gh, gw) -> (2, gh, gw, C) numpy.

    The scale-16 cls_logits are computed BEFORE the gm_logit_bias hook adds
    the bias (spec forward: embedding_decoder -> +bias -> cls_to_flow), so
    one unbiased capture is valid for solving the corrected bias. The two
    implementations' logits agree to ~1e-3 (PARITY_FULLRES), so a bias
    solved against the torch capture centers BOTH decoded flows on GT while
    leaving any genuine cross-impl logit divergence in the metric."""
    import torch

    cap = {}
    handle = spec.decoder.embedding_decoder.register_forward_hook(
        lambda m, args, out: cap.__setitem__("logits", out[0].detach())
    )
    try:
        with torch.no_grad():
            nhwc = lambda a: torch.tensor(a).permute(0, 3, 1, 2)
            spec(nhwc(im_A), nhwc(im_B), symmetric=True,
                 scale_factor=scale_factor)
    finally:
        handle.remove()
    return cap["logits"].permute(0, 2, 3, 1).numpy()


# --------------------------------------------------------------------------
# shared downstream: adapter exposing the pose-benchmark model surface over
# precomputed dense matches — IDENTICAL sample/to-pixel code for both sides
# --------------------------------------------------------------------------


class PrecomputedMatcher:
    """match() returns stored (warp, cert) by pair tag; sample and to-pixel
    are the production RegressionMatcher implementations (ops.balanced_sample
    with the benchmark-owned key)."""

    def __init__(self, results: dict, sample_thresh: float = 0.05):
        self.results = results
        self.sample_thresh = sample_thresh

    def match(self, im_A, im_B):
        return self.results[im_A]

    def sample(self, matches, certainty, num=5000, key=None):
        import jax
        import jax.numpy as jnp

        from roma_tpu.ops import balanced_sample

        assert key is not None, "benchmark-owned keys only"
        m = jnp.asarray(matches).reshape(-1, 4)
        c = jnp.asarray(certainty).reshape(-1)
        return balanced_sample(
            key, m, c, num, thresh=self.sample_thresh, mode="threshold_balanced"
        )

    @staticmethod
    def to_pixel_coordinates(coords, H_A, W_A, H_B=None, W_B=None):
        import jax.numpy as jnp

        coords = jnp.asarray(coords)
        tp = lambda c, h, w: jnp.stack(
            (w / 2 * (c[..., 0] + 1), h / 2 * (c[..., 1] + 1)), axis=-1
        )
        return tp(coords[..., :2], H_A, W_A), tp(coords[..., 2:], H_B, W_B)


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def build_impls(seed: int = 0, refiner_flow_gain: float = 1.0):
    """Shared random weights: torch spec + converted JAX variables.

    ``refiner_flow_gain`` scales the FLOW rows (0:2) of every refiner's
    out_conv — the certainty row (2) is untouched. Random-init refiners emit
    smooth spatially-correlated px-scale flow fields; structured noise of
    that size makes essential-matrix RANSAC chaotic (measured: 0.5 px of
    low-frequency field -> pose errors 2-13 deg with multi-degree seed
    spread). Trained refiners CORRECT the coarse flow instead of corrupting
    it, so the gain-suppressed spec is the faithful stand-in for the trained
    regime: every module still runs live and contributes, and a composed
    semantic divergence (layout, BN, assembly, conventions) still shifts
    flows at a detectable scale, while sub-0.1 px numeric deltas stay
    covered by the direct flow pins (tests/test_roma_parity.py)."""
    import torch

    import tests.test_roma_parity as trp

    torch.manual_seed(seed)
    spec = trp.RoMaSpec().eval()
    for m in spec.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    if refiner_flow_gain != 1.0:
        with torch.no_grad():
            for r in spec.decoder.refiners.values():
                r.out_conv.weight[:2] *= refiner_flow_gain
                r.out_conv.bias[:2] *= refiner_flow_gain
    roma_sd, dinov2_sd = trp.spec_state_dicts(spec)
    from roma_tpu.models.zoo import convert

    variables = convert.convert_roma(roma_sd, dinov2_sd)
    return spec, variables


def run_crossimpl(coarse: int, up: int, n_scenes: int = 3, repeats: int = 5,
                  sample_n: int = 5000, bf16: bool = False, amp: float = 60.0,
                  refiner_flow_gain: float = 0.02,
                  cache_dir: str = "/tmp/crossimpl", verbose: bool = True):
    """Run both implementations over the scenes; return the report dict.

    Regime (the knobs exist to make the composed AUC a WELL-CONDITIONED
    function of implementation behavior — measured, not assumed):
      * ``amp`` 60: bias peak vs the ±0.6-logit data-dependent field.
      * logit-aware bias solve (render_gt_bias model_logits): kills the
        ~0.2-cell decoder bias + model-logit jitter, coarse flow lands
        <0.1 px from GT.
      * ``refiner_flow_gain`` 0.02: random-init refiners emit px-scale
        smooth flow fields; 0.5 px of such structured error already makes
        0.5 px-threshold RANSAC chaotic (pose spread 1.5-73 deg across
        seeds on a FIXED match set at the old 5%-baseline scenes).
      * 15%-of-depth baselines (make_scene).
    Result: match error ~0.1 px, pose errors <1 deg, estimator
    seed-stable — so a composed cross-impl divergence >0.2 px moves the
    AUC, and the reference's 0.5 pp reproduction bar is meaningful for a
    15-pair benchmark."""
    import jax
    import jax.numpy as jnp

    from roma_tpu.benchmarks.pose_bench import (
        PosePair,
        native_estimator,
        run_pose_benchmark,
    )
    from roma_tpu.models.roma import RegressionMatcher

    os.makedirs(cache_dir, exist_ok=True)
    say = print if verbose else (lambda *a, **k: None)
    spec, variables = build_impls(refiner_flow_gain=refiner_flow_gain)

    pairs, torch_res, jax_res = [], {}, {}
    match_err = {"torch": [], "jax": []}
    matcher = None
    grid_hw = (coarse // 14, coarse // 14)
    for i in range(n_scenes):
        # geometry lives at the UP resolution: K must match the pixel scale
        # the benchmark converts matches to (hw_A below)
        scene = make_scene(i, (up, up))
        tag = f"scene{i}_{coarse}to{up}_amp{amp:g}_g{refiner_flow_gain:g}_v2"
        pairs.append(
            PosePair(
                im_A=tag, im_B=tag + "_B", K1=scene.K1, K2=scene.K2,
                R=scene.R, t=scene.t, hw_A=(up, up), hw_B=(up, up),
            )
        )
        im_A, im_B, im_A_u, im_B_u = scene_images(i, coarse, up)

        lcache = os.path.join(cache_dir, f"logits_{tag}.npz")
        if os.path.exists(lcache):
            model_logits = np.load(lcache)["logits"]
            say(f"[{tag}] logit capture: cached")
        else:
            t0 = time.time()
            sf_c = (coarse * coarse / 560.0**2) ** 0.5
            model_logits = torch_capture_cls_logits(spec, im_A, im_B, sf_c)
            np.savez(lcache, logits=model_logits)
            say(f"[{tag}] logit capture: {time.time()-t0:.0f}s")
        bias = render_gt_bias(scene, grid_hw, amp=amp,
                              model_logits=model_logits, verbose=verbose)

        cache = os.path.join(cache_dir, f"torch_{tag}.npz")
        if os.path.exists(cache):
            z = np.load(cache)
            torch_res[tag] = (z["warp"], z["cert"])
            say(f"[{tag}] torch: cached")
        else:
            t0 = time.time()
            warp, cert = torch_match(spec, im_A, im_B, im_A_u, im_B_u, bias)
            np.savez(cache, warp=warp, cert=cert)
            torch_res[tag] = (warp, cert)
            say(f"[{tag}] torch: {time.time()-t0:.0f}s")

        jcache = os.path.join(
            cache_dir,
            f"jax_{tag}_{'bf16' if bf16 else 'f32'}_{jax.default_backend()}.npz",
        )
        if os.path.exists(jcache):
            z = np.load(jcache)
            jax_res[tag] = (z["warp"], z["cert"])
            say(f"[{tag}] jax: cached")
        else:
            if matcher is None:
                matcher = RegressionMatcher(
                    variables, h=coarse, w=coarse, upsample_res=(up, up),
                    dtype=jnp.bfloat16 if bf16 else jnp.float32,
                )
            t0 = time.time()
            warp, cert = matcher.match(
                im_A[0], im_B[0], im_A_high_res=im_A_u[0], im_B_high_res=im_B_u[0],
                gm_logit_bias=jnp.asarray(bias),
            )
            jax_res[tag] = (
                np.asarray(warp, np.float32), np.asarray(cert, np.float32)
            )
            np.savez(jcache, warp=jax_res[tag][0], cert=jax_res[tag][1])
            say(f"[{tag}] jax: {time.time()-t0:.0f}s")

        # transparency: dense A->B match error vs exact GT (subsampled grid)
        for name, res in (("torch", torch_res), ("jax", jax_res)):
            w_full = np.asarray(res[tag][0])
            q = w_full[::8, : w_full.shape[1] // 2 : 8]  # (h/8, w/8, 4)
            gt = gt_warp(scene, q[..., :2], "AtoB")
            ok = (np.abs(q[..., 2:]) < 0.999).all(-1) & (np.abs(gt) < 1).all(-1)
            err = np.abs(q[..., 2:] - gt).max(-1)[ok] * up / 2
            match_err[name].append(err)

    kw = dict(estimator=native_estimator, repeats=repeats, sample_n=sample_n,
              seed=0, progress=False, return_errors=True)
    s_torch, e_torch = run_pose_benchmark(PrecomputedMatcher(torch_res), pairs, **kw)
    s_jax, e_jax = run_pose_benchmark(PrecomputedMatcher(jax_res), pairs, **kw)
    report = {
        "config": f"{coarse}->{up} symmetric, {n_scenes} scenes x {repeats} "
        f"repeats x {sample_n} samples, logit-aware bias amp {amp:g}, "
        f"refiner_flow_gain {refiner_flow_gain:g}, native RANSAC, "
        f"jax_dtype={'bf16' if bf16 else 'f32'}, "
        f"jax_backend={jax.default_backend()}",
        "match_err_px": {
            name: {
                "p50": round(float(np.percentile(np.concatenate(v), 50)), 4),
                "p95": round(float(np.percentile(np.concatenate(v), 95)), 4),
                "max": round(float(np.concatenate(v).max()), 3),
            }
            for name, v in match_err.items()
        },
        "auc_torch": {k: round(v, 5) for k, v in s_torch.items()},
        "auc_jax": {k: round(v, 5) for k, v in s_jax.items()},
        "delta_pp": {
            k: round(100 * abs(s_jax[k] - s_torch[k]), 3) for k in s_torch
        },
        "max_delta_pp": round(
            100 * max(abs(s_jax[k] - s_torch[k]) for k in s_torch), 3
        ),
        "pose_errors_deg_torch": [round(e, 3) for e in e_torch],
        "pose_errors_deg_jax": [round(e, 3) for e in e_jax],
    }
    return report


def main():
    golden = "--golden" in sys.argv
    bf16 = "--bf16" in sys.argv
    if "--tpu" not in sys.argv:
        # f32 apples-to-apples vs torch-CPU: run JAX on XLA:CPU (the axon
        # TPU platform lowers f32 matmuls to bf16 passes by default).
        # --tpu (with --bf16) scores the production TPU path instead.
        import jax

        jax.config.update("jax_platforms", "cpu")
    coarse, up = (672, 1344) if golden else (560, 864)
    report = run_crossimpl(coarse, up, bf16=bf16)
    out = os.path.join(ROOT, "CROSSIMPL_AUC.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    key = f"{coarse}to{up}" + ("_bf16" if bf16 else "")
    existing[key] = report
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(report, indent=1))
    ok = report["max_delta_pp"] <= 0.5
    print(f"max |AUC delta| = {report['max_delta_pp']} pp -> "
          f"{'WITHIN' if ok else 'EXCEEDS'} the reference 0.5 pp tolerance")


if __name__ == "__main__":
    main()
