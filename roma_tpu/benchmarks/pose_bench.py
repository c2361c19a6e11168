"""Shared two-view pose-benchmark engine.

All pose benchmarks (Mega-1500 / Mega-8-scenes, the native-RANSAC variant,
ScanNet-1500) are the same experiment with different pair loaders and pose
estimators:

    pairs -> dense match -> N x { sample, to-pixel, RANSAC, pose error }
          -> pooled AUC@5/10/20 + mAP

This module owns that engine; the per-dataset files only build ``PosePair``
lists and pick an estimator. Protocol constants (intrinsic rescale rules,
5000 samples, 5 repeats, thresholds [5, 10, 20], the 0.5 px threshold
normalized by mean focal length, error=90° on estimator failure) follow the
reference protocol (romatch/benchmarks/megadepth_pose_estimation_benchmark.py:
59-87, scannet_benchmark.py:59-125) so metrics stay comparable.

TPU-native addition (BASELINE config 4): ``match_pairs_batched`` runs the
match phase over B-pair device batches, optionally sharded over an ICI mesh —
the reference matches strictly one pair at a time from paths.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Iterator

import numpy as np

from .pose import compute_pose_error, estimate_pose, pose_auc

THRESHOLDS = (5, 10, 20)


@dataclasses.dataclass
class PosePair:
    """One evaluation pair: image paths + protocol-rescaled geometry."""

    im_A: str
    im_B: str
    K1: np.ndarray          # (3,3), already protocol-rescaled
    K2: np.ndarray
    R: np.ndarray           # GT relative rotation (3,3)
    t: np.ndarray           # GT relative translation (3,)
    hw_A: tuple[float, float]  # protocol-rescaled (h, w) for to-pixel
    hw_B: tuple[float, float]


class PoseErrors:
    """Pooled pose-error accumulator -> AUC/mAP summary."""

    def __init__(self):
        self.e_t: list[float] = []
        self.e_R: list[float] = []
        self.e_pose: list[float] = []

    def add(self, e_t: float, e_R: float):
        self.e_t.append(float(e_t))
        self.e_R.append(float(e_R))
        self.e_pose.append(float(max(e_t, e_R)))

    def summary(self, thresholds=THRESHOLDS) -> dict[str, float]:
        e = np.asarray(self.e_pose)
        auc = pose_auc(e, list(thresholds))
        acc = {th: float((e < th).mean()) for th in (5, 10, 15, 20)}
        return {
            "auc_5": auc[0],
            "auc_10": auc[1],
            "auc_20": auc[2],
            "map_5": acc[5],
            "map_10": float(np.mean([acc[5], acc[10]])),
            "map_20": float(np.mean([acc[5], acc[10], acc[15], acc[20]])),
        }


def cv2_estimator(kpts1, kpts2, K1, K2, rep: int):
    """OpenCV 5-point essential RANSAC (reference utils.py:30-51).

    Threshold: 0.5 px normalized by the mean focal magnitude of both cameras
    (megadepth_pose_estimation_benchmark.py:76-79).
    """
    norm_threshold = 0.5 / (np.mean(np.abs(K1[:2, :2])) + np.mean(np.abs(K2[:2, :2])))
    out = estimate_pose(kpts1, kpts2, K1, K2, norm_threshold, conf=0.99999)
    if out is None:
        raise RuntimeError("essential-matrix estimation failed")
    R_est, t_est, _ = out
    return R_est, t_est.reshape(3)


def native_estimator(kpts1, kpts2, K1, K2, rep: int):
    """Self-contained C++ RANSAC (native/ransac) — the poselib-path
    equivalent (megadepth_pose_estimation_benchmark_poselib.py:78-84)."""
    from .. import native

    out = native.estimate_relative_pose(
        np.asarray(kpts1, np.float64), np.asarray(kpts2, np.float64),
        K1, K2, threshold=0.5, max_iters=10000, seed=rep,
    )
    if out is None:
        raise RuntimeError("native pose estimation failed")
    R_est, t_est, _ = out
    return R_est, t_est.reshape(3)


def evaluate_matched_pair(
    model,
    pair: PosePair,
    warp,
    certainty,
    errors: PoseErrors,
    rng: np.random.Generator,
    estimator: Callable = cv2_estimator,
    repeats: int = 5,
    sample_n: int = 5000,
    pixel_offset: float = 0.0,
    double_final_repeat: bool = False,
    sample_key=None,
):
    """Sample/estimate ``repeats`` times from one pair's dense match.

    ``sample_key``: per-pair PRNG key; the benchmark owns the sampling RNG
    (folded per repeat) so results are reproducible regardless of the model
    instance's call history. ``None`` falls back to the model's stateful
    key stream."""
    import jax

    (h1, w1), (h2, w2) = pair.hw_A, pair.hw_B
    e_t = e_R = 90.0
    for rep in range(repeats):
        k = None if sample_key is None else jax.random.fold_in(sample_key, rep)
        sparse, _ = model.sample(warp, certainty, sample_n, key=k)
        kpts1, kpts2 = model.to_pixel_coordinates(sparse, h1, w1, h2, w2)
        kpts1 = np.asarray(kpts1) - pixel_offset
        kpts2 = np.asarray(kpts2) - pixel_offset
        order = rng.permutation(len(kpts1))
        kpts1, kpts2 = kpts1[order], kpts2[order]
        try:
            R_est, t_est = estimator(kpts1, kpts2, pair.K1, pair.K2, rep)
            T_est = np.concatenate((R_est, t_est[:, None]), axis=-1)
            e_t, e_R = compute_pose_error(T_est, pair.R, pair.t)
        except Exception as exc:  # estimator failure -> protocol max error
            print(repr(exc))
            e_t = e_R = 90.0
        errors.add(e_t, e_R)
    if double_final_repeat:
        # ScanNet protocol quirk: the reference appends the last repeat twice
        # (scannet_benchmark.py:123-125); kept for metric comparability
        errors.add(e_t, e_R)


def match_pairs_single(model, pairs: Iterable[PosePair]) -> Iterator[tuple[PosePair, object, object]]:
    """Reference-exact match phase: one pair at a time from paths."""
    for pair in pairs:
        warp, certainty = model.match(pair.im_A, pair.im_B)
        yield pair, warp, certainty


def match_pairs_batched(
    model, pairs: list[PosePair], batch_size: int, mesh=None
) -> Iterator[tuple[PosePair, object, object]]:
    """Batched match phase via ``serving.MatchEngine``: host preprocessing
    (PIL bicubic + ImageNet normalize, identical to the path mode) prefetches
    ahead of the device, one jitted two-pass match per B-pair batch,
    optionally with the pair batch sharded over the ICI ``mesh`` (GSPMD
    inserts the collectives). Metrics match the single-pair protocol up to
    sampling noise.
    """
    from ..serving import MatchEngine

    engine = MatchEngine(model, batch_size=batch_size, mesh=mesh)
    for pair, result in zip(
        pairs, engine.match_paths((p.im_A, p.im_B) for p in pairs)
    ):
        yield pair, result.warp, result.certainty


def run_pose_benchmark(
    model,
    pairs: list[PosePair],
    estimator: Callable = cv2_estimator,
    repeats: int = 5,
    sample_n: int = 5000,
    pixel_offset: float = 0.0,
    double_final_repeat: bool = False,
    batch_size: int | None = None,
    mesh=None,
    seed: int = 0,
    progress: bool = True,
    return_errors: bool = False,
) -> dict[str, float]:
    """Run the full benchmark; ``batch_size``/``mesh`` enable the batched
    (and ICI-sharded) match phase.

    The benchmark owns all randomness: ``seed`` drives both the keypoint
    permutation and the per-(pair, repeat) sampling keys, so two runs over
    the same model object produce identical match sets (the reference's
    stochastic-eval caveat, README.md:149-152, minus the statefulness)."""
    import jax

    rng = np.random.default_rng(seed)
    root_key = jax.random.PRNGKey(seed)
    errors = PoseErrors()
    matched = (
        match_pairs_batched(model, pairs, batch_size, mesh=mesh)
        if batch_size is not None
        else match_pairs_single(model, pairs)
    )
    if progress:
        from tqdm import tqdm

        matched = tqdm(matched, total=len(pairs))
    for i, (pair, warp, certainty) in enumerate(matched):
        evaluate_matched_pair(
            model, pair, warp, certainty, errors, rng,
            estimator=estimator, repeats=repeats, sample_n=sample_n,
            pixel_offset=pixel_offset, double_final_repeat=double_final_repeat,
            sample_key=jax.random.fold_in(root_key, i),
        )
    if return_errors:
        # diagnostics (e.g. tools/crossimpl_auc.py): the pooled per-repeat
        # max(e_t, e_R) series behind the summary
        return errors.summary(), list(errors.e_pose)
    return errors.summary()
