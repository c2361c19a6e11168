"""Mega-1500 pose benchmark using the self-contained native RANSAC library
(the poselib-equivalent path — reference
romatch/benchmarks/megadepth_pose_estimation_benchmark_poselib.py:11-116).

Same protocol as MegaDepthPoseEstimationBenchmark but pose estimation runs in
native/ransac/ransac.cpp instead of OpenCV, with ``num_ransac_iter`` and
``test_every`` knobs mirroring the poselib variant.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image
from tqdm import tqdm

from .. import native
from .mega1500 import MEGA_1500_SCENES
from .pose import compute_pose_error, compute_relative_pose, pose_auc


class Mega1500NativePoseBenchmark:
    def __init__(self, data_root="data/megadepth", scene_names=None,
                 num_ransac_iter: int = 5, test_every: int = 1):
        self.scene_names = scene_names or MEGA_1500_SCENES
        self.scenes = [
            np.load(os.path.join(data_root, s), allow_pickle=True)
            for s in self.scene_names
        ]
        self.data_root = data_root
        self.num_ransac_iter = num_ransac_iter
        self.test_every = test_every

    def benchmark(self, model, model_name=None):
        tot_e_t, tot_e_R, tot_e_pose = [], [], []
        thresholds = [5, 10, 20]
        for scene in self.scenes:
            pairs = scene["pair_infos"]
            intrinsics = scene["intrinsics"]
            poses = scene["poses"]
            im_paths = scene["image_paths"]
            for pairind in tqdm(range(0, len(pairs), self.test_every)):
                idx1, idx2 = pairs[pairind][0]
                K1 = intrinsics[idx1].copy()
                T1 = poses[idx1].copy()
                R1, t1 = T1[:3, :3], T1[:3, 3]
                K2 = intrinsics[idx2].copy()
                T2 = poses[idx2].copy()
                R2, t2 = T2[:3, :3], T2[:3, 3]
                R, t = compute_relative_pose(R1, t1, R2, t2)
                im_A_path = os.path.join(self.data_root, im_paths[idx1])
                im_B_path = os.path.join(self.data_root, im_paths[idx2])
                dense_matches, dense_certainty = model.match(im_A_path, im_B_path)

                w1, h1 = Image.open(im_A_path).size
                w2, h2 = Image.open(im_B_path).size
                scale1 = 1200 / max(w1, h1)
                scale2 = 1200 / max(w2, h2)
                w1, h1 = scale1 * w1, scale1 * h1
                w2, h2 = scale2 * w2, scale2 * h2
                K1[:2] = K1[:2] * scale1
                K2[:2] = K2[:2] * scale2

                for rep in range(self.num_ransac_iter):
                    sparse_matches, _ = model.sample(dense_matches, dense_certainty, 5000)
                    kpts1, kpts2 = model.to_pixel_coordinates(
                        sparse_matches, h1, w1, h2, w2
                    )
                    try:
                        out = native.estimate_relative_pose(
                            np.asarray(kpts1, np.float64),
                            np.asarray(kpts2, np.float64),
                            K1, K2, threshold=0.5, max_iters=10000, seed=rep,
                        )
                        if out is None:
                            raise RuntimeError("pose estimation failed")
                        R_est, t_est, _ = out
                        T1_to_2_est = np.concatenate((R_est, t_est[:, None]), axis=-1)
                        e_t, e_R = compute_pose_error(T1_to_2_est, R, t)
                        e_pose = max(e_t, e_R)
                    except Exception as e:
                        print(repr(e))
                        e_t = e_R = 90
                        e_pose = 90
                    tot_e_t.append(e_t)
                    tot_e_R.append(e_R)
                    tot_e_pose.append(e_pose)
        tot_e_pose = np.array(tot_e_pose)
        auc = pose_auc(tot_e_pose, thresholds)
        return {"auc_5": auc[0], "auc_10": auc[1], "auc_20": auc[2]}
