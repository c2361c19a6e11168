"""MegaDepth-1500 / Mega-8-scenes pose-estimation benchmark
(reference romatch/benchmarks/megadepth_pose_estimation_benchmark.py:7-116).

Per pair: dense match -> 5x {sample 5k, to pixel coords (intrinsics rescaled
to max-dim 1200), essential-matrix RANSAC, pose error} -> AUC@5/10/20 + mAP.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image
from tqdm import tqdm

from .pose import compute_pose_error, compute_relative_pose, estimate_pose, pose_auc

MEGA_1500_SCENES = [
    "0015_0.1_0.3.npz",
    "0015_0.3_0.5.npz",
    "0022_0.1_0.3.npz",
    "0022_0.3_0.5.npz",
    "0022_0.5_0.7.npz",
]

MEGA_8_SCENES = [
    "mega_8_scenes_0008_0.1_0.3.npz",
    "mega_8_scenes_0008_0.3_0.5.npz",
    "mega_8_scenes_0019_0.1_0.3.npz",
    "mega_8_scenes_0019_0.3_0.5.npz",
    "mega_8_scenes_0021_0.1_0.3.npz",
    "mega_8_scenes_0021_0.3_0.5.npz",
    "mega_8_scenes_0024_0.1_0.3.npz",
    "mega_8_scenes_0024_0.3_0.5.npz",
    "mega_8_scenes_0025_0.1_0.3.npz",
    "mega_8_scenes_0025_0.3_0.5.npz",
    "mega_8_scenes_0032_0.1_0.3.npz",
    "mega_8_scenes_0032_0.3_0.5.npz",
    "mega_8_scenes_1589_0.1_0.3.npz",
    "mega_8_scenes_1589_0.3_0.5.npz",
    "mega_8_scenes_0063_0.1_0.3.npz",
    "mega_8_scenes_0063_0.3_0.5.npz",
]


class MegaDepthPoseEstimationBenchmark:
    def __init__(self, data_root="data/megadepth", scene_names=None):
        self.scene_names = scene_names or MEGA_1500_SCENES
        self.scenes = [
            np.load(os.path.join(data_root, s), allow_pickle=True)
            for s in self.scene_names
        ]
        self.data_root = data_root

    def benchmark(self, model, model_name=None, num_ransac_runs: int = 5):
        tot_e_t, tot_e_R, tot_e_pose = [], [], []
        thresholds = [5, 10, 20]
        for scene in self.scenes:
            pairs = scene["pair_infos"]
            intrinsics = scene["intrinsics"]
            poses = scene["poses"]
            im_paths = scene["image_paths"]
            for pairind in (pbar := tqdm(range(len(pairs)), desc="Current AUC: ?")):
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
                # DKM/RoMa convention: rescale intrinsics to max-dim 1200
                scale1 = 1200 / max(w1, h1)
                scale2 = 1200 / max(w2, h2)
                w1, h1 = scale1 * w1, scale1 * h1
                w2, h2 = scale2 * w2, scale2 * h2
                K1 = K1.copy()
                K2 = K2.copy()
                K1[:2] = K1[:2] * scale1
                K2[:2] = K2[:2] * scale2

                for _ in range(num_ransac_runs):
                    sparse_matches, _ = model.sample(dense_matches, dense_certainty, 5000)
                    kpts1, kpts2 = model.to_pixel_coordinates(sparse_matches, h1, w1, h2, w2)
                    kpts1 = np.asarray(kpts1)
                    kpts2 = np.asarray(kpts2)
                    shuffling = np.random.permutation(len(kpts1))
                    kpts1, kpts2 = kpts1[shuffling], kpts2[shuffling]
                    try:
                        threshold = 0.5
                        norm_threshold = threshold / (
                            np.mean(np.abs(K1[:2, :2])) + np.mean(np.abs(K2[:2, :2]))
                        )
                        R_est, t_est, mask = estimate_pose(
                            kpts1, kpts2, K1, K2, norm_threshold, conf=0.99999
                        )
                        T1_to_2_est = np.concatenate((R_est, t_est), axis=-1)
                        e_t, e_R = compute_pose_error(T1_to_2_est, R, t)
                        e_pose = max(e_t, e_R)
                    except Exception as e:
                        print(repr(e))
                        e_t, e_R = 90, 90
                        e_pose = max(e_t, e_R)
                    tot_e_t.append(e_t)
                    tot_e_R.append(e_R)
                    tot_e_pose.append(e_pose)
                pbar.set_description(f"Current AUC: {pose_auc(tot_e_pose, thresholds)}")

        tot_e_pose = np.array(tot_e_pose)
        auc = pose_auc(tot_e_pose, thresholds)
        acc_5 = (tot_e_pose < 5).mean()
        acc_10 = (tot_e_pose < 10).mean()
        acc_15 = (tot_e_pose < 15).mean()
        acc_20 = (tot_e_pose < 20).mean()
        return {
            "auc_5": auc[0],
            "auc_10": auc[1],
            "auc_20": auc[2],
            "map_5": acc_5,
            "map_10": np.mean([acc_5, acc_10]),
            "map_20": np.mean([acc_5, acc_10, acc_15, acc_20]),
        }
