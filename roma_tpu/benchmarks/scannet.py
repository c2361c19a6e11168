"""ScanNet-1500 pose benchmark (reference
romatch/benchmarks/scannet_benchmark.py:9-143): test.npz pairs, min-dim-480
intrinsic rescale, 0.5 px offset convention, 5 RANSAC repeats -> AUC/mAP.
"""
from __future__ import annotations

import os.path as osp

import numpy as np
from PIL import Image
from tqdm import tqdm

from .pose import compute_pose_error, estimate_pose, pose_auc


class ScanNetBenchmark:
    def __init__(self, data_root="data/scannet"):
        self.data_root = data_root

    def benchmark(self, model, model_name=None):
        tmp = np.load(osp.join(self.data_root, "test.npz"))
        pairs, rel_pose = tmp["name"], tmp["rel_pose"]
        tot_e_t, tot_e_R, tot_e_pose = [], [], []
        pair_inds = np.random.choice(range(len(pairs)), size=len(pairs), replace=False)
        for pairind in tqdm(pair_inds, smoothing=0.9):
            scene = pairs[pairind]
            scene_name = f"scene0{scene[0]}_00"
            im_A_path = osp.join(
                self.data_root, "scans_test", scene_name, "color", f"{scene[2]}.jpg"
            )
            im_B_path = osp.join(
                self.data_root, "scans_test", scene_name, "color", f"{scene[3]}.jpg"
            )
            T_gt = rel_pose[pairind].reshape(3, 4)
            R, t = T_gt[:3, :3], T_gt[:3, 3]
            K = np.stack(
                [
                    np.array([float(i) for i in r.split()])
                    for r in open(
                        osp.join(
                            self.data_root, "scans_test", scene_name,
                            "intrinsic", "intrinsic_color.txt",
                        )
                    )
                    .read()
                    .split("\n")
                    if r
                ]
            )
            w1, h1 = Image.open(im_A_path).size
            w2, h2 = Image.open(im_B_path).size
            dense_matches, dense_certainty = model.match(im_A_path, im_B_path)
            sparse_matches, _ = model.sample(dense_matches, dense_certainty, 5000)
            sparse_matches = np.asarray(sparse_matches)

            scale1 = 480 / min(w1, h1)
            scale2 = 480 / min(w2, h2)
            w1, h1 = scale1 * w1, scale1 * h1
            w2, h2 = scale2 * w2, scale2 * h2
            K1 = K.copy() * scale1
            K2 = K.copy() * scale2

            offset = 0.5
            kpts1 = np.stack(
                (
                    w1 * (sparse_matches[:, 0] + 1) / 2 - offset,
                    h1 * (sparse_matches[:, 1] + 1) / 2 - offset,
                ),
                axis=-1,
            )
            kpts2 = np.stack(
                (
                    w2 * (sparse_matches[:, 2] + 1) / 2 - offset,
                    h2 * (sparse_matches[:, 3] + 1) / 2 - offset,
                ),
                axis=-1,
            )
            for _ in range(5):
                shuffling = np.random.permutation(len(kpts1))
                kpts1, kpts2 = kpts1[shuffling], kpts2[shuffling]
                try:
                    norm_threshold = 0.5 / (
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
            # reference appends the final repeat once more (scannet_benchmark.py:123-125)
            tot_e_t.append(e_t)
            tot_e_R.append(e_R)
            tot_e_pose.append(e_pose)
        tot_e_pose = np.array(tot_e_pose)
        thresholds = [5, 10, 20]
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
