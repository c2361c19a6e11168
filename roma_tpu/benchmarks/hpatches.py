"""HPatches homography benchmark (reference
romatch/benchmarks/hpatches_sequences_homog_benchmark.py:11-113):
match -> sample -> cv2.findHomography RANSAC -> corner-warp error AUC@3/5/10.
"""
from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image
from tqdm import tqdm

from .pose import pose_auc

IGNORE_SEQS = {
    "i_contruction",
    "i_crownnight",
    "i_dc",
    "i_pencils",
    "i_whitebuilding",
    "v_artisans",
    "v_astronautis",
    "v_talent",
}


class HpatchesHomogBenchmark:
    """HPatches grid goes from [0, n-1] instead of [0.5, n-0.5]."""

    def __init__(self, dataset_path):
        self.seqs_path = os.path.join(dataset_path, "hpatches-sequences-release")
        self.seq_names = sorted(os.listdir(self.seqs_path))
        self.ignore_seqs = IGNORE_SEQS

    def convert_coordinates(self, im_A_coords, im_A_to_im_B, wq, hq, wsup, hsup):
        offset = 0.5  # HPatches top-left pixel center is [0,0]
        im_A_coords = (
            np.stack(
                (wq * (im_A_coords[..., 0] + 1) / 2, hq * (im_A_coords[..., 1] + 1) / 2),
                axis=-1,
            )
            - offset
        )
        im_A_to_im_B = (
            np.stack(
                (
                    wsup * (im_A_to_im_B[..., 0] + 1) / 2,
                    hsup * (im_A_to_im_B[..., 1] + 1) / 2,
                ),
                axis=-1,
            )
            - offset
        )
        return im_A_coords, im_A_to_im_B

    def benchmark(self, model, model_name=None):
        homog_dists = []
        for seq_name in tqdm(self.seq_names):
            if seq_name in self.ignore_seqs:
                continue
            im_A_path = os.path.join(self.seqs_path, seq_name, "1.ppm")
            w1, h1 = Image.open(im_A_path).size
            for im_idx in range(2, 7):
                im_B_path = os.path.join(self.seqs_path, seq_name, f"{im_idx}.ppm")
                w2, h2 = Image.open(im_B_path).size
                H = np.loadtxt(os.path.join(self.seqs_path, seq_name, f"H_1_{im_idx}"))
                dense_matches, dense_certainty = model.match(im_A_path, im_B_path)
                good_matches, _ = model.sample(dense_matches, dense_certainty, 5000)
                good_matches = np.asarray(good_matches)
                pos_a, pos_b = self.convert_coordinates(
                    good_matches[:, :2], good_matches[:, 2:], w1, h1, w2, h2
                )
                try:
                    H_pred, inliers = cv2.findHomography(
                        pos_a,
                        pos_b,
                        method=cv2.RANSAC,
                        confidence=0.99999,
                        ransacReprojThreshold=3 * min(w2, h2) / 480,
                    )
                except Exception:
                    H_pred = None
                if H_pred is None:
                    H_pred = np.zeros((3, 3))
                    H_pred[2, 2] = 1.0
                corners = np.array(
                    [[0, 0, 1], [0, h1 - 1, 1], [w1 - 1, 0, 1], [w1 - 1, h1 - 1, 1]]
                )
                real_warped = corners @ H.T
                real_warped = real_warped[:, :2] / real_warped[:, 2:]
                warped = corners @ H_pred.T
                warped = warped[:, :2] / warped[:, 2:]
                mean_dist = np.mean(np.linalg.norm(real_warped - warped, axis=1)) / (
                    min(w2, h2) / 480.0
                )
                homog_dists.append(mean_dist)
        thresholds = list(range(1, 11))
        auc = pose_auc(np.array(homog_dists), thresholds)
        return {
            "hpatches_homog_auc_3": auc[2],
            "hpatches_homog_auc_5": auc[4],
            "hpatches_homog_auc_10": auc[9],
        }
