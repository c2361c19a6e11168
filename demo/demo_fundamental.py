"""Fundamental-matrix estimation demo (reference demo/demo_fundamental.py):
match -> sample -> to pixel coords -> cv2.findFundamentalMat (MAGSAC).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np
from PIL import Image

from roma_tpu.models.zoo import roma_outdoor

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/sacre_coeur_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/sacre_coeur_B.jpg")
    p.add_argument("--weights", default=None)
    p.add_argument("--dinov2_weights", default=None)
    args = p.parse_args()

    model = roma_outdoor(weights=args.weights, dinov2_weights=args.dinov2_weights)
    w_A, h_A = Image.open(args.im_A_path).size
    w_B, h_B = Image.open(args.im_B_path).size
    warp, certainty = model.match(args.im_A_path, args.im_B_path)
    matches, certainty = model.sample(warp, certainty)
    kpts1, kpts2 = model.to_pixel_coordinates(matches, h_A, w_A, h_B, w_B)
    F, mask = cv2.findFundamentalMat(
        np.asarray(kpts1), np.asarray(kpts2),
        ransacReprojThreshold=0.2, method=cv2.USAC_MAGSAC,
        confidence=0.999999, maxIters=10000,
    )
    print("F =\n", F)
    print("inliers:", int(mask.sum()), "/", len(mask))
