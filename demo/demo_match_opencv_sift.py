"""SIFT baseline comparison demo (reference demo/demo_match_opencv_sift.py):
OpenCV SIFT + BF ratio-test matching, drawn side by side.
"""
from __future__ import annotations

import argparse

import cv2
import numpy as np
from PIL import Image

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/sacre_coeur_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/sacre_coeur_B.jpg")
    p.add_argument("--save_path", default="demo_sift_matches.jpg")
    args = p.parse_args()

    img1 = cv2.imread(args.im_A_path, cv2.IMREAD_GRAYSCALE)
    img2 = cv2.imread(args.im_B_path, cv2.IMREAD_GRAYSCALE)
    sift = cv2.SIFT_create()
    kp1, des1 = sift.detectAndCompute(img1, None)
    kp2, des2 = sift.detectAndCompute(img2, None)
    bf = cv2.BFMatcher()
    matches = bf.knnMatch(des1, des2, k=2)
    good = [[m] for m, n in matches if m.distance < 0.75 * n.distance]
    out = cv2.drawMatchesKnn(
        img1, kp1, img2, kp2, good, None,
        flags=cv2.DrawMatchesFlags_NOT_DRAW_SINGLE_POINTS,
    )
    Image.fromarray(out).save(args.save_path)
    print(f"saved {args.save_path} with {len(good)} matches")
