"""Warp + certainty visualization demo (reference demo/demo_match.py).

Usage: python demo/demo_match.py --im_A_path assets/sacre_coeur_A.jpg \
           --im_B_path assets/sacre_coeur_B.jpg --save_path demo/roma_warp.jpg
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roma_tpu.models.zoo import roma_outdoor

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--im_A_path", default="/root/reference/assets/sacre_coeur_A.jpg")
    parser.add_argument("--im_B_path", default="/root/reference/assets/sacre_coeur_B.jpg")
    parser.add_argument("--save_path", default="demo_warp.jpg")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--dinov2_weights", default=None)
    args = parser.parse_args()

    model = roma_outdoor(weights=args.weights, dinov2_weights=args.dinov2_weights)
    warp, certainty = model.match(args.im_A_path, args.im_B_path)
    model.visualize_warp(warp, certainty, args.im_A_path, args.im_B_path,
                         save_path=args.save_path)
    print("saved", args.save_path)
