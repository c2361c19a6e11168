"""Tiny RoMa bidirectional match demo (reference demo/demo_match_tiny.py).

Runs A->B and B->A matches and saves certainty-weighted warp visualizations.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roma_tpu.models.zoo import tiny_roma_v1_outdoor

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/sacre_coeur_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/sacre_coeur_B.jpg")
    p.add_argument("--save_A_path", default="demo_tiny_warp_AtoB.jpg")
    p.add_argument("--save_B_path", default="demo_tiny_warp_BtoA.jpg")
    p.add_argument("--weights", default=None)
    p.add_argument("--xfeat_weights", default=None)
    args = p.parse_args()

    model = tiny_roma_v1_outdoor(weights=args.weights, xfeat_weights=args.xfeat_weights)
    warp_ab, cert_ab = model.match(args.im_A_path, args.im_B_path)
    model.visualize_warp(warp_ab, cert_ab, args.im_A_path, args.im_B_path,
                         save_path=args.save_A_path)
    warp_ba, cert_ba = model.match(args.im_B_path, args.im_A_path)
    model.visualize_warp(warp_ba, cert_ba, args.im_B_path, args.im_A_path,
                         save_path=args.save_B_path)
    print("saved", args.save_A_path, args.save_B_path)
