"""Evaluate Tiny RoMa v1 on Mega-1500 + Mega-8-scenes
(reference experiments/eval_tiny_roma_v1_outdoor.py:73-83)."""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(args):
    from roma_tpu.benchmarks import MEGA_8_SCENES, MegaDepthPoseEstimationBenchmark
    from roma_tpu.models.zoo import tiny_roma_v1_outdoor

    model = tiny_roma_v1_outdoor(
        weights=args.weights, xfeat_weights=args.xfeat_weights
    )
    results = {}
    results["mega1500"] = MegaDepthPoseEstimationBenchmark(args.data_root).benchmark(
        model, model_name="tiny_roma_v1_outdoor"
    )
    if args.mega_8_scenes:
        results["mega_8_scenes"] = MegaDepthPoseEstimationBenchmark(
            args.data_root, scene_names=MEGA_8_SCENES
        ).benchmark(model, model_name="tiny_roma_v1_outdoor")
    os.makedirs("results", exist_ok=True)
    with open("results/eval_tiny_roma_v1_outdoor.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default=None)
    p.add_argument("--xfeat_weights", default=None)
    p.add_argument("--data_root", default="data/megadepth")
    p.add_argument("--mega_8_scenes", action="store_true")
    run(p.parse_args())
