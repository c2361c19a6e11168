"""Evaluate big RoMa (reference experiments/eval_roma_outdoor.py:50-56):
Mega-1500 (+ optionally Mega-8-scenes) at coarse 672 / upsample 1344.

Usage: python experiments/eval_roma_outdoor.py --weights roma_outdoor.pth \
           --dinov2_weights dinov2_vitl14_pretrain.pth --data_root data/megadepth
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(args):
    from roma_tpu.benchmarks import MEGA_8_SCENES, MegaDepthPoseEstimationBenchmark
    from roma_tpu.models.zoo import roma_outdoor

    model = roma_outdoor(
        weights=args.weights,
        dinov2_weights=args.dinov2_weights,
        coarse_res=args.coarse_res,
        upsample_res=args.upsample_res,
        amp=args.bf16,
        vit_int8=args.vit_int8,
        refiner_int8=args.refiner_int8,
        vit_gelu_tanh=args.vit_gelu_tanh,
    )
    results = {}
    bench = MegaDepthPoseEstimationBenchmark(args.data_root)
    results["mega1500"] = bench.benchmark(model, model_name="roma_outdoor")
    if args.mega_8_scenes:
        bench8 = MegaDepthPoseEstimationBenchmark(args.data_root, scene_names=MEGA_8_SCENES)
        results["mega_8_scenes"] = bench8.benchmark(model, model_name="roma_outdoor")
    os.makedirs("results", exist_ok=True)
    with open("results/eval_roma_outdoor.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default=None)
    p.add_argument("--dinov2_weights", default=None)
    p.add_argument("--data_root", default="data/megadepth")
    p.add_argument("--coarse_res", type=int, default=672)
    p.add_argument("--upsample_res", type=int, default=1344)
    p.add_argument("--mega_8_scenes", action="store_true")
    p.add_argument("--bf16", action="store_true", default=True)
    # serving knobs — A/B the int8 paths against the golden metrics
    p.add_argument("--vit_int8", action="store_true")
    p.add_argument("--refiner_int8", action="store_true")
    p.add_argument("--vit_gelu_tanh", action="store_true")
    run(p.parse_args())
