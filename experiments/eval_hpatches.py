"""Evaluate on HPatches homography benchmark
(reference experiments/eval_roma_outdoor hpatches path)."""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(args):
    from roma_tpu.benchmarks import HpatchesHomogBenchmark
    from roma_tpu.models.zoo import roma_outdoor

    model = roma_outdoor(
        weights=args.weights, dinov2_weights=args.dinov2_weights, amp=args.bf16
    )
    results = {"hpatches": HpatchesHomogBenchmark(args.data_root).benchmark(model)}
    os.makedirs("results", exist_ok=True)
    with open("results/eval_hpatches.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default=None)
    p.add_argument("--dinov2_weights", default=None)
    p.add_argument("--data_root", default="data/hpatches")
    p.add_argument("--bf16", action="store_true", default=True)
    run(p.parse_args())
