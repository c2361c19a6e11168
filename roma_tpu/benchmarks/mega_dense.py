"""MegaDepth dense-warp benchmark: EPE + PCK@1/3/5 px against the GT depth
reprojection (reference romatch/benchmarks/megadepth_dense_benchmark.py:9-105).

TPU-native addition: the per-batch geometric distance runs jitted, and with a
``mesh`` the *pair batch* is sharded over ICI (BASELINE config 4 — the
parallelism the reference never had; its benchmarks were rank-0 only).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..parallel.mesh import shard_batch
from ..train.gt_warp import warp_kpts


@partial(jax.jit, static_argnames=("h1", "w1"))
def _geometric_dist(depth1, depth2, T_1to2, K1, K2, dense_matches, h1: int, w1: int):
    b = dense_matches.shape[0]
    x1 = dense_matches[..., :2].reshape(b, h1 * w1, 2)
    mask, x2 = warp_kpts(x1, depth1, depth2, T_1to2, K1, K2)
    x2 = jnp.stack((w1 * (x2[..., 0] + 1) / 2, h1 * (x2[..., 1] + 1) / 2), axis=-1)
    prob = mask.astype(jnp.float32).reshape(b, h1, w1)
    x2_hat = dense_matches[..., 2:]
    x2_hat = jnp.stack(
        (w1 * (x2_hat[..., 0] + 1) / 2, h1 * (x2_hat[..., 1] + 1) / 2), axis=-1
    )
    gd = jnp.linalg.norm(x2_hat - x2.reshape(b, h1, w1, 2), axis=-1)
    valid = prob == 1
    n = jnp.maximum(jnp.sum(valid), 1)
    gd_mean = jnp.sum(gd * valid) / n
    pck = lambda t: jnp.sum((gd < t) * valid) / n
    return gd_mean, pck(1.0), pck(3.0), pck(5.0)


class MegadepthDenseBenchmark:
    def __init__(self, data_root="data/megadepth", h=384, w=512, num_samples=2000,
                 dataset=None, seed=0):
        if dataset is None:
            from ..datasets.megadepth import MegadepthBuilder

            mega = MegadepthBuilder(data_root=data_root)
            dataset = mega.build_concat(split="test_loftr", ht=h, wt=w)
        self.dataset = dataset
        self.num_samples = num_samples
        self.h, self.w = h, w
        self.rng = np.random.RandomState(seed)

    def _dump_debug(self, debug_dir, batch_idx, batch, matches, certainty):
        """Certainty-blended warp visualizations, one dir per pair (the
        reference's DEBUG_MODE dumps, megadepth_dense_benchmark.py:71-91)."""
        import os

        from ..ops import grid_sample
        from ..utils.image import to_pil

        b, h1, w1 = certainty.shape[0], matches.shape[1], matches.shape[2]
        warp_rgb = grid_sample(batch["im_B"], matches[..., 2:])  # (B,H,W,3)
        c = np.asarray(certainty)[..., None]
        vis = c * np.asarray(warp_rgb) + (1 - c) * np.ones_like(warp_rgb)
        for i in range(b):
            d = os.path.join(debug_dir, f"{batch_idx}_{i}_{h1}_{w1}")
            os.makedirs(d, exist_ok=True)
            to_pil(vis[i], unnormalize=True).save(os.path.join(d, "warp.jpg"))
            to_pil(np.asarray(batch["im_A"][i]), unnormalize=True).save(
                os.path.join(d, "im_A.jpg"))
            to_pil(np.asarray(batch["im_B"][i]), unnormalize=True).save(
                os.path.join(d, "im_B.jpg"))

    def benchmark(self, model, batch_size=8, mesh=None, debug_dir=None):
        idxs = self.rng.choice(
            len(self.dataset), size=min(self.num_samples, len(self.dataset)), replace=False
        )
        gd_tot = pck1_tot = pck3_tot = pck5_tot = 0.0
        num_batches = 0
        for start in tqdm(range(0, len(idxs), batch_size)):
            chunk = idxs[start : start + batch_size]
            if len(chunk) < batch_size:
                break  # static shapes: drop ragged tail (matches sampler semantics)
            items = [self.dataset[i] for i in chunk]
            batch = {
                k: np.stack([it[k] for it in items])
                for k in ("im_A", "im_B", "im_A_depth", "im_B_depth", "T_1to2", "K1", "K2")
            }
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            matches, certainty = model.match(batch["im_A"], batch["im_B"], batched=True)
            if model.symmetric:
                matches = matches[:, :, : matches.shape[2] // 2]
                certainty = certainty[:, :, : matches.shape[2]]
            h1, w1 = matches.shape[1], matches.shape[2]
            if debug_dir is not None:
                self._dump_debug(debug_dir, num_batches, batch, matches, certainty)
            gd, pck1, pck3, pck5 = _geometric_dist(
                batch["im_A_depth"], batch["im_B_depth"], batch["T_1to2"],
                batch["K1"], batch["K2"], matches, h1=h1, w1=w1,
            )
            gd_tot += float(gd)
            pck1_tot += float(pck1)
            pck3_tot += float(pck3)
            pck5_tot += float(pck5)
            num_batches += 1
        n = max(num_batches, 1)
        return {
            "epe": gd_tot / n,
            "mega_pck_1": pck1_tot / n,
            "mega_pck_3": pck3_tot / n,
            "mega_pck_5": pck5_tot / n,
        }
