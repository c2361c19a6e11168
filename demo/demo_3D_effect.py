"""3D parallax-effect GIF: interpolate the warp between the two views
(reference demo/demo_3D_effect.py)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np
from PIL import Image

from roma_tpu.models.zoo import roma_outdoor
from roma_tpu.ops import grid_sample, normalized_grid
from roma_tpu.utils.image import load_image, to_array

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/toronto_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/toronto_B.jpg")
    p.add_argument("--save_path", default="demo_3d.gif")
    p.add_argument("--weights", default=None)
    p.add_argument("--dinov2_weights", default=None)
    args = p.parse_args()

    model = roma_outdoor(weights=args.weights, dinov2_weights=args.dinov2_weights)
    warp, certainty = model.match(args.im_A_path, args.im_B_path)
    warp = jnp.asarray(warp)
    h, w2 = warp.shape[:2]
    w = w2 // 2
    x_b = jnp.asarray(to_array(load_image(args.im_B_path).resize((w, h))))

    grid = normalized_grid(h, w)
    a2b = warp[:, :w, 2:]
    cert = jnp.asarray(certainty)[:, :w, None]
    frames = []
    for alpha in np.concatenate([np.linspace(0, 1, 12), np.linspace(1, 0, 12)]):
        coords = (1 - alpha) * grid + alpha * a2b
        im = grid_sample(x_b[None], coords[None])[0]
        im = cert * im + (1 - cert) * jnp.ones_like(im)
        frames.append(Image.fromarray(np.asarray(jnp.clip(im, 0, 1) * 255, np.uint8)))
    frames[0].save(
        args.save_path, save_all=True, append_images=frames[1:], duration=80, loop=0
    )
    print("saved", args.save_path)
