"""Host-side image IO / preprocessing (NumPy + PIL — device code starts at
the normalized array, mirroring the reference's host/device boundary
romatch/models/matcher.py:812-816).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def load_image(im) -> Image.Image:
    """str/Path/PIL/HWC array -> RGB PIL image (reference matcher.py:530-547).

    Arrays may be (H, W) grayscale or (H, W, 3|4); float arrays are taken
    as [0, 1]. Everything lands in RGB like the reference's convert("RGB").
    """
    if isinstance(im, (str, Path)):
        im = Image.open(im)
    elif isinstance(im, np.ndarray):
        x = im
        if x.ndim not in (2, 3) or (x.ndim == 3 and x.shape[-1] not in (1, 3, 4)):
            raise ValueError(f"expected (H, W[, 1|3|4]) image array, got {x.shape}")
        if np.issubdtype(x.dtype, np.floating):
            x = (np.clip(x, 0.0, 1.0) * 255).astype(np.uint8)
        if x.ndim == 3 and x.shape[-1] == 1:
            x = x[..., 0]
        im = Image.fromarray(x)
    if not isinstance(im, Image.Image):
        raise TypeError(f"expected path, PIL image, or array, got {type(im)}")
    return im.convert("RGB")


def to_array(im: Image.Image) -> np.ndarray:
    """PIL -> float32 HWC in [0, 1] (torchvision ToTensor semantics)."""
    return np.asarray(im, dtype=np.float32) / 255.0


def resize(im: Image.Image, size_hw: tuple[int, int], mode=Image.BICUBIC):
    """Resize PIL image to (h, w); reference TupleResize uses bicubic
    (romatch/utils/utils.py:164-173)."""
    h, w = size_hw
    return im.resize((w, h), mode)


def imagenet_normalize(x: np.ndarray) -> np.ndarray:
    """Normalize float HWC/NHWC array with ImageNet statistics."""
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def check_not_i16(im: Image.Image):
    """Reject 16-bit integer images (reference utils check_not_i16)."""
    if im.mode == "I;16":
        raise ValueError("Input images should not be 16-bit (mode I;16)")


def check_rgb(im: Image.Image):
    if im.mode != "RGB":
        raise ValueError(f"Expected an RGB image, got mode {im.mode}")


def to_pil(x: np.ndarray, unnormalize: bool = False) -> Image.Image:
    """float HWC array (optionally ImageNet-normalized) -> PIL image
    (reference tensor_to_pil/numpy_to_pil, utils.py:460-480)."""
    x = np.asarray(x, np.float32)
    if unnormalize:
        x = x * IMAGENET_STD + IMAGENET_MEAN
    x = np.clip(x, 0.0, 1.0)
    return Image.fromarray((x * 255).astype(np.uint8))


def prepare(im, size_hw: tuple[int, int] | None = None, normalize: bool = True):
    """Full host preprocess: load -> (resize) -> [0,1] float -> (normalize).

    Returns (array (H, W, 3) float32, original (H, W)).
    """
    pil = load_image(im)
    w0, h0 = pil.size
    if size_hw is not None:
        pil = resize(pil, size_hw)
    x = to_array(pil)
    if normalize:
        x = imagenet_normalize(x)
    return x, (h0, w0)
