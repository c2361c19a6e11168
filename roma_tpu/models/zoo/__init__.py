"""Model zoo — constructors mirroring the reference public entry points
(romatch/models/model_zoo/__init__.py:18-94): ``tiny_roma_v1_outdoor``,
``roma_outdoor``, ``roma_indoor``.

Weight files are the released torch ``.pth`` checkpoints. Like the
reference (``torch.hub.load_state_dict_from_url``), constructors download
and cache them by default (``download.py``, ``~/.cache/roma_tpu``); pass
local paths to skip the network, set ``ROMA_TPU_OFFLINE=1`` to force-skip.
Without weights the models come up randomly initialized — correct
shapes/jit, not pretrained accuracy.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..config import RoMaConfig
from ..roma import RegressionMatcher
from ..tiny import TinyRoMa
from . import convert, download

WEIGHT_URLS = {
    "romatch": {
        "outdoor": "https://github.com/Parskatt/storage/releases/download/roma/roma_outdoor.pth",
        "indoor": "https://github.com/Parskatt/storage/releases/download/roma/roma_indoor.pth",
    },
    "tiny_roma_v1": {
        "outdoor": "https://github.com/Parskatt/storage/releases/download/roma/tiny_roma_v1_outdoor.pth",
    },
    "dinov2": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitl14/dinov2_vitl14_pretrain.pth",
    # torch.hub.load('verlab/accelerated_features', 'XFeat') resolves to:
    "xfeat": "https://github.com/verlab/accelerated_features/raw/main/weights/xfeat.pt",
    # torchvision vgg19_bn(pretrained=True) (reference encoders.py:9 trains
    # from the torchvision-pretrained VGG):
    "vgg19_bn": "https://download.pytorch.org/models/vgg19_bn-c79401a0.pth",
}


def _load_torch_state_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return convert.state_dict_to_numpy(sd)


def _fetch_state_dict(url):
    """Download+cache ``url``; None when the environment is offline."""
    path = download.fetch(url)
    return None if path is None else _load_torch_state_dict(path)


def tiny_roma_v1_outdoor(
    weights: str | dict | None = None,
    xfeat_weights: str | dict | None = None,
    exact_softmax: bool = False,
    dtype: Any = jnp.float32,
) -> TinyRoMa:
    """Tiny RoMa v1 (reference model_zoo/__init__.py:18-28).

    Args:
      weights: path to tiny_roma_v1_outdoor.pth (or converted numpy dict).
      xfeat_weights: path to the XFeat hub checkpoint (state dict of `.net`).
    """
    if weights is None:
        weights = _fetch_state_dict(WEIGHT_URLS["tiny_roma_v1"]["outdoor"])
    if xfeat_weights is None:
        xfeat_weights = _fetch_state_dict(WEIGHT_URLS["xfeat"])
    if (weights is None) != (xfeat_weights is None):
        # Exactly one of the pair resolved (e.g. one cached, companion
        # fetch offline): loading half and random-initing the rest would
        # silently produce garbage matches — fail loudly instead.
        missing = "xfeat_weights" if xfeat_weights is None else "weights"
        raise RuntimeError(
            f"tiny_roma_v1_outdoor: {missing} unavailable while the "
            "companion checkpoint is present; pass both (weights=..., "
            "xfeat_weights=...) or neither (random init)."
        )
    if weights is not None and xfeat_weights is not None:
        tiny_sd = weights if isinstance(weights, dict) else _load_torch_state_dict(weights)
        xfeat_sd = (
            xfeat_weights
            if isinstance(xfeat_weights, dict)
            else _load_torch_state_dict(xfeat_weights)
        )
        variables = convert.convert_tiny_roma(tiny_sd, xfeat_sd)
    else:
        variables = TinyRoMa.init_variables(dtype=dtype, fast=True)
    return TinyRoMa(variables, exact_softmax=exact_softmax, dtype=dtype)


def _roma_model(
    weights=None,
    dinov2_weights=None,
    coarse_res: int | tuple[int, int] = 560,
    upsample_res: int | tuple[int, int] = 864,
    symmetric: bool = True,
    upsample_preds: bool = True,
    attenuate_cert: bool = True,
    dtype: Any = jnp.float32,
    amp: bool = True,
    vit_int8: bool = False,
    refiner_int8: bool = False,
    # Default ON when amp: tanh-GELU's max |d gelu| ~3e-4 sits BELOW the
    # bf16 activation rounding (~4e-3 at unit scale) the amp path already
    # accepts, and far below the fp16 autocast error of the reference's own
    # production config (matcher.py:296-309 runs these MLPs in fp16).
    # Measured ~44 ms/batch on the 560->864 e2e. vit_gelu_tanh=False forces
    # exact erf (used automatically when amp=False for f32-exact runs).
    vit_gelu_tanh: bool | None = None,
    config: RoMaConfig | None = None,
    variant: str | None = None,
) -> RegressionMatcher:
    """Build a full RoMa matcher (reference model_zoo/roma_models.py:32-205).

    ``amp=True`` maps the reference's fp16 autocast regions to bf16 compute
    (the TPU-native mixed precision); GP solve and out_convs stay f32.
    ``variant`` ("outdoor"/"indoor") selects the released checkpoint to
    auto-download when no weights are passed.
    """
    import dataclasses

    if isinstance(coarse_res, int):
        coarse_res = (coarse_res, coarse_res)
    if isinstance(upsample_res, int):
        upsample_res = (upsample_res, upsample_res)
    config = config or RoMaConfig()
    if vit_gelu_tanh is None:
        vit_gelu_tanh = amp
    if vit_int8 or refiner_int8 or vit_gelu_tanh:
        config = dataclasses.replace(
            config,
            vit_int8=vit_int8 or config.vit_int8,
            refiner_int8=refiner_int8 or config.refiner_int8,
            vit_gelu_tanh=vit_gelu_tanh or config.vit_gelu_tanh,
        )
    compute_dtype = jnp.bfloat16 if amp else dtype
    # the int8/gelu flags are serving knobs, not architecture changes — the
    # param tree is identical, so released weights still apply
    arch = dataclasses.replace(
        config, vit_int8=False, refiner_int8=False, vit_gelu_tanh=False
    )
    if variant is not None and arch == RoMaConfig():
        if weights is None:
            weights = _fetch_state_dict(WEIGHT_URLS["romatch"][variant])
        if weights is not None and dinov2_weights is None:
            dinov2_weights = _fetch_state_dict(WEIGHT_URLS["dinov2"])
    if (weights is None) != (dinov2_weights is None):
        # One checkpoint of the pair resolved (cached) but the companion
        # didn't — a half-pretrained matcher is garbage; fail loudly.
        missing = "dinov2_weights" if dinov2_weights is None else "weights"
        raise RuntimeError(
            f"roma_{variant or 'model'}: {missing} unavailable while the "
            "companion checkpoint is present; pass both (weights=..., "
            "dinov2_weights=...) or neither (random init)."
        )
    if weights is not None and dinov2_weights is not None:
        roma_sd = weights if isinstance(weights, dict) else _load_torch_state_dict(weights)
        dino_sd = (
            dinov2_weights
            if isinstance(dinov2_weights, dict)
            else _load_torch_state_dict(dinov2_weights)
        )
        variables = convert.convert_roma(roma_sd, dino_sd)
    else:
        # no pretrained weights -> shapes-only random init (no init compile);
        # from-scratch training uses the experiments' own initializers
        variables = RegressionMatcher.init_variables(
            dtype=compute_dtype, config=config, fast=True
        )
    return RegressionMatcher(
        variables,
        h=coarse_res[0],
        w=coarse_res[1],
        upsample_preds=upsample_preds,
        upsample_res=upsample_res,
        symmetric=symmetric,
        attenuate_cert=attenuate_cert,
        dtype=compute_dtype,
        config=config,
    )


def pretrained_backbone(
    variables: dict,
    dinov2_weights: str | dict | None = None,
    vgg_weights: str | dict | None = None,
) -> dict:
    """Graft pretrained encoder weights into freshly-initialized RoMaNet
    variables, for from-scratch training runs.

    The reference always trains with ``pretrained_backbone=True``
    (experiments/train_roma_outdoor.py:187): torchvision-pretrained
    VGG19-BN (encoders.py:9) + pretrained frozen DINOv2 vitl14
    (encoders.py:33). Training from a *random frozen* DINOv2 cannot work
    (frozen noise features), so train entry points call this by default.

    Args:
      variables: ``{"params", "batch_stats"}`` from ``RoMaNet.init`` (plain
        nested dicts; mutated copies are returned, inputs untouched).
      dinov2_weights: path/state-dict of dinov2_vitl14_pretrain.pth;
        auto-downloaded when None.
      vgg_weights: path/state-dict of torchvision vgg19_bn weights
        (prefix ``features``); auto-downloaded when None.

    Offline with no local paths, prints a warning and returns the variables
    unchanged (a deliberate degrade: CI / smoke tests train from random).
    """
    import copy
    import sys

    import jax
    import numpy as np

    def _resolve(w, url):
        if w is None:
            return _fetch_state_dict(url)
        return w if isinstance(w, dict) else _load_torch_state_dict(w)

    dino_sd = _resolve(dinov2_weights, WEIGHT_URLS["dinov2"])
    vgg_sd = _resolve(vgg_weights, WEIGHT_URLS["vgg19_bn"])
    if dino_sd is None or vgg_sd is None:
        print(
            "roma_tpu: pretrained backbone unavailable "
            f"(dinov2={'ok' if dino_sd else 'missing'}, "
            f"vgg={'ok' if vgg_sd else 'missing'}); the encoder stays "
            "randomly initialized — a frozen-random DINOv2 will not "
            "reproduce the reference training recipe.",
            file=sys.stderr,
        )
        return variables

    def _graft(tree, path, new):
        """Replace ``tree[path] = new`` with structure+shape verification
        against the initialized subtree (tree_map raises on structure
        mismatch)."""
        node = tree
        for k in path[:-1]:
            node = node[k]
        old = node[path[-1]]

        def check(a, b):
            if np.shape(a) != np.shape(b):
                raise ValueError(
                    f"pretrained_backbone: shape mismatch under "
                    f"{'/'.join(path)}: {np.shape(a)} vs {np.shape(b)}"
                )

        jax.tree_util.tree_map(check, old, new)
        node[path[-1]] = new

    variables = copy.copy(variables)
    variables["params"] = copy.deepcopy(variables["params"])
    variables["batch_stats"] = copy.deepcopy(variables["batch_stats"])
    vgg_p, vgg_s = convert.convert_vgg19(vgg_sd, prefix="features")
    _graft(variables["params"], ("encoder", "vgg"), vgg_p)
    _graft(variables["batch_stats"], ("encoder", "vgg"), vgg_s)
    _graft(variables["params"], ("encoder", "dinov2"), convert.convert_dinov2(dino_sd))
    return variables


def roma_outdoor(
    weights=None, dinov2_weights=None, coarse_res=560, upsample_res=864, **kw
) -> RegressionMatcher:
    """RoMa outdoor (reference model_zoo/__init__.py:31-61)."""
    return _roma_model(
        weights=weights,
        dinov2_weights=dinov2_weights,
        coarse_res=coarse_res,
        upsample_res=upsample_res,
        variant="outdoor",
        **kw,
    )


def roma_indoor(
    weights=None, dinov2_weights=None, coarse_res=560, upsample_res=864, **kw
) -> RegressionMatcher:
    """RoMa indoor (reference model_zoo/__init__.py:64-94). Architecture is
    identical to outdoor; only the released weights differ."""
    return _roma_model(
        weights=weights,
        dinov2_weights=dinov2_weights,
        coarse_res=coarse_res,
        upsample_res=upsample_res,
        variant="indoor",
        **kw,
    )
