"""torch state-dict -> Flax variables converters.

The released RoMa weights are torch ``.pth`` state dicts
(reference romatch/models/model_zoo/__init__.py:6-15):
  * ``tiny_roma_v1_outdoor.pth`` — TinyRoMa matcher CNNs (XFeat is hidden from
    the state dict via the plain-list trick, reference tiny.py:45),
  * XFeat hub weights (``verlab/accelerated_features``, key prefix-free after
    taking ``.net``),
  * ``roma_outdoor/indoor.pth`` + ``dinov2_vitl14_pretrain.pth``.

Layout conversions: Conv2d OIHW -> HWIO; Linear (out, in) -> (in, out);
BN running_mean/var -> batch_stats mean/var. All values numpy float32.

Loading the .pth files requires torch (CPU build is fine); everything after
``state_dict_to_numpy`` is torch-free.
"""
from __future__ import annotations

import numpy as np


def state_dict_to_numpy(sd) -> dict[str, np.ndarray]:
    """torch state dict -> {name: float32 numpy array} (drops num_batches)."""
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = np.asarray(v.detach().cpu().float().numpy() if hasattr(v, "detach") else v)
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.transpose(w, (1, 0))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_basic_layer(sd, prefix: str, params: dict, stats: dict, path: tuple[str, ...]):
    """torch ``<prefix>.layer.{0 conv,1 bn}`` -> flax {conv, bn} at ``path``."""
    _set(params, path + ("conv", "kernel"), conv_kernel(sd[f"{prefix}.layer.0.weight"]))
    if f"{prefix}.layer.0.bias" in sd:
        _set(params, path + ("conv", "bias"), sd[f"{prefix}.layer.0.bias"])
    _set(stats, path + ("bn", "mean"), sd[f"{prefix}.layer.1.running_mean"])
    _set(stats, path + ("bn", "var"), sd[f"{prefix}.layer.1.running_var"])
    if f"{prefix}.layer.1.weight" in sd:  # affine BN
        _set(params, path + ("bn", "scale"), sd[f"{prefix}.layer.1.weight"])
        _set(params, path + ("bn", "bias"), sd[f"{prefix}.layer.1.bias"])


def convert_xfeat(sd: dict[str, np.ndarray]):
    """XFeatModel state dict -> (params, batch_stats) subtrees for
    models/xfeat.py::XFeatBackbone."""
    params: dict = {}
    stats: dict = {}
    block_sizes = {
        "block1": 4,
        "block2": 2,
        "block3": 3,
        "block4": 3,
        "block5": 4,
        "block_fusion": 2,
    }
    for block, n in block_sizes.items():
        for i in range(n):
            convert_basic_layer(sd, f"{block}.{i}", params, stats, (f"{block}_{i}",))
    _set(params, ("skip1", "kernel"), conv_kernel(sd["skip1.1.weight"]))
    _set(params, ("skip1", "bias"), sd["skip1.1.bias"])
    _set(params, ("block_fusion_head", "kernel"), conv_kernel(sd["block_fusion.2.weight"]))
    _set(params, ("block_fusion_head", "bias"), sd["block_fusion.2.bias"])
    return params, stats


def convert_conv_stack(sd, prefix: str, num_layers: int):
    """torch Sequential(BasicLayer x n, Conv1x1) -> flax ConvStack subtrees."""
    params: dict = {}
    stats: dict = {}
    for i in range(num_layers):
        convert_basic_layer(sd, f"{prefix}.{i}", params, stats, (f"layer{i}",))
    _set(params, ("head", "kernel"), conv_kernel(sd[f"{prefix}.{num_layers}.weight"]))
    _set(params, ("head", "bias"), sd[f"{prefix}.{num_layers}.bias"])
    return params, stats


def convert_tiny_roma(tiny_sd: dict[str, np.ndarray], xfeat_sd: dict[str, np.ndarray]):
    """Assemble full TinyRoMaNet variables from the two torch state dicts."""
    xf_params, xf_stats = convert_xfeat(xfeat_sd)
    cm_params, cm_stats = convert_conv_stack(tiny_sd, "coarse_matcher", 4)
    fm_params, fm_stats = convert_conv_stack(tiny_sd, "fine_matcher", 4)
    params = {"xfeat": xf_params, "coarse_matcher": cm_params, "fine_matcher": fm_params}
    stats = {"xfeat": xf_stats, "coarse_matcher": cm_stats, "fine_matcher": fm_stats}
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Big RoMa (roma_outdoor/indoor.pth + dinov2_vitl14_pretrain.pth)
# ---------------------------------------------------------------------------


def convert_vit_block(sd, prefix: str, params: dict, path: tuple[str, ...]):
    """torch ViT block (dinov2 layers/block.py) -> flax models/vit.py::Block."""
    for ln in ("norm1", "norm2"):
        _set(params, path + (ln, "scale"), sd[f"{prefix}.{ln}.weight"])
        _set(params, path + (ln, "bias"), sd[f"{prefix}.{ln}.bias"])
    _set(params, path + ("attn", "qkv", "kernel"), linear_kernel(sd[f"{prefix}.attn.qkv.weight"]))
    if f"{prefix}.attn.qkv.bias" in sd:
        _set(params, path + ("attn", "qkv", "bias"), sd[f"{prefix}.attn.qkv.bias"])
    _set(params, path + ("attn", "proj", "kernel"), linear_kernel(sd[f"{prefix}.attn.proj.weight"]))
    _set(params, path + ("attn", "proj", "bias"), sd[f"{prefix}.attn.proj.bias"])
    for fc in ("fc1", "fc2"):
        _set(params, path + ("mlp", fc, "kernel"), linear_kernel(sd[f"{prefix}.mlp.{fc}.weight"]))
        _set(params, path + ("mlp", fc, "bias"), sd[f"{prefix}.mlp.{fc}.bias"])
    for ls in ("ls1", "ls2"):
        if f"{prefix}.{ls}.gamma" in sd:
            _set(params, path + (ls, "gamma"), sd[f"{prefix}.{ls}.gamma"])


def _stack_trees(trees):
    """Stack a list of identically-shaped nested dicts along a new axis 0
    (the nn.scan depth axis of models/vit.py::ScannedBlocks)."""
    out = {}
    for k in trees[0]:
        vals = [t[k] for t in trees]
        out[k] = _stack_trees(vals) if isinstance(vals[0], dict) else np.stack(vals)
    return out


def convert_dinov2(sd: dict[str, np.ndarray], depth: int = 24):
    """dinov2_vitl14_pretrain.pth -> params subtree for models/vit.py::DinoV2.

    Per-block weights are stacked along a leading depth axis for the scanned
    layer stack."""
    params: dict = {}
    _set(params, ("patch_embed", "kernel"), conv_kernel(sd["patch_embed.proj.weight"]))
    _set(params, ("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    _set(params, ("cls_token",), sd["cls_token"])
    _set(params, ("pos_embed",), sd["pos_embed"])
    blocks = []
    for i in range(depth):
        b: dict = {}
        convert_vit_block(sd, f"blocks.{i}", b, ("block",))
        blocks.append(b["block"])
    _set(params, ("blocks", "block"), _stack_trees(blocks))
    _set(params, ("norm", "scale"), sd["norm.weight"])
    _set(params, ("norm", "bias"), sd["norm.bias"])
    return params


def _convert_torch_bn(sd, prefix: str, params: dict, stats: dict, path: tuple[str, ...]):
    _set(stats, path + ("mean",), sd[f"{prefix}.running_mean"])
    _set(stats, path + ("var",), sd[f"{prefix}.running_var"])
    if f"{prefix}.weight" in sd:
        _set(params, path + ("scale",), sd[f"{prefix}.weight"])
        _set(params, path + ("bias",), sd[f"{prefix}.bias"])


def convert_vgg19(sd: dict[str, np.ndarray], prefix: str = "encoder.cnn.layers"):
    """torchvision vgg19_bn features[:40] weights -> VGG19 subtrees.

    Conv/BN torchvision indices are preserved in the flax names
    (models/encoders.py::VGG19_PLAN).
    """
    from ..encoders import VGG19_PLAN

    params: dict = {}
    stats: dict = {}
    for item in VGG19_PLAN:
        if item == "M":
            continue
        idx, _ = item
        _set(params, (f"conv{idx}", "kernel"), conv_kernel(sd[f"{prefix}.{idx}.weight"]))
        _set(params, (f"conv{idx}", "bias"), sd[f"{prefix}.{idx}.bias"])
        _convert_torch_bn(sd, f"{prefix}.{idx + 1}", params, stats, (f"bn{idx + 1}",))
    return params, stats


def _convert_refiner_block(sd, prefix: str):
    """torch create_block Sequential(conv5x5, BN, ReLU, conv1x1)
    (reference matcher.py:92-122) -> ({conv1, bn, conv2} params, {bn} stats)."""
    params: dict = {}
    stats: dict = {}
    _set(params, ("conv1", "kernel"), conv_kernel(sd[f"{prefix}.0.weight"]))
    if f"{prefix}.0.bias" in sd:
        _set(params, ("conv1", "bias"), sd[f"{prefix}.0.bias"])
    _convert_torch_bn(sd, f"{prefix}.1", params, stats, ("bn",))
    _set(params, ("conv2", "kernel"), conv_kernel(sd[f"{prefix}.3.weight"]))
    _set(params, ("conv2", "bias"), sd[f"{prefix}.3.bias"])
    return params, stats


def convert_roma(
    roma_sd: dict[str, np.ndarray],
    dinov2_sd: dict[str, np.ndarray],
    scales=(16, 8, 4, 2, 1),
    hidden_blocks: int = 8,
    decoder_depth: int = 5,
):
    """roma_outdoor/indoor.pth + dinov2 .pth -> full RoMaNet variables."""
    params: dict = {}
    stats: dict = {}

    vgg_p, vgg_s = convert_vgg19(roma_sd)
    _set(params, ("encoder", "vgg"), vgg_p)
    _set(stats, ("encoder", "vgg"), vgg_s)
    _set(params, ("encoder", "dinov2"), convert_dinov2(dinov2_sd))

    dec_p: dict = {}
    dec_s: dict = {}
    # transformer decoder (scanned blocks -> depth-stacked)
    ed: dict = {}
    blocks = []
    for i in range(decoder_depth):
        b: dict = {}
        convert_vit_block(roma_sd, f"decoder.embedding_decoder.blocks.{i}", b, ("block",))
        blocks.append(b["block"])
    _set(ed, ("blocks", "block"), _stack_trees(blocks))
    _set(ed, ("to_out", "kernel"), linear_kernel(roma_sd["decoder.embedding_decoder.to_out.weight"]))
    _set(ed, ("to_out", "bias"), roma_sd["decoder.embedding_decoder.to_out.bias"])
    dec_p["embedding_decoder"] = ed
    # gp
    _set(dec_p, ("gp16", "pos_conv", "kernel"), conv_kernel(roma_sd["decoder.gps.16.pos_conv.weight"]))
    _set(dec_p, ("gp16", "pos_conv", "bias"), roma_sd["decoder.gps.16.pos_conv.bias"])
    # projections + refiners
    for s in scales:
        _set(dec_p, (f"proj{s}_conv", "kernel"), conv_kernel(roma_sd[f"decoder.proj.{s}.0.weight"]))
        _set(dec_p, (f"proj{s}_conv", "bias"), roma_sd[f"decoder.proj.{s}.0.bias"])
        _convert_torch_bn(roma_sd, f"decoder.proj.{s}.1", dec_p, dec_s, (f"proj{s}_bn",))
        rp = f"decoder.conv_refiner.{s}"
        b1_p, b1_s = _convert_refiner_block(roma_sd, f"{rp}.block1")
        _set(dec_p, (f"refiner{s}", "block1"), b1_p)
        _set(dec_s, (f"refiner{s}", "block1"), b1_s)
        hid = [
            _convert_refiner_block(roma_sd, f"{rp}.hidden_blocks.{j}")
            for j in range(hidden_blocks)
        ]
        _set(dec_p, (f"refiner{s}", "hidden", "block"), _stack_trees([p for p, _ in hid]))
        _set(dec_s, (f"refiner{s}", "hidden", "block"), _stack_trees([st for _, st in hid]))
        _set(dec_p, (f"refiner{s}", "out_conv", "kernel"), conv_kernel(roma_sd[f"{rp}.out_conv.weight"]))
        _set(dec_p, (f"refiner{s}", "out_conv", "bias"), roma_sd[f"{rp}.out_conv.bias"])
        _set(dec_p, (f"refiner{s}", "disp_emb", "kernel"), conv_kernel(roma_sd[f"{rp}.disp_emb.weight"]))
        _set(dec_p, (f"refiner{s}", "disp_emb", "bias"), roma_sd[f"{rp}.disp_emb.bias"])

    params["decoder"] = dec_p
    stats["decoder"] = dec_s
    return {"params": params, "batch_stats": stats}
