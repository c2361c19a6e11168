"""Tiny RoMa parity + API tests.

The torch modules below are written from the published XFeat/TinyRoMa
architecture descriptions to serve as an executable spec: random torch weights
are converted with models/zoo/convert.py and outputs compared.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from roma_tpu.models.tiny import TinyRoMa, TinyRoMaNet, corr_volume_qmajor, softmax_pos_embed
from roma_tpu.models.xfeat import XFeatBackbone
from roma_tpu.models.zoo import convert


class BasicLayerT(nn.Module):
    """Matches the published BasicLayer module structure (keys `<p>.layer.N`)."""

    def __init__(self, c_in, c_out, k=3, stride=1, padding=1):
        super().__init__()
        self.layer = nn.Sequential(
            nn.Conv2d(c_in, c_out, k, padding=padding, stride=stride, bias=False),
            nn.BatchNorm2d(c_out, affine=False),
            nn.ReLU(),
        )

    def forward(self, x):
        return self.layer(x)


def basic_layer_t(c_in, c_out, k=3, stride=1, padding=1):
    return BasicLayerT(c_in, c_out, k, stride, padding)


class XFeatTorch(nn.Module):
    """Executable spec of the XFeat encoder used by Tiny RoMa."""

    def __init__(self):
        super().__init__()
        self.norm = nn.InstanceNorm2d(1)
        self.skip1 = nn.Sequential(
            nn.AvgPool2d(4, stride=4), nn.Conv2d(1, 24, 1, stride=1, padding=0)
        )
        self.block1 = nn.Sequential(
            basic_layer_t(1, 4, stride=1),
            basic_layer_t(4, 8, stride=2),
            basic_layer_t(8, 8, stride=1),
            basic_layer_t(8, 24, stride=2),
        )
        self.block2 = nn.Sequential(
            basic_layer_t(24, 24, stride=1), basic_layer_t(24, 24, stride=1)
        )
        self.block3 = nn.Sequential(
            basic_layer_t(24, 64, stride=2),
            basic_layer_t(64, 64, stride=1),
            basic_layer_t(64, 64, 1, padding=0),
        )
        self.block4 = nn.Sequential(
            basic_layer_t(64, 64, stride=2),
            basic_layer_t(64, 64, stride=1),
            basic_layer_t(64, 64, stride=1),
        )
        self.block5 = nn.Sequential(
            basic_layer_t(64, 128, stride=2),
            basic_layer_t(128, 128, stride=1),
            basic_layer_t(128, 128, stride=1),
            basic_layer_t(128, 64, 1, padding=0),
        )
        self.block_fusion = nn.Sequential(
            basic_layer_t(64, 64, stride=1),
            basic_layer_t(64, 64, stride=1),
            nn.Conv2d(64, 64, 1, padding=0),
        )

    def forward(self, x):
        x = x.mean(dim=1, keepdim=True)
        x = self.norm(x)
        x1 = self.block1(x)
        x2 = self.block2(x1 + self.skip1(x))
        x3 = self.block3(x2)
        x4 = self.block4(x3)
        x5 = self.block5(x4)
        x4 = F.interpolate(x4, (x3.shape[-2], x3.shape[-1]), mode="bilinear")
        x5 = F.interpolate(x5, (x3.shape[-2], x3.shape[-1]), mode="bilinear")
        feats = self.block_fusion(x3 + x4 + x5)
        return x2, feats


class TinyTorch(nn.Module):
    """Executable spec of the full Tiny RoMa forward (eval mode)."""

    def __init__(self, exact_softmax=False):
        super().__init__()
        self.xfeat = XFeatTorch()
        self.coarse_matcher = nn.Sequential(
            basic_layer_t(64 + 64 + 2, 256),
            basic_layer_t(256, 256),
            basic_layer_t(256, 256),
            basic_layer_t(256, 256),
            nn.Conv2d(256, 3, kernel_size=1, bias=True, padding=0),
        )
        self.fine_matcher = nn.Sequential(
            basic_layer_t(24 + 24 + 2, 64),
            basic_layer_t(64, 64),
            basic_layer_t(64, 64),
            basic_layer_t(64, 64),
            nn.Conv2d(64, 3, kernel_size=1, bias=True, padding=0),
        )
        self.exact_softmax = exact_softmax

    def pos_embed(self, cv):
        B, H1, W1, H0, W0 = cv.shape
        grid = torch.stack(
            torch.meshgrid(
                torch.linspace(-1 + 1 / W1, 1 - 1 / W1, W1),
                torch.linspace(-1 + 1 / H1, 1 - 1 / H1, H1),
                indexing="xy",
            ),
            dim=-1,
        ).reshape(H1 * W1, 2)
        down = 4
        if not self.exact_softmax:
            grid_lr = torch.stack(
                torch.meshgrid(
                    torch.linspace(-1 + down / W1, 1 - down / W1, W1 // down),
                    torch.linspace(-1 + down / H1, 1 - down / H1, H1 // down),
                    indexing="xy",
                ),
                dim=-1,
            ).reshape(H1 * W1 // down**2, 2)
            best = cv.reshape(B, H1 * W1, H0, W0).argmax(dim=1)
            p = torch.cat(
                (
                    cv[:, ::down, ::down].reshape(B, H1 * W1 // down**2, H0, W0),
                    torch.gather(
                        cv.reshape(B, H1 * W1, H0, W0), 1, best[:, None]
                    ),
                ),
                dim=1,
            ).softmax(dim=1)
            pos = torch.einsum("bchw,cd->bdhw", p[:, :-1], grid_lr)
            pos = pos + p[:, -1] * grid[best].permute(0, 3, 1, 2)
            return pos
        p = cv.reshape(B, H1 * W1, H0, W0).softmax(dim=1)
        return torch.einsum("bchw,cd->bdhw", p, grid)

    def forward(self, im0, im1):
        B, C, H, W = im1.shape
        to_norm = torch.tensor((2 / W, 2 / H, 1))[None, :, None, None]
        f0_f, f0_c = self.xfeat(im0)
        f1_f, f1_c = self.xfeat(im1)
        Bc, Cc, Hc, Wc = f0_c.shape
        H1c, W1c = f1_c.shape[-2:]
        cv = torch.einsum(
            "bci,bcj->bji", f0_c.reshape(B, Cc, -1), f1_c.reshape(B, Cc, -1)
        ).reshape(B, H1c, W1c, Hc, Wc) / math.sqrt(Cc)
        warp = self.pos_embed(cv)
        coarse = torch.cat((warp, torch.zeros_like(warp[:, -1:])), dim=1)
        f1_c_w = F.grid_sample(
            f1_c, coarse.permute(0, 2, 3, 1)[..., :2], mode="bilinear", align_corners=False
        )
        delta = self.coarse_matcher(torch.cat((f0_c, f1_c_w, warp), dim=1))
        coarse = coarse + delta * to_norm
        up = F.interpolate(coarse, size=f0_f.shape[-2:], mode="bilinear", align_corners=False)
        f1_f_w = F.grid_sample(
            f1_f, up.permute(0, 2, 3, 1)[..., :2], mode="bilinear", align_corners=False
        )
        fine_delta = self.fine_matcher(torch.cat((f0_f, f1_f_w, up[:, :2]), dim=1))
        fine = up + fine_delta * to_norm
        return coarse, fine


def _rand_images(b, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(b, h, w, 3).astype(np.float32)


def test_xfeat_parity():
    torch.manual_seed(0)
    tm = XFeatTorch().eval()
    # randomize BN running stats so the test actually checks them
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    sd = convert.state_dict_to_numpy(tm.state_dict())
    params, stats = convert.convert_xfeat(sd)
    im = _rand_images(2, 64, 96)
    with torch.no_grad():
        t_fine, t_coarse = tm(torch.tensor(im).permute(0, 3, 1, 2))
    j_fine, j_coarse = XFeatBackbone().apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(im)
    )
    np.testing.assert_allclose(
        np.asarray(j_fine), t_fine.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(j_coarse), t_coarse.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize("exact", [True, False])
def test_tiny_forward_parity(exact):
    torch.manual_seed(1)
    tm = TinyTorch(exact_softmax=exact).eval()
    sd = convert.state_dict_to_numpy(tm.state_dict())
    xfeat_sd = {k[len("xfeat.") :]: v for k, v in sd.items() if k.startswith("xfeat.")}
    variables = convert.convert_tiny_roma(sd, xfeat_sd)
    im0 = _rand_images(1, 64, 96, seed=1)
    im1 = _rand_images(1, 64, 96, seed=2)
    with torch.no_grad():
        t_coarse, t_fine = tm(
            torch.tensor(im0).permute(0, 3, 1, 2), torch.tensor(im1).permute(0, 3, 1, 2)
        )
    net = TinyRoMaNet(exact_softmax=exact)
    corresps = net.apply(variables, jnp.asarray(im0), jnp.asarray(im1))
    j_coarse = np.concatenate(
        [np.asarray(corresps[8]["flow"]), np.asarray(corresps[8]["certainty"])], axis=-1
    )
    j_fine = np.concatenate(
        [np.asarray(corresps[4]["flow"]), np.asarray(corresps[4]["certainty"])], axis=-1
    )
    np.testing.assert_allclose(
        j_coarse, t_coarse.permute(0, 2, 3, 1).numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        j_fine, t_fine.permute(0, 2, 3, 1).numpy(), atol=5e-4, rtol=1e-3
    )


def test_tiny_match_api():
    model = TinyRoMa(TinyRoMa.init_variables(fast=True))
    im = _rand_images(2, 70, 90)  # not /32 -> exercises preprocess resize
    warp, cert = model.match(im, _rand_images(2, 70, 90, seed=3))
    assert warp.shape == (2, 70, 90, 4)
    assert cert.shape == (2, 70, 90)
    assert np.all(np.isfinite(np.asarray(warp)))
    assert (np.asarray(cert) >= 0).all() and (np.asarray(cert) <= 1).all()
    # unbatched path
    w1, c1 = model.match(im[0], _rand_images(2, 70, 90, seed=3)[0])
    assert w1.shape == (70, 90, 4)
    # sampling
    matches, mc = model.sample(w1, c1, num=500)
    assert matches.shape == (500, 4)
    kA, kB = model.to_pixel_coordinates(matches, 70, 90, 70, 90)
    assert kA.shape == (500, 2)
    assert (np.asarray(kA)[:, 0] <= 90 + 1).all()


@pytest.mark.parametrize("exact", [True, False])
def test_tiny_forward_parity_unequal_sizes(exact):
    """A and B at different resolutions: each image keeps its own /32 grid
    (reference tiny.py:72-79,277-290)."""
    torch.manual_seed(2)
    tm = TinyTorch(exact_softmax=exact).eval()
    sd = convert.state_dict_to_numpy(tm.state_dict())
    xfeat_sd = {k[len("xfeat.") :]: v for k, v in sd.items() if k.startswith("xfeat.")}
    variables = convert.convert_tiny_roma(sd, xfeat_sd)
    im0 = _rand_images(1, 64, 96, seed=4)
    im1 = _rand_images(1, 96, 64, seed=5)
    with torch.no_grad():
        t_coarse, t_fine = tm(
            torch.tensor(im0).permute(0, 3, 1, 2), torch.tensor(im1).permute(0, 3, 1, 2)
        )
    net = TinyRoMaNet(exact_softmax=exact)
    corresps = net.apply(variables, jnp.asarray(im0), jnp.asarray(im1))
    j_fine = np.concatenate(
        [np.asarray(corresps[4]["flow"]), np.asarray(corresps[4]["certainty"])], axis=-1
    )
    # output lives on A's grid
    assert j_fine.shape[1:3] == (64 // 4, 96 // 4)
    np.testing.assert_allclose(
        j_fine, t_fine.permute(0, 2, 3, 1).numpy(), atol=5e-4, rtol=1e-3
    )


def test_tiny_match_api_unequal_sizes():
    """match() must not resize A to B's grid (aspect preservation)."""
    model = TinyRoMa(TinyRoMa.init_variables(fast=True))
    im_A = _rand_images(1, 70, 120, seed=6)
    im_B = _rand_images(1, 120, 70, seed=7)
    warp, cert = model.match(im_A[0], im_B[0])
    assert warp.shape == (70, 120, 4)  # A's resolution
    assert cert.shape == (70, 120)
    assert np.isfinite(np.asarray(warp)).all()
