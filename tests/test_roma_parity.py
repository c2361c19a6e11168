"""Big RoMa end-to-end parity vs an independently written torch spec.

The torch modules below are an executable spec of the published RoMa
architecture (VGG19-BN pyramid + DINOv2 ViT-L + GP + transformer decoder +
conv refiners); random torch weights are converted via models/zoo/convert.py
and the full coarse pass + upsample pass outputs are compared.

Run at reduced resolution (56x56 coarse / 64x64 upsample) — channel dims are
the real ones, spatial dims are small so the test stays CPU-friendly.
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from roma_tpu.models.encoders import VGG19_PLAN
from roma_tpu.models.matcher import PROJ_SPECS, REFINER_SPECS, RoMaNet
from roma_tpu.models.zoo import convert

torch.manual_seed(0)

# full-dim ViT-L graphs: minutes of XLA:CPU compile per program -> slow tier
pytestmark = pytest.mark.slow

DEPTH = 24  # ViT-L


# --------------------------------------------------------------------------
# torch spec modules
# --------------------------------------------------------------------------


class VGGSpec(nn.Module):
    def __init__(self):
        super().__init__()
        layers = []
        in_ch = 3
        for item in VGG19_PLAN:
            if item == "M":
                layers.append(nn.MaxPool2d(2, 2))
                continue
            _, ch = item
            layers += [nn.Conv2d(in_ch, ch, 3, padding=1), nn.BatchNorm2d(ch), nn.ReLU()]
            in_ch = ch
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        feats = {}
        scale = 1
        for layer in self.layers:
            if isinstance(layer, nn.MaxPool2d):
                feats[scale] = x
                scale *= 2
            x = layer(x)
        return feats


class AttnSpec(nn.Module):
    def __init__(self, dim, heads, qkv_bias):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(dim, 3 * dim, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = [t.transpose(1, 2) for t in qkv.unbind(2)]
        out = F.scaled_dot_product_attention(q, k, v)
        return self.proj(out.transpose(1, 2).reshape(B, N, C))


class MlpSpec(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class LSSpec(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class BlockSpec(nn.Module):
    def __init__(self, dim, heads, qkv_bias=True, ls=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = AttnSpec(dim, heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MlpSpec(dim, 4 * dim)
        if ls:
            self.ls1, self.ls2 = LSSpec(dim), LSSpec(dim)
        else:
            self.ls1 = self.ls2 = nn.Identity()

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class PatchEmbedSpec(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, 14, 14)


class DinoSpec(nn.Module):
    def __init__(self, dim=1024, depth=DEPTH, heads=16):
        super().__init__()
        self.patch_embed = PatchEmbedSpec(dim)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        n = (518 // 14) ** 2
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = nn.ModuleList([BlockSpec(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.patch_size = 14

    def interpolate_pos_encoding(self, npatch, h, w):
        N = self.pos_embed.shape[1] - 1
        if npatch == N and w == h:
            return self.pos_embed
        class_pos = self.pos_embed[:, 0]
        patch_pos = self.pos_embed[:, 1:]
        dim = self.pos_embed.shape[-1]
        w0 = h // self.patch_size + 0.1  # note reference's (w,h) swap: first is H
        h0 = w // self.patch_size + 0.1
        s = int(math.sqrt(N))
        patch_pos = F.interpolate(
            patch_pos.reshape(1, s, s, dim).permute(0, 3, 1, 2),
            scale_factor=(w0 / s, h0 / s),
            mode="bicubic",
        )
        patch_pos = patch_pos.permute(0, 2, 3, 1).view(1, -1, dim)
        return torch.cat((class_pos.unsqueeze(0), patch_pos), dim=1)

    def forward_features(self, x):
        B, _, H, W = x.shape
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat((self.cls_token.expand(B, -1, -1), t), dim=1)
        t = t + self.interpolate_pos_encoding(t.shape[1] - 1, H, W)
        for blk in self.blocks:
            t = blk(t)
        t = self.norm(t)
        return t[:, 1:].permute(0, 2, 1).reshape(B, -1, H // 14, W // 14)


class EncoderSpec(nn.Module):
    def __init__(self):
        super().__init__()
        self.cnn = VGGSpec()
        self.dinov2 = DinoSpec()

    def forward(self, x, upsample=False):
        feats = self.cnn(x)
        if not upsample:
            feats[16] = self.dinov2.forward_features(x)
        return feats


def grid_t(h, w):
    g = torch.meshgrid(
        torch.linspace(-1 + 1 / h, 1 - 1 / h, h),
        torch.linspace(-1 + 1 / w, 1 - 1 / w, w),
        indexing="ij",
    )
    return torch.stack((g[1], g[0]), dim=-1)


class GPSpec(nn.Module):
    def __init__(self, gp_dim=512, T=0.2, sigma=0.1):
        super().__init__()
        self.pos_conv = nn.Conv2d(2, gp_dim, 1, 1)
        self.T, self.sigma, self.dim = T, sigma, gp_dim

    def kernel(self, x, y, eps=1e-6):
        c = torch.einsum("bnd,bmd->bnm", x, y) / (
            x.norm(dim=-1)[..., None] * y.norm(dim=-1)[:, None] + eps
        )
        return ((c - 1.0) / self.T).exp()

    def forward(self, x, y):
        b, c, h1, w1 = x.shape
        _, _, h2, w2 = y.shape
        coords = grid_t(h2, w2).permute(2, 0, 1)[None]
        f = torch.cos(8 * math.pi * self.pos_conv(coords))
        f = f.reshape(1, self.dim, h2 * w2).permute(0, 2, 1).expand(b, -1, -1)
        xf = x.reshape(b, c, -1).permute(0, 2, 1)
        yf = y.reshape(b, c, -1).permute(0, 2, 1)
        k_yy = self.kernel(yf, yf) + self.sigma * torch.eye(h2 * w2)[None]
        k_xy = self.kernel(xf, yf)
        L = torch.linalg.cholesky(k_yy)
        mu = k_xy @ torch.cholesky_solve(f, L, upper=False)
        return mu.permute(0, 2, 1).reshape(b, self.dim, h1, w1)


class TransDecSpec(nn.Module):
    def __init__(self, dim=1024, out_dim=64 * 64 + 1, depth=5):
        super().__init__()
        self.blocks = nn.Sequential(
            *[BlockSpec(dim, 8, qkv_bias=False, ls=False) for _ in range(depth)]
        )
        self.to_out = nn.Linear(dim, out_dim)
        self.out_dim = out_dim

    def forward(self, gp_post, feats):
        x = torch.cat((gp_post, feats), dim=1)
        B, C, H, W = x.shape
        z = self.blocks(x.reshape(B, C, H * W).permute(0, 2, 1))
        out = self.to_out(z).permute(0, 2, 1).reshape(B, self.out_dim, H, W)
        return out[:, :-1], out[:, -1:]


def local_corr_t(f0, f1, radius, warp):
    B, c, h, w = f0.shape
    r = radius
    K = (2 * r + 1) ** 2
    ys = torch.linspace(-2 * r / h, 2 * r / h, 2 * r + 1)
    xs = torch.linspace(-2 * r / w, 2 * r / w, 2 * r + 1)
    wy, wx = torch.meshgrid(ys, xs, indexing="ij")
    window = torch.stack((wx, wy), dim=-1).reshape(1, K, 2)
    warp_hw = warp.permute(0, 2, 3, 1)
    corr = torch.empty(B, K, h, w)
    for i in range(B):
        coords = (warp_hw[i, :, :, None] + window[:, None, None]).reshape(1, h, w * K, 2)
        feat = F.grid_sample(f1[i : i + 1], coords, padding_mode="zeros", align_corners=False)
        corr[i] = (f0[i, ..., None] / (c**0.5) * feat.reshape(c, h, w, K)).sum(0).permute(2, 0, 1)
    return corr


class RefinerSpecT(nn.Module):
    def __init__(self, spec):
        super().__init__()
        self.spec = spec

        def block(in_dim, out_dim):
            return nn.Sequential(
                nn.Conv2d(in_dim, out_dim, 5, padding=2, groups=in_dim),
                nn.BatchNorm2d(out_dim, momentum=0.01),
                nn.ReLU(),
                nn.Conv2d(out_dim, out_dim, 1),
            )

        self.block1 = block(spec.in_dim, spec.hidden_dim)
        self.hidden_blocks = nn.Sequential(
            *[block(spec.hidden_dim, spec.hidden_dim) for _ in range(spec.hidden_blocks)]
        )
        self.out_conv = nn.Conv2d(spec.hidden_dim, 3, 1)
        self.disp_emb = nn.Conv2d(2, spec.disp_emb_dim, 1)

    def forward(self, x, y, flow, scale_factor=1.0):
        b, c, hs, ws = x.shape
        x_hat = F.grid_sample(y, flow.permute(0, 2, 3, 1), align_corners=False, mode="bilinear")
        g = grid_t(hs, ws).permute(2, 0, 1)[None]
        emb = self.disp_emb(40 / 32 * scale_factor * (flow - g))
        parts = [x, x_hat, emb]
        if self.spec.local_corr_radius is not None:
            parts.append(local_corr_t(x, y, self.spec.local_corr_radius, flow))
        d = self.block1(torch.cat(parts, dim=1))
        d = self.hidden_blocks(d)
        d = self.out_conv(d.float())
        return d[:, :2], d[:, 2:]


def cls_to_flow_refine_t(cls_logits):
    B, C, H, W = cls_logits.shape
    res = int(math.sqrt(C))
    G = torch.meshgrid(
        *[torch.linspace(-1 + 1 / res, 1 - 1 / res, res) for _ in range(2)], indexing="ij"
    )
    G = torch.stack([G[1], G[0]], dim=-1).reshape(C, 2)
    probs = cls_logits.softmax(dim=1)
    mode = probs.max(dim=1).indices
    index = torch.stack((mode - 1, mode, mode + 1, mode - res, mode + res), dim=1).clamp(
        0, C - 1
    ).long()
    neighbours = torch.gather(probs, dim=1, index=index)[..., None]
    flow = sum(neighbours[:, i] * G[index[:, i]] for i in range(5)) / neighbours.sum(dim=1)
    return flow  # (B, H, W, 2)


class DecoderSpec(nn.Module):
    def __init__(self):
        super().__init__()
        self.embedding_decoder = TransDecSpec()
        self.gp16 = GPSpec()
        self.proj = nn.ModuleDict(
            {
                str(s): nn.Sequential(nn.Conv2d(i, o, 1, 1), nn.BatchNorm2d(o))
                for s, (i, o) in PROJ_SPECS.items()
            }
        )
        self.refiners = nn.ModuleDict(
            {str(s): RefinerSpecT(spec) for s, spec in REFINER_SPECS.items()}
        )
        self.refine_init = 4

    def forward(self, f1, f2, upsample=False, flow=None, certainty=None, scale_factor=1.0,
                gm_logit_bias=None):
        # gm_logit_bias (B, cls_res^2, H16, W16): diagnostic logit injection
        # mirroring roma_tpu Decoder's hook (see matcher.py docstring).
        scales = [8, 4, 2, 1] if upsample else [16, 8, 4, 2, 1]
        sizes = {s: f.shape[-2:] for s, f in f1.items()}
        h, w = sizes[1]
        b = f1[1].shape[0]
        if not upsample:
            flow = grid_t(*sizes[scales[0]]).permute(2, 0, 1)[None].expand(b, 2, *sizes[scales[0]])
            certainty = 0.0
        else:
            flow = F.interpolate(flow, size=sizes[scales[0]], mode="bilinear", align_corners=False)
            certainty = F.interpolate(
                certainty, size=sizes[scales[0]], mode="bilinear", align_corners=False
            )
        corresps = {}
        for ins in scales:
            corresps[ins] = {}
            f1_s = self.proj[str(ins)](f1[ins])
            f2_s = self.proj[str(ins)](f2[ins])
            if ins == 16 and not upsample:
                gp_post = self.gp16(f1_s, f2_s)
                cls_logits, certainty = self.embedding_decoder(gp_post, f1_s)
                if gm_logit_bias is not None:
                    cls_logits = cls_logits + gm_logit_bias
                flow = cls_to_flow_refine_t(cls_logits).permute(0, 3, 1, 2)
            delta_flow, delta_cert = self.refiners[str(ins)](f1_s, f2_s, flow, scale_factor)
            disp = ins * torch.stack(
                (delta_flow[:, 0] / (self.refine_init * w), delta_flow[:, 1] / (self.refine_init * h)),
                dim=1,
            )
            flow = flow + disp
            certainty = certainty + delta_cert
            corresps[ins].update(certainty=certainty, flow=flow)
            if ins != 1:
                flow = F.interpolate(flow, size=sizes[ins // 2], mode="bilinear")
                certainty = F.interpolate(certainty, size=sizes[ins // 2], mode="bilinear")
        return corresps


class RoMaSpec(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = EncoderSpec()
        self.decoder = DecoderSpec()

    def forward(self, im_A, im_B, symmetric=False, upsample=False, flow=None,
                certainty=None, scale_factor=1.0, gm_logit_bias=None):
        x = torch.cat((im_A, im_B), dim=0)
        pyr = self.encoder(x, upsample=upsample)
        if symmetric:
            f_q = pyr
            f_s = {s: torch.cat(f.chunk(2)[::-1], dim=0) for s, f in pyr.items()}
        else:
            f_q = {s: f.chunk(2)[0] for s, f in pyr.items()}
            f_s = {s: f.chunk(2)[1] for s, f in pyr.items()}
        return self.decoder(f_q, f_s, upsample=upsample, flow=flow,
                            certainty=certainty, scale_factor=scale_factor,
                            gm_logit_bias=gm_logit_bias)


# --------------------------------------------------------------------------
# conversion: torch spec state dict -> the .pth key layout the converter expects
# --------------------------------------------------------------------------


def spec_state_dicts(spec: RoMaSpec):
    sd = convert.state_dict_to_numpy(spec.state_dict())
    dinov2_sd = {k[len("encoder.dinov2.") :]: v for k, v in sd.items() if "dinov2" in k}
    roma_sd = {}
    for k, v in sd.items():
        if "dinov2" in k:
            continue
        k = k.replace("decoder.refiners.", "decoder.conv_refiner.")
        k = k.replace("decoder.gp16.", "decoder.gps.16.")
        roma_sd[k] = v
    return roma_sd, dinov2_sd


@pytest.fixture(scope="module")
def spec_and_vars():
    spec = RoMaSpec().eval()
    for m in spec.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    roma_sd, dinov2_sd = spec_state_dicts(spec)
    variables = convert.convert_roma(roma_sd, dinov2_sd)
    return spec, variables


def _imgs(b, h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randn(b, h, w, 3).astype(np.float32) * 0.5


def test_roma_coarse_parity(spec_and_vars):
    spec, variables = spec_and_vars
    im_A = _imgs(1, 56, 56, 1)
    im_B = _imgs(1, 56, 56, 2)
    net = RoMaNet()
    corresps = net.apply(
        variables, jnp.asarray(im_A), jnp.asarray(im_B), symmetric=True, scale_factor=0.1
    )
    with torch.no_grad():
        t_corresps = spec(
            torch.tensor(im_A).permute(0, 3, 1, 2),
            torch.tensor(im_B).permute(0, 3, 1, 2),
            symmetric=True,
            scale_factor=0.1,
        )
    for s in (16, 8, 4, 2, 1):
        np.testing.assert_allclose(
            np.asarray(corresps[s]["flow"]),
            t_corresps[s]["flow"].permute(0, 2, 3, 1).numpy(),
            atol=2e-3,
            err_msg=f"flow scale {s}",
        )
        np.testing.assert_allclose(
            np.asarray(corresps[s]["certainty"]),
            t_corresps[s]["certainty"].permute(0, 2, 3, 1).numpy(),
            atol=2e-3,
            err_msg=f"certainty scale {s}",
        )


def test_roma_coarse_parity_peaked_logits(spec_and_vars):
    """gm_logit_bias diagnostic hook: identical peaked logit injection on both
    sides -> the coarse anchor argmax is tie-free and the flows must agree
    tightly (this is the regime trained weights operate in; see
    tools/fullres_parity.py --peaked)."""
    spec, variables = spec_and_vars
    im_A = _imgs(1, 56, 56, 5)
    im_B = _imgs(1, 56, 56, 6)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fullres_parity import render_peaked_bias

    bias = render_peaked_bias(4, 4)  # 56/14 = 4x4 coarse grid, batch 2
    net = RoMaNet()
    corresps = net.apply(
        variables, jnp.asarray(im_A), jnp.asarray(im_B), symmetric=True,
        scale_factor=0.1, gm_logit_bias=jnp.asarray(bias),
    )
    with torch.no_grad():
        t_corresps = spec(
            torch.tensor(im_A).permute(0, 3, 1, 2),
            torch.tensor(im_B).permute(0, 3, 1, 2),
            symmetric=True,
            scale_factor=0.1,
            gm_logit_bias=torch.tensor(bias).permute(0, 3, 1, 2),
        )
    for s in (16, 8, 4, 2, 1):
        np.testing.assert_allclose(
            np.asarray(corresps[s]["flow"]),
            t_corresps[s]["flow"].permute(0, 2, 3, 1).numpy(),
            atol=2e-3,
            err_msg=f"flow scale {s}",
        )


def test_roma_upsample_parity(spec_and_vars):
    spec, variables = spec_and_vars
    im_A = _imgs(1, 64, 64, 3)
    im_B = _imgs(1, 64, 64, 4)
    rng = np.random.RandomState(9)
    flow = np.clip(rng.randn(2, 7, 7, 2) * 0.3, -1, 1).astype(np.float32)
    cert = rng.randn(2, 7, 7, 1).astype(np.float32)
    net = RoMaNet()
    corresps = net.apply(
        variables,
        jnp.asarray(im_A),
        jnp.asarray(im_B),
        symmetric=True,
        upsample=True,
        flow=jnp.asarray(flow),
        certainty=jnp.asarray(cert),
        scale_factor=0.11,
    )
    with torch.no_grad():
        t_corresps = spec(
            torch.tensor(im_A).permute(0, 3, 1, 2),
            torch.tensor(im_B).permute(0, 3, 1, 2),
            symmetric=True,
            upsample=True,
            flow=torch.tensor(flow).permute(0, 3, 1, 2),
            certainty=torch.tensor(cert).permute(0, 3, 1, 2),
            scale_factor=0.11,
        )
    for s in (8, 4, 2, 1):
        np.testing.assert_allclose(
            np.asarray(corresps[s]["flow"]),
            t_corresps[s]["flow"].permute(0, 2, 3, 1).numpy(),
            atol=2e-3,
            err_msg=f"flow scale {s}",
        )


# --------------------------------------------------------------------------
# full-resolution-only code paths, pinned at their REAL sizes in isolation
# (cheap without the surrounding ViT/decoder; complements the reduced-res
# end-to-end tests above and tools/fullres_parity.py)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("res", [(560, 560), (864, 864), (560, 784)])
def test_pos_embed_interpolation_full_grids(res):
    """Bicubic pos-embed interpolation at the real eval grids (40x40 for
    560, ~62x62 for 864; reference dinov2.py:166-190 scale_factor + 0.1
    trick) vs the torch spec."""
    from roma_tpu.models.vit import DinoV2

    h, w = res
    spec = DinoSpec(depth=0)
    pos = spec.interpolate_pos_encoding((h // 14) * (w // 14), h, w)

    model = DinoV2(depth=0)
    jpos = model._interpolate_pos_encoding(
        jnp.asarray(spec.pos_embed.detach().numpy()), h // 14, w // 14
    )
    np.testing.assert_allclose(
        np.asarray(jpos), pos.detach().numpy(), atol=2e-5, rtol=1e-5
    )


def test_gp_full_token_count():
    """GP Cholesky solve at the real 560-coarse token count (35^2 = 1225
    Gram matrix; reference matcher.py:301-309 eval path) vs the torch
    spec, f32."""
    from roma_tpu.models.matcher import GP

    torch.manual_seed(3)
    spec = GPSpec()
    rng = np.random.RandomState(3)
    x = rng.randn(1, 512, 35, 35).astype(np.float32)
    y = rng.randn(1, 512, 35, 35).astype(np.float32)
    with torch.no_grad():
        ref = spec(torch.tensor(x), torch.tensor(y))

    gp = GP()
    variables = {
        "params": {
            "pos_conv": {
                "kernel": jnp.asarray(
                    spec.pos_conv.weight.detach().numpy().transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(spec.pos_conv.bias.detach().numpy()),
            }
        }
    }
    got = gp.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got),
        ref.permute(0, 2, 3, 1).numpy(),
        atol=5e-3,
        rtol=1e-3,
    )


def test_pretrained_backbone_graft(spec_and_vars, monkeypatch):
    """zoo.pretrained_backbone grafts converted VGG/DINOv2 encoder weights
    into initialized variables (the reference trains with
    pretrained_backbone=True, experiments/train_roma_outdoor.py:187)."""
    import copy

    from roma_tpu.models import zoo

    spec, variables = spec_and_vars
    roma_sd, dinov2_sd = spec_state_dicts(spec)
    # torchvision vgg19_bn layout: prefix "features" instead of the
    # roma-checkpoint "encoder.cnn.layers"
    vgg_sd = {
        k.replace("encoder.cnn.layers.", "features."): v
        for k, v in roma_sd.items()
        if k.startswith("encoder.cnn.layers.")
    }

    import jax

    blank = copy.deepcopy(variables)
    for tree, path in (
        (blank["params"], ("encoder", "vgg")),
        (blank["params"], ("encoder", "dinov2")),
        (blank["batch_stats"], ("encoder", "vgg")),
    ):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = jax.tree.map(lambda a: np.zeros_like(a), node[path[-1]])

    out = zoo.pretrained_backbone(
        blank, dinov2_weights=dinov2_sd, vgg_weights=vgg_sd
    )
    # grafted subtrees match the full converter's output exactly
    for path in (
        ("params", "encoder", "vgg"),
        ("params", "encoder", "dinov2"),
        ("batch_stats", "encoder", "vgg"),
    ):
        want = variables
        got = out
        for k in path:
            want, got = want[k], got[k]
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            want,
            got,
        )
    # non-encoder params untouched
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["params"]["decoder"],
        out["params"]["decoder"],
    )
    # offline degrade: both missing -> unchanged, warned
    monkeypatch.setenv("ROMA_TPU_OFFLINE", "1")
    same = zoo.pretrained_backbone(blank)
    assert same is blank
