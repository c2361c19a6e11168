"""Big RoMa match heads + coarse-to-fine decoder (Flax, NHWC).

TPU-native re-design of reference romatch/models/matcher.py:
  * ``CosKernel``/``GP`` (matcher.py:182-323): cosine Gram matrices as MXU
    matmuls in f32, eval-path Cholesky solve (jnp.linalg.cholesky +
    batched triangular solves) — never the explicit inverse.
  * ``TransformerDecoder`` (transformer/__init__.py:10-46): 5 pre-norm ViT
    blocks over cat(gp_posterior, proj_feats) tokens, linear head to
    64^2 + 1 coarse-match classification channels.
  * ``ConvRefiner`` (matcher.py:23-179): grid-sample warp of B-features,
    displacement embedding, Pallas/XLA windowed local correlation
    (ops.local_corr replaces the fused-local-corr CUDA extension), depthwise
    5x5 conv blocks, f32 out_conv.
  * ``Decoder`` (matcher.py:326-527): scale loop 16->1 (or 8->1 for the
    upsample pass), flow/certainty x2 upsampling with optional detach.

Compute dtype is configurable: the reference's fp16 autocast regions map to
bf16 on TPU; GP solve and out_conv stay f32 (matcher.py:177, 296).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (
    cls_to_flow_refine,
    interpolate,
    local_correlation,
    normalized_grid,
    warp_sample,
)
from ..ops import pallas_refiner
from .blocks import QConv1x1, torch_bn, torch_conv
from .config import RefinerSpec, RoMaConfig
from .encoders import CNNandDinov2
from .vit import ScannedBlocks

Dtype = Any


# ---------------------------------------------------------------------------
# GP coarse-match module
# ---------------------------------------------------------------------------


def cos_kernel(x: jnp.ndarray, y: jnp.ndarray, T: float, eps: float = 1e-6):
    """K = exp((cos(x, y) - 1)/T); x (B,N,D), y (B,M,D) f32
    (reference matcher.py:182-200)."""
    c = jnp.einsum("bnd,bmd->bnm", x, y, preferred_element_type=jnp.float32)
    nx = jnp.linalg.norm(x, axis=-1)
    ny = jnp.linalg.norm(y, axis=-1)
    c = c / (nx[..., :, None] * ny[..., None, :] + eps)
    return jnp.exp((c - 1.0) / T)


class GP(nn.Module):
    """Gaussian-process regression from B-features to B's Fourier positional
    basis (reference matcher.py:203-323, eval path)."""

    gp_dim: int = 512
    T: float = 0.2
    sigma_noise: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y: (B, H, W, C) projected features -> (B, H, W, gp_dim) f32."""
        b, h1, w1, c = x.shape
        _, h2, w2, _ = y.shape
        n, m = h1 * w1, h2 * w2

        coords = normalized_grid(h2, w2)[None]  # (1, h2, w2, 2)
        pos = torch_conv(self.gp_dim, kernel=1, padding=0, name="pos_conv")(coords)
        f = jnp.cos(8 * jnp.pi * pos).reshape(1, m, self.gp_dim)  # Fourier basis

        xf = x.astype(jnp.float32).reshape(b, n, c)
        yf = y.astype(jnp.float32).reshape(b, m, c)
        k_yy = cos_kernel(yf, yf, self.T)
        k_xy = cos_kernel(xf, yf, self.T)
        k_yy = k_yy + self.sigma_noise * jnp.eye(m, dtype=jnp.float32)

        chol = jnp.linalg.cholesky(k_yy)  # (B, M, M) lower
        fb = jnp.broadcast_to(f, (b, m, self.gp_dim))
        z = jax.scipy.linalg.solve_triangular(chol, fb, lower=True)
        w = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(chol, -1, -2), z, lower=False
        )
        mu = jnp.einsum("bnm,bmd->bnd", k_xy, w, preferred_element_type=jnp.float32)
        return mu.reshape(b, h1, w1, self.gp_dim)


# ---------------------------------------------------------------------------
# Transformer match proposer
# ---------------------------------------------------------------------------


class TransformerDecoder(nn.Module):
    """5x ViT blocks + linear head to res^2+1 anchor-classification channels
    (reference transformer/__init__.py:10-46)."""

    depth: int = 5
    dim: int = 1024
    num_heads: int = 8
    out_dim: int = 64 * 64 + 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, gp_posterior: jnp.ndarray, features: jnp.ndarray):
        b, h, w, _ = gp_posterior.shape
        x = jnp.concatenate(
            (gp_posterior.astype(self.dtype), features.astype(self.dtype)), axis=-1
        )
        tokens = x.reshape(b, h * w, self.dim)
        # lane-pad the sequence through the stack (35^2=1225 -> 1280); the
        # padded keys are masked from the attention softmax via n_valid
        ntok = h * w
        npad = -(-ntok // 128) * 128
        if npad != ntok:
            tokens = jnp.pad(tokens, ((0, 0), (0, npad - ntok), (0, 0)))
        # reference Block defaults: qkv_bias=False, no LayerScale
        # (transformer/layers/block.py:42, roma_models.py:78)
        tokens = ScannedBlocks(
            depth=self.depth, dim=self.dim, num_heads=self.num_heads,
            layer_scale=False, qkv_bias=False, dtype=self.dtype,
            n_valid=ntok if npad != ntok else None, name="blocks",
        )(tokens)
        out = nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="to_out"
        )(tokens[:, :ntok])
        out = out.astype(jnp.float32).reshape(b, h, w, self.out_dim)
        return out[..., :-1], out[..., -1:]  # cls logits, certainty


# ---------------------------------------------------------------------------
# ConvRefiner
# ---------------------------------------------------------------------------


class RefinerBlock(nn.Module):
    """create_block: Conv(k5, depthwise) -> BN -> ReLU -> Conv1x1
    (reference matcher.py:92-122)."""

    out_dim: int
    kernel: int = 5
    dtype: Dtype = jnp.float32
    train: bool = False
    bn_momentum: float = 0.01
    int8: bool = False  # serving-only: 1x1 via dynamic int8 (zero-grad round)

    @nn.compact
    def __call__(self, x):
        groups = x.shape[-1]  # dw=True everywhere in big RoMa
        x = torch_conv(
            self.out_dim, kernel=self.kernel, padding=self.kernel // 2,
            groups=groups, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not self.train,
            momentum=1.0 - self.bn_momentum,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        x = nn.relu(x)
        if self.int8 and not self.train:
            return QConv1x1(self.out_dim, dtype=self.dtype, name="conv2")(x)
        return torch_conv(self.out_dim, kernel=1, padding=0, dtype=self.dtype, name="conv2")(x)


class ScannedRefinerBlocks(nn.Module):
    """The 8 identical hidden blocks under nn.scan (own submodule so the scan
    target scope contains only the scanned block — sibling params must not be
    lifted).

    ``unroll=True`` (inference default) unrolls the scan body while keeping
    the depth-stacked weight layout: the scan's per-iteration carry forces an
    HBM layout round-trip on TPU (~90ms/refiner at 864^2); unrolled, XLA keeps
    one layout across blocks. Training keeps the rolled scan for compile time.
    """

    length: int
    block_kwargs: dict
    unroll: bool = True
    remat: bool = False  # checkpoint each scan iteration (training memory)

    @nn.compact
    def __call__(self, x):
        def body(mdl, carry, _):
            return RefinerBlock(**self.block_kwargs, name="block")(carry), None

        if self.remat:
            # per-iteration checkpoint: without it the scan stashes every
            # block's conv/BN residuals (~3 tensors x (B,H,W,C) x 8 blocks —
            # the dominant buffer at the fine scales under training), with
            # it only the 8 carry inputs survive to backward. prevent_cse
            # is pointless inside a scan body (no cross-iteration CSE).
            body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            length=self.length,
            unroll=self.length if self.unroll else 1,
        )
        x, _ = scan(self, x, None)
        return x


class ConvRefiner(nn.Module):
    """Per-scale refinement CNN (reference matcher.py:23-179).

    Depthwise 5x5 + 1x1 blocks (the 8 identical hidden blocks run under
    nn.scan — one compiled block, depth-stacked weights); local correlation
    window around the current warp for the coarse scales; f32 out_conv
    producing (delta_flow, delta_cert).
    """

    spec: RefinerSpec
    dtype: Dtype = jnp.float32
    train: bool = False
    bn_momentum: float = 0.01
    remat: bool = False  # per-block scan checkpointing (training memory)
    int8: bool = False   # serving-only: hidden 1x1 convs via dynamic int8

    @nn.compact
    def __call__(self, x, y, flow, scale_factor: float = 1.0):
        """x, y: (B,H,W,C) projected A/B features; flow (B,H,W,2) A->B warp."""
        b, hs, ws, _ = x.shape
        s = self.spec
        # NOTE: local_correlation(..., return_lookup=True) can hand back the
        # x_hat lookup for free from the patch corners, but routing it here
        # measured SLOWER end-to-end (4.21 -> 3.70 pairs/sec): the second
        # consumer on the gathered patch breaks XLA's gather-einsum fusion
        # and re-materializes the (n, P^2, C) transient. Separate lookups
        # stay.
        x_hat = warp_sample(y, flow, inference=not self.train)
        grid = normalized_grid(hs, ws)
        disp = flow.astype(jnp.float32) - grid
        emb = torch_conv(
            s.disp_emb_dim, kernel=1, padding=0, dtype=self.dtype, name="disp_emb"
        )((40.0 / 32.0 * scale_factor * disp).astype(self.dtype))
        parts = [x, x_hat, emb]
        if s.local_corr_radius is not None:
            corr = local_correlation(
                x, y, s.local_corr_radius, flow, inference=not self.train
            )
            parts.append(corr.astype(self.dtype))
        d = jnp.concatenate(parts, axis=-1)
        blk = dict(
            out_dim=s.hidden_dim, kernel=s.kernel_size, dtype=self.dtype,
            train=self.train, bn_momentum=self.bn_momentum, int8=self.int8,
        )
        # Inference fast path for the narrow-channel stacks (scale 1: C=24,
        # where XLA's NHWC convs waste 81% of the vector lanes): fold the BN
        # into the depthwise convs and run all 9 blocks as fused Pallas
        # channel-major strip kernels (2.7x on v5e at 864^2). Wider scales
        # stay on XLA's scanned convs — measured faster than a lane-major
        # Pallas variant at every C in {144, 569, 1137, 1377} (see
        # graveyard/pallas_refiner_lanemajor.py notes). Same params,
        # read directly from this module's variable tree; training and init
        # keep the module path (BN batch stats + autodiff).
        use_fused = (
            not self.train
            and s.hidden_dim <= pallas_refiner.CMAJOR_MAX_C
            and not self.is_initializing()
            and "batch_stats" in self.variables
        )
        if use_fused:
            folded = pallas_refiner.fold_refiner_tree(
                self.variables["params"], self.variables["batch_stats"]
            )
            d = pallas_refiner.fused_refiner_stack(d, folded)
        else:
            d = RefinerBlock(**blk, name="block1")(d)
            d = ScannedRefinerBlocks(
                length=s.hidden_blocks, block_kwargs=blk, unroll=not self.train,
                remat=self.remat and self.train, name="hidden",
            )(d)
        out = torch_conv(3, kernel=1, padding=0, name="out_conv")(d.astype(jnp.float32))
        return out[..., :2], out[..., 2:]


# ---------------------------------------------------------------------------
# Decoder (coarse-to-fine orchestrator)
# ---------------------------------------------------------------------------

# Released-model specs (= RoMaConfig() defaults), kept as module constants for
# external use; Decoder derives its own from its config.
REFINER_SPECS = RoMaConfig().refiner_specs()
PROJ_SPECS = RoMaConfig().proj_specs()


class Decoder(nn.Module):
    """Scale loop (reference matcher.py:326-527). ``upsample=True`` runs
    scales [8,4,2,1] seeded with the previous pass's finest flow/certainty."""

    config: RoMaConfig = RoMaConfig()
    dtype: Dtype = jnp.float32
    train_mode: bool = False
    detach: bool = True
    refine_init: int = 4
    remat: bool = False  # jax.checkpoint each refiner (training memory)

    def setup(self):
        cfg = self.config
        # GP stashes several (B, M, M) f32 intermediates (kernel matrices,
        # Cholesky factor, triangular-solve residuals) — ~0.5 GB at the
        # 560^2-train shape; recomputing them in backward is ~12 GFLOP.
        # TransformerDecoder's blocks already remat per-iteration
        # (ScannedBlocks default), so only its concat/head get wrapped.
        gp_cls = nn.remat(GP) if self.remat else GP
        td_cls = nn.remat(TransformerDecoder) if self.remat else TransformerDecoder
        self.embedding_decoder = td_cls(
            depth=cfg.decoder_depth,
            dim=cfg.decoder_dim,
            num_heads=cfg.decoder_heads,
            out_dim=cfg.cls_res**2 + 1,
            dtype=self.dtype,
            name="embedding_decoder",
        )
        self.gp16 = gp_cls(gp_dim=cfg.gp_dim, name="gp16")
        self._projs = {
            s: (
                torch_conv(out, kernel=1, padding=0, dtype=self.dtype, name=f"proj{s}_conv"),
                torch_bn(affine=True, train=self.train_mode, dtype=self.dtype, name=f"proj{s}_bn"),
            )
            for s, (_, out) in cfg.proj_specs().items()
        }
        # nn.remat on the CLASS keeps the instance name scope, so param
        # paths (and the .pth converter mapping) are identical with or
        # without rematerialization. The refiner stacks hold the bulk of
        # the training activations (9 conv blocks at up to full res);
        # recomputing them in backward is what lets a 16 GB v5e chip fit
        # the reference's A100-80GB per-device batch (see train bench).
        refiner_cls = nn.remat(ConvRefiner) if self.remat else ConvRefiner
        self._refiners = {
            s: refiner_cls(
                spec,
                dtype=self.dtype,
                train=self.train_mode,
                remat=self.remat,
                int8=cfg.refiner_int8,
                name=f"refiner{s}",
            )
            for s, spec in cfg.refiner_specs().items()
        }

    def __call__(
        self,
        f1: dict[int, jnp.ndarray],
        f2: dict[int, jnp.ndarray],
        upsample: bool = False,
        flow: jnp.ndarray | None = None,
        certainty: jnp.ndarray | None = None,
        scale_factor: float = 1.0,
        gm_logit_bias: jnp.ndarray | None = None,
    ):
        """``gm_logit_bias`` (B, H16, W16, cls_res^2) is a diagnostic hook:
        added to the coarse classification logits before cls_to_flow_refine.
        Used by the full-dims parity pin (tools/fullres_parity.py) to render a
        peaked synthetic warp into the classifier — with random weights the
        64^2-way softmax is a near-uniform tie and argmax flips swamp the
        numerics being measured. Never set on the production path."""
        scales = [8, 4, 2, 1] if upsample else [16, 8, 4, 2, 1]
        sizes = {s: (f.shape[1], f.shape[2]) for s, f in f1.items()}
        h, w = sizes[1]
        b = f1[1].shape[0]
        coarsest = scales[0]

        if not upsample:
            flow = jnp.broadcast_to(
                normalized_grid(*sizes[coarsest]), (b, *sizes[coarsest], 2)
            )
            certainty = jnp.zeros((b, *sizes[coarsest], 1), jnp.float32)
        else:
            flow = interpolate(flow, sizes[coarsest], mode="bilinear")
            certainty = interpolate(certainty, sizes[coarsest], mode="bilinear")

        corresps: dict[int, dict[str, jnp.ndarray]] = {}
        for ins in scales:
            corresps[ins] = {}
            conv, bn = self._projs[ins]
            f1_s = bn(conv(f1[ins].astype(self.dtype)))
            f2_s = bn(conv(f2[ins].astype(self.dtype)))

            if ins == 16 and not upsample:
                gp_posterior = self.gp16(f1_s, f2_s)
                cls_logits, certainty = self.embedding_decoder(gp_posterior, f1_s)
                if gm_logit_bias is not None:
                    cls_logits = cls_logits + gm_logit_bias
                flow = cls_to_flow_refine(cls_logits)
                if self.train_mode:
                    corresps[ins].update(gm_cls=cls_logits, gm_certainty=certainty)

            if self.train_mode:
                corresps[ins]["flow_pre_delta"] = flow
            delta_flow, delta_certainty = self._refiners[ins](
                f1_s, f2_s, flow, scale_factor=scale_factor
            )
            if self.train_mode:
                corresps[ins]["delta_flow"] = delta_flow
            displacement = ins * jnp.stack(
                (
                    delta_flow[..., 0] / (self.refine_init * w),
                    delta_flow[..., 1] / (self.refine_init * h),
                ),
                axis=-1,
            )
            flow = flow + displacement
            certainty = certainty + delta_certainty
            corresps[ins].update(certainty=certainty, flow=flow)

            if ins != 1:
                flow = interpolate(flow, sizes[ins // 2], mode="bilinear")
                certainty = interpolate(certainty, sizes[ins // 2], mode="bilinear")
                if self.detach:
                    flow = jax.lax.stop_gradient(flow)
                    certainty = jax.lax.stop_gradient(certainty)
        return corresps


# ---------------------------------------------------------------------------
# Full network: encoder + decoder with symmetric batching
# ---------------------------------------------------------------------------


class RoMaNet(nn.Module):
    """Backbone + decoder with the reference's A|B concat batching
    (reference matcher.py:585-670)."""

    config: RoMaConfig = RoMaConfig()
    dtype: Dtype = jnp.float32
    coarse_dtype: Dtype = jnp.float32
    train_mode: bool = False
    remat: bool = False  # checkpoint VGG + refiners (training memory)

    def setup(self):
        self.encoder = CNNandDinov2(
            config=self.config,
            dtype=self.dtype,
            coarse_dtype=self.coarse_dtype,
            train=self.train_mode,
            remat=self.remat,
            name="encoder",
        )
        self.decoder = Decoder(
            config=self.config,
            dtype=self.dtype,
            train_mode=self.train_mode,
            remat=self.remat,
            name="decoder",
        )

    def __call__(
        self,
        im_A: jnp.ndarray,
        im_B: jnp.ndarray,
        symmetric: bool = False,
        upsample: bool = False,
        flow: jnp.ndarray | None = None,
        certainty: jnp.ndarray | None = None,
        scale_factor: float = 1.0,
        gm_logit_bias: jnp.ndarray | None = None,
    ):
        x = jnp.concatenate((im_A, im_B), axis=0).astype(self.dtype)
        pyramid = self.encoder(x, upsample=upsample)
        if symmetric:
            f_q = pyramid
            f_s = {
                s: jnp.concatenate(jnp.split(f, 2, axis=0)[::-1], axis=0)
                for s, f in pyramid.items()
            }
        else:
            f_q = {s: jnp.split(f, 2, axis=0)[0] for s, f in pyramid.items()}
            f_s = {s: jnp.split(f, 2, axis=0)[1] for s, f in pyramid.items()}
        return self.decoder(
            f_q,
            f_s,
            upsample=upsample,
            flow=flow,
            certainty=certainty,
            scale_factor=scale_factor,
            gm_logit_bias=gm_logit_bias,
        )
