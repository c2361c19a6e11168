"""Stage-by-stage wall-clock + miss-statistics breakdown of the windowed
warp sampler (graveyard/window_warp_v1.py) at the real matcher shapes.

Flows are synthetic but adversarially realistic: smooth base warp +
foreground discontinuity (different shift) + an out-of-image band (sky /
non-covisible: targets far outside [-1,1]) + uncertainty speckle noise.

Run detached (tunnel):  nohup python tools/profile_window.py > /tmp/pw.log &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 16


def timeit(fn, *args, iters=20, warmup=2):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        r = jfn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jfn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    return (time.perf_counter() - t0) / iters


def realistic_flow(h, w, b=B, seed=0):
    """Piecewise-smooth warp with discontinuity + out-of-image band + noise."""
    rs = np.random.RandomState(seed)
    gy, gx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    flows = []
    for i in range(b):
        # smooth base: affine-ish + low-freq sinusoidal distortion
        a = 0.9 + 0.2 * rs.rand()
        tx, ty = 0.15 * rs.randn(2)
        fx = a * gx + tx + 0.05 * np.sin(2.3 * np.pi * gy + rs.rand() * 6)
        fy = a * gy + ty + 0.05 * np.sin(1.7 * np.pi * gx + rs.rand() * 6)
        # foreground object with a different shift (warp discontinuity)
        cy, cx = rs.uniform(-0.5, 0.5, 2)
        r0 = rs.uniform(0.15, 0.35)
        mask = ((gy - cy) ** 2 + (gx - cx) ** 2) < r0**2
        fx = np.where(mask, fx + rs.uniform(-0.3, 0.3), fx)
        fy = np.where(mask, fy + rs.uniform(-0.3, 0.3), fy)
        # out-of-image band (top sky): targets far outside
        band = gy < rs.uniform(-0.9, -0.6)
        fy = np.where(band, fy - 2.5, fy)
        # uncertainty speckle: heavy noise on 2% of pixels
        sp = rs.rand(h, w) < 0.02
        fx = fx + np.where(sp, 0.8 * rs.randn(h, w), 0.02 * rs.randn(h, w))
        fy = fy + np.where(sp, 0.8 * rs.randn(h, w), 0.02 * rs.randn(h, w))
        flows.append(np.stack([fx, fy], -1))
    return jnp.asarray(np.stack(flows), jnp.float32)


def miss_stats(h, w, spec, flow):
    """Replicate the prep stages; report per-tile miss counts with and
    without the fully-out-of-image refinement."""
    import graveyard.window_warp_v1 as ww

    b = flow.shape[0]
    n = h * w
    th, tw, wh, wwid, xq, pm = spec.th, spec.tw, spec.wh, spec.ww, spec.xq, spec.pm
    g = flow.reshape(b, n, 2).astype(jnp.float32)
    ix = (g[..., 0] + 1) * w / 2 - 0.5
    iy = (g[..., 1] + 1) * h / 2 - 0.5
    x0f, y0f = jnp.floor(ix), jnp.floor(iy)
    y0 = y0f.astype(jnp.int32) + pm
    x0 = x0f.astype(jnp.int32) + pm
    y0t, geom = ww._tile_fields(y0, h, w, th, tw)
    x0t, _ = ww._tile_fields(x0, h, w, th, tw)
    hp, wp = h + 2 * pm, w + 2 * pm
    wpx = wwid + max(0, -(-(wp - wwid) // xq)) * xq
    oy = ww._pick_origin(y0t.astype(jnp.float32), hp, wh)
    jx = ww._pick_origin(x0t.astype(jnp.float32), wpx, wwid, xq) // xq
    yl = y0t - oy[..., None]
    xl = x0t - (jx * xq)[..., None]
    miss = ~((yl >= 0) & (yl <= wh - 2) & (xl >= 0) & (xl <= wwid - 2))
    # fully-out-of-image: every bilinear corner outside -> value is 0, no fixup
    y0a, x0a = y0t - pm, x0t - pm
    touches = (y0a + 1 >= 0) & (y0a <= h - 1) & (x0a + 1 >= 0) & (x0a <= w - 1)
    need = miss & touches
    counts_all = np.asarray(jnp.sum(miss, axis=-1))
    counts_need = np.asarray(jnp.sum(need, axis=-1))
    # second window at the mean of remaining misses
    def second_window(counts_src, needm):
        oy2 = ww._pick_origin(
            jnp.where(needm, y0t, 0).astype(jnp.float32)
            * (counts_src[..., None] > 0),
            hp,
            wh,
        )
        # mean over misses only
        s = jnp.sum(jnp.where(needm, y0t, 0), axis=-1)
        c = jnp.maximum(jnp.sum(needm, axis=-1), 1)
        my = (s / c).astype(jnp.float32)
        sx = jnp.sum(jnp.where(needm, x0t, 0), axis=-1)
        mx = (sx / c).astype(jnp.float32)
        oy2 = jnp.clip(
            jnp.round(my - wh / 2).astype(jnp.int32), 0, hp - wh
        )
        jx2 = jnp.clip(
            (jnp.round((mx - wwid / 2) / xq)).astype(jnp.int32),
            0,
            (wpx - wwid) // xq,
        )
        yl2 = y0t - oy2[..., None]
        xl2 = x0t - (jx2 * xq)[..., None]
        in2 = (yl2 >= 0) & (yl2 <= wh - 2) & (xl2 >= 0) & (xl2 <= wwid - 2)
        return needm & ~in2

    need2 = second_window(counts_need, need)
    counts_need2 = np.asarray(jnp.sum(need2, axis=-1))
    for nm, cs in (
        ("all misses", counts_all),
        ("need-fix (touches image)", counts_need),
        ("need-fix after 2nd window", counts_need2),
    ):
        print(
            f"    {nm:28s}: mean {cs.mean():7.1f}  p95 {np.percentile(cs, 95):6.0f}"
            f"  max {cs.max():6.0f}  tiles>{spec.kf}: "
            f"{(cs > spec.kf).mean() * 100:5.2f}%  batches-hit: "
            f"{float((cs > spec.kf).any()) * 100:3.0f}%"
        )
    return counts_all, counts_need


def stage_times(h, w, c, spec, flow):
    import graveyard.window_warp_v1 as ww
    from roma_tpu.ops import grid_sample

    x = jnp.asarray(
        np.random.RandomState(1).randn(B, h, w, c), jnp.bfloat16
    )
    t_plain = timeit(lambda x, f: grid_sample(x, f), x, flow)
    print(f"    plain grid_sample       : {t_plain*1e3:8.2f} ms")
    t_win = timeit(
        lambda x, f: ww.windowed_grid_sample(x, f, spec=spec), x, flow
    )
    print(f"    windowed (current, full): {t_win*1e3:8.2f} ms")

    # window-table stage only (unfold + row gather)
    th, tw, wh, wwid, xq, pm = spec.th, spec.tw, spec.wh, spec.ww, spec.xq, spec.pm

    def window_stage(x, flow):
        b = x.shape[0]
        n = h * w
        g = flow.reshape(b, n, 2).astype(jnp.float32)
        ix = (g[..., 0] + 1) * w / 2 - 0.5
        iy = (g[..., 1] + 1) * h / 2 - 0.5
        y0 = jnp.floor(iy).astype(jnp.int32) + pm
        x0 = jnp.floor(ix).astype(jnp.int32) + pm
        y0t, geom = ww._tile_fields(y0, h, w, th, tw)
        x0t, _ = ww._tile_fields(x0, h, w, th, tw)
        nt = y0t.shape[1]
        hp, wp = h + 2 * pm, w + 2 * pm
        wpx = wwid + max(0, -(-(wp - wwid) // xq)) * xq
        nj = (wpx - wwid) // xq + 1
        oy = ww._pick_origin(y0t.astype(jnp.float32), hp, wh)
        jx = ww._pick_origin(x0t.astype(jnp.float32), wpx, wwid, xq) // xq
        xp = jnp.pad(x, ((0, 0), (pm, pm), (pm, wpx - w - pm), (0, 0)))
        xt_ = jnp.transpose(xp, (0, 1, 3, 2))
        u = jnp.stack(
            [
                jax.lax.slice_in_dim(xt_, j * xq, j * xq + wwid, axis=3)
                for j in range(nj)
            ],
            axis=1,
        )
        u = u.transpose(0, 2, 1, 3, 4).reshape(b, hp * nj, c * wwid)
        rows = (oy[..., None] + jnp.arange(wh)[None, None, :]) * nj + jx[..., None]
        win = jnp.take_along_axis(
            u, rows.reshape(b, nt * wh, 1), axis=1
        ).reshape(b * nt, wh, wwid * c)
        return win

    t_wstage = timeit(window_stage, x, flow)
    print(f"    window-table stage      : {t_wstage*1e3:8.2f} ms")

    # prep-only (tile fields for all 6 arrays + miss)
    def prep(x, flow):
        b = x.shape[0]
        n = h * w
        g = flow.reshape(b, n, 2).astype(jnp.float32)
        ix = (g[..., 0] + 1) * w / 2 - 0.5
        iy = (g[..., 1] + 1) * h / 2 - 0.5
        x0f, y0f = jnp.floor(ix), jnp.floor(iy)
        fx, fy = ix - x0f, iy - y0f
        y0 = y0f.astype(jnp.int32) + pm
        x0 = x0f.astype(jnp.int32) + pm
        outs = [ww._tile_fields(a, h, w, th, tw)[0] for a in (y0, x0, fy, fx, iy, ix)]
        hp, wp = h + 2 * pm, w + 2 * pm
        wpx = wwid + max(0, -(-(wp - wwid) // xq)) * xq
        oy = ww._pick_origin(outs[0].astype(jnp.float32), hp, wh)
        jx = ww._pick_origin(outs[1].astype(jnp.float32), wpx, wwid, xq) // xq
        yl = outs[0] - oy[..., None]
        xl = outs[1] - (jx * xq)[..., None]
        miss = ~((yl >= 0) & (yl <= wh - 2) & (xl >= 0) & (xl <= wwid - 2))
        return [yl, xl, miss] + outs[2:]

    t_prep = timeit(prep, x, flow)
    print(f"    index prep (tile fields): {t_prep*1e3:8.2f} ms")

    # compaction alone
    n = h * w
    nt_guess = -(-h // th) * (-(-w // tw))
    t = spec.t
    missx = jnp.asarray(
        np.random.RandomState(2).rand(B * nt_guess, 1, t) < 0.01
    )
    t_cmp = timeit(lambda m: ww._compact_miss(m, t, spec.kf), missx)
    print(f"    compact_miss kernel     : {t_cmp*1e3:8.2f} ms")
    return t_plain, t_win


def main():
    from graveyard.window_warp_v1 import WindowSpec

    print(f"backend={jax.default_backend()}")
    shapes = [
        (864, 864, 9),
        (432, 432, 64),
        (216, 216, 256),
        (560, 560, 9),
        (280, 280, 64),
    ]
    spec = WindowSpec()
    for h, w, c in shapes:
        print(f"== {h}x{w} C={c} (B={B}) ==")
        flow = realistic_flow(h, w)
        miss_stats(h, w, spec, flow)
        stage_times(h, w, c, spec, flow)


if __name__ == "__main__":
    main()
