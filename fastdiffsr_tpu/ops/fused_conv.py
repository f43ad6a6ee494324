"""Fused GroupNorm->Swish->3x3-Conv (+stats epilogue) Pallas kernel.

Motivation (BASELINE.md "Where the time goes"): 60% of the T=20 sampler
step is XLA kOutput fusions that attach GroupNorm statistics to a conv and
force a ~2.5x slower conv schedule. This kernel replaces the whole Block
structure (reference unet.py:89-101) for the inference path:

    y = conv3x3(swish(normalize(x))) + bias [+ per-batch shift] [+ residual]
    stats_y = per-channel (sum, sum_sq) of y over H,W   (feeds the NEXT GN)

as ONE VMEM pass per (batch, row-band):
- the 3x3 conv is an im2col matmul with contraction K = 9*C — at C=64 that
  fills the 128-lane MXU (K=576) instead of running at the ~50% lane
  ceiling of a C-contraction;
- normalize+swish happens on the row band in VMEM (no f32 HBM round-trip);
- ``x`` may be a TUPLE of feature maps: the UNet's skip-concat inputs are
  consumed as separate sources whose im2col parts concatenate in VMEM, so
  the (B,H,W,C1+C2) concat never materializes in HBM. GroupNorm groups may
  straddle the source boundary — group stats are computed on the
  concatenated channel stats and the per-channel affine is sliced per
  source, which is exact;
- H-halo rows come from a thin precomputed (B, nH, 2, W, C) side array of
  band-edge rows (standard BlockSpecs cannot overlap; fetching whole
  neighbor bands instead was measured 2.6x heavier on HBM reads).

Normalization statistics are PER-CHANNEL (B, 2, C) sums; the tiny
channel->group collapse + mean/rsqrt happens in XLA between kernel calls
(see group_stats_to_norm). Inference-only: no custom VJP (training keeps
the plain Flax path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def group_stats_to_norm(stats: jax.Array, hw: int, groups: int,
                        eps: float = 1e-5):
    """(B, 2, C) channel sums -> per-channel (mean, inv_std) of GroupNorm.

    ``stats`` may come from the kernel's epilogue or from
    channel_stats_pallas; ``hw`` is the spatial element count the sums
    cover.
    """
    b, _, c = stats.shape
    cg = c // groups
    cnt = float(hw * cg)
    gsum = jnp.sum(stats[:, 0].reshape(b, groups, cg), axis=-1)
    gsq = jnp.sum(stats[:, 1].reshape(b, groups, cg), axis=-1)
    mean_g = gsum / cnt
    var_g = jnp.maximum(gsq / cnt - mean_g ** 2, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=-1)   # (B, C)
    inv_c = jnp.repeat(inv_g, cg, axis=-1)
    return mean_c, inv_c


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _pick_th(h: int, w: int, cs, co: int, budget: int = 20 << 20,
             pks=None) -> int:
    """Row-band height such that the im2col patch buffer, its staging
    parts, and the f32 accumulator fit the VMEM budget; th divides h.

    Mosaic pads the lane (last) dim to 128, so small channel counts are
    costed at their PADDED width — without this the 9 stem parts at C=6
    each occupy a full 128-lane tile and blow the scoped-vmem limit.
    ``pks`` is the per-source patch part width (= cs, or pad128(c) in the
    lane-aligned patch modes).
    """
    kat = _pad128(9 * sum(pks if pks is not None else cs))
    per_row = w * (sum(9 * _pad128(c) * 2 for c in cs)
                   + kat * 2 + _pad128(co) * 4)
    th = max(1, min(h, budget // max(per_row, 1)))
    while h % th:
        th -= 1
    return max(th, 1)


def _halos(x: jax.Array, th: int, nH: int) -> jax.Array:
    """(B, nH, 2, W, C) band-edge rows; zero at the image borders (conv
    zero-padding). Thin strided row slices (2*(nH-1) rows), NOT a padded
    copy of x — a full-x pad per call costs more than the kernel saves."""
    B, H, W, C = x.shape
    zrow = jnp.zeros((B, 1, W, C), x.dtype)
    if nH > 1:
        inner_top = x[:, th - 1::th][:, :nH - 1]
        inner_bot = x[:, th::th][:, :nH - 1]
    else:
        inner_top = jnp.zeros((B, 0, W, C), x.dtype)
        inner_bot = jnp.zeros((B, 0, W, C), x.dtype)
    top_rows = jnp.concatenate([zrow, inner_top], axis=1)   # (B, nH, W, C)
    bot_rows = jnp.concatenate([inner_bot, zrow], axis=1)
    return jnp.stack([top_rows, bot_rows], axis=2)


@functools.partial(
    jax.jit,
    static_argnames=("groups", "eps", "apply_norm", "want_stats", "split",
                     "chunks", "phase"))
def fused_gn_swish_conv3x3(x,
                           gn_scale: Optional[jax.Array],
                           gn_bias: Optional[jax.Array],
                           stats_in,
                           w: jax.Array,
                           b: jax.Array,
                           shift: Optional[jax.Array] = None,
                           res: Optional[jax.Array] = None,
                           groups: int = 32,
                           eps: float = 1e-5,
                           apply_norm: bool = True,
                           want_stats: bool = True,
                           split: str = "none",
                           chunks: int = 4,
                           phase: str = "all"):
    """y [+ stats_y].

    x: (B,H,W,C) feature map, or a tuple of maps consumed as a channel
    concat without materializing it. stats_in: (B,2,C) channel sums of x
    over H,W (tuple matching x) — required when apply_norm. w:
    (3,3,C,Co) HWIO conv kernel, b: (Co,). shift: optional (B,Co) per-batch
    bias (FeatureWiseAffine). res: optional (B,H,W,Co) residual added
    before the stats epilogue. Returns y (B,H,W,Co) in x.dtype and, when
    want_stats, stats_y (B,2,Co) f32.

    split: how the im2col matmul is decomposed per grid step —
      "none":  one (th*W, 9C) patch and one K=9C dot (full patch-build
               barrier before the MXU starts);
      "dy":    three accumulating dots of K=3C per source, each on a
               patch slice built just before it — shortens the VPU
               dependency chain ahead of each MXU issue so Mosaic can
               overlap building chunk i+1 with the dot of chunk i;
      "dydx":  nine accumulating dots of K=C per source on shifted VIEWS
               (no patch concat at all; trades lane-padding waste at
               K=C<128 for zero build copies).
      "pad":   like "none" but every (src,dy,dx) part sits at a
               128-lane-aligned patch offset (zero-fill to pad128(C),
               matching zero rows in the weight matrix) — the patch
               build becomes whole-tile copies instead of the lane
               shuffles C=64 parts otherwise need, at the price of a
               (possibly) wider, partly-zero contraction;
      "rows":  M-chunked software pipeline: the row band is cut into
               ``chunks`` sub-bands; chunk m+1's patch is built (VPU)
               while the MXU consumes chunk m. The dots write DISJOINT
               row ranges (no accumulation dependency), and the issue
               order build(m+1)->dot(m) keeps both patch buffers live so
               Mosaic cannot fold them into one (WAR hazard) — the
               explicit double-buffering r2's split-dot variants lacked;
      "padrows": both.
    phase: timing diagnostics — "all" (real kernel), "build" (patch
      build runs, the MXU dot is replaced by a lane-slice of the patch),
      "dot" (the patch is zero-filled instead of built, dot runs).
      Non-"all" phases return wrong values; they exist so the VPU
      patch-build and MXU dot can be timed separately (tools/kernel_lab).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xs = x if isinstance(x, tuple) else (x,)
    n_src = len(xs)
    B, H, W = xs[0].shape[:3]
    Cs = [xx.shape[-1] for xx in xs]
    C = sum(Cs)
    Co = w.shape[-1]
    pad = split in ("pad", "padrows")
    # per-source patch part width: lane-align only where it helps (C >= 64
    # and not already a multiple of 128 — padding the C=6 stem would cost
    # 9x the MACs for nothing)
    pKs = [_pad128(c) if (pad and c % 128 and c >= 64) else c for c in Cs]
    K = 9 * sum(pKs)
    th = _pick_th(H, W, Cs, Co, pks=pKs)
    nH = H // th
    if split in ("rows", "padrows"):
        nM = max(d for d in range(1, min(chunks, th) + 1) if th % d == 0)
    else:
        nM = 1
    tm = th // nM

    if apply_norm:
        sts = stats_in if isinstance(stats_in, tuple) else (stats_in,)
        stats_cat = jnp.concatenate(sts, axis=-1) if n_src > 1 else sts[0]
        mean_c, inv_c = group_stats_to_norm(stats_cat, H * W, groups, eps)
        scale_full = (inv_c * gn_scale[None, :]).astype(jnp.float32)
        bias_full = (gn_bias[None, :]
                     - mean_c * inv_c * gn_scale[None, :]).astype(jnp.float32)
    else:  # identity prologue: y = conv(x)
        scale_full = jnp.ones((B, C), jnp.float32)
        bias_full = jnp.zeros((B, C), jnp.float32)

    offs = [0]
    for c in Cs:
        offs.append(offs[-1] + c)
    scales = [scale_full[:, None, offs[k]:offs[k + 1]] for k in range(n_src)]
    biases = [bias_full[:, None, offs[k]:offs[k + 1]] for k in range(n_src)]

    if shift is None:
        shift = jnp.zeros((B, Co), jnp.float32)
    shift = shift.astype(jnp.float32)[:, None, :]  # (B,1,Co)

    dtype = xs[0].dtype
    # weight rows regrouped per source, each in (dy,dx,c) patch order; in
    # pad mode each (dy,dx,src) row group is zero-filled to pad128(C) so
    # the zero patch lanes multiply zero weight rows (exact)
    wparts = []
    for k in range(n_src):
        wk = w[:, :, offs[k]:offs[k + 1]].astype(dtype)
        if pKs[k] != Cs[k]:
            wk = jnp.pad(wk.reshape(9, Cs[k], Co),
                         ((0, 0), (0, pKs[k] - Cs[k]), (0, 0)))
        wparts.append(wk.reshape(9 * pKs[k], Co))
    wmat = jnp.concatenate(wparts, axis=0) if n_src > 1 else wparts[0]
    bvec = b.astype(jnp.float32).reshape(1, Co)

    have_res = res is not None
    if not have_res:
        res = jnp.zeros((B, 1, 1, Co), dtype)   # dummy, never read

    halos = [_halos(xx, th, nH) for xx in xs]

    def kernel(*refs):
        x_refs = refs[0:n_src]
        h_refs = refs[n_src:2 * n_src]
        s_refs = refs[2 * n_src:3 * n_src]
        b_refs = refs[3 * n_src:4 * n_src]
        sh_ref, w_ref, bias_ref, res_ref, y_ref, st_ref = refs[4 * n_src:]

        j = pl.program_id(1)
        nj = pl.num_programs(1)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
        edge_ok = jnp.logical_and(
            jnp.logical_or(row_idx > 0, j > 0),
            jnp.logical_or(row_idx < th + 1, j < nj - 1))

        def norm_band(k):
            ck = Cs[k]
            rows = jnp.concatenate(
                [h_refs[k][0, 0, 0][None], x_refs[k][0],
                 h_refs[k][0, 0, 1][None]], axis=0)   # (th+2, W, Ck)
            xf = rows.astype(jnp.float32) * s_refs[k][0, 0] \
                + b_refs[k][0, 0]
            if apply_norm:
                xf = xf * jax.nn.sigmoid(xf)          # swish
                # zero halo rows must STAY zero after the affine
                # (zero-padding applies to the normalized map)
                xf = jnp.where(edge_ok, xf, 0.0)
            xn = xf.astype(dtype)
            zcol = jnp.zeros((th + 2, 1, ck), xn.dtype)
            return jnp.concatenate([zcol, xn, zcol], axis=1)

        def dot_w(pat_k, row0, krows):
            return jax.lax.dot_general(
                pat_k, w_ref[row0:row0 + krows, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if split in ("none", "pad", "rows", "padrows"):
            xns = [norm_band(k) for k in range(n_src)]

            def build_chunk(m):
                r0 = m * tm
                parts = []
                for k in range(n_src):
                    ck = Cs[k]
                    for dy in range(3):
                        for dx in range(3):
                            parts.append(
                                xns[k][r0 + dy:r0 + dy + tm,
                                       dx:dx + W].reshape(tm * W, ck))
                            if pKs[k] != ck:   # pad modes: lane-align
                                parts.append(jnp.zeros(
                                    (tm * W, pKs[k] - ck), xns[k].dtype))
                return (jnp.concatenate(parts, axis=-1)
                        if len(parts) > 1 else parts[0])

            if phase == "dot":      # timing: dot on a zero-filled patch
                build = lambda m: jnp.zeros((tm * W, K), dtype)
            else:
                build = build_chunk
            if phase == "build":    # timing: consume the patch on the VPU
                consume = lambda pat: jnp.broadcast_to(
                    jnp.sum(pat, axis=1, keepdims=True),
                    (tm * W, Co)).astype(jnp.float32)
            else:
                consume = lambda pat: dot_w(pat, 0, K)

            # software pipeline (rows modes, nM > 1): issue order is
            # build(m+1) -> dot(m), the dots write DISJOINT row ranges,
            # and chunk m's patch stays live across chunk m+1's build so
            # the two staging buffers cannot be folded into one
            prev = build(0)
            outs = []
            for m in range(1, nM):
                cur = build(m)
                outs.append(consume(prev))
                prev = cur
            outs.append(consume(prev))
            acc = outs[0] if nM == 1 else jnp.concatenate(outs, axis=0)
        else:
            acc = None
            row0 = 0
            for k in range(n_src):
                ck = Cs[k]
                xn = norm_band(k)
                for dy in range(3):
                    if split == "dy":
                        chunk = jnp.concatenate(
                            [xn[dy:dy + th, dx:dx + W].reshape(th * W, ck)
                             for dx in range(3)], axis=-1)
                        d = dot_w(chunk, row0, 3 * ck)
                        row0 += 3 * ck
                        acc = d if acc is None else acc + d
                    else:                            # "dydx"
                        for dx in range(3):
                            d = dot_w(
                                xn[dy:dy + th, dx:dx + W].reshape(th * W, ck),
                                row0, ck)
                            row0 += ck
                            acc = d if acc is None else acc + d
        acc = acc + bias_ref[...] + sh_ref[0, 0]
        if have_res:
            acc = acc + res_ref[0].reshape(th * W, Co).astype(jnp.float32)

        y_ref[0] = acc.reshape(th, W, Co).astype(y_ref.dtype)
        if want_stats:
            s1 = jnp.sum(acc, axis=0)
            s2 = jnp.sum(acc * acc, axis=0)
            st_ref[0, 0] = jnp.stack([s1, s2])

    in_specs = (
        [pl.BlockSpec((1, th, W, c), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM) for c in Cs]
        + [pl.BlockSpec((1, 1, 2, W, c), lambda i, j: (i, j, 0, 0, 0),
                        memory_space=pltpu.VMEM) for c in Cs]
        + [pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM) for c in Cs]
        + [pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM) for c in Cs]
        + [
            pl.BlockSpec((1, 1, Co), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, th, W, Co), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM) if have_res else
             pl.BlockSpec((1, 1, 1, Co), lambda i, j: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
        ])
    out_shape = [jax.ShapeDtypeStruct((B, H, W, Co), dtype),
                 jax.ShapeDtypeStruct((B, nH, 2, Co), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, th, W, Co), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2, Co), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    y, partial = pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*xs, *halos, *scales, *biases, shift, wmat, bvec, res)

    if want_stats:
        return y, jnp.sum(partial, axis=1)
    return y
