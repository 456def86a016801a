"""Block-DMA Pallas RoIAlign — one rectangular DMA per RoI.

Successor to the strip kernel (``pallas_roi_align_fused.py``).  The strip
kernel issues ``2*ny`` row-strip DMAs per RoI (28 for the 7x7 branch, 56
for 14x14) and is descriptor-issue-bound on TPU (profiled ~10 issues/us);
with 2048 bbox RoIs that is ~57k descriptors per branch per step.

Key observation: ``(B, H, W, C)`` reshapes to ``(B*H, W, C)`` as a pure
bitcast, and a RoI's entire sample footprint at its FPN level is a
rectangle in that view — so the whole footprint moves as ONE rectangular
DMA (``BH`` rows x ``window`` cells x C), cutting descriptors per RoI
from ``2*ny`` (fwd) / up to ``4*ny`` (bwd RMW) to 1 / 2.  Per-level 3-D
views also remove the 85 MB flat-buffer concat the strip kernel needed
(``prepare_flat_levels``), and the backward becomes radically simpler:

- every flat row appears at most once in a block, so the strip kernel's
  intra-RoI dedup (equality-matrix contraction) is unnecessary;
- narrow-level partial strip overlap cannot happen (the block is clipped
  to the level's padded width), so the symmetric partner-total matmuls
  are unnecessary;
- cross-RoI RMW hazards are handled exactly as before: K-chain partial
  buffers (a chain only touches its own partials) + a wait-previous-
  writes fence per chain, partials summed by the caller.

Bilinear resolution is two one-hot interpolation matmuls on the MXU
(y over block rows, x over window cells) — the transposed pair scatters
the gradient block in the backward.

Level rule: ``floor(log2(sqrt(wh)/56))`` as the reference
(``mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:
32-52``), with a SYMMETRIC window push: an RoI whose x- OR y-extent at
its level exceeds ``window - 4`` cells is pushed coarser until it fits
(the strip kernel pushed on x only; blocks bound both dims).  Affects
only aspect ratios ≳6 at level-boundary scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .roi_align import map_roi_levels, _sample_coords


def prepare_block_levels(features, window):
    """Pad + bitcast the FPN levels for block fetches.

    Each level becomes ``(B*Hp, Wp, C)`` with ``Wp >= window + 8`` (x pad
    so a full window always fits) and ``B*Hp >= window + 8`` (row pad for
    tiny test levels).  Production 1024^2 levels P2-P4 are untouched
    bitcasts; P5 (32 cells) pays a ~1 MB pad.  Returns (views, consts).
    """
    win = window + 8
    views = []
    heights, widths = [], []
    B = features[0].shape[0]
    for f in features:
        _, H, W, C = f.shape
        Hp = max(H, -(-win // B))
        Wp = max(W, win)
        if Hp != H or Wp != W:
            f = jnp.pad(f, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        views.append(f.reshape(B * Hp, Wp, C))
        heights.append(Hp)
        widths.append(Wp)
    return views, dict(B=B, C=features[0].shape[-1],
                       heights=np.asarray(heights, np.int32),
                       widths=np.asarray(widths, np.int32))


def _block_plan(rois, consts, featmap_strides, output_size, sr, aligned,
                finest_scale, window, roi_valid):
    """Per-RoI block coordinates + interpolation offsets/fractions.

    All index math is vectorised (traced); the kernel only reads the
    results.  ``window`` here is the PADDED window (window + 8)."""
    num_levels = len(featmap_strides)
    heights = consts["heights"][:num_levels]     # padded Hp (per batch)
    widths = consts["widths"][:num_levels]       # padded Wp
    B = consts["B"]
    boxes = rois[:, 1:5]
    batch_idx = rois[:, 0].astype(jnp.int32)
    lvl = map_roi_levels(boxes, num_levels, finest_scale)
    # symmetric push: both extents must fit in window - 4 cells
    ext = jnp.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
    need = ext / (float(featmap_strides[0]) * (window - 8 - 4))
    lvl_min = jnp.ceil(jnp.log2(jnp.maximum(need, 1e-9))).astype(jnp.int32)
    lvl = jnp.clip(jnp.maximum(lvl, lvl_min), 0, num_levels - 1)

    strides = jnp.asarray(featmap_strides, jnp.float32)
    Hl = jnp.asarray(heights)[lvl]               # padded rows per image
    Wl = jnp.asarray(widths)[lvl]
    scaled = boxes / strides[lvl][:, None]
    ys, xs = _sample_coords(scaled, output_size, sr, aligned)
    y_s = ys[:, :, 0]                            # (R, ny)
    x_s = xs[:, 0, :]                            # (R, nx)
    # border rules use the TRUE level size = image_size / stride; the
    # padded tail rows/cols are out-of-level by construction
    true_h = consts["true_heights"][:num_levels]
    true_w = consts["true_widths"][:num_levels]
    Hf = jnp.asarray(true_h, jnp.float32)[lvl]
    Wf = jnp.asarray(true_w, jnp.float32)[lvl]
    out_y = (y_s < -1.0) | (y_s > Hf[:, None])
    out_x = (x_s < -1.0) | (x_s > Wf[:, None])
    yc = jnp.clip(y_s, 0.0, Hf[:, None] - 1.0)
    xc = jnp.clip(x_s, 0.0, Wf[:, None] - 1.0)
    Hi = Hf.astype(jnp.int32)
    Wi = Wf.astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(yc), 0,
                  jnp.maximum(Hi[:, None] - 2, 0)).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xc), 0,
                  jnp.maximum(Wi[:, None] - 2, 0)).astype(jnp.int32)
    ly = jnp.where(out_y, -1.0, yc - y0)         # -1 => zero weight
    lx = jnp.where(out_x, -1.0, xc - x0)
    if roi_valid is not None:
        gate = roi_valid[:, None]
        ly = jnp.where(gate, ly, -1.0)
        lx = jnp.where(gate, lx, -1.0)

    # x window: 8-aligned cell start with the full window inside Wp
    xw = jnp.minimum(jnp.min(x0, axis=1), jnp.maximum(Wl - window, 0))
    xw = jnp.maximum(xw - xw % 8, 0)
    e0 = x0 - xw[:, None]                        # (R, nx) in [0, window-1]
    # y block: rows are the MAJOR dim of the (B*Hp, Wp, C) view — no
    # alignment requirement; clamp so the block stays inside the buffer
    row_min = batch_idx * Hl + jnp.min(y0, axis=1)
    row0 = jnp.clip(row_min, 0, B * Hl - window)
    f0 = (batch_idx * Hl)[:, None] + y0 - row0[:, None]   # in [0, window-1]
    if roi_valid is not None:
        row0 = jnp.where(roi_valid, row0, 0)
        xw = jnp.where(roi_valid, xw, 0)
    return dict(lvl=lvl.astype(jnp.int32), row0=row0.astype(jnp.int32),
                xw=xw.astype(jnp.int32), e0=e0.astype(jnp.int32),
                f0=f0.astype(jnp.int32), lx=lx.astype(jnp.float32),
                ly=ly.astype(jnp.float32))


def _onehot_interp(idx, frac, n, size):
    """(n, size) interpolation matrix: row s has ``1-frac`` at idx[s] and
    ``frac`` at idx[s]+1; rows with ``frac < 0`` are zero."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, size), 1)
    valid = (frac >= 0.0).astype(jnp.float32)
    fc = jnp.maximum(frac, 0.0)
    w = jnp.where(iota == idx[:, None], (1.0 - fc)[:, None], 0.0) + \
        jnp.where(iota == (idx + 1)[:, None], fc[:, None], 0.0)
    return w * valid[:, None]


def _fwd_kernel(oh, ow, sr, window, C, R, L, slots, dtype,
                lvl_ref, row0_ref, xw_ref,
                e0_ref, f0_ref, lx_ref, ly_ref,
                *rest):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    level_refs = rest[:L]
    out_ref = rest[L]
    buf, sems = rest[L + 1], rest[L + 2]
    ny, nx = oh * sr, ow * sr
    r = pl.program_id(0)

    def start_dma(slot, roi):
        for l in range(L):
            @pl.when(lvl_ref[roi] == l)
            def _(l=l):
                pltpu.make_async_copy(
                    level_refs[l].at[
                        pl.ds(row0_ref[roi], window),
                        pl.ds(pl.multiple_of(xw_ref[roi], 8), window), :],
                    buf.at[slot], sems.at[slot]).start()

    def wait_dma(slot, roi):
        for l in range(L):
            @pl.when(lvl_ref[roi] == l)
            def _(l=l):
                pltpu.make_async_copy(
                    level_refs[l].at[
                        pl.ds(row0_ref[roi], window),
                        pl.ds(pl.multiple_of(xw_ref[roi], 8), window), :],
                    buf.at[slot], sems.at[slot]).wait()

    # slots-deep prefetch: keep up to ``slots-1`` block fetches in flight
    # so consecutive DMAs ride parallel HBM engines instead of
    # serialising on the issue->complete round trip.
    @pl.when(r == 0)
    def _():
        for k in range(min(slots - 1, R)):   # R is static
            start_dma(k % slots, k)

    @pl.when(r + slots - 1 < R)
    def _():
        start_dma((r + slots - 1) % slots, r + slots - 1)

    slot = r % slots
    wait_dma(slot, r)

    wy = _onehot_interp(f0_ref[r], ly_ref[r], ny, window)   # (ny, BH)
    wx = _onehot_interp(e0_ref[r], lx_ref[r], nx, window)   # (nx, win)
    F = buf[slot].astype(jnp.float32)                       # (BH, win, C)
    U = jax.lax.dot_general(
        wy, F.reshape(window, window * C),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (ny, win*C)
    V = U.reshape(ny, window, C).transpose(1, 0, 2) \
        .reshape(window, ny * C)
    T = jax.lax.dot_general(
        wx, V, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (nx, ny*C)
    vals = T.reshape(ow, sr, oh, sr, C)
    pooled = jnp.mean(vals, axis=(1, 3))                    # (ow, oh, C)
    out_ref[0] = pooled.transpose(1, 0, 2).astype(out_ref.dtype)


def _bwd_kernel(oh, ow, sr, window, C, R, L, chains, acc_dtype,
                lvl_ref, row0_ref, xw_ref,
                e0_ref, f0_ref, lx_ref, ly_ref, g_ref,
                *rest):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    # rest: L aliased dgrad inputs, L dgrad outputs, scratch: rbuf, wbuf,
    # rsem, wsems.  All reads/writes go through the OUTPUT refs.
    dgrad_refs = rest[L:2 * L]
    rbuf, wbuf = rest[2 * L], rest[2 * L + 1]
    rsem, wsems = rest[2 * L + 2], rest[2 * L + 3]
    ny, nx = oh * sr, ow * sr
    r = pl.program_id(0)
    chain = jax.lax.rem(r, chains)

    def start(roi, read):
        c = jax.lax.rem(roi, chains)
        s = jax.lax.rem(roi, 2)
        for l in range(L):
            @pl.when(lvl_ref[roi] == l)
            def _(l=l, c=c, s=s):
                if read:
                    pltpu.make_async_copy(
                        dgrad_refs[l].at[
                            c, pl.ds(row0_ref[roi], window),
                            pl.ds(pl.multiple_of(xw_ref[roi], 8), window),
                            :],
                        rbuf.at[s], rsem.at[s]).start()
                else:
                    pltpu.make_async_copy(
                        wbuf.at[c],
                        dgrad_refs[l].at[
                            c, pl.ds(row0_ref[roi], window),
                            pl.ds(pl.multiple_of(xw_ref[roi], 8), window),
                            :],
                        wsems.at[c]).start()

    def wait(roi, read):
        c = jax.lax.rem(roi, chains)
        s = jax.lax.rem(roi, 2)
        for l in range(L):
            @pl.when(lvl_ref[roi] == l)
            def _(l=l, c=c, s=s):
                if read:
                    pltpu.make_async_copy(
                        dgrad_refs[l].at[
                            c, pl.ds(row0_ref[roi], window),
                            pl.ds(pl.multiple_of(xw_ref[roi], 8), window),
                            :],
                        rbuf.at[s], rsem.at[s]).wait()
                else:
                    pltpu.make_async_copy(
                        wbuf.at[c],
                        dgrad_refs[l].at[
                            c, pl.ds(row0_ref[roi], window),
                            pl.ds(pl.multiple_of(xw_ref[roi], 8), window),
                            :],
                        wsems.at[c]).wait()

    # Pipelined RMW: reads are double-buffered and prefetched one step
    # ahead, so a read and a write are in flight concurrently.  The
    # same-chain RMW fence moves into the PREFETCH: before starting
    # rd(r+1) (which reads chain (r+1)%chains' partial buffer), the
    # previous write on that chain — wr(r+1-chains) — must have landed.
    # With chains >= 3 that write is >= 2 steps old, so the wait is
    # nearly free and the rd(r)/wr(r-1) overlap is preserved.
    @pl.when(r == 0)
    def _():
        start(0, read=True)   # chain 0 has no prior writes

    @pl.when(r + 1 < R)
    def _():
        @pl.when(r + 1 >= chains)
        def _():
            wait(r + 1 - chains, read=False)
        start(r + 1, read=True)

    mm = acc_dtype
    wy = _onehot_interp(f0_ref[r], ly_ref[r], ny, window)    # (ny, BH)
    wx = _onehot_interp(e0_ref[r], lx_ref[r], nx, window)    # (nx, win)
    g = g_ref[0].astype(jnp.float32)                         # (oh, ow, C)
    gs = jnp.broadcast_to(g[:, None, :, None, :],
                          (oh, sr, ow, sr, C)).reshape(ny, nx * C)
    gs = (gs / float(sr * sr)).astype(mm)
    # U[h, x', c] = sum_y' wy[y', h] gs[y', x', c]
    U = jax.lax.dot_general(
        wy.astype(mm), gs,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(mm)       # (BH, nx*C)
    V = U.reshape(window, nx, C).transpose(1, 0, 2) \
        .reshape(nx, window * C)
    dFw = jax.lax.dot_general(
        wx.astype(mm), V,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(mm)       # (win, BH*C)
    dF = dFw.reshape(window, window, C).transpose(1, 0, 2)   # (BH, win, C)

    wait(r, read=True)
    wbuf[chain] = rbuf[jax.lax.rem(r, 2)] + dF
    start(r, read=False)

    @pl.when(r == R - 1)
    def _():
        for d in range(min(chains, R)):
            @pl.when(r - d >= 0)
            def _(d=d):
                wait(r - d, read=False)


def _pallas_block_fwd(views, plan, oh, ow, sr, window, out_dtype,
                      interpret, slots=4):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    L = len(views)
    C = views[0].shape[-1]
    R = plan["lvl"].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,                   # lvl, row0, xw
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 +   # e0 f0 lx ly
                 [pl.BlockSpec(memory_space=pl.ANY)] * L,
        out_specs=pl.BlockSpec((1, oh, ow, C), lambda r, *_: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, window, window, C), views[0].dtype),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, oh, ow, sr, window, C, R, L,
                               slots, views[0].dtype)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, oh, ow, C), out_dtype),
        interpret=interpret,
    )(plan["lvl"], plan["row0"], plan["xw"],
      plan["e0"], plan["f0"], plan["lx"], plan["ly"], *views)


def _pallas_block_bwd(g, plan, view_shapes, oh, ow, sr, window, chains,
                      acc_dtype, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    L = len(view_shapes)
    C = view_shapes[0][-1]
    R = plan["lvl"].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 +
                 [pl.BlockSpec((1, oh, ow, C), lambda r, *_: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pl.ANY)] * L,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * L,
        scratch_shapes=[
            pltpu.VMEM((2, window, window, C), acc_dtype),
            pltpu.VMEM((chains, window, window, C), acc_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((chains,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, oh, ow, sr, window, C, R, L,
                               chains, acc_dtype)
    # TRACED zeros (derived from g), not jnp.zeros: a constant zeros of
    # this size ((chains, B*Hp, Wp, C) per level, ~270 MB for P2) gets
    # folded into an executable LITERAL, bloating generated code by
    # hundreds of MB — which the tunneled TPU platform re-ships per
    # dispatch (measured: 2.8 s/step vs 0.06 s device time).  A broadcast
    # of a data-dependent scalar stays a cheap on-device fill and also
    # keeps the buffers' liveness anchored to the backward pass.
    z0 = (g.reshape(-1)[0] * 0).astype(acc_dtype)
    zeros = [jnp.broadcast_to(z0, (chains,) + tuple(s))
             for s in view_shapes]
    # aliased inputs follow: 3 scalar-prefetch + 4 plan + 1 grad + i
    aliases = {8 + i: i for i in range(L)}
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((chains,) + tuple(s), acc_dtype)
                   for s in view_shapes],
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(plan["lvl"], plan["row0"], plan["xw"],
      plan["e0"], plan["f0"], plan["lx"], plan["ly"], g, *zeros)
    return [jnp.sum(o.astype(jnp.float32), axis=0) for o in outs]


def pallas_block_roi_align(features, rois, output_size, featmap_strides,
                           sampling_ratio=2, aligned=True, finest_scale=56,
                           roi_valid=None, flat_pack=None, window=32,
                           interpret=False, chains=4, chunk=2048):
    """Drop-in multi-level RoIAlign with block DMAs (see module docstring).

    ``flat_pack`` is accepted for API compatibility with
    ``multilevel_roi_align`` and ignored — the block kernel reads
    per-level 3-D views (identical pad/reshape ops across branches are
    CSE'd by XLA, so there is nothing to share explicitly).
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    oh, ow = output_size
    sr = max(int(sampling_ratio), 1)
    chains = max(int(chains), 2)   # bwd prefetch fences wr(r+1-chains),
                                   # which must predate the prefetch step
    num_levels = len(featmap_strides)
    features = list(features[:num_levels])

    R_total = int(rois.shape[0])
    CHUNK = int(chunk)
    if R_total > CHUNK:
        n_chunks = -(-R_total // CHUNK)
        pad = n_chunks * CHUNK - R_total
        rois_p = jnp.concatenate(
            [rois, jnp.zeros((pad,) + rois.shape[1:], rois.dtype)])
        rv = roi_valid if roi_valid is not None \
            else jnp.ones((R_total,), bool)
        rv_p = jnp.concatenate([rv, jnp.zeros((pad,), rv.dtype)])
        outs = [
            pallas_block_roi_align(
                features, rois_p[i * CHUNK:(i + 1) * CHUNK], output_size,
                featmap_strides, sampling_ratio, aligned, finest_scale,
                rv_p[i * CHUNK:(i + 1) * CHUNK], None, window,
                interpret, chains, CHUNK)
            for i in range(n_chunks)]
        return jnp.concatenate(outs, axis=0)[:R_total]

    win = window + 8
    views, consts = prepare_block_levels(features, window)
    consts["true_heights"] = np.asarray(
        [f.shape[1] for f in features], np.int32)
    consts["true_widths"] = np.asarray(
        [f.shape[2] for f in features], np.int32)
    plan = _block_plan(rois, consts, featmap_strides, output_size, sr,
                       aligned, finest_scale, win, roi_valid)
    view_shapes = [tuple(v.shape) for v in views]
    out_dtype = views[0].dtype
    acc_dtype = views[0].dtype

    @jax.custom_vjp
    def run(plan, *views):
        return _pallas_block_fwd(list(views), plan, oh, ow, sr, win,
                                 out_dtype, interpret)

    def run_fwd(plan, *views):
        return run(plan, *views), plan

    def _zero_plan(plan):
        return {k: (np.zeros(v.shape, jax.dtypes.float0)
                    if v.dtype.kind in "ib" else jnp.zeros_like(v))
                for k, v in plan.items()}

    def run_bwd(plan, g):
        dviews = _pallas_block_bwd(g, plan, view_shapes, oh, ow, sr, win,
                                   chains, acc_dtype, interpret)
        return (_zero_plan(plan),) + tuple(
            dv.astype(v_dt) for dv, v_dt in
            zip(dviews, [out_dtype] * len(dviews)))

    run.defvjp(run_fwd, run_bwd)
    return run(plan, *views)
