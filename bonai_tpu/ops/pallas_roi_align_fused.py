"""Fused fwd+bwd Pallas RoIAlign — the production TPU kernel.

Replaces both halves of the XLA gather formulation (``roi_align.py``):

- forward: XLA lowers the 4-corner gathers to one DMA descriptor per
  bilinear corner row (descriptor-bound, ~57M rows/s).  Here each RoI's
  ``2*ny`` sample rows are fetched as contiguous ``(window, C)`` strips
  (few, large descriptors), double-buffered across the RoI grid so the
  next RoI's DMAs overlap the current RoI's MXU compute; x-resolution is
  a one-hot contraction on the MXU.
- backward: XLA emits a serialized 4N-row scatter-add.  Here the kernel
  walks the same per-RoI strips, computes the strip gradients with the
  transposed one-hot matmuls, de-duplicates repeated rows *inside* the
  RoI with an equality-matrix contraction, and read-modify-writes the
  ``(P, C)`` gradient buffer in HBM.  The sequential TPU grid plus a
  wait-previous-writes fence makes the RMW race-free.

Semantics match ``multilevel_roi_align`` (reference CUDA counterpart:
``mmcv`` RoIAlign via ``single_level_roi_extractor.py:54-93``) with one
bound: an RoI whose x-extent at its assigned FPN level exceeds
``window - 4`` cells (40 by default — aspect ratios ≳6.6 at the level
rule's sqrt(wh) ∈ [56, 112) px) is pushed to a coarser level until it
fits; the backward gather plan applies the identical push so gradients
always land on the level the forward read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .roi_align import map_roi_levels, prepare_flat_levels, _sample_coords


def _plan(rois, consts, featmap_strides, output_size, sr, aligned,
          finest_scale, window, roi_valid):
    """Traced (vector-math) index planning: per-RoI strip rows, in-window
    x offsets, interpolation fractions, and first-occurrence masks."""
    num_levels = len(featmap_strides)
    heights = consts["heights"][:num_levels]
    widths = consts["widths"][:num_levels]
    level_offsets = consts["level_offsets"][:num_levels]
    boxes = rois[:, 1:5]
    batch_idx = rois[:, 0].astype(jnp.int32)
    lvl = map_roi_levels(boxes, num_levels, finest_scale)
    # extreme-aspect RoIs whose x-extent would overflow the strip window
    # are pushed to a coarser level until they fit (instead of silently
    # zeroing beyond-window samples).  Deviation from the reference's
    # pure sqrt(wh) level rule, but only for boxes the window cannot
    # cover; feature content is preserved.
    w_box = boxes[:, 2] - boxes[:, 0]
    need = w_box / (float(featmap_strides[0]) * (window - 4))
    lvl_min = jnp.ceil(
        jnp.log2(jnp.maximum(need, 1e-9))).astype(jnp.int32)
    lvl = jnp.clip(jnp.maximum(lvl, lvl_min), 0, num_levels - 1)
    strides = jnp.asarray(featmap_strides, jnp.float32)
    Hl = jnp.asarray(heights)[lvl]
    Wl = jnp.asarray(widths)[lvl]
    base_off = jnp.asarray(level_offsets)[lvl] + batch_idx * Hl * Wl

    oh, ow = output_size
    ny, nx = oh * sr, ow * sr
    scaled = boxes / strides[lvl][:, None]
    ys, xs = _sample_coords(scaled, output_size, sr, aligned)
    y_s = ys[:, :, 0]                                   # (R, ny)
    x_s = xs[:, 0, :]                                   # (R, nx)
    Hf = Hl.astype(jnp.float32)
    Wf = Wl.astype(jnp.float32)
    out_y = (y_s < -1.0) | (y_s > Hf[:, None])
    out_x = (x_s < -1.0) | (x_s > Wf[:, None])
    yc = jnp.clip(y_s, 0.0, Hf[:, None] - 1.0)
    xc = jnp.clip(x_s, 0.0, Wf[:, None] - 1.0)
    y0 = jnp.clip(jnp.floor(yc), 0,
                  jnp.maximum(Hl[:, None] - 2, 0)).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xc), 0,
                  jnp.maximum(Wl[:, None] - 2, 0)).astype(jnp.int32)
    ly = jnp.where(out_y, -1.0, yc - y0)                # -1 => zero weight
    lx = jnp.where(out_x, -1.0, xc - x0)
    if roi_valid is not None:
        gate = roi_valid[:, None]
        ly = jnp.where(gate, ly, -1.0)
        lx = jnp.where(gate, lx, -1.0)
        base_off = jnp.where(roi_valid, base_off, 0)
    win_start = jnp.minimum(jnp.min(x0, axis=1),
                            jnp.maximum(Wl - window, 0))
    # Mosaic requires dynamic HBM slice starts 8-aligned in dim 0.  With
    # level widths (and hence flat level offsets) multiples of 8, a RoI's
    # strip misalignment is the RoI-constant ``win_start % 8`` (rows
    # differ by multiples of Wl): fetch from the aligned start and fold
    # the offset into the one-hot x index (window is padded by 8).
    off = win_start % 8
    win_start = win_start - off
    row0 = base_off[:, None] + y0 * Wl[:, None] + win_start[:, None]
    row1 = base_off[:, None] + jnp.minimum(y0 + 1, Hl[:, None] - 1) * \
        Wl[:, None] + win_start[:, None]
    rows = jnp.concatenate([row0, row1], axis=1)        # (R, 2ny), t-major
    e0 = x0 - win_start[:, None]                        # (R, nx)
    # first occurrence of each distinct row within the RoI (dedup for the
    # backward RMW: duplicate rows must be written exactly once)
    eq = rows[:, :, None] == rows[:, None, :]           # (R, 2ny, 2ny)
    tri = jnp.tril(jnp.ones((2 * ny, 2 * ny), bool), k=-1)
    first_occ = ~jnp.any(eq & tri, axis=2)
    return dict(rows=rows.astype(jnp.int32),
                first_occ=first_occ.astype(jnp.int32),
                e0=e0.astype(jnp.int32),
                lx=lx.astype(jnp.float32), ly=ly.astype(jnp.float32),
                wl=Wl.astype(jnp.int32))


def _xy_weights(e0, lx, ly, nx, ny, window):
    """One-hot x weights (nx, window) and y weights (2, ny) from plan rows."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (nx, window), 1)
    valid_x = (lx >= 0.0).astype(jnp.float32)
    lxc = jnp.maximum(lx, 0.0)
    w_lo = jnp.where(iota == e0[:, None], (1.0 - lxc)[:, None], 0.0)
    w_hi = jnp.where(iota == (e0 + 1)[:, None], lxc[:, None], 0.0)
    wx = (w_lo + w_hi) * valid_x[:, None]
    valid_y = (ly >= 0.0).astype(jnp.float32)
    lyc = jnp.maximum(ly, 0.0)
    wy = jnp.stack([(1.0 - lyc) * valid_y, lyc * valid_y])   # (2, ny)
    return wx, wy


def _fwd_kernel(oh, ow, sr, window, C, R, dtype,
                rows_ref, focc_ref, e0_ref, lx_ref, ly_ref,
                flat_ref, out_ref, buf, sems):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    ny, nx = oh * sr, ow * sr
    n_strips = 2 * ny
    r = pl.program_id(0)

    def strip_dma(slot, roi, j):
        # rows/first_occ ride SMEM flattened 1-D: 2-D SMEM operands are
        # row-padded to the 128-lane width (R*128*4B blows the budget)
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(pl.multiple_of(
                rows_ref[roi * n_strips + j], 8), window), :],
            buf.at[slot, j], sems.at[slot, j])

    # NB: the forward intentionally fetches ALL strips, duplicates
    # included.  A first-occurrence-gated fetch + dedup-select matmul
    # was measured SLOWER on hardware (bbox branch 6.1 -> 11.4 ms): the
    # (2ny, 2ny) x (2ny, window*C) reconstruction matmul writes ~1.4 MB
    # of VMEM per RoI, which costs more than the skipped descriptors.
    # The backward is different — skipped read strips there need no
    # reconstruction at all (they are never written back).
    @pl.when(r == 0)
    def _():
        for j in range(n_strips):
            strip_dma(0, 0, j).start()

    @pl.when(r + 1 < R)
    def _():
        nxt = (r + 1) % 2
        for j in range(n_strips):
            strip_dma(nxt, r + 1, j).start()

    slot = r % 2
    for j in range(n_strips):
        strip_dma(slot, r, j).wait()

    # e0/lx/ly live whole-array in VMEM: SMEM (scalar-prefetch) refs only
    # allow scalar loads on hardware, and these are vector operands
    wx, wy = _xy_weights(e0_ref[r], lx_ref[r], ly_ref[r], nx, ny, window)
    F = buf[slot].astype(jnp.float32)                    # (2ny, window, C)
    G = jax.lax.dot_general(
        wx, F.transpose(1, 0, 2).reshape(window, n_strips * C),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # (nx, 2ny*C)
    G = G.reshape(nx, 2, ny, C)
    vals = G[:, 0] * wy[0][None, :, None] + G[:, 1] * wy[1][None, :, None]
    vals = vals.transpose(1, 0, 2).reshape(oh, sr, ow, sr, C)
    out_ref[0] = jnp.mean(vals, axis=(1, 3)).astype(out_ref.dtype)


def _bwd_kernel(oh, ow, sr, window, C, R, mmax, chains, acc_dtype,
                rows_ref, focc_ref, wl_ref, e0_ref, lx_ref, ly_ref,
                rows_vec_ref, focc_vec_ref, g_ref, dflat_in_ref, dflat_ref,
                rbuf, wbuf, rsems, wsems):
    # dflat_in_ref is aliased to dflat_ref (same HBM buffer); all
    # reads/writes go through the output ref.
    #
    # K-chain pipelining: RoI r accumulates into partial buffer
    # dflat[r % K].  The read-after-write fence then only reaches back
    # to r-K (same buffer), so K RMW round-trips are in flight at once
    # instead of a fully serial chain; the K partials are summed by the
    # caller.  wbuf needs K slots because a slot's write DMA is only
    # waited K steps later.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    ny, nx = oh * sr, ow * sr
    n_strips = 2 * ny
    r = pl.program_id(0)
    chain = jax.lax.rem(r, chains)

    def read_dma(roi, j):
        return pltpu.make_async_copy(
            dflat_ref.at[chain, pl.ds(pl.multiple_of(
                rows_ref[roi * n_strips + j], 8), window), :],
            rbuf.at[j], rsems.at[j])

    def write_dma(roi, j):
        return pltpu.make_async_copy(
            wbuf.at[chain, j],
            dflat_ref.at[chain, pl.ds(pl.multiple_of(
                rows_ref[roi * n_strips + j], 8), window), :],
            wsems.at[chain, j])

    def write_dma_for(roi, j):
        # DMA handle for a (possibly different-chain) earlier roi
        c = jax.lax.rem(roi, chains)
        return pltpu.make_async_copy(
            wbuf.at[c, j],
            dflat_ref.at[c, pl.ds(pl.multiple_of(
                rows_ref[roi * n_strips + j], 8), window), :],
            wsems.at[c, j])

    # fence: the previous RoI ON THIS CHAIN must have its writes landed
    # before we read the same partial buffer (their rows may overlap)
    @pl.when(r >= chains)
    def _():
        for j in range(n_strips):
            @pl.when(focc_ref[(r - chains) * n_strips + j] == 1)
            def _():
                write_dma_for(r - chains, j).wait()

    # non-first duplicate strips are never written back (write gated on
    # first_occ), so their stale rbuf content is irrelevant: skip their
    # read DMAs too — the kernel is descriptor-issue-bound
    for j in range(n_strips):
        @pl.when(focc_ref[r * n_strips + j] == 1)
        def _(j=j):
            read_dma(r, j).start()

    # matmul operands/results in the accumulate dtype (bf16 in
    # production): keeps the kernel's VMEM stack under the 16MB scoped
    # limit (all-f32 intermediates OOM at the mask branch's 56 strips)
    # and runs the MXU at full rate; Mosaic requires 32-bit matmul
    # accumulators, so each dot accumulates f32 and casts immediately.
    # Tests pass f32 features and get f32 end to end.
    mm = acc_dtype
    wx, wy = _xy_weights(e0_ref[r], lx_ref[r], ly_ref[r], nx, ny, window)
    # upstream grad -> per-sample grads (mean pooling backward)
    g = g_ref[0].astype(jnp.float32)                     # (oh, ow, C)
    gs = jnp.broadcast_to(g[:, None, :, None, :],
                          (oh, sr, ow, sr, C)).reshape(ny, nx, C)
    gs = gs / float(sr * sr)
    # strip-major per-sample grads, built 2-D (no 4-D broadcasts — Mosaic
    # rejects multi-trailing-1 reshapes; no transposes — VMEM stack):
    # dG[t*ny + y, x*C + c] = gs[y, x, c] * wy[t, y]
    gs2 = gs.reshape(ny, nx * C).astype(mm)
    dGst = jnp.concatenate(
        [gs2 * wy[0][:, None].astype(mm),
         gs2 * wy[1][:, None].astype(mm)], axis=0)        # (2ny, nx*C)
    # intra-RoI dedup: rows repeated across strips combine into the first
    # occurrence.  The E contraction commutes with the wx matmul (both
    # are linear, over different axes), and applying it BEFORE is
    # nx/window times cheaper (the strip axis is contracted against nx
    # columns instead of window columns) — the kernel is MXU-bound, so
    # this ordering is a direct ~30-45% compute cut.
    rv = rows_vec_ref[r]                                 # (2ny,) int32
    E = (rv[:, None] == rv[None, :]).astype(mm)
    dGc = jax.lax.dot_general(
        E, dGst,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(mm)    # (2ny, nx*C)
    dGc = dGc.reshape(n_strips, nx, C).transpose(1, 0, 2)  # (nx, 2ny, C)
    dFm = jax.lax.dot_general(
        wx.astype(mm), dGc.reshape(nx, n_strips * C),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(mm)    # (window, 2ny*C)
    combined = dFm.reshape(window, n_strips, C).transpose(1, 0, 2)

    # Symmetric partial-overlap sums: when the RoI's level is narrower
    # than the window, strips at row distance m*Wl overlap.  Every strip
    # covering a flat row must WRITE THE SAME TOTAL for it — then the
    # unordered completion of overlapping write DMAs is benign.  Partner
    # contributions are gathered with a one-hot strip matmul and shifted
    # into place with a band-matrix matmul (dist is a traced scalar).
    def _gather_shift(partner_mask_f, dist, left):
        # partner contributions from the dedup TOTALS: every duplicate
        # strip of a row holds the row's total, so masking partners to
        # first occurrences picks each total exactly once (a per-strip
        # recompute here would blow the VMEM stack)
        ps = jax.lax.dot_general(
            partner_mask_f,
            combined.reshape(n_strips, window * C),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(mm)  # (S, window*C)
        ps = ps.reshape(n_strips, window, C)
        i_out = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0)
        i_in = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1)
        if left:       # out[w] = x[w + dist]
            band = (i_in == i_out + dist).astype(mm)
        else:          # out[w] = x[w - dist]
            band = (i_in == i_out - dist).astype(mm)
        shifted = jax.lax.dot_general(
            band, ps.transpose(1, 0, 2).reshape(window, n_strips * C),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(mm)
        return shifted.reshape(window, n_strips, C).transpose(1, 0, 2)

    for j in range(n_strips):
        @pl.when(focc_ref[r * n_strips + j] == 1)
        def _(j=j):
            read_dma(r, j).wait()
    # only THIS chain's slot: other slots may back in-flight write DMAs
    wbuf[chain] = rbuf[:] + combined

    if mmax > 0:
        # only narrow-level RoIs (Wl < window) can have partial overlap;
        # gate the partner matmuls so wide-level RoIs (the majority) pay
        # nothing
        @pl.when(wl_ref[r] < window)
        def _():
            fv = focc_vec_ref[r].astype(mm)              # (2ny,)
            acc = jnp.zeros_like(combined)
            for m in range(1, mmax + 1):
                dist = wl_ref[r] * m
                below = ((rv[:, None] - dist) == rv[None, :]).astype(mm) \
                    * fv[None, :]                        # k = j - m*Wl
                above = ((rv[:, None] + dist) == rv[None, :]).astype(mm) \
                    * fv[None, :]                        # k = j + m*Wl
                acc = acc + _gather_shift(below, dist, left=True)
                acc = acc + _gather_shift(above, dist, left=False)
            wbuf[chain] = wbuf[chain] + acc

    for j in range(n_strips):
        @pl.when(focc_ref[r * n_strips + j] == 1)
        def _():
            write_dma(r, j).start()

    @pl.when(r == R - 1)
    def _():
        # drain: the last K rois' writes are still outstanding
        for d in range(min(chains, R)):
            @pl.when(r - d >= 0)
            def _(d=d):
                for j in range(n_strips):
                    @pl.when(focc_ref[(r - d) * n_strips + j] == 1)
                    def _(j=j):
                        write_dma_for(r - d, j).wait()


def _pallas_fwd(flat, plan, oh, ow, sr, window, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    C = flat.shape[1]
    R = plan["rows"].shape[0]
    ny = oh * sr
    n_strips = 2 * ny
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(R,),
        in_specs=[
            # whole-array VMEM residency: per-r (1, N) blocks violate the
            # (8, 128)-divisibility rule for small N; the full plans are
            # a few hundred KB and vector-indexable by r
            pl.BlockSpec(memory_space=pltpu.VMEM),       # e0
            pl.BlockSpec(memory_space=pltpu.VMEM),       # lx
            pl.BlockSpec(memory_space=pltpu.VMEM),       # ly
            pl.BlockSpec(memory_space=pl.ANY),           # flat
        ],
        out_specs=pl.BlockSpec((1, oh, ow, C), lambda r, *_: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, n_strips, window, C), flat.dtype),
            pltpu.SemaphoreType.DMA((2, n_strips)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, oh, ow, sr, window, C, R,
                               flat.dtype)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, oh, ow, C), flat.dtype),
        interpret=interpret,
    )(plan["rows"].reshape(-1), plan["first_occ"].reshape(-1),
      plan["e0"], plan["lx"], plan["ly"], flat)


def _pallas_bwd(g, plan, P, C, oh, ow, sr, window, mmax, interpret,
                chains=2, acc_dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    R = plan["rows"].shape[0]
    ny = oh * sr
    n_strips = 2 * ny
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # e0
            pl.BlockSpec(memory_space=pltpu.VMEM),       # lx
            pl.BlockSpec(memory_space=pltpu.VMEM),       # ly
            pl.BlockSpec(memory_space=pltpu.VMEM),       # rows as vector
            pl.BlockSpec(memory_space=pltpu.VMEM),       # first_occ vector
            pl.BlockSpec((1, oh, ow, C), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),       # upstream grad
            pl.BlockSpec(memory_space=pl.ANY),        # dflat (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_strips, window, C), acc_dtype),
            pltpu.VMEM((chains, n_strips, window, C), acc_dtype),
            pltpu.SemaphoreType.DMA((n_strips,)),
            pltpu.SemaphoreType.DMA((chains, n_strips)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, oh, ow, sr, window, C, R,
                               mmax, chains, acc_dtype)
    dflat0 = jnp.zeros((chains, P, C), acc_dtype)
    # the mask branch (56 strips) peaks ~20 MB of scoped VMEM; the
    # default 16 MB guard is conservative (v5e has 128 MB physical)
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=48 * 1024 * 1024)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chains, P, C), acc_dtype),
        input_output_aliases={9: 0},   # dflat0 (3 scalar-prefetch + 6) -> out
        interpret=interpret, compiler_params=params,
    )(plan["rows"].reshape(-1), plan["first_occ"].reshape(-1),
      plan["wl"], plan["e0"], plan["lx"], plan["ly"], plan["rows"],
      plan["first_occ"], g, dflat0)
    return jnp.sum(out.astype(jnp.float32), axis=0)


def pallas_multilevel_roi_align(features, rois, output_size,
                                featmap_strides, sampling_ratio=2,
                                aligned=True, finest_scale=56,
                                roi_valid=None, flat_pack=None, window=40,
                                interpret=False, backward="rmw",
                                chunk=2048, chains=2):
    """Drop-in replacement for ``multilevel_roi_align`` with a Pallas
    strip-DMA forward (same contract; differentiable in the feature
    pyramid).

    ``backward``:
    - ``"rmw"`` (default): the Pallas read-modify-write kernel — walks
      the same per-RoI strips as the forward, builds the strip gradients
      with transposed one-hot matmuls (bf16 operands, f32 accumulation),
      and RMWs K-chain partial buffers in HBM.  Race-free by
      construction: intra-RoI duplicate rows collapse into their first
      occurrence (equality-matrix contraction), narrow-level partial
      overlaps write symmetric totals (partner matmuls), and cross-RoI
      hazards are fenced per chain.  Validated against the scatter path
      on hardware (train-step profile: 41ms of XLA scatter -> 26ms).
    - ``"scatter"``: XLA fallback — the ``jax.linear_transpose`` of the
      gather formulation as an x-pair-packed 2N-row scatter-add; exact
      same semantics, no Pallas dependency.
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    oh, ow = output_size
    sr = max(int(sampling_ratio), 1)
    if flat_pack is None:
        flat_pack = prepare_flat_levels(features[:len(featmap_strides)])
    flat, consts = flat_pack

    # SMEM budget: the scalar-prefetch plan arrays scale with R
    # (~250 B/RoI); past ~4k RoIs the 1 MB SMEM overflows (hit at the
    # eval cfg: 2 x 3000 proposals).  Chunk the RoI axis — the shared
    # ``flat`` buffer makes per-chunk backward contributions sum
    # naturally through JAX linearity.
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
            pallas_multilevel_roi_align(
                features, rois_p[i * CHUNK:(i + 1) * CHUNK], output_size,
                featmap_strides, sampling_ratio, aligned, finest_scale,
                rv_p[i * CHUNK:(i + 1) * CHUNK], flat_pack, window,
                interpret, backward, CHUNK, chains)
            for i in range(n_chunks)]
        return jnp.concatenate(outs, axis=0)[:R_total]
    plan = _plan(rois, consts, featmap_strides, output_size, sr, aligned,
                 finest_scale, window, roi_valid)
    # strips are fetched from 8-aligned starts: e0 may reach window+7,
    # so the kernels operate on a window+8 fetch (flat carries 128 zero
    # tail rows to keep the over-fetch in-bounds)
    window = window + 8
    P = int(flat.shape[0])
    C = int(flat.shape[1])

    @jax.custom_vjp
    def run(flat, plan):
        return _pallas_fwd(flat, plan, oh, ow, sr, window, interpret)

    def run_fwd(flat, plan):
        return run(flat, plan), plan

    def _zero_plan(plan):
        return {k: (np.zeros(v.shape, jax.dtypes.float0)
                    if v.dtype.kind in "ib" else jnp.zeros_like(v))
                for k, v in plan.items()}

    if backward == "rmw":
        # static bound on partial-overlap partner distance: strips within
        # one RoI differ by multiples of its level width
        min_w = int(np.min(consts["widths"][:len(featmap_strides)]))
        mmax = max(0, (window - 1) // max(min_w, 1))
        # accumulate in the feature dtype (bf16 in production — same
        # rounding regime as the scatter path); tests pass f32 features
        # and get f32 accumulation
        acc_dtype = flat.dtype

        def run_bwd(plan, g):
            dflat = _pallas_bwd(g, plan, P, C, oh, ow, sr, window, mmax,
                                interpret, chains=chains,
                                acc_dtype=acc_dtype)
            return dflat.astype(flat.dtype), _zero_plan(plan)
    else:
        from .roi_align import _bilinear_gather_bwd, multilevel_gather_plan

        def run_bwd(plan, g):
            # RoIAlign is linear in the features: the exact VJP is the
            # gather formulation's fused corner scatter applied to the
            # mean-pooling-spread cotangent — no forward recompute.
            # max_extent keeps the bwd level assignment identical to the
            # fwd _plan's window push (previously the bwd never pushed:
            # extreme-aspect RoIs scattered grads to a finer level than
            # the forward had read).
            i00, Wrow, ws = multilevel_gather_plan(
                rois, consts, featmap_strides, output_size, sr, aligned,
                finest_scale, roi_valid, max_extent=window - 12)
            R = rois.shape[0]
            gs = jnp.broadcast_to(
                g[:, :, None, :, None, :].astype(jnp.float32) / (sr * sr),
                (R, oh, sr, ow, sr, C)).reshape(i00.shape + (C,))
            res = (tuple(flat.shape), jnp.zeros((), flat.dtype),
                   i00, Wrow, *ws)
            dflat = _bilinear_gather_bwd(res, gs)[0]
            return dflat, _zero_plan(plan)

    run.defvjp(run_fwd, run_bwd)
    return run(flat, plan)
