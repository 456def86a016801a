"""Pallas RoIAlign forward kernel.

Motivation (profiled on v5e): XLA lowers the RoIAlign gathers to one DMA
descriptor per bilinear corner row — descriptor-bound at ~57M rows/s —
and the blocked XLA reformulation pays a serialized backward scatter.
A Pallas kernel controls the data movement directly:

- grid over RoIs; per RoI the kernel DMAs the ``2*ny`` bilinear sample
  rows as contiguous ``(window,) x C`` strips from the flat HBM level
  buffer into VMEM (large strips, few descriptors),
- resolves the x positions with an in-kernel one-hot contraction on the
  MXU, and
- writes the pooled ``(out, out, C)`` tile.

Index math (level mapping, window starts, sample rows) is precomputed
on the host side of the jit and fed via scalar prefetch, so the kernel
body is pure DMA + compute.  The backward pass reuses the XLA gather
formulation through ``jax.custom_vjp`` (scatter-add there is fine — it
is the forward descriptor storm this kernel removes; fusing the
backward into Pallas is follow-up work).

Status: numerically validated against ``multilevel_roi_align`` in
interpret mode; compiled-TPU benchmarking pending (tunnel access).
Not yet the default path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .roi_align import (map_roi_levels, prepare_flat_levels,
                        _sample_coords)


def _plan(rois, consts, featmap_strides, output_size, sr, aligned,
          finest_scale, window):
    """Host-side (traced) index planning shared with the blocked impl."""
    num_levels = len(featmap_strides)
    heights = consts["heights"][:num_levels]
    widths = consts["widths"][:num_levels]
    level_offsets = consts["level_offsets"][:num_levels]
    boxes = rois[:, 1:5]
    batch_idx = rois[:, 0].astype(jnp.int32)
    lvl = map_roi_levels(boxes, num_levels, finest_scale)
    strides = jnp.asarray(featmap_strides, jnp.float32)
    Hl = jnp.asarray(heights)[lvl]
    Wl = jnp.asarray(widths)[lvl]
    base_off = jnp.asarray(level_offsets)[lvl] + batch_idx * Hl * Wl

    scaled = boxes / strides[lvl][:, None]
    ys, xs = _sample_coords(scaled, output_size, sr, aligned)
    y_s = ys[:, :, 0]
    x_s = xs[:, 0, :]
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
    ly = jnp.where(out_y, 0.0, (yc - y0))
    lx = xc - x0
    win_start = jnp.minimum(jnp.min(x0, axis=1),
                            jnp.maximum(Wl - window, 0))
    row0 = base_off[:, None] + y0 * Wl[:, None] + win_start[:, None]
    row1 = base_off[:, None] + jnp.minimum(y0 + 1, Hl[:, None] - 1) * \
        Wl[:, None] + win_start[:, None]
    e0 = x0 - win_start[:, None]
    return dict(row0=row0, row1=row1, e0=e0,
                lx=jnp.where(out_x, -1.0, lx).astype(jnp.float32),
                ly=ly.astype(jnp.float32))


def pallas_roi_align(features, rois, output_size, featmap_strides,
                     sampling_ratio=2, aligned=True, finest_scale=56,
                     roi_valid=None, window=64, interpret=False):
    """Forward-only Pallas RoIAlign (same contract as
    ``multilevel_roi_align``); backward via the XLA gather formulation."""
    from jax.experimental import pallas as pl

    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    sr = max(int(sampling_ratio), 1)
    oh, ow = output_size
    ny, nx = oh * sr, ow * sr

    flat_pack = prepare_flat_levels(features[:len(featmap_strides)])
    flat, consts = flat_pack
    C = consts["C"]
    P = int(flat.shape[0])
    R = rois.shape[0]
    plan = _plan(rois, consts, featmap_strides, output_size, sr, aligned,
                 finest_scale, window)
    dtype = flat.dtype

    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, oh, ow, C),
                               lambda r, *args: (r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    # scalar-prefetch args must be indexed per grid step inside the kernel
    def kernel_wrapper(row0_all, row1_all, e0_all, lx_all, ly_all,
                       flat_ref, out_ref):
        r = pl.program_id(0)

        def body(scratch, sem):
            for t in range(2):
                rows = row0_all if t == 0 else row1_all
                for i in range(ny):
                    dma = pltpu.make_async_copy(
                        flat_ref.at[pl.ds(rows[r, i], window), :],
                        scratch.at[t, i], sem)
                    dma.start()
                    dma.wait()
            F = scratch[:]
            iota = jax.lax.broadcasted_iota(jnp.int32, (nx, window), 1)
            e0 = e0_all[r]
            lx = lx_all[r]
            valid_x = lx >= 0.0
            lxc = jnp.where(valid_x, lx, 0.0)
            w_lo = jnp.where(iota == e0[:, None], (1.0 - lxc)[:, None], 0.0)
            w_hi = jnp.where(iota == (e0 + 1)[:, None], lxc[:, None], 0.0)
            wx = (w_lo + w_hi) * valid_x[:, None].astype(jnp.float32)
            Fm = F.reshape(2 * ny, window, C).astype(jnp.float32)
            G = jax.lax.dot_general(
                wx, Fm.transpose(1, 0, 2).reshape(window, 2 * ny * C),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            G = G.reshape(nx, 2, ny, C)
            ly = ly_all[r]
            vals = (G[:, 0] * (1.0 - ly)[None, :, None]
                    + G[:, 1] * ly[None, :, None])
            vals = vals.transpose(1, 0, 2).reshape(oh, sr, ow, sr, C)
            out_ref[0] = jnp.mean(vals, axis=(1, 3)).astype(out_ref.dtype)

        pl.run_scoped(body, scratch=pltpu.VMEM((2, ny, window, C), dtype),
                      sem=pltpu.SemaphoreType.DMA(()))

    out = pl.pallas_call(
        kernel_wrapper,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, oh, ow, C), dtype),
        interpret=interpret,
    )(plan["row0"], plan["row1"], plan["e0"], plan["lx"], plan["ly"], flat)

    if roi_valid is not None:
        out = out * roi_valid[:, None, None, None].astype(out.dtype)
    return out
