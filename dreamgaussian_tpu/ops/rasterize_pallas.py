"""Pallas TPU tile-compositing kernels for 3D Gaussian splatting.

This is the TPU replacement for the CUDA per-tile forward/backward kernels
of ``diff-gaussian-rasterization`` (call surface
/root/reference/gs_renderer.py:745-822). The design is TPU-first rather
than a translation of the CUDA warp model:

- **Pixels live on sublanes, gaussians on lanes.** Each 16x16 tile is a
  256-row vector; a chunk of ``C`` depth-sorted gaussians is a [256, C]
  problem. All per-pair math is VPU-friendly broadcasting.
- **Front-to-back compositing without a sequential loop.** The CUDA kernel
  walks gaussians one-by-one per pixel. Here the exclusive prefix product
  of transmittance inside a chunk is computed as ``exp(log1p(-alpha) @
  STRICT_UPPER)`` — a triangular matmul on the MXU — and the early-stop
  rule (first gaussian that would push T below 1e-4 terminates the pixel
  and does not contribute) becomes a cummax over the same triangular
  structure. Color/depth accumulation is another [256,C]x[C,3] matmul.
- **Chunk-aligned duplicate lists** (see binning.py) are streamed from HBM
  with double-buffered DMA; zero-padded slots are inert (opacity 0).
- **Backward is a reverse chunk sweep** reconstructing per-gaussian
  transmittance from the stored final T (the CUDA back-to-front division
  trick, vectorized as an inclusive-suffix triangular matmul) and the
  stored per-pixel contributor count; per-duplicate gradients are written
  back to HBM and segment-summed into per-gaussian gradients by XLA's
  gather VJP outside the kernel.

Feature/gradient row layout (FEAT_ROWS x K_aligned, f32):
  0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c,
  5 color_r, 6 color_g, 7 color_b, 8 opacity, 9 depth, 10..15 pad.

Forward per-tile output layout ([T, 256, OUT_CH]):
  0..2 rgb (premultiplied, no background), 3 depth, 4 T_final,
  5 n_contrib, 6..7 pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16                 # default (CUDA-parity); 32 is the TPU fast path
PIX = TILE * TILE         # default pixel count; kernels take `tile` statically
FEAT_ROWS = 16
OUT_CH = 8
TERM_EPS = 1e-4
ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99

_f32 = jnp.float32


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=_f32,
    )


def _dot_t(a, b):
    """Contract last dims: a [P, C] x b [Q, C] -> [P, Q]."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=_f32,
    )


def _dot_p(a, b):
    """Contract first dims: a [P, Q] x b [P, C] -> [Q, C] (no transposes)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_f32,
    )


def _pixel_coords(tile_id, grid_x, tile):
    """Pixel centers of tile `tile_id` as [tile*tile, 1] columns (x, y)."""
    ty = tile_id // grid_x
    tx = tile_id - ty * grid_x
    pid = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
    px = (tx * tile + pid % tile).astype(_f32)
    py = (ty * tile + pid // tile).astype(_f32)
    return px, py


def _chunk_alpha(feat, px, py):
    """Per-(pixel, gaussian) alpha for one chunk.

    feat: [FEAT_ROWS, C]; returns alpha (masked, clamped), alpha_raw,
    exp(power), and the diffs/conics needed by the backward pass.
    """
    mx, my = feat[0:1, :], feat[1:2, :]
    ca, cb, cc = feat[2:3, :], feat[3:4, :], feat[4:5, :]
    op = feat[8:9, :]
    dx = mx - px    # [PIX, C]
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    alpha_raw = op * g
    skip = (power > 0.0) | (alpha_raw < ALPHA_SKIP)
    alpha = jnp.where(skip, 0.0, jnp.minimum(alpha_raw, ALPHA_MAX))
    return alpha, alpha_raw, g, dx, dy, (ca, cb, cc, op)


def _tri_masks(c):
    li = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    strict_upper = (li < lj).astype(_f32)   # x @ M = exclusive prefix sum
    incl_lower = (li >= lj).astype(_f32)    # x @ M = inclusive suffix sum
    strict_lower = (li > lj).astype(_f32)   # x @ M = exclusive suffix sum
    return strict_upper, incl_lower, strict_lower


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(chunk_start_ref, n_chunks_ref, off_ref, feat_hbm, out_ref,
                buf, sems, *, grid_x: int, chunk: int, tile: int):
    pix = tile * tile
    t = pl.program_id(0)
    n_chunks = n_chunks_ref[t]
    start = chunk_start_ref[t]
    # off_ref: global id of this shard's first tile (tile sharding).
    px, py = _pixel_coords(t + off_ref[0], grid_x, tile)
    strict_upper, _, _ = _tri_masks(chunk)
    ones_c = jnp.ones((chunk, 1), _f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds((start + c) * chunk, chunk)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(c, carry):
        t_run, rgb, dep, ncontrib = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()
        feat = buf[slot]

        alpha, _, _, _, _, _ = _chunk_alpha(feat, px, py)
        lg = jnp.log1p(-alpha)
        t_g = t_run * jnp.exp(_dot(lg, strict_upper))      # T before each g
        one_m = 1.0 - alpha
        # done pixels carry t_run < TERM_EPS is impossible (invariant), but a
        # triggering gaussian must stop the pixel without contributing.
        test = ((t_g * one_m < TERM_EPS) & (alpha > 0.0)).astype(_f32)
        trig_before = _dot(test, strict_upper) > 0.0
        m = jnp.logical_not(trig_before) * (1.0 - test)    # [PIX, C] 0/1
        w = alpha * t_g * m

        colors = feat[5:8, :]                               # [3, C]
        rgb = rgb + _dot_t(w, colors)                       # [PIX, 3]
        dep = dep + _dot_t(w, feat[9:10, :])                # [PIX, 1]

        gpos = (c * chunk + lane + 1).astype(_f32)
        ncontrib = jnp.maximum(
            ncontrib, jnp.max(jnp.where(w > 0.0, gpos, 0.0), axis=1, keepdims=True)
        )

        any_trig = _dot(test, ones_c) > 0.0                 # [PIX, 1]
        t_at_trig = _dot(t_g * test * jnp.logical_not(trig_before), ones_c)
        t_full = t_run * jnp.exp(_dot(lg, ones_c))
        t_run = jnp.where(any_trig, t_at_trig, t_full)
        return t_run, rgb, dep, ncontrib

    init = (
        jnp.ones((pix, 1), _f32),
        jnp.zeros((pix, 3), _f32),
        jnp.zeros((pix, 1), _f32),
        jnp.zeros((pix, 1), _f32),
    )
    t_run, rgb, dep, ncontrib = jax.lax.fori_loop(0, n_chunks, body, init)
    out_ref[0] = jnp.concatenate(
        [rgb, dep, t_run, ncontrib, jnp.zeros((pix, OUT_CH - 6), _f32)], axis=1
    )


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(chunk_start_ref, n_chunks_ref, off_ref, feat_hbm, fwd_ref,
                gout_ref, dfeat_hbm, buf, dbuf, sems, wsems, *, grid_x: int,
                chunk: int, tile: int):
    pix = tile * tile
    t = pl.program_id(0)
    n_chunks = n_chunks_ref[t]
    start = chunk_start_ref[t]
    px, py = _pixel_coords(t + off_ref[0], grid_x, tile)
    _, incl_lower, strict_lower = _tri_masks(chunk)
    ones_c = jnp.ones((chunk, 1), _f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    fwd = fwd_ref[0]          # [PIX, OUT_CH]
    gout = gout_ref[0]
    t_final = fwd[:, 4:5]
    ncontrib = fwd[:, 5:6]
    g_rgb = gout[:, 0:3]      # [PIX, 3]
    g_dep = gout[:, 3:4]
    g_tfin = gout[:, 4:5]
    kt = g_tfin * t_final     # [PIX, 1] T_N * dL/dT_N

    def get_read_dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds((start + c) * chunk, chunk)],
            buf.at[slot],
            sems.at[slot],
        )

    def get_write_dma(slot, c):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dfeat_hbm.at[:, pl.ds((start + c) * chunk, chunk)],
            wsems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_read_dma(0, n_chunks - 1).start()

    def body(i, carry):
        t_run, s_run = carry          # T after chunk end; suffix sum of u
        c = n_chunks - 1 - i
        slot = jax.lax.rem(i, 2)

        @pl.when(c - 1 >= 0)
        def _():
            get_read_dma(1 - slot, c - 1).start()

        get_read_dma(slot, c).wait()
        feat = buf[slot]

        alpha, alpha_raw, g, dx, dy, (ca, cb, cc, _) = _chunk_alpha(feat, px, py)
        gpos = (c * chunk + lane).astype(_f32)
        m = ((gpos < ncontrib) & (alpha > 0.0)).astype(_f32)   # contributor set
        am = alpha * m
        r = -jnp.log1p(-am)                                    # [PIX, C]
        t_g = t_run * jnp.exp(_dot(r, incl_lower))             # T before each g
        w = am * t_g

        colors = feat[5:8, :]
        e = _dot(g_rgb, colors) + g_dep * feat[9:10, :]        # [PIX, C]
        u = w * e
        s_g = s_run + _dot(u, strict_lower)                    # strict suffix
        inv_1m = 1.0 / (1.0 - am)
        d_alpha = m * (e * t_g - (s_g + kt) * inv_1m)

        d_power = alpha_raw * d_alpha                          # [PIX, C]

        def rowsum(x):
            return jnp.sum(x, axis=0, keepdims=True)           # [1, C]

        d_mx = rowsum(-(ca * dx + cb * dy) * d_power)
        d_my = rowsum(-(cc * dy + cb * dx) * d_power)
        d_ca = rowsum(-0.5 * dx * dx * d_power)
        d_cb = rowsum(-dx * dy * d_power)
        d_cc = rowsum(-0.5 * dy * dy * d_power)
        d_colors = _dot_p(g_rgb, w)                            # [3, C]
        d_opr = rowsum(g * d_alpha)                            # [1, C]
        d_depr = _dot_p(g_dep, w)                              # [1, C]
        dfeat = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_colors, d_opr, d_depr,
             jnp.zeros((FEAT_ROWS - 10, chunk), _f32)],
            axis=0,
        )

        wslot = jax.lax.rem(i, 2)

        @pl.when(i >= 2)
        def _():
            get_write_dma(wslot, c + 2).wait()

        dbuf[wslot] = dfeat
        get_write_dma(wslot, c).start()

        t_run = t_run * jnp.exp(_dot(r, ones_c))
        s_run = s_run + _dot(u, ones_c)
        return t_run, s_run

    init = (t_final, jnp.zeros((pix, 1), _f32))
    jax.lax.fori_loop(0, n_chunks, body, init)

    # Drain outstanding writes.
    @pl.when(n_chunks >= 1)
    def _():
        get_write_dma(jax.lax.rem(n_chunks - 1, 2), 0).wait()

    @pl.when(n_chunks >= 2)
    def _():
        get_write_dma(jax.lax.rem(n_chunks - 2, 2), 1).wait()


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("grid_x", "num_tiles", "chunk", "tile")
)
def composite_forward(dup_feat, chunk_starts, n_chunks, tile_offset=None,
                      *, grid_x, num_tiles, chunk, tile=TILE):
    """Run the forward tile kernel.

    dup_feat: [FEAT_ROWS, K_aligned] chunk-aligned duplicated features.
    Returns [num_tiles, tile*tile, OUT_CH].
    """
    pix = tile * tile
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(_fwd_kernel, grid_x=grid_x, chunk=chunk,
                               tile=tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, pix, OUT_CH), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_ROWS, chunk), _f32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, pix, OUT_CH), _f32),
        interpret=_use_interpret(),
    )(chunk_starts, n_chunks, tile_offset, dup_feat)


@functools.partial(
    jax.jit, static_argnames=("grid_x", "num_tiles", "chunk", "tile")
)
def composite_backward(dup_feat, chunk_starts, n_chunks, fwd_out, g_out,
                       tile_offset=None, *, grid_x, num_tiles, chunk,
                       tile=TILE):
    """Run the backward tile kernel -> per-duplicate feature gradients."""
    pix = tile * tile
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    kernel = functools.partial(_bwd_kernel, grid_x=grid_x, chunk=chunk,
                               tile=tile)
    k_aligned = dup_feat.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, pix, OUT_CH), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pix, OUT_CH), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_ROWS, chunk), _f32),
            pltpu.VMEM((2, FEAT_ROWS, chunk), _f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT_ROWS, k_aligned), _f32),
        interpret=_use_interpret(),
    )(chunk_starts, n_chunks, tile_offset, dup_feat, fwd_out, g_out)
    return out
