"""Pallas TPU tile-compositing kernels for 3D Gaussian splatting.

This is the TPU replacement for the CUDA per-tile forward/backward kernels
of ``diff-gaussian-rasterization`` (call surface
/root/reference/gs_renderer.py:745-822). The design is TPU-first rather
than a translation of the CUDA warp model:

- **Pixels live on sublanes, gaussians on lanes.** Each tile is a
  tile*tile-row vector; a chunk of ``C`` depth-sorted gaussians is a
  [PIX, C] problem. All per-pair math is VPU-friendly broadcasting.
- **The exponent is a quadratic form in tile-local coordinates.** The
  kernel builds per-chunk the coefficients of
  ``power + log(opacity) = q0 + qx*x + qy*y + qxx*x^2 + qxy*x*y + qyy*y^2``
  in TILE-CENTER-relative coordinates (a dozen [1,C] row ops from the raw
  mean/conic/log-opacity features — means relative to the tile center
  stay O(tile + 3 sigma), so the form is well-conditioned in f32) and
  evaluates all pairs as 5 VPU broadcast-fmas of [PIX,1] monomial columns
  against the [1,C] coefficient rows (see _chunk_alpha for why not a
  [PIX,6]x[6,C] MXU matmul). alpha follows as one exp; the CUDA skip
  rules become two compares (``power > 0``  <=>  powero > log_op;
  ``alpha < 1/255``  <=>  powero < log(1/255)).
- **Front-to-back compositing without a sequential loop.** The CUDA kernel
  walks gaussians one-by-one per pixel. Here the exclusive prefix product
  of transmittance inside a chunk is computed as ``exp(log1p(-alpha) @
  STRICT_UPPER)`` — a triangular matmul on the MXU. The early-stop rule
  needs NO second matmul: with the naive (non-stopping) prefix product
  t_naive — which is non-increasing, and which the triggering gaussian
  pushes below TERM_EPS for every successor — the contributor set is just
  ``alpha>0 and t_naive*(1-alpha) >= TERM_EPS`` (matches the dense oracle
  in rasterize_ref.py exactly). Color/depth accumulation is another
  [PIX,C]x[C,4] matmul.
- **Many tiles per grid step.** The chunk-aligned duplicate lists of
  consecutive tiles are CONTIGUOUS in the aligned array (binning lays
  tiles out back-to-back), so each grid step streams the combined chunk
  range of ``bt`` tiles with one double-buffered DMA pipeline, advancing
  the current tile by comparing the chunk index against the prefetched
  tile starts.
- **The backward geometric gradient is one matmul.** d(powero) per pair
  chains to the local quadratic coefficients as exactly ``P6^T @
  d_powero`` ([6,C]), then to mean/conic/log-opacity with per-chunk row
  math — no per-pair dx/dy products and no sublane reductions.
  Per-duplicate gradients are written back to HBM and reduced to
  per-gaussian gradients by gather outside the kernel.

Feature/gradient row layout (FEAT_ROWS x K_aligned, f32):
  0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c, 5 log_opacity,
  6 color_r, 7 color_g, 8 color_b, 9 depth, 10..15 pad.
The padding/sentinel feature column must have log_opacity <= -1e10
(=> alpha 0 without NaNs).

Forward per-tile output layout ([T, PIX, OUT_CH]):
  0..2 rgb (premultiplied, no background), 3 depth, 4 T_final,
  5 n_contrib, 6..7 pad.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16                 # default (CUDA-parity); 32 is the TPU fast path
PIX = TILE * TILE         # default pixel count; kernels take `tile` statically
FEAT_ROWS = 16
REAL_FEAT_ROWS = 10       # rows 0..9 carry data; 10..15 are sublane padding
OUT_CH = 8
TERM_EPS = 1e-4
ALPHA_SKIP = 1.0 / 255.0
LOG_ALPHA_SKIP = math.log(ALPHA_SKIP)
ALPHA_MAX = 0.99
Q_SENTINEL = -1e10        # log_opacity of padding slots (alpha == 0, no NaNs)
BT = 8                    # tiles per grid step (fixed-overhead amortization)

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


def _tile_center(tile_id, grid_x, tile):
    """Tile-center reference point (cx, cy) for local coordinates."""
    ty = tile_id // grid_x
    tx = tile_id - ty * grid_x
    half = (tile - 1) / 2.0
    return (tx * tile).astype(_f32) + half, (ty * tile).astype(_f32) + half


def _local_monomials(tile: int):
    """P6 [PIX, 6]: (1, x, y, x^2, x*y, y^2) at tile-CENTER-relative
    pixel centers (|x|,|y| <= (tile-1)/2 keeps the form well-conditioned).
    Used by the BACKWARD's s_l = P6^T @ d_powero contraction."""
    pix = tile * tile
    pid = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    half = (tile - 1) / 2.0
    x = (pid % tile).astype(_f32) - half
    y = (pid // tile).astype(_f32) - half
    one = jnp.ones((pix, 1), _f32)
    return jnp.concatenate([one, x, y, x * x, x * y, y * y], axis=1)


def _monomial_cols(tile: int):
    """Per-pixel monomial COLUMNS for the forward fma evaluation:
    (x, y, -x^2/2, -x*y, -y^2/2) as [PIX, 1], tile-center-relative.
    The quadratic terms carry the -1/2 / -1 coefficient folds so the
    evaluation is 5 broadcast-fmas against raw conic rows."""
    pix = tile * tile
    pid = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    half = (tile - 1) / 2.0
    x = (pid % tile).astype(_f32) - half
    y = (pid // tile).astype(_f32) - half
    return x, y, -0.5 * x * x, -(x * y), -0.5 * y * y


def _chunk_alpha(feat, mono, cx, cy):
    """Per-(pixel, gaussian) alpha for one chunk.

    powero = power + log(opacity) is a quadratic form in tile-CENTER-
    relative coordinates; evaluated as 5 VPU broadcast-fmas of [PIX,1]
    monomial columns against [1,C] coefficient rows. (A [PIX,6]x[6,C]
    MXU matmul was measurably ~20x SLOWER: Mosaic pads the size-6
    contraction to a full 128-pass.) Exact f32; the CUDA skip rules
    become two compares (``power > 0`` <=> powero > log_op;
    ``alpha < 1/255`` <=> powero < log(1/255)).

    Returns (alpha, alpha_raw, aux-for-backward) with the skip rules and
    0.99 clamp applied; alpha_raw = opacity * exp(power) = exp(powero).
    """
    x, y, nxx, nxy, nyy = mono
    mx_l = feat[0:1, :] - cx
    my_l = feat[1:2, :] - cy
    ca, cb, cc = feat[2:3, :], feat[3:4, :], feat[4:5, :]
    log_op = feat[5:6, :]
    qx_l = ca * mx_l + cb * my_l
    qy_l = cc * my_l + cb * mx_l
    q0_l = -0.5 * (mx_l * qx_l + my_l * qy_l) + log_op
    powero = (
        (q0_l + x * qx_l) + (y * qy_l + nxx * ca) + (nxy * cb + nyy * cc)
    )
    alpha_raw = jnp.exp(powero)
    skip = (powero > log_op) | (powero < LOG_ALPHA_SKIP)
    alpha = jnp.where(skip, 0.0, jnp.minimum(alpha_raw, ALPHA_MAX))
    return alpha, alpha_raw, (mx_l, my_l, qx_l, qy_l)


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


def _fwd_kernel(cs_ref, ct_ref, off_ref, feat_hbm, out_ref, buf, sems, *,
                grid_x: int, chunk: int, tile: int, bt: int):
    """One grid step = the contiguous chunk range of ``bt`` tiles.

    cs_ref: [n_blocks*bt + 1] chunk start of each tile (extended; entry
    t+1 is tile t's end — the aligned layout is back-to-back).
    ct_ref: [cap_chunks] global tile id owning each chunk (precomputed
    on-device; replaces a per-chunk while_loop tile advance).
    """
    pix = tile * tile
    b = pl.program_id(0)
    tb0 = b * bt
    cs0 = cs_ref[tb0]
    cs1 = cs_ref[tb0 + bt]
    strict_upper, _, _ = _tri_masks(chunk)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    mono = _monomial_cols(tile)

    # Empty tiles never store: initialize the whole block to the empty
    # result (T=1, everything else 0).
    out_ref[...] = jnp.concatenate(
        [jnp.zeros((bt, pix, 4), _f32), jnp.ones((bt, pix, 1), _f32),
         jnp.zeros((bt, pix, OUT_CH - 5), _f32)], axis=2,
    )

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(k * chunk, chunk)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(cs1 > cs0)
    def _():
        get_dma(0, cs0).start()

    def body(k, carry):
        # t_naive: prefix product of (1-alpha) over ALL gaussians so far,
        # ignoring the early-stop rule; t_true: product over contributors
        # only (the CUDA T_final — the trigger does not multiply in).
        t_naive, t_true, rgb_d, ncontrib = carry
        slot = jax.lax.rem(k - cs0, 2)

        @pl.when(k + 1 < cs1)
        def _():
            get_dma(1 - slot, k + 1).start()

        cur_t = ct_ref[k]        # tile owning chunk k (empty tiles skipped)
        first = k == cs_ref[cur_t]
        is_last = k == cs_ref[cur_t + 1] - 1
        t_naive = jnp.where(first, 1.0, t_naive)
        t_true = jnp.where(first, 1.0, t_true)
        rgb_d = jnp.where(first, 0.0, rgb_d)
        ncontrib = jnp.where(first, 0.0, ncontrib)

        cx, cy = _tile_center(cur_t + off_ref[0], grid_x, tile)

        get_dma(slot, k).wait()
        feat = buf[slot]

        # NOTE a chunk-granular early-termination lax.cond here (skip
        # compute once max(t_naive) < TERM_EPS — exact, the forward twin
        # of the backward's dead-chunk skip) was measured 23% SLOWER at
        # 512^2/8k: Mosaic's per-chunk branch overhead exceeds the saved
        # work whenever any tile pixel stays uncovered (t=1 forever), so
        # it stays out.
        alpha, _, _ = _chunk_alpha(feat, mono, cx, cy)
        lg = jnp.log1p(-alpha)
        t_g = t_naive * jnp.exp(_dot(lg, strict_upper))    # naive T before g
        m = ((t_g * (1.0 - alpha) >= TERM_EPS) & (alpha > 0.0)).astype(_f32)
        w = alpha * t_g * m

        cd = feat[6:10, :]                                  # [4, C] rgb+depth
        rgb_d = rgb_d + _dot_t(w, cd)                       # [PIX, 4]

        gpos = ((k - cs_ref[cur_t]) * chunk + lane + 1).astype(_f32)
        ncontrib = jnp.maximum(
            ncontrib,
            jnp.max(jnp.where(w > 0.0, gpos, 0.0), axis=1, keepdims=True),
        )

        # Full-chunk prefix product = (T before the last gaussian) * its
        # own (1-alpha) — read off t_g's last column instead of another
        # [C,1] matmul + exp.
        t_naive = t_g[:, chunk - 1:chunk] * (1.0 - alpha[:, chunk - 1:chunk])
        t_true = t_true * jnp.exp(
            jnp.sum(lg * m, axis=1, keepdims=True)
        )

        @pl.when(is_last)
        def _():
            out_ref[cur_t - tb0] = jnp.concatenate(
                [rgb_d, t_true, ncontrib,
                 jnp.zeros((pix, OUT_CH - 6), _f32)], axis=1,
            )

        return t_naive, t_true, rgb_d, ncontrib

    init = (
        jnp.ones((pix, 1), _f32),
        jnp.ones((pix, 1), _f32),
        jnp.zeros((pix, 4), _f32),
        jnp.zeros((pix, 1), _f32),
    )
    jax.lax.fori_loop(cs0, cs1, body, init)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(cs_ref, ct_ref, off_ref, feat_hbm, fwd_ref, gout_ref,
                dfeat_hbm, buf, dbuf, sems, wsems, *, grid_x: int,
                chunk: int, tile: int, bt: int, skip_dead: bool = True):
    """Reverse sweep over the same contiguous chunk range of ``bt`` tiles."""
    pix = tile * tile
    b = pl.program_id(0)
    tb0 = b * bt
    cs0 = cs_ref[tb0]
    cs1 = cs_ref[tb0 + bt]
    nk = cs1 - cs0
    _, incl_lower, strict_lower = _tri_masks(chunk)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    p6 = _local_monomials(tile)
    mono = _monomial_cols(tile)

    def get_read_dma(slot, k):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(k * chunk, chunk)],
            buf.at[slot],
            sems.at[slot],
        )

    def get_write_dma(slot, k):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            dfeat_hbm.at[:, pl.ds(k * chunk, chunk)],
            wsems.at[slot],
        )

    @pl.when(nk > 0)
    def _():
        get_read_dma(0, cs1 - 1).start()

    def body(i, carry):
        t_run, s_run = carry          # T after chunk end; suffix sum of u
        k = cs1 - 1 - i
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nk)
        def _():
            get_read_dma(1 - slot, k - 1).start()

        cur_t = ct_ref[k]             # tile owning chunk k
        first = k == cs_ref[cur_t + 1] - 1   # first in REVERSE order

        fwd = fwd_ref[cur_t - tb0]           # [PIX, OUT_CH]
        gout = gout_ref[cur_t - tb0]
        t_final = fwd[:, 4:5]
        ncontrib = fwd[:, 5:6]
        gd = gout[:, 0:4]                    # [PIX, 4] d rgb+depth
        kt = gout[:, 4:5] * t_final          # [PIX, 1] T_N * dL/dT_N

        t_run = jnp.where(first, t_final, t_run)
        s_run = jnp.where(first, 0.0, s_run)

        cx, cy = _tile_center(cur_t + off_ref[0], grid_x, tile)

        get_read_dma(slot, k).wait()
        feat = buf[slot]

        def live_chunk(feat, gd, kt, t_run, s_run):
            alpha, alpha_raw, (mx_l, my_l, qx_l, qy_l) = _chunk_alpha(
                feat, mono, cx, cy
            )
            gpos = ((k - cs_ref[cur_t]) * chunk + lane).astype(_f32)
            m = ((gpos < ncontrib) & (alpha > 0.0)).astype(_f32)  # contribs
            am = alpha * m
            r = -jnp.log1p(-am)                                # [PIX, C]
            t_g = t_run * jnp.exp(_dot(r, incl_lower))         # T before g
            w = am * t_g

            cd = feat[6:10, :]                                 # [4, C]
            e = _dot(gd, cd)                                   # [PIX, C]
            u = w * e
            s_g = s_run + _dot(u, strict_lower)                # strict suffix
            inv_1m = 1.0 / (1.0 - am)
            d_alpha = m * (e * t_g - (s_g + kt) * inv_1m)
            d_powero = alpha_raw * d_alpha                     # [PIX, C]

            # d w.r.t. the LOCAL quadratic coefficients is exactly P6^T @
            # d_powero ([6,C] matmul); chain to mean/conic/log-opacity with
            # per-chunk [1,C] row math (the analytic partials of _local_q).
            s_l = _dot_p(p6, d_powero)                         # [6, C]
            s0, s1, s2 = s_l[0:1], s_l[1:2], s_l[2:3]
            s3, s4, s5 = s_l[3:4], s_l[4:5], s_l[5:6]
            ca, cb, cc = feat[2:3, :], feat[3:4, :], feat[4:5, :]
            d_mx = -qx_l * s0 + ca * s1 + cb * s2
            d_my = -qy_l * s0 + cb * s1 + cc * s2
            d_ca = -0.5 * mx_l * mx_l * s0 + mx_l * s1 - 0.5 * s3
            d_cb = -mx_l * my_l * s0 + my_l * s1 + mx_l * s2 - s4
            d_cc = -0.5 * my_l * my_l * s0 + my_l * s2 - 0.5 * s5
            d_cd = _dot_p(gd, w)                               # [4, C]
            dfeat = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, s0, d_cd,
                 jnp.zeros((FEAT_ROWS - 10, chunk), _f32)],
                axis=0,
            )
            # Full-chunk carries read off existing matmul columns instead
            # of two more [C,1] matmuls: t_g[:,0] already holds
            # t_run * exp(sum r); s_g[:,0] + u[:,0] = s_run + sum u.
            t_run_n = t_g[:, 0:1]
            s_run_n = s_g[:, 0:1] + u[:, 0:1]
            return dfeat, t_run_n, s_run_n

        def dead_chunk(feat, gd, kt, t_run, s_run):
            return jnp.zeros((FEAT_ROWS, chunk), _f32), t_run, s_run

        # Chunk-granular early termination (CUDA-style): a chunk whose
        # smallest gaussian position is at or past every pixel's last
        # contributor has m == 0 everywhere => zero gradients and
        # unchanged running products (r == 0, u == 0). The zero dfeat is
        # still written (dfeat_hbm is uninitialized).
        if skip_dead:
            dfeat, t_run, s_run = jax.lax.cond(
                (k - cs_ref[cur_t]).astype(_f32) * chunk < jnp.max(ncontrib),
                live_chunk,
                dead_chunk,
                feat, gd, kt, t_run, s_run,
            )
        else:
            dfeat, t_run, s_run = live_chunk(feat, gd, kt, t_run, s_run)

        wslot = jax.lax.rem(i, 2)

        @pl.when(i >= 2)
        def _():
            get_write_dma(wslot, k + 2).wait()

        dbuf[wslot] = dfeat
        get_write_dma(wslot, k).start()

        return t_run, s_run

    init = (jnp.ones((pix, 1), _f32), jnp.zeros((pix, 1), _f32))
    jax.lax.fori_loop(0, nk, body, init)

    # Drain outstanding writes.
    @pl.when(nk >= 1)
    def _():
        get_write_dma(jax.lax.rem(nk - 1, 2), cs0).wait()

    @pl.when(nk >= 2)
    def _():
        get_write_dma(jax.lax.rem(nk - 2, 2), cs0 + 1).wait()


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


# The Mosaic scoped-vmem default (16 MB) is tight for the backward
# kernel's vector stack (~15 [PIX,C] f32 temporaries at bt=8); raise it —
# v5e has far more physical VMEM than the conservative default.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _blocks(num_tiles: int, bt: int) -> tuple[int, int]:
    bt = min(bt, num_tiles)
    return (num_tiles + bt - 1) // bt, bt


def _extend_starts(chunk_starts, n_chunks, num_tiles, n_blocks, bt):
    """[T] starts -> [n_blocks*bt + 1] extended/padded tile starts."""
    total = chunk_starts[num_tiles - 1] + n_chunks[num_tiles - 1]
    pad = n_blocks * bt - num_tiles
    return jnp.concatenate([
        chunk_starts,
        jnp.full((pad + 1,), total, jnp.int32),
    ])


def _chunk_tiles(chunk_starts, n_chunks, k_aligned, chunk):
    """[cap_chunks] global tile id owning each aligned chunk.

    Replaces the kernels' per-chunk while_loop tile advance with one SMEM
    lookup. Tile lists are back-to-back, so chunk c belongs to the first
    tile whose cumulative end exceeds c (empty tiles skipped, matching the
    while_loop semantics). Chunks past the real demand are never visited;
    searchsorted assigns them num_tiles, which is fine.
    """
    cap_chunks = k_aligned // chunk
    ends = chunk_starts + n_chunks                  # [T] cumulative ends
    c = jnp.arange(cap_chunks, dtype=jnp.int32)
    return jnp.searchsorted(ends, c, side="right").astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("grid_x", "num_tiles", "chunk", "tile", "bt")
)
def composite_forward(dup_feat, chunk_starts, n_chunks, tile_offset=None,
                      *, grid_x, num_tiles, chunk, tile=TILE, bt=BT):
    """Run the forward tile kernel.

    dup_feat: [FEAT_ROWS, K_aligned] chunk-aligned duplicated quadratic
    features. Returns [num_tiles, tile*tile, OUT_CH].
    """
    pix = tile * tile
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    n_blocks, bt = _blocks(num_tiles, bt)
    cs_ext = _extend_starts(chunk_starts, n_chunks, num_tiles, n_blocks, bt)
    ct = _chunk_tiles(chunk_starts, n_chunks, dup_feat.shape[1], chunk)
    kernel = functools.partial(_fwd_kernel, grid_x=grid_x, chunk=chunk,
                               tile=tile, bt=bt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (bt, pix, OUT_CH), lambda b, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_ROWS, chunk), _f32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * bt, pix, OUT_CH), _f32),
        interpret=_use_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(cs_ext, ct, tile_offset, dup_feat)
    return out[:num_tiles]


@functools.partial(
    jax.jit,
    static_argnames=("grid_x", "num_tiles", "chunk", "tile", "bt",
                     "skip_dead"),
)
def composite_backward(dup_feat, chunk_starts, n_chunks, fwd_out, g_out,
                       tile_offset=None, *, grid_x, num_tiles, chunk,
                       tile=TILE, bt=BT, skip_dead=True):
    """Run the backward tile kernel -> per-duplicate feature gradients."""
    pix = tile * tile
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    n_blocks, bt = _blocks(num_tiles, bt)
    cs_ext = _extend_starts(chunk_starts, n_chunks, num_tiles, n_blocks, bt)
    ct = _chunk_tiles(chunk_starts, n_chunks, dup_feat.shape[1], chunk)
    kernel = functools.partial(_bwd_kernel, grid_x=grid_x, chunk=chunk,
                               tile=tile, bt=bt, skip_dead=skip_dead)
    k_aligned = dup_feat.shape[1]
    pad_tiles = n_blocks * bt - num_tiles
    if pad_tiles:
        fwd_out = jnp.pad(fwd_out, ((0, pad_tiles), (0, 0), (0, 0)))
        g_out = jnp.pad(g_out, ((0, pad_tiles), (0, 0), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bt, pix, OUT_CH), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, pix, OUT_CH), lambda b, *_: (b, 0, 0),
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
        compiler_params=_COMPILER_PARAMS,
    )(cs_ext, ct, tile_offset, dup_feat, fwd_out, g_out)
    return out
