"""Pallas TPU tile-compositing kernels for 3D Gaussian splatting.

This is the TPU replacement for the CUDA per-tile forward/backward kernels
of ``diff-gaussian-rasterization`` (call surface
/root/reference/gs_renderer.py:745-822). The design is TPU-first rather
than a translation of the CUDA warp model:

- **Gaussians live on sublanes, pixels on lanes.** Each chunk of ``C``
  depth-sorted gaussians against a tile's ``PIX`` pixels is a [C, PIX]
  problem; all per-pair math is VPU-friendly broadcasting of per-gaussian
  [C, 1] columns against per-pixel [1, PIX] rows. (Round 5 flipped the
  r1-r4 pixel-sublane orientation: with pixels on LANES the outputs
  leave the kernel as [OUT_CH, PIX] rows — a layout XLA stores unpadded.
  The old [PIX, OUT_CH] output had an 8-wide minor dim that TPU layouts
  pad to 128 lanes: 16x memory bloat and two ~0.2 ms relayout copies per
  call at 512^2.)
- **The exponent is a quadratic form in tile-local coordinates.** The
  kernel builds per-chunk the coefficients of
  ``power + log(opacity) = q0 + qx*x + qy*y + qxx*x^2 + qxy*x*y + qyy*y^2``
  in TILE-CENTER-relative coordinates (a dozen [C, 1] column ops from the
  raw mean/conic/log-opacity features — means relative to the tile center
  stay O(tile + 3 sigma), so the form is well-conditioned in f32) and
  evaluates all pairs as 5 VPU broadcast-fmas of [1, PIX] monomial rows
  against the [C, 1] coefficient columns (see _chunk_alpha for why not a
  [C,6]x[6,PIX] MXU matmul). alpha follows as one exp; the CUDA skip
  rules become two compares (``power > 0``  <=>  powero > log_op;
  ``alpha < 1/255``  <=>  powero < log(1/255)).
- **Front-to-back compositing without a sequential loop.** The CUDA kernel
  walks gaussians one-by-one per pixel. Here the exclusive prefix product
  of transmittance inside a chunk is computed as ``exp(STRICT_LOWER @
  log1p(-alpha))`` — a triangular matmul on the MXU. The early-stop rule
  needs NO second matmul: with the naive (non-stopping) prefix product
  t_naive — which is non-increasing, and which the triggering gaussian
  pushes below TERM_EPS for every successor — the contributor set is just
  ``alpha>0 and t_naive*(1-alpha) >= TERM_EPS`` (matches the dense oracle
  in rasterize_ref.py exactly). Color/depth accumulation is another
  [4,C]x[C,PIX] matmul, and the running carries are [1, PIX] rows.
- **Many tiles per grid step.** The chunk-aligned duplicate lists of
  consecutive tiles are CONTIGUOUS in the aligned array (binning lays
  tiles out back-to-back), so each grid step streams the combined chunk
  range of ``bt`` tiles with one double-buffered DMA pipeline, advancing
  the current tile by comparing the chunk index against the prefetched
  tile starts.
- **The backward geometric gradient is one matmul.** d(powero) per pair
  chains to the local quadratic coefficients as exactly ``d_powero @
  P6`` ([C,6]), then to mean/conic/log-opacity with per-chunk column
  math — no per-pair dx/dy products and no lane reductions.
  Per-duplicate gradients are written back to HBM and reduced to
  per-gaussian gradients by gather outside the kernel.
- **Feature rows stay feature-major in HBM.** dup_feat is [FEAT_ROWS,
  K_aligned] (K minor: unpadded, lane-aligned chunk DMAs); the kernel
  transposes each [FEAT_ROWS, C] chunk to gaussian-major [C, FEAT_ROWS]
  with one tiny exact identity matmul (Mosaic has no general shape
  cast; a [16,16] identity contraction is ~free on the MXU).

Feature/gradient row layout (FEAT_ROWS x K_aligned, f32):
  0 mean_x, 1 mean_y, 2 conic_a, 3 conic_b, 4 conic_c, 5 log_opacity,
  6 color_r, 7 color_g, 8 color_b, 9 depth, 10..15 pad.
The padding/sentinel feature column must have log_opacity <= -1e10
(=> alpha 0 without NaNs).

Forward per-tile output layout ([T, OUT_CH, PIX] — channel-planar rows):
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


def _transpose_mm(x, rows: int):
    """Exact transpose of ``x`` [rows, C] -> [C, rows] via an identity
    contraction (Mosaic supports no general vector shape cast; the MXU
    pass with a 0/1 identity operand is bit-exact at HIGHEST precision
    and costs ~nothing at these sizes)."""
    li = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    eye = (li == lj).astype(_f32)
    return jax.lax.dot_general(
        x, eye, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_f32,
        precision=jax.lax.Precision.HIGHEST,
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
    Used by the BACKWARD's s_l = d_powero @ P6 contraction."""
    pix = tile * tile
    pid = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    half = (tile - 1) / 2.0
    x = (pid % tile).astype(_f32) - half
    y = (pid // tile).astype(_f32) - half
    one = jnp.ones((pix, 1), _f32)
    return jnp.concatenate([one, x, y, x * x, x * y, y * y], axis=1)


def _monomial_rows(tile: int):
    """Per-pixel monomial ROWS for the forward fma evaluation:
    (x, y, -x^2/2, -x*y, -y^2/2) as [1, PIX], tile-center-relative.
    The quadratic terms carry the -1/2 / -1 coefficient folds so the
    evaluation is 5 broadcast-fmas against raw conic columns."""
    pix = tile * tile
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    half = (tile - 1) / 2.0
    x = (pid % tile).astype(_f32) - half
    y = (pid // tile).astype(_f32) - half
    return x, y, -0.5 * x * x, -(x * y), -0.5 * y * y


def _chunk_alpha(featT, mono, cx, cy):
    """Per-(gaussian, pixel) alpha for one chunk; featT is [C, FEAT_ROWS].

    powero = power + log(opacity) is a quadratic form in tile-CENTER-
    relative coordinates; evaluated as 5 VPU broadcast-fmas of [1, PIX]
    monomial rows against [C, 1] coefficient columns. (A [C,6]x[6,PIX]
    MXU matmul was measurably ~20x SLOWER: Mosaic pads the size-6
    contraction to a full 128-pass.) Exact f32; the CUDA skip rules
    become two compares (``power > 0`` <=> powero > log_op;
    ``alpha < 1/255`` <=> powero < log(1/255)).

    Returns (alpha, alpha_raw, aux-for-backward) with the skip rules and
    0.99 clamp applied; alpha_raw = opacity * exp(power) = exp(powero).
    """
    x, y, nxx, nxy, nyy = mono
    mx_l = featT[:, 0:1] - cx
    my_l = featT[:, 1:2] - cy
    ca, cb, cc = featT[:, 2:3], featT[:, 3:4], featT[:, 4:5]
    log_op = featT[:, 5:6]
    qx_l = ca * mx_l + cb * my_l
    qy_l = cc * my_l + cb * mx_l
    q0_l = -0.5 * (mx_l * qx_l + my_l * qy_l) + log_op
    powero = (
        (q0_l + qx_l * x) + (qy_l * y + ca * nxx) + (cb * nxy + cc * nyy)
    )
    alpha_raw = jnp.exp(powero)
    skip = (powero > log_op) | (powero < LOG_ALPHA_SKIP)
    alpha = jnp.where(skip, 0.0, jnp.minimum(alpha_raw, ALPHA_MAX))
    return alpha, alpha_raw, (mx_l, my_l, qx_l, qy_l)


def _tri_masks(c):
    """Triangular masks used as the LHS of [C,C]x[C,PIX] matmuls:
    M @ x reduces over the gaussian (sublane) axis."""
    li = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    strict_lower = (li > lj).astype(_f32)   # M @ x = exclusive prefix sum
    incl_upper = (li <= lj).astype(_f32)    # M @ x = inclusive suffix sum
    strict_upper = (li < lj).astype(_f32)   # M @ x = exclusive suffix sum
    return strict_lower, incl_upper, strict_upper


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
    strict_lower, _, _ = _tri_masks(chunk)
    sub = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    mono = _monomial_rows(tile)

    # Empty tiles never store: initialize the whole block to the empty
    # result (T_final=1 on channel 4, everything else 0).
    out_ref[...] = jnp.concatenate(
        [jnp.zeros((bt, 4, pix), _f32), jnp.ones((bt, 1, pix), _f32),
         jnp.zeros((bt, OUT_CH - 5, pix), _f32)], axis=1,
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
        featT = _transpose_mm(buf[slot], FEAT_ROWS)      # [C, FEAT_ROWS]

        # NOTE a chunk-granular early-termination lax.cond here (skip
        # compute once max(t_naive) < TERM_EPS — exact, the forward twin
        # of the backward's dead-chunk skip) was measured 23% SLOWER at
        # 512^2/8k: Mosaic's per-chunk branch overhead exceeds the saved
        # work whenever any tile pixel stays uncovered (t=1 forever), so
        # it stays out.
        alpha, _, _ = _chunk_alpha(featT, mono, cx, cy)
        lg = jnp.log1p(-alpha)
        t_g = t_naive * jnp.exp(_dot(strict_lower, lg))    # naive T before g
        m = ((t_g * (1.0 - alpha) >= TERM_EPS) & (alpha > 0.0)).astype(_f32)
        w = alpha * t_g * m

        cd = featT[:, 6:10]                                 # [C, 4] rgb+depth
        rgb_d = rgb_d + _dot_p(cd, w)                       # [4, PIX]

        gpos = ((k - cs_ref[cur_t]) * chunk + sub + 1).astype(_f32)
        ncontrib = jnp.maximum(
            ncontrib,
            jnp.max(jnp.where(w > 0.0, gpos, 0.0), axis=0, keepdims=True),
        )

        # Full-chunk prefix product = (T before the last gaussian) * its
        # own (1-alpha) — read off t_g's last row instead of another
        # [1,C] matmul + exp.
        t_naive = t_g[chunk - 1:chunk, :] * (1.0 - alpha[chunk - 1:chunk, :])
        t_true = t_true * jnp.exp(
            jnp.sum(lg * m, axis=0, keepdims=True)
        )

        @pl.when(is_last)
        def _():
            out_ref[cur_t - tb0] = jnp.concatenate(
                [rgb_d, t_true, ncontrib,
                 jnp.zeros((OUT_CH - 6, pix), _f32)], axis=0,
            )

        return t_naive, t_true, rgb_d, ncontrib

    init = (
        jnp.ones((1, pix), _f32),
        jnp.ones((1, pix), _f32),
        jnp.zeros((4, pix), _f32),
        jnp.zeros((1, pix), _f32),
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
    _, incl_upper, strict_upper = _tri_masks(chunk)
    sub = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    p6 = _local_monomials(tile)
    mono = _monomial_rows(tile)

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

        fwd = fwd_ref[cur_t - tb0]           # [OUT_CH, PIX]
        gout = gout_ref[cur_t - tb0]
        t_final = fwd[4:5, :]
        ncontrib = fwd[5:6, :]
        gd = gout[0:4, :]                    # [4, PIX] d rgb+depth
        kt = gout[4:5, :] * t_final          # [1, PIX] T_N * dL/dT_N

        t_run = jnp.where(first, t_final, t_run)
        s_run = jnp.where(first, 0.0, s_run)

        cx, cy = _tile_center(cur_t + off_ref[0], grid_x, tile)

        get_read_dma(slot, k).wait()
        featT = _transpose_mm(buf[slot], FEAT_ROWS)      # [C, FEAT_ROWS]

        def live_chunk(featT, gd, kt, t_run, s_run):
            alpha, alpha_raw, (mx_l, my_l, qx_l, qy_l) = _chunk_alpha(
                featT, mono, cx, cy
            )
            gpos = ((k - cs_ref[cur_t]) * chunk + sub).astype(_f32)
            m = ((gpos < ncontrib) & (alpha > 0.0)).astype(_f32)  # contribs
            am = alpha * m
            r = -jnp.log1p(-am)                                # [C, PIX]
            t_g = t_run * jnp.exp(_dot(incl_upper, r))         # T before g
            w = am * t_g

            cd = featT[:, 6:10]                                # [C, 4]
            e = _dot(cd, gd)                                   # [C, PIX]
            u = w * e
            s_g = s_run + _dot(strict_upper, u)                # strict suffix
            inv_1m = 1.0 / (1.0 - am)
            d_alpha = m * (e * t_g - (s_g + kt) * inv_1m)
            d_powero = alpha_raw * d_alpha                     # [C, PIX]

            # d w.r.t. the LOCAL quadratic coefficients is exactly
            # d_powero @ P6 ([C,6] matmul); chain to mean/conic/log-
            # opacity with per-chunk [C,1] column math (the analytic
            # partials of the local quadratic).
            s_l = _dot(d_powero, p6)                           # [C, 6]
            s0, s1, s2 = s_l[:, 0:1], s_l[:, 1:2], s_l[:, 2:3]
            s3, s4, s5 = s_l[:, 3:4], s_l[:, 4:5], s_l[:, 5:6]
            ca, cb, cc = featT[:, 2:3], featT[:, 3:4], featT[:, 4:5]
            d_mx = -qx_l * s0 + ca * s1 + cb * s2
            d_my = -qy_l * s0 + cb * s1 + cc * s2
            d_ca = -0.5 * mx_l * mx_l * s0 + mx_l * s1 - 0.5 * s3
            d_cb = -mx_l * my_l * s0 + my_l * s1 + mx_l * s2 - s4
            d_cc = -0.5 * my_l * my_l * s0 + my_l * s2 - 0.5 * s5
            d_cd = _dot_t(w, gd)                               # [C, 4]
            dfeatT = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, s0, d_cd,
                 jnp.zeros((chunk, FEAT_ROWS - 10), _f32)],
                axis=1,
            )
            # Full-chunk carries read off existing matmul rows instead
            # of two more [1,C] matmuls: t_g[0] already holds
            # t_run * exp(sum r); s_g[0] + u[0] = s_run + sum u.
            t_run_n = t_g[0:1, :]
            s_run_n = s_g[0:1, :] + u[0:1, :]
            return dfeatT, t_run_n, s_run_n

        def dead_chunk(featT, gd, kt, t_run, s_run):
            return jnp.zeros((chunk, FEAT_ROWS), _f32), t_run, s_run

        # Chunk-granular early termination (CUDA-style): a chunk whose
        # smallest gaussian position is at or past every pixel's last
        # contributor has m == 0 everywhere => zero gradients and
        # unchanged running products (r == 0, u == 0). The zero dfeat is
        # still written (dfeat_hbm is uninitialized).
        if skip_dead:
            dfeatT, t_run, s_run = jax.lax.cond(
                (k - cs_ref[cur_t]).astype(_f32) * chunk < jnp.max(ncontrib),
                live_chunk,
                dead_chunk,
                featT, gd, kt, t_run, s_run,
            )
        else:
            dfeatT, t_run, s_run = live_chunk(featT, gd, kt, t_run, s_run)

        wslot = jax.lax.rem(i, 2)

        @pl.when(i >= 2)
        def _():
            get_write_dma(wslot, k + 2).wait()

        # Back to feature-major [FEAT_ROWS, C] for the HBM write: a
        # gaussian-major [K, FEAT_ROWS] output (which would make the
        # per-gaussian reduce a row-gather and skip this transpose) was
        # measured a net LOSS — the 16-wide rows lane-pad to 128, so
        # every downstream read of dfeat carries 8x traffic (+8 ms at
        # 512^2/32k).
        dbuf[wslot] = _transpose_mm(dfeatT, chunk)
        get_write_dma(wslot, k).start()

        return t_run, s_run

    init = (jnp.ones((1, pix), _f32), jnp.zeros((1, pix), _f32))
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
# kernel's vector stack (~15 [C,PIX] f32 temporaries at bt=8); raise it —
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
    # tile(c) = #{t : ends[t] <= c} — a dense compare+reduce (~0.3M VPU
    # ops) instead of jnp.searchsorted, whose scalar while-loop lowering
    # cost 0.17 ms/call at 512^2 (ends is sorted, both are exact).
    return jnp.sum(
        (ends[None, :] <= c[:, None]).astype(jnp.int32), axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("grid_x", "num_tiles", "chunk", "tile", "bt")
)
def composite_forward(dup_feat, chunk_starts, n_chunks, tile_offset=None,
                      *, grid_x, num_tiles, chunk, tile=TILE, bt=BT):
    """Run the forward tile kernel.

    dup_feat: [FEAT_ROWS, K_aligned] chunk-aligned duplicated quadratic
    features. Returns [num_tiles, OUT_CH, tile*tile] (channel-planar).
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
            (bt, OUT_CH, pix), lambda b, *_: (b, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((n_blocks * bt, OUT_CH, pix), _f32),
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
    """Run the backward tile kernel -> per-duplicate feature gradients
    [FEAT_ROWS, K_aligned].

    fwd_out / g_out use composite_forward's [T, OUT_CH, PIX] layout.
    """
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
            pl.BlockSpec((bt, OUT_CH, pix), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, OUT_CH, pix), lambda b, *_: (b, 0, 0),
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
