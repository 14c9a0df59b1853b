"""Isolate the ~0.78 ms fixed cost of a pallas_call on the axon TPU.

Chains (in-graph fori_loop, 50 iters) of:
  triv        : minimal kernel, no grid, VMEM in/out [8,128]
  grid32      : same with grid=(32,) revisiting out
  prefetch    : + PrefetchScalarGridSpec with 2 scalar args
  anyin       : + input left in ANY (HBM) memory space + scratch + DMA sems
  anyin_dma   : anyin + one actual DMA per grid step
  bigout      : anyin with the real [256,1024,8] out shape
  two_anyin   : two anyin calls back-to-back per iteration
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_f32 = jnp.float32


def triv_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1e-30


@jax.jit
def triv(x):
    return pl.pallas_call(
        triv_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), _f32),
    )(x)


def grid_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1e-30


@jax.jit
def grid32(x):
    return pl.pallas_call(
        grid_kernel,
        grid=(32,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), _f32),
    )(x)


def pf_kernel(s1_ref, s2_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...] + s1_ref[0].astype(_f32) * 1e-30


@jax.jit
def prefetch(x, s1, s2):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(32,),
        in_specs=[pl.BlockSpec((8, 128), lambda i, *_: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0)),
    )
    return pl.pallas_call(
        pf_kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((8, 128), _f32),
    )(s1, s2, x)


def any_kernel(s1_ref, s2_ref, x_hbm, o_ref, buf, sem, *, dma):
    i = pl.program_id(0)
    if dma:
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 8), pl.ds(0, 128)], buf, sem)
        cp.start()
        cp.wait()
        o_ref[...] = buf[...] + s1_ref[0].astype(_f32) * 1e-30
    else:
        o_ref[...] = jnp.zeros((8, 128), _f32) + s1_ref[0].astype(_f32) * 1e-30


@functools.partial(jax.jit, static_argnames=("dma", "big"))
def anyin(x, s1, s2, dma=False, big=False):
    out_shape = (256, 1024, 8) if big else (8, 128)
    if big:
        out_spec = pl.BlockSpec((8, 1024, 8), lambda i, *_: (i, 0, 0))
        def k(s1_ref, s2_ref, x_hbm, o_ref, buf, sem):
            o_ref[...] = jnp.zeros((8, 1024, 8), _f32) \
                + s1_ref[0].astype(_f32) * 1e-30
        kern = k
    else:
        out_spec = pl.BlockSpec((8, 128), lambda i, *_: (0, 0))
        kern = functools.partial(any_kernel, dma=dma)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(32,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((8, 128), _f32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct(out_shape, _f32),
    )(s1, s2, x)


def main():
    x8 = jnp.zeros((8, 128), _f32)
    xbig = jnp.zeros((16, 155648), _f32)
    s1 = jnp.arange(260, dtype=jnp.int32)
    s2 = jnp.arange(1216, dtype=jnp.int32)

    def chain(name, step):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, 50, lambda i, x: step(x), x)
        jax.block_until_ready(run(jnp.zeros(())))
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.zeros(())))
        dt = (time.perf_counter() - t0) / 50
        print(f"{name:12s} {dt*1e3:8.3f} ms", flush=True)

    chain("triv", lambda c: c + triv(x8 + c * 1e-30)[0, 0] * 1e-30)
    chain("grid32", lambda c: c + grid32(x8 + c * 1e-30)[0, 0] * 1e-30)
    chain("prefetch", lambda c: c + prefetch(
        x8 + c * 1e-30, s1, s2)[0, 0] * 1e-30)
    chain("anyin", lambda c: c + anyin(
        xbig + c * 1e-30, s1, s2)[0, 0] * 1e-30)
    chain("anyin_dma", lambda c: c + anyin(
        xbig + c * 1e-30, s1, s2, dma=True)[0, 0] * 1e-30)
    chain("bigout", lambda c: c + anyin(
        xbig + c * 1e-30, s1, s2, big=True)[0, 0, 0] * 1e-30)

    def two(c):
        a = anyin(xbig + c * 1e-30, s1, s2)
        b = anyin(xbig + a[0, 0] * 1e-30, s1, s2)
        return c + b[0, 0] * 1e-30
    chain("two_anyin", two)

    # also: is it the 10MB xbig consume?
    chain("consume10MB", lambda c: c + (xbig + c * 1e-30)[0, 0] * 1e-30)


if __name__ == "__main__":
    main()
