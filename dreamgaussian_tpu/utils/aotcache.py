"""Cross-process AOT executable cache.

JAX's persistent compilation cache misses across processes on the axon
TPU backend (the backend-side cache key is per-process even though the
lowered StableHLO is bit-identical — verified by hashing `as_text()`
across processes). Remote compiles cost minutes, so this module caches
SERIALIZED EXECUTABLES keyed on the stable lowered-module hash:

    fn = AotCached(jax.jit(f), tag="train_scan")
    out = fn(*args)   # first process: compile + persist; later: ~1s load

Executables are shape-specialized; one AotCached instance assumes one
call signature (which is how the trainers use their per-(size, K)
compiled functions).
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/dg_tpu_aot")


def _cache_path(tag: str, key: str) -> str:
    os.makedirs(DEFAULT_DIR, exist_ok=True)
    return os.path.join(DEFAULT_DIR, f"{tag}-{key}.aot")


def cached_compile(jit_fn, *args, tag: str = "fn", verbose: bool = False):
    """Compile (or load) the executable of ``jit_fn`` for ``args``.

    On the CPU backend this is a plain compile: local compiles are fast,
    and serialized executables bake in the device topology (a 1-device
    entry poisons an 8-virtual-device test process)."""
    from jax.experimental import serialize_executable

    if jax.default_backend() == "cpu":
        return jit_fn.lower(*args).compile()

    lowered = jit_fn.lower(*args)
    devs = ",".join(str(d) for d in jax.devices())
    ident = (
        lowered.as_text()
        + jax.__version__
        + jax.default_backend()
        + devs
    )
    key = hashlib.sha256(ident.encode()).hexdigest()[:32]
    path = _cache_path(tag, key)
    # Debug aid: two runs of "the same" program sometimes produce
    # different keys (constant divergence between construction paths);
    # keep a compressed HLO alongside each entry so `zdiff` pinpoints it.
    hlo_path = path + ".hlo.gz"
    if not os.path.exists(hlo_path):
        import gzip

        try:
            with gzip.open(hlo_path, "wt") as f:
                f.write(lowered.as_text())
        except Exception:
            pass
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = serialize_executable.deserialize_and_load(
                payload, in_tree, out_tree
            )
            if verbose:
                print(f"[aotcache] loaded {tag}-{key[:8]}")
            return compiled
        except Exception as e:  # stale/incompatible entry: recompile
            if verbose:
                print(f"[aotcache] load failed ({e}); recompiling")
    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        if verbose:
            print(f"[aotcache] saved {tag}-{key[:8]}")
    except Exception as e:  # serialization unsupported: still usable
        if verbose:
            print(f"[aotcache] save failed ({e})")
    return compiled


class AotCached:
    """Lazily compile-or-load a jitted function on first call."""

    def __init__(self, jit_fn, tag: str = "fn", verbose: bool = False):
        self._jit_fn = jit_fn
        self._tag = tag
        self._verbose = verbose
        self._compiled = None

    def __call__(self, *args):
        if self._compiled is None:
            self._compiled = cached_compile(
                self._jit_fn, *args, tag=self._tag, verbose=self._verbose
            )
        return self._compiled(*args)
