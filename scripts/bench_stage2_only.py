"""Run ONLY the stage-2 refine bench (fast iteration on VERDICT r2 #4).

Same guidance + measurement protocol as bench.py's bench_stage2; prints
its dict as one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    g, kind = bench.build_guidance()
    out = bench.bench_stage2(g)
    out["guidance"] = kind
    print(json.dumps(out))


if __name__ == "__main__":
    main()
