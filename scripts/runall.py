#!/usr/bin/env python
"""Batch image-to-3D over a directory of preprocessed RGBA inputs.

Equivalent of the reference batch driver
(/root/reference/scripts/runall.py): for each ``*_rgba.png`` under
``--dir``, run stage 1, stage 2, and export an orbit turntable. One TPU
process at a time (the reference farms one prompt per GPU; a single-host
TPU runs them sequentially — parallelism lives INSIDE the step via the
device mesh, not across processes).

  python scripts/runall.py --dir data --out logs [--gpu unused]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data")
    ap.add_argument("--out", default="logs")
    ap.add_argument("--config", default="configs/image.yaml")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra key=value overrides for both stages")
    ap.add_argument("--video", action="store_true")
    args = ap.parse_args()

    from dreamgaussian_tpu.cli import main as cli1
    from dreamgaussian_tpu.cli import main2 as cli2
    from dreamgaussian_tpu.utils.config import load_with_cli

    files = sorted(glob.glob(os.path.join(args.dir, "*_rgba.png")))
    print(f"[INFO] {len(files)} inputs")
    for path in files:
        name = os.path.basename(path).replace("_rgba.png", "")
        print(f"===== {name} =====")
        over = [
            f"input={path}", f"save_path={name}", f"outdir={args.out}",
            *args.extra,
        ]
        opt = load_with_cli(args.config, over)
        cli1.run(opt)
        cli2.run(opt)
        if args.video:
            from dreamgaussian_tpu.cli import render as cli_render

            mesh = os.path.join(
                args.out, f"{name}.{opt.get('mesh_format', 'obj')}"
            )
            cli_render.main([mesh, "--out",
                             os.path.join(args.out, f"{name}_orbit.gif")])


if __name__ == "__main__":
    main()
