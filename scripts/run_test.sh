#!/bin/bash
# Smoke test: one sample of each pipeline flavor through both stages
# (reference scripts/run_test.sh equivalent). With no diffusion
# checkpoints available, pass EXTRA="fake_guidance=True" to exercise the
# full paths with the random-denoiser prior.
#   bash scripts/run_test.sh data/anya_rgba.png [EXTRA...]
set -e
PY=${PYTHON:-/opt/venv/bin/python}
INPUT=${1:-data/anya_rgba.png}
shift || true
EXTRA="$@"

echo "=== image-to-3D (zero123) ==="
$PY -m dreamgaussian_tpu.cli.main  --config configs/image.yaml input="$INPUT" save_path=smoke_img $EXTRA
$PY -m dreamgaussian_tpu.cli.main2 --config configs/image.yaml input="$INPUT" save_path=smoke_img $EXTRA

echo "=== text-to-3D (SD) ==="
$PY -m dreamgaussian_tpu.cli.main  --config configs/text.yaml "prompt=a photo of an icecream" save_path=smoke_txt $EXTRA
$PY -m dreamgaussian_tpu.cli.main2 --config configs/text.yaml "prompt=a photo of an icecream" save_path=smoke_txt $EXTRA

echo "=== text-to-3D (MVDream) ==="
$PY -m dreamgaussian_tpu.cli.main  --config configs/text_mv.yaml "prompt=a plush dragon toy" save_path=smoke_mv $EXTRA
$PY -m dreamgaussian_tpu.cli.main2 --config configs/text_mv.yaml "prompt=a plush dragon toy" save_path=smoke_mv $EXTRA

echo "=== image-to-3D (ImageDream) ==="
$PY -m dreamgaussian_tpu.cli.main  --config configs/imagedream.yaml input="$INPUT" "prompt=a character" save_path=smoke_id $EXTRA
$PY -m dreamgaussian_tpu.cli.main2 --config configs/imagedream.yaml input="$INPUT" "prompt=a character" save_path=smoke_id $EXTRA

echo "=== turntables ==="
for n in smoke_img smoke_txt smoke_mv smoke_id; do
  $PY -m dreamgaussian_tpu.cli.render "logs/$n.obj" --out "logs/${n}_orbit.gif" || true
done
echo "smoke test done"
