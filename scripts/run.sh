#!/bin/bash
# Single-asset pipeline (reference scripts/run.sh equivalent).
# Usage: bash scripts/run.sh data/name_rgba.png name
set -e
PY=${PYTHON:-/opt/venv/bin/python}
INPUT=$1
NAME=$2
$PY -m dreamgaussian_tpu.cli.main --config configs/image.yaml \
  input="$INPUT" save_path="$NAME"
$PY -m dreamgaussian_tpu.cli.main2 --config configs/image.yaml \
  input="$INPUT" save_path="$NAME"
$PY -m dreamgaussian_tpu.cli.render "logs/$NAME.obj" \
  --out "logs/${NAME}_orbit.gif"
