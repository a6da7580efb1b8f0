#!/usr/bin/env bash
# Fetch the BAIR robot-pushing dataset (the canonical data for this task,
# SURVEY.md §1 / §3 row 9 — the reference ships an equivalent fetch script).
#
# ~30 GB of TFRecords: per-timestep features {t}/image_aux1/encoded (raw
# RGB24 64x64), {t}/action (float32[4]), {t}/endeffector_pos (float32[3]),
# 30 steps per clip — exactly the schema data/tfrecord.py and the native
# reader parse.
#
# Usage: scripts/download_bair.sh [DEST_DIR]
set -euo pipefail

DEST="${1:-$HOME/data/bair}"
URL="http://rail.eecs.berkeley.edu/datasets/bair_robot_pushing_dataset_v0.tar"

mkdir -p "$DEST"
echo "Downloading BAIR robot pushing dataset to $DEST ..."
if command -v wget >/dev/null; then
  wget -c "$URL" -O "$DEST/bair_robot_pushing_dataset_v0.tar"
else
  curl -C - -o "$DEST/bair_robot_pushing_dataset_v0.tar" "$URL"
fi
tar -xf "$DEST/bair_robot_pushing_dataset_v0.tar" -C "$DEST"
echo "Done. Train with:"
echo "  python -m action_conditioned_gans_tpu train --preset config1 \\"
echo "    --set data.source=tfrecord_native --set data.data_dir=$DEST/softmotion30_44k/train"
