#!/bin/sh
# Fetch the pre-trained ROVINA forest model (reference resources/get_rf_model.sh:2).
# The model file is the reference's own forest.dat; this framework loads it
# directly (models/forest.py implements the binary format bit-for-bit).
set -e
DEST="${1:-resources/forest.dat}"
mkdir -p "$(dirname "$DEST")"
wget -O "$DEST" "https://www.vision.rwth-aachen.de/media/resource_files/forest.dat"
echo "Wrote $DEST"
