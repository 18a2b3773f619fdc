#!/usr/bin/env bash
# Download + restructure Cityscapes / Foggy Cityscapes and build the COCO
# JSONs this framework consumes (the reference's cityscapes.sh, rebuilt).
#
# Requires CITYSCAPES_USERNAME / CITYSCAPES_PASSWORD (cityscapes-dataset.com
# credentials) and ~60GB free under $SFOD_DATASETS (default ./datasets).
set -euo pipefail

ROOT="${SFOD_DATASETS:-datasets}"
CS="$ROOT/cityscapes"
CSF="$ROOT/cityscapes_foggy"
mkdir -p "$CS" "$CSF"

login() {
  wget --keep-session-cookies --save-cookies=/tmp/cs_cookies.txt \
    --post-data "username=${CITYSCAPES_USERNAME}&password=${CITYSCAPES_PASSWORD}&submit=Login" \
    https://www.cityscapes-dataset.com/login/ -O /dev/null
}

fetch() { # fetch <packageID> <outfile>
  wget --load-cookies /tmp/cs_cookies.txt --content-disposition -c \
    "https://www.cityscapes-dataset.com/file-handling/?packageID=$1" -O "$2"
}

login
fetch 1 "$CS/gtFine_trainvaltest.zip"          # gtFine annotations
fetch 3 "$CS/leftImg8bit_trainvaltest.zip"     # clear images
fetch 29 "$CSF/leftImg8bit_trainvaltest_foggy.zip"  # foggy renderings

unzip -qo "$CS/gtFine_trainvaltest.zip" -d "$CS"
unzip -qo "$CS/leftImg8bit_trainvaltest.zip" -d "$CS"
unzip -qo "$CSF/leftImg8bit_trainvaltest_foggy.zip" -d "$CSF"

# COCO JSONs (instancesonly, 8 classes), clear + foggy beta 0.02
for SPLIT in train val; do
  python "$(dirname "$0")/converters/cityscapes_to_coco.py" \
    --gt-root "$CS/gtFine" --split "$SPLIT" \
    --output "$CS/annotations/instancesonly_filtered_gtFine_${SPLIT}.json"
  python "$(dirname "$0")/converters/cityscapes_to_coco.py" \
    --gt-root "$CS/gtFine" --split "$SPLIT" --foggy-beta 0.02 \
    --output "$CSF/annotations/instancesonly_filtered_gtFine_${SPLIT}_foggy_beta_0.02.json"
done

echo "done. export SFOD_DATASETS=$ROOT"
