#!/bin/bash
# Fetch COCO 2017 into ../datasets/coco in the layout the loaders expect
# (images/{train2017,val2017} + YOLO-txt labels). TPU-host equivalent of
# the reference data/get_coco.sh. Flags: --train --val --test --segments
# (default: train+val, detection labels).
set -e

train=true; val=true; test=false; segments=false
if [ "$#" -gt 0 ]; then
  train=false; val=false
  for opt in "$@"; do
    case "${opt}" in
      --train) train=true ;;
      --val) val=true ;;
      --test) test=true ;;
      --segments) segments=true ;;
      *) echo "unknown flag ${opt}" >&2; exit 2 ;;
    esac
  done
fi

dst='../datasets'
mkdir -p "$dst/coco/images"

fetch() { # url file unzip_dir
  echo "downloading $1$2 ..."
  curl -fL "$1$2" -o "$2" -# && unzip -q "$2" -d "$3" && rm "$2"
}

# YOLO-format labels (ultralytics release artifacts)
lbl='coco2017labels.zip'
[ "$segments" = true ] && lbl='coco2017labels-segments.zip'
fetch 'https://github.com/ultralytics/yolov5/releases/download/v1.0/' "$lbl" "$dst" &

img_url='http://images.cocodataset.org/zips/'
[ "$train" = true ] && fetch "$img_url" 'train2017.zip' "$dst/coco/images" &
[ "$val" = true ] && fetch "$img_url" 'val2017.zip' "$dst/coco/images" &
[ "$test" = true ] && fetch "$img_url" 'test2017.zip' "$dst/coco/images" &
wait
echo "done -> $dst/coco"
