#!/bin/bash
# Fetch the Efficient Teacher SSOD split lists (the labeled/unlabeled
# percentage partitions of COCO used by the configs' Dataset.train/target
# list files) into ../datasets. Equivalent of the reference
# data/get_label.sh.
set -e
dst='../datasets'
mkdir -p "$dst"
url='https://github.com/BowieHsu/EfficientTeacher/releases/download/data_list/'
f='data_list.zip'
echo "downloading $url$f ..."
curl -fL "$url$f" -o "$f" -#
unzip -q "$f" -d "$dst"
rm "$f"
echo "done -> $dst"
