#!/bin/bash
# Fragment-wise run over a long ScanNet sequence (reference:
# generate_video_on_scannet.sh, scene0054 with 6629 frames).
SCENE=${1:-scene0054}
LEN=${2:-6629}
STEP=500
for ((start=$STEP; start<=$LEN; start+=$STEP)); do
  python run.py configs/ScanNet/${SCENE}.yaml --max_frames $start \
    --output output/ScanNet/${SCENE}_video/frag_${start}
done
