#!/bin/bash
MODE=${1:-rgbd}
for scene in fr1_desk fr2_xyz fr3_office; do
  echo "=== TUM $scene ($MODE) ==="
  python run.py configs/TUM_RGBD/${scene}.yaml --mode $MODE --only_tracking
done
for scene in fr1_desk fr2_xyz fr3_office; do
  f=output/TUM_RGBD/${scene}/metrics_traj.txt
  [ -f "$f" ] && echo "$scene: $(cat $f | tr -d '\n')"
done
