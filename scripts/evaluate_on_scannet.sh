#!/bin/bash
# ScanNet evaluation (tracking only, reference parity:
# evaluate_on_scannet.sh uses --only_tracking).
for scene in scene0000 scene0054 scene0059 scene0106 scene0169 scene0181 scene0207 scene0233; do
  echo "=== ScanNet $scene ==="
  python run.py configs/ScanNet/${scene}.yaml --only_tracking
done
for scene in scene0000 scene0054 scene0059 scene0106 scene0169 scene0181 scene0207 scene0233; do
  f=output/ScanNet/${scene}/metrics_traj.txt
  [ -f "$f" ] && echo "$scene: $(cat $f | tr -d '\n')"
done
