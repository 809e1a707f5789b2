#!/bin/bash
# Evaluate goslam_tpu on all Replica scenes (reference parity:
# evaluate_on_replica.sh). Usage: ./scripts/evaluate_on_replica.sh [rgbd|mono]
MODE=${1:-rgbd}
SUFFIX=""
[ "$MODE" = "mono" ] && SUFFIX="_mono"
for scene in room0 room1 room2 office0 office1 office2 office3 office4; do
  echo "=== Replica $scene ($MODE) ==="
  python run.py configs/Replica/${scene}${SUFFIX}.yaml --mode $MODE
done
echo "=== summary ==="
for scene in room0 room1 room2 office0 office1 office2 office3 office4; do
  f=output/Replica/${scene}/${MODE}/metrics_traj.txt
  [ -f "$f" ] && echo "$scene: $(cat $f | tr -d '\n')"
  m=output/Replica/${scene}/${MODE}/metrics_mesh.txt
  [ -f "$m" ] && echo "$scene mesh: $(cat $m | tr -d '\n')"
done
