#!/bin/bash
for scene in MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult \
             V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult; do
  echo "=== EuRoC $scene (stereo) ==="
  python run.py configs/EuRoC/${scene}.yaml --only_tracking
done
for scene in MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult \
             V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult; do
  f=output/EuRoC/${scene}/metrics_traj.txt
  [ -f "$f" ] && echo "$scene: $(cat $f | tr -d '\n')"
done
