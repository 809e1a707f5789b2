"""Dataset loaders on synthetic on-disk fixtures: preprocessing math
(resize -> RGB -> crop + intrinsics rescale), TUM association +
first-pose normalization, ETH3D poseless test split, ScanNet numeric
sort, config inheritance chains."""
import os

import numpy as np
import pytest

from goslam_tpu.config import default_config, load_config, update_recursive

pytestmark = pytest.mark.quick

cv2 = pytest.importorskip("cv2")


def _cam(H=48, W=64, H_out=24, W_out=32, H_edge=2, W_edge=4, **kw):
    cfg = default_config()
    update_recursive(cfg, {"cam": {
        "H": H, "W": W, "fx": 50.0, "fy": 40.0, "cx": W / 2, "cy": H / 2,
        "H_out": H_out, "W_out": W_out, "H_edge": H_edge, "W_edge": W_edge,
        "png_depth_scale": 1000.0}})
    return cfg


def test_base_preprocess_intrinsics_and_crop(tmp_path):
    """Pipeline per the reference (datasets.py:115-132): resize to
    out+2*edge, rescale intrinsics by the same factors, then edge-crop
    shifting the principal point."""
    from goslam_tpu.data.datasets import BaseDataset

    cfg = _cam()
    cfg["data"]["input_folder"] = str(tmp_path)
    ds = BaseDataset(cfg)
    img = np.zeros((48, 64, 3), np.uint8)
    img[:, :, 2] = 200          # BGR red channel
    depth = np.full((48, 64), 2.0, np.float32)
    color, dep, intr = ds._process(img, depth)

    assert color.shape == (24, 32, 3)
    assert dep.shape == (24, 32)
    # BGR -> RGB: red must land in channel 0
    assert color[0, 0, 0] > 0.7 and color[0, 0, 2] < 0.05
    sx = (32 + 2 * 4) / 64.0
    sy = (24 + 2 * 2) / 48.0
    np.testing.assert_allclose(
        intr, [50.0 * sx, 40.0 * sy, 32.0 * sx - 4, 24.0 * sy - 2],
        rtol=1e-6)
    assert (dep == 2.0).all()


def _write_tum(root, n=6, with_gt=True, dt=0.05, depth_offset=0.004):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    with open(os.path.join(root, "rgb.txt"), "w") as fr, \
            open(os.path.join(root, "depth.txt"), "w") as fd:
        for i in range(n):
            t = 100.0 + i * dt
            fr.write(f"{t:.6f} rgb/{i:04d}.png\n")
            fd.write(f"{t + depth_offset:.6f} depth/{i:04d}.png\n")
            img = np.full((16, 20, 3), 10 * i, np.uint8)
            cv2.imwrite(os.path.join(root, f"rgb/{i:04d}.png"), img)
            d = (np.full((16, 20), 1500 + i, np.uint16))
            cv2.imwrite(os.path.join(root, f"depth/{i:04d}.png"), d)
    if with_gt:
        with open(os.path.join(root, "groundtruth.txt"), "w") as fp:
            for i in range(n):
                t = 100.0 + i * dt
                fp.write(f"{t:.6f} {0.1 * i} 0 0 0 0 0 1\n")


def test_tum_association_and_first_pose_normalization(tmp_path):
    from goslam_tpu.data.datasets import TUM_RGBD

    root = str(tmp_path / "tum")
    _write_tum(root, n=6)
    cfg = _cam(H=16, W=20, H_out=16, W_out=20, H_edge=0, W_edge=0)
    cfg["data"]["input_folder"] = root
    ds = TUM_RGBD(cfg)
    assert len(ds) == 6
    # depth associated within max_dt despite the 4 ms offset
    assert all(p is not None for p in ds.depth_paths)
    # first pose normalized to identity; translation increments kept
    np.testing.assert_allclose(ds.poses[0], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(ds.poses[3][0, 3], 0.3, atol=1e-6)
    idx, color, depth, intr, pose = ds[2]
    assert depth.shape == (16, 20)
    np.testing.assert_allclose(depth, (1500 + 2) / 1000.0, atol=1e-6)


def test_eth3d_poseless_test_split(tmp_path):
    """ETH3D test split has no groundtruth.txt: poses must be None and
    timestamps preserved for the submission file (datasets.py ETH3D)."""
    from goslam_tpu.data.datasets import ETH3D

    root = str(tmp_path / "eth3d")
    _write_tum(root, n=5, with_gt=False)
    cfg = _cam(H=16, W=20, H_out=16, W_out=20, H_edge=0, W_edge=0)
    cfg["data"]["input_folder"] = root
    ds = ETH3D(cfg)
    assert len(ds) == 5
    assert ds.poses is None
    np.testing.assert_allclose(ds.timestamps,
                               100.0 + 0.05 * np.arange(5), atol=1e-6)
    idx, color, depth, intr, pose = ds[0]
    assert pose is None


def test_scannet_numeric_frame_order(tmp_path):
    """ScanNet frames sort numerically (2 < 10), not lexically."""
    from goslam_tpu.data.datasets import ScanNet

    root = str(tmp_path / "scan")
    for sub in ("color", "depth", "pose"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    ids = [0, 2, 10, 1]
    for i in ids:
        cv2.imwrite(os.path.join(root, f"color/{i}.jpg"),
                    np.full((16, 20, 3), i, np.uint8))
        cv2.imwrite(os.path.join(root, f"depth/{i}.png"),
                    np.full((16, 20), 1000, np.uint16))
        np.savetxt(os.path.join(root, f"pose/{i}.txt"),
                   np.eye(4) + 0.001 * i)
    cfg = _cam(H=16, W=20, H_out=16, W_out=20, H_edge=0, W_edge=0)
    cfg["data"]["input_folder"] = root
    ds = ScanNet(cfg)
    names = [os.path.basename(p) for p in ds.color_paths]
    assert names == ["0.jpg", "1.jpg", "2.jpg", "10.jpg"]


def test_config_inherit_chain(tmp_path):
    base = tmp_path / "base.yaml"
    mid = tmp_path / "mid.yaml"
    leaf = tmp_path / "leaf.yaml"
    base.write_text("tracking:\n  buffer: 99\n  warmup: 5\n")
    mid.write_text(f"inherit_from: {base}\ntracking:\n  warmup: 7\n")
    leaf.write_text(f"inherit_from: {mid}\nmode: rgbd\n")
    cfg = load_config(str(leaf))
    assert cfg["tracking"]["buffer"] == 99      # from base
    assert cfg["tracking"]["warmup"] == 7       # mid overrides base
    assert cfg["mode"] == "rgbd"                # leaf
    # code defaults still merged underneath
    assert "frontend" in cfg["tracking"]


def test_dataset_registry():
    from goslam_tpu.data import get_dataset
    from goslam_tpu.data.synthetic import Synthetic

    cfg = default_config()
    update_recursive(cfg, {"dataset": "synthetic",
                           "data": {"input_folder": "", "n_frames": 3}})
    ds = get_dataset(cfg)
    assert isinstance(ds, Synthetic)
    with pytest.raises(KeyError):
        cfg["dataset"] = "not_a_dataset"
        get_dataset(cfg)
