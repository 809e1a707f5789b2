"""Convert a torch DROID checkpoint (droid.pth) to goslam_tpu flax params.

The reference loads ``pretrained/droid.pth`` and truncates the delta/weight
head output channels to 2 (slam.py:196-208); we replicate both steps.  The
checkpoint itself is not shipped in the reference snapshot
(.MISSING_LARGE_BLOBS) — this converter accepts any state dict with the
DROID-SLAM layout, e.g. from the upstream DROID-SLAM release.

Input: a mapping name -> numpy array (use ``load_torch_checkpoint`` if torch
is available).  Output: a flax params pytree for models.droidnet.DroidNet.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

# torch module path -> flax module path
_ENC_LAYERS = {
    "conv1": "conv1",
    "conv2": "conv2",
    "layer1.0": "layer1_0", "layer1.1": "layer1_1",
    "layer2.0": "layer2_0", "layer2.1": "layer2_1",
    "layer3.0": "layer3_0", "layer3.1": "layer3_1",
}

_UPDATE_CONVS = {
    "corr_encoder.0": "corr_enc1",
    "corr_encoder.2": "corr_enc2",
    "flow_encoder.0": "flow_enc1",
    "flow_encoder.2": "flow_enc2",
    "weight.0": "weight1",
    "weight.2": "weight2",
    "delta.0": "delta1",
    "delta.2": "delta2",
    "gru.convz": "gru.convz", "gru.convr": "gru.convr",
    "gru.convq": "gru.convq", "gru.w": "gru.w",
    "gru.convz_glo": "gru.convz_glo", "gru.convr_glo": "gru.convr_glo",
    "gru.convq_glo": "gru.convq_glo",
    "agg.conv1": "agg.conv1", "agg.conv2": "agg.conv2",
    "agg.eta.0": "agg.eta", "agg.upmask.0": "agg.upmask",
}


def _set(tree: Dict, path: str, leaf_name: str, value: np.ndarray):
    node = tree
    for part in path.split("."):
        node = node.setdefault(part, {})
    node[leaf_name] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_state_dict(sd: Mapping[str, np.ndarray]) -> Dict:
    """torch state dict (numpy values) -> flax params for DroidNet."""
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}

    # reference head truncation (slam.py:203-206)
    for head in ("update.weight.2", "update.delta.2"):
        if head + ".weight" in sd and sd[head + ".weight"].shape[0] > 2:
            sd[head + ".weight"] = sd[head + ".weight"][:2]
            sd[head + ".bias"] = sd[head + ".bias"][:2]

    params: Dict = {}

    for enc in ("fnet", "cnet"):
        for tname, fname in _ENC_LAYERS.items():
            if "." in tname:  # residual block
                for sub in ("conv1", "conv2"):
                    key = f"{enc}.{tname}.{sub}"
                    _set(params, f"{enc}.{fname}.{sub}", "kernel",
                         _conv_kernel(sd[key + ".weight"]))
                    _set(params, f"{enc}.{fname}.{sub}", "bias",
                         sd[key + ".bias"])
                dkey = f"{enc}.{tname}.downsample.0"
                if dkey + ".weight" in sd:
                    _set(params, f"{enc}.{fname}.downsample", "kernel",
                         _conv_kernel(sd[dkey + ".weight"]))
                    _set(params, f"{enc}.{fname}.downsample", "bias",
                         sd[dkey + ".bias"])
            else:
                key = f"{enc}.{tname}"
                _set(params, f"{enc}.{fname}", "kernel",
                     _conv_kernel(sd[key + ".weight"]))
                _set(params, f"{enc}.{fname}", "bias", sd[key + ".bias"])

    for tname, fname in _UPDATE_CONVS.items():
        key = f"update.{tname}"
        if key + ".weight" not in sd:
            continue  # tolerate partial checkpoints (e.g. agg-less variants)
        _set(params, f"update.{fname}", "kernel",
             _conv_kernel(sd[key + ".weight"]))
        _set(params, f"update.{fname}", "bias", sd[key + ".bias"])

    return {"params": _nest(params)}


def _nest(tree):
    """dotted-path dict -> nested dict (already nested by _set; identity)."""
    return tree


def load_torch_checkpoint(path: str) -> Dict:
    """Load droid.pth with torch (CPU) and convert."""
    import torch  # local import: torch only needed for conversion

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict({k: v.numpy() for k, v in sd.items()})
