"""Golden parity tests: flax DroidNet vs the reference torch modules.

We instantiate the *reference's own torch modules* (CPU) with random
weights, convert with models/convert.py, and require matching activations.
This is the strongest possible oracle for weight-compat with droid.pth.
"""
import sys
import types

import numpy as np
import pytest

# the reference package imports droid_backends (CUDA ext) at package level;
# stub it — we only use the pure-torch modules.
sys.modules.setdefault("droid_backends", types.ModuleType("droid_backends"))
sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from goslam_tpu.models import convert, droidnet  # noqa: E402


def torch_sd_to_numpy(mod, prefix=""):
    return {prefix + k: v.detach().numpy() for k, v in mod.state_dict().items()}


@pytest.fixture(scope="module")
def torch_mods():
    from src.modules.extractor import BasicEncoder as TBasicEncoder
    torch.manual_seed(7)
    fnet = TBasicEncoder(out_dim=128, norm_fn="instance").eval()
    cnet = TBasicEncoder(out_dim=256, norm_fn="none").eval()
    return fnet, cnet


def test_encoder_parity(torch_mods):
    fnet_t, cnet_t = torch_mods
    H, W = 48, 64
    x = np.random.default_rng(0).normal(size=(1, 1, 3, H, W)).astype(np.float32)

    with torch.no_grad():
        out_t = fnet_t(torch.from_numpy(x)).numpy()[0, 0]     # [128, H/8, W/8]

    sd = {}
    sd.update(torch_sd_to_numpy(fnet_t, "fnet."))
    sd.update(torch_sd_to_numpy(cnet_t, "cnet."))
    # fake update params so the converter has a complete dict
    _add_fake_update(sd)
    params = convert.convert_state_dict(sd)

    enc = droidnet.BasicEncoder(128, "instance")
    x_nhwc = jnp.asarray(x[0].transpose(0, 2, 3, 1))          # [1, H, W, 3]
    out_j = enc.apply({"params": params["params"]["fnet"]}, x_nhwc)
    out_j = np.asarray(out_j[0]).transpose(2, 0, 1)

    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=5e-4)


def test_cnet_parity(torch_mods):
    fnet_t, cnet_t = torch_mods
    H, W = 48, 64
    x = np.random.default_rng(1).normal(size=(1, 1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out_t = cnet_t(torch.from_numpy(x)).numpy()[0, 0]

    sd = {}
    sd.update(torch_sd_to_numpy(fnet_t, "fnet."))
    sd.update(torch_sd_to_numpy(cnet_t, "cnet."))
    _add_fake_update(sd)
    params = convert.convert_state_dict(sd)

    enc = droidnet.BasicEncoder(256, "none")
    x_nhwc = jnp.asarray(x[0].transpose(0, 2, 3, 1))
    out_j = enc.apply({"params": params["params"]["cnet"]}, x_nhwc)
    out_j = np.asarray(out_j[0]).transpose(2, 0, 1)
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=5e-4)


def _add_fake_update(sd, seed=3):
    """Random torch-layout update-module params (heads with 3 output
    channels, as in the released droid.pth, to exercise truncation)."""
    r = np.random.default_rng(seed)

    def conv(cin, cout, k):
        return (r.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05,
                r.normal(size=(cout,)).astype(np.float32) * 0.05)

    spec = {
        "corr_encoder.0": (196, 128, 1), "corr_encoder.2": (128, 128, 3),
        "flow_encoder.0": (4, 128, 7), "flow_encoder.2": (128, 64, 3),
        "weight.0": (128, 128, 3), "weight.2": (128, 3, 3),
        "delta.0": (128, 128, 3), "delta.2": (128, 3, 3),
        "gru.convz": (448, 128, 3), "gru.convr": (448, 128, 3),
        "gru.convq": (448, 128, 3), "gru.w": (128, 128, 1),
        "gru.convz_glo": (128, 128, 1), "gru.convr_glo": (128, 128, 1),
        "gru.convq_glo": (128, 128, 1),
        "agg.conv1": (128, 128, 3), "agg.conv2": (128, 128, 3),
        "agg.eta.0": (128, 1, 3), "agg.upmask.0": (128, 8 * 8 * 9, 1),
    }
    for name, (cin, cout, k) in spec.items():
        w, b = conv(cin, cout, k)
        sd[f"update.{name}.weight"] = w
        sd[f"update.{name}.bias"] = b


def _torch_update_module():
    """Reference UpdateModule rebuilt from its own submodules, bypassing the
    torch_scatter import (we test the non-agg path)."""
    import torch.nn as tnn
    from src.modules.gru import ConvGRU as TConvGRU
    from src.modules.clipping import GradientClip as TGradClip

    class TUpdate(tnn.Module):
        def __init__(self):
            super().__init__()
            cor_planes = 4 * 49
            self.corr_encoder = tnn.Sequential(
                tnn.Conv2d(cor_planes, 128, 1), tnn.ReLU(inplace=True),
                tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(inplace=True))
            self.flow_encoder = tnn.Sequential(
                tnn.Conv2d(4, 128, 7, padding=3), tnn.ReLU(inplace=True),
                tnn.Conv2d(128, 64, 3, padding=1), tnn.ReLU(inplace=True))
            self.weight = tnn.Sequential(
                tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(inplace=True),
                tnn.Conv2d(128, 2, 3, padding=1), TGradClip(), tnn.Sigmoid())
            self.delta = tnn.Sequential(
                tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(inplace=True),
                tnn.Conv2d(128, 2, 3, padding=1), TGradClip())
            self.gru = TConvGRU(128, 128 + 128 + 64)

        def forward(self, net, inp, corr, flow):
            corr = self.corr_encoder(corr)
            flow = self.flow_encoder(flow)
            net = self.gru(net, inp, corr, flow)
            return net, self.delta(net), self.weight(net)

    return TUpdate()


def test_update_module_parity():
    tup = _torch_update_module().eval()
    sd = torch_sd_to_numpy(tup, "update.")
    # pad head channels back to 3 is unnecessary: converter truncates only
    # if >2; our torch module already has 2-channel heads.
    _add_fake_encoder(sd)
    params = convert.convert_state_dict(sd)

    r = np.random.default_rng(5)
    E, H, W = 2, 8, 12
    net = r.normal(size=(E, 128, H, W)).astype(np.float32) * 0.3
    inp = r.normal(size=(E, 128, H, W)).astype(np.float32) * 0.3
    corr = r.normal(size=(E, 196, H, W)).astype(np.float32) * 0.3
    flow = r.normal(size=(E, 4, H, W)).astype(np.float32) * 0.3

    with torch.no_grad():
        net_t, delta_t, weight_t = tup(
            torch.from_numpy(net), torch.from_numpy(inp),
            torch.from_numpy(corr), torch.from_numpy(flow))

    mod = droidnet.UpdateModule(num_frames=0)
    to_nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    net_j, delta_j, weight_j = mod.apply(
        {"params": params["params"]["update"]},
        to_nhwc(net), to_nhwc(inp), to_nhwc(corr), to_nhwc(flow))

    np.testing.assert_allclose(
        np.asarray(net_j).transpose(0, 3, 1, 2), net_t.numpy(),
        rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(delta_j).transpose(0, 3, 1, 2), delta_t.numpy(),
        rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(weight_j).transpose(0, 3, 1, 2), weight_t.numpy(),
        rtol=2e-4, atol=1e-4)


def _add_fake_encoder(sd, seed=11):
    r = np.random.default_rng(seed)

    def add(prefix, cin, cout, k):
        sd[prefix + ".weight"] = r.normal(
            size=(cout, cin, k, k)).astype(np.float32) * 0.05
        sd[prefix + ".bias"] = r.normal(size=(cout,)).astype(np.float32) * 0.05

    for enc, out in (("fnet", 128), ("cnet", 256)):
        add(f"{enc}.conv1", 3, 32, 7)
        add(f"{enc}.conv2", 128, out, 1)
        for stage, (cin, cout) in enumerate(
                [(32, 32), (32, 64), (64, 128)], start=1):
            add(f"{enc}.layer{stage}.0.conv1", cin, cout, 3)
            add(f"{enc}.layer{stage}.0.conv2", cout, cout, 3)
            if stage > 1:
                add(f"{enc}.layer{stage}.0.downsample.0", cin, cout, 1)
            add(f"{enc}.layer{stage}.1.conv1", cout, cout, 3)
            add(f"{enc}.layer{stage}.1.conv2", cout, cout, 3)


def test_cvx_upsample_parity():
    """cvx_upsample vs the reference torch implementation."""
    import torch.nn.functional as F

    def torch_cvx(data, mask):
        batch, ht, wd, dim = data.shape
        data = data.permute(0, 3, 1, 2).contiguous()
        mask = mask.view(batch, 1, 9, 8, 8, ht, wd)
        mask = torch.softmax(mask, dim=2)
        up = F.unfold(data, kernel_size=(3, 3), padding=(1, 1))
        up = up.view(batch, dim, 9, 1, 1, ht, wd)
        up = torch.sum(mask * up, dim=2)
        up = up.permute(0, 4, 2, 5, 3, 1).contiguous()
        return up.reshape(batch, 8 * ht, 8 * wd, dim)

    r = np.random.default_rng(9)
    B, ht, wd, C = 1, 4, 6, 2
    data = r.normal(size=(B, ht, wd, C)).astype(np.float32)
    # torch layout: [B, 8*8*9, ht, wd] with channel = k*64 + sy*8 + sx
    mask_t = r.normal(size=(B, 576, ht, wd)).astype(np.float32)

    out_t = torch_cvx(torch.from_numpy(data), torch.from_numpy(mask_t)).numpy()

    mask_j = jnp.asarray(mask_t.transpose(0, 2, 3, 1))        # [B,ht,wd,576]
    out_j = droidnet.cvx_upsample(jnp.asarray(data), mask_j)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-4, atol=1e-5)
