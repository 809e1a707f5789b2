"""DroidNet — feature/context encoders and the recurrent update operator.

Flax re-implementation of the reference model family
(/root/reference/src/droid_net.py, src/modules/{extractor,gru,clipping}.py)
in NHWC layout (TPU-native; XLA maps convs onto the MXU directly).

Weight-compatibility: the module tree and parameter shapes are chosen so a
torch ``droid.pth`` checkpoint converts 1:1 (see models/convert.py), incl.
the reference's truncation of the delta/weight heads to 2 channels
(slam.py:196-208).  Convs use explicit torch-style padding so activations
match the CUDA build bit-for-bit at borders.

Parity notes vs the reference:
  * fnet = BasicEncoder(128, instance-norm), cnet = BasicEncoder(256, none)
    (droid_net.py:146-147); both run in bf16 on TPU (the reference uses AMP
    fp16 — motion_filter.py:26).
  * ConvGRU has extra global-context gates: a sigmoid-gated spatial mean of
    the hidden state injected through 1x1 convs into z/r/q (gru.py:25-30).
  * GraphAgg aggregates hidden states over edges sharing a source frame and
    predicts per-frame damping eta (0.01 * softplus) and the 8x8x9 convex
    upsampling mask (droid_net.py:34-67).  Our version uses a static-shape
    segment mean over a fixed frame capacity instead of torch_scatter.
  * GradientClip zeroes gradients with |g| > 0.01 or NaN in the backward
    pass only (clipping.py) — implemented as a custom_vjp identity.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


@jax.custom_vjp
def grad_clip(x):
    """Identity forward; backward zeroes entries with |g| > 0.01 or NaN."""
    return x


def _grad_clip_fwd(x):
    return x, None


def _grad_clip_bwd(_, g):
    ok = jnp.isfinite(g) & (jnp.abs(g) <= 0.01)
    return (jnp.where(ok, g, 0.0),)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


def instance_norm(x, eps: float = 1e-5):
    """Per-sample, per-channel normalization over H,W (NHWC), no affine —
    matches torch nn.InstanceNorm2d defaults (affine=False).  Statistics
    always accumulate in fp32 (torch AMP autocasts norms to fp32 too);
    the result is cast back to the input dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
    var = jnp.var(x32, axis=(-3, -2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _conv(features, kernel, stride=1, pad=0, name=None, dtype=None):
    """dtype selects the COMPUTE dtype (flax casts inputs and the fp32
    params to it): dtype=jnp.bfloat16 keeps the conv on the MXU's native
    bf16 path — the runtime's choice, mirroring the reference's fp16 AMP
    (motion_filter.py:26) — while dtype=None promotes to fp32 (the
    golden-parity tests' choice)."""
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), name=name, dtype=dtype)


class ResidualBlock(nn.Module):
    """Two 3x3 convs + skip; optional strided downsample (extractor.py:4-55)."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        def norm(h):
            if self.norm_fn == "instance":
                return instance_norm(h)
            return h  # 'none'

        dt = self.dtype
        y = nn.relu(norm(_conv(self.planes, 3, self.stride, 1, "conv1",
                               dt)(x)))
        y = nn.relu(norm(_conv(self.planes, 3, 1, 1, "conv2", dt)(y)))
        if self.stride > 1:
            x = norm(_conv(self.planes, 1, self.stride, 0, "downsample",
                           dt)(x))
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """1/8-resolution encoder: 7x7 s2 stem + 3 residual stages (32/64/128)
    + 1x1 head (extractor.py:61-126)."""
    out_dim: int
    norm_fn: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: [..., H, W, 3] -> [..., H/8, W/8, out_dim]."""
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])

        def norm(h):
            return instance_norm(h) if self.norm_fn == "instance" else h

        dt = self.dtype
        x = nn.relu(norm(_conv(32, 7, 2, 3, "conv1", dt)(x)))
        x = ResidualBlock(32, self.norm_fn, 1, dt, name="layer1_0")(x)
        x = ResidualBlock(32, self.norm_fn, 1, dt, name="layer1_1")(x)
        x = ResidualBlock(64, self.norm_fn, 2, dt, name="layer2_0")(x)
        x = ResidualBlock(64, self.norm_fn, 1, dt, name="layer2_1")(x)
        x = ResidualBlock(128, self.norm_fn, 2, dt, name="layer3_0")(x)
        x = ResidualBlock(128, self.norm_fn, 1, dt, name="layer3_1")(x)
        x = _conv(self.out_dim, 1, 1, 0, "conv2", dt)(x)
        return x.reshape(lead + x.shape[-3:])


class ConvGRU(nn.Module):
    """3x3 conv GRU with global-context gates (gru.py:5-33)."""
    hidden: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, net, inp):
        """net: [B,H,W,128] hidden; inp: [B,H,W,Ci] stacked inputs."""
        dt = self.dtype
        net_inp = jnp.concatenate([net, inp], axis=-1)

        glo = jax.nn.sigmoid(_conv(self.hidden, 1, 1, 0, "w", dt)(net)) * net
        # global-context mean in fp32 (1200-term reduction)
        glo = jnp.mean(glo.astype(jnp.float32), axis=(-3, -2),
                       keepdims=True).astype(glo.dtype)

        z = jax.nn.sigmoid(_conv(self.hidden, 3, 1, 1, "convz", dt)(net_inp)
                           + _conv(self.hidden, 1, 1, 0, "convz_glo",
                                   dt)(glo))
        r = jax.nn.sigmoid(_conv(self.hidden, 3, 1, 1, "convr", dt)(net_inp)
                           + _conv(self.hidden, 1, 1, 0, "convr_glo",
                                   dt)(glo))
        q = jnp.tanh(
            _conv(self.hidden, 3, 1, 1, "convq", dt)(
                jnp.concatenate([r * net, inp], axis=-1))
            + _conv(self.hidden, 1, 1, 0, "convq_glo", dt)(glo))
        return (1 - z) * net + z * q


class GraphAgg(nn.Module):
    """Frame-wise aggregation of edge hidden states -> damping + upmask
    (droid_net.py:34-67).

    Static-shape replacement for torch_scatter: edges are segment-averaged
    onto a fixed frame capacity `num_frames`; frames without edges produce
    outputs the caller masks out.

    Split into an edge-side half (`edge_features`: the pre-aggregation
    conv) and a frame-side half (`frame_head`: the convs over the [P,...]
    segment mean) so the edge-chunked lowmem path can accumulate segment
    sums across chunks and run the frame-side convs ONCE per step instead
    of once per chunk — which is also exactly the reference's semantics
    (its keyframe-chunked GRU gives GraphAgg every edge of a frame in one
    call; a per-edge-chunk GraphAgg would see partial means).
    """
    num_frames: int
    dtype: Any = None

    def setup(self):
        # conv1 is the per-edge hot path and follows the compute dtype;
        # the frame-side head (conv2/eta/upmask) runs once per step and
        # stays in fp32 — eta is the BA damping and the [P,...] convs
        # are not worth bf16's nondeterminism there
        self.conv1 = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                             dtype=self.dtype)
        self.conv2 = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)))
        self.eta = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)))
        self.upmask = nn.Conv(8 * 8 * 9, (1, 1))

    def edge_features(self, net):
        """Edge-side half: [E,H,W,128] -> [E,H,W,128] (pre-aggregation)."""
        return nn.relu(self.conv1(net))

    def frame_head(self, agg, want_upmask=True):
        """Frame-side half over the segment mean [P,H,W,128].

        Returns (eta [P,H,W], upmask [P,H,W,8*8*9] or None)."""
        agg = nn.relu(self.conv2(agg.astype(jnp.float32)))
        eta = jax.nn.softplus(grad_clip(self.eta(agg)))
        upmask = self.upmask(agg) if want_upmask else None
        return 0.01 * eta[..., 0], upmask

    def __call__(self, net, ii, edge_valid):
        """net: [E,H,W,128]; ii: [E] source frames; edge_valid: [E] bool.

        Returns (eta [P,H,W], upmask [P,H,W,8*8*9], frame_has_edge [P]).
        """
        P = self.num_frames
        net = self.edge_features(net)

        w = edge_valid.astype(net.dtype)
        seg_sum = jax.ops.segment_sum(net * w[:, None, None, None], ii,
                                      num_segments=P)
        seg_cnt = jax.ops.segment_sum(w, ii, num_segments=P)
        has_edge = seg_cnt > 0
        agg = seg_sum / jnp.maximum(seg_cnt, 1.0)[:, None, None, None]

        eta, upmask = self.frame_head(agg)
        return eta, upmask, has_edge


class UpdateModule(nn.Module):
    """Recurrent flow/confidence update operator (droid_net.py:70-140).

    `dtype` is the compute dtype for every conv (params stay fp32):
    the runtime passes bf16 — MXU-native, and faithful to the
    reference's fp16 AMP (motion_filter.py:26) — while the default None
    promotes to fp32 for the golden-parity tests."""
    num_frames: int = 0   # GraphAgg capacity; 0 disables aggregation
    dtype: Any = None

    @nn.compact
    def __call__(self, net, inp, corr, flow=None, ii=None, edge_valid=None):
        """All NHWC, batched over edges E.

        net: [E,H,W,128] hidden; inp: [E,H,W,128] context;
        corr: [E,H,W,196]; flow: [E,H,W,4].
        Returns (net, delta [E,H,W,2], weight [E,H,W,2]) and, when ii is
        given, (eta [P,H,W], upmask [P,H,W,576], has_edge [P]).
        """
        dt = self.dtype
        if flow is None:
            flow = jnp.zeros(net.shape[:-1] + (4,), net.dtype)

        corr = nn.relu(_conv(128, 1, 1, 0, "corr_enc1", dt)(corr))
        corr = nn.relu(_conv(128, 3, 1, 1, "corr_enc2", dt)(corr))
        flow = nn.relu(_conv(128, 7, 1, 3, "flow_enc1", dt)(flow))
        flow = nn.relu(_conv(64, 3, 1, 1, "flow_enc2", dt)(flow))

        inp_cat = jnp.concatenate([inp, corr, flow], axis=-1)
        net = ConvGRU(128, dt, name="gru")(net, inp_cat)

        delta = nn.relu(_conv(128, 3, 1, 1, "delta1", dt)(net))
        delta = grad_clip(_conv(2, 3, 1, 1, "delta2", dt)(delta))
        weight = jax.nn.sigmoid(grad_clip(_conv(
            2, 3, 1, 1, "weight2", dt)(
                nn.relu(_conv(128, 3, 1, 1, "weight1", dt)(net)))))

        if ii is not None:
            eta, upmask, has_edge = GraphAgg(
                self.num_frames, dt, name="agg")(net, ii, edge_valid)
            return net, delta, weight, eta, upmask, has_edge
        return net, delta, weight


class DroidNet(nn.Module):
    """Container: fnet (matching features), cnet (context), update operator
    (droid_net.py:143-148)."""
    num_frames: int = 0
    dtype: Any = None

    def setup(self):
        self.fnet = BasicEncoder(128, "instance", self.dtype, name="fnet")
        self.cnet = BasicEncoder(256, "none", self.dtype, name="cnet")
        self.update = UpdateModule(self.num_frames, self.dtype,
                                   name="update")

    def __call__(self, images):
        """Convenience forward for initialization: images [B,H,W,3].
        Exercises every submodule (incl. GraphAgg) so init creates all
        params."""
        fmap = self.fnet(images)
        ctx = self.cnet(images)
        net, inp = jnp.split(ctx, 2, axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)
        E, h, w = net.shape[0], net.shape[1], net.shape[2]
        corr = jnp.zeros((E, h, w, 196), images.dtype)
        ii = jnp.zeros((E,), jnp.int32)
        valid = jnp.ones((E,), bool)
        return self.update(net, inp, corr, None, ii, valid)

    def encode_features(self, images):
        return self.fnet(images)

    def encode_context(self, images):
        ctx = self.cnet(images)
        net, inp = jnp.split(ctx, 2, axis=-1)
        return jnp.tanh(net), nn.relu(inp)


# ---------------------------------------------------------------------------
# convex upsampling (droid_net.py:9-31)
# ---------------------------------------------------------------------------

def cvx_upsample(data, mask):
    """8x convex-combination upsampling of 1/8-res fields.

    data: [B, ht, wd, C]; mask: [B, ht, wd, 8*8*9] (logits over the 3x3
    neighbourhood per output subpixel, layout [9, 8, 8] to match the torch
    view(batch,1,9,8,8,ht,wd)).
    Returns [B, 8*ht, 8*wd, C].
    """
    B, ht, wd, C = data.shape
    m = mask.reshape(B, ht, wd, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)

    # 3x3 neighbourhood gather (zero-padded, torch F.unfold semantics)
    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [pad[:, dy:dy + ht, dx:dx + wd] for dy in range(3) for dx in range(3)],
        axis=3)                                        # [B, ht, wd, 9, C]

    up = jnp.einsum("bhwkyx,bhwkc->bhwyxc", m, neigh)  # [B,ht,wd,8,8,C]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * ht, 8 * wd, C)


def upsample_disp(disp, mask):
    """disp: [B, ht, wd] -> [B, 8ht, 8wd] via cvx_upsample."""
    return cvx_upsample(disp[..., None], mask)[..., 0]
