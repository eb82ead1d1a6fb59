"""Faithful Cellpose CPnet architecture in Flax + torch->flax weight port.

The reference runs pretrained torch Cellpose as a black box
(``segment/dispatch.py:172-248``). The flagship ``models/unet.py`` is this
framework's own TPU-first design; THIS module exists so real pretrained
Cellpose checkpoints (cyto/cyto2/cyto3/nuclei) can run on TPU with
mask-level parity: it mirrors the torch ``CPnet`` graph exactly —
residual double-conv blocks of (BatchNorm eps=1e-5 -> ReLU -> Conv 3x3),
maxpool downsampling, full-image avg-pool style vector (L2-normalized),
style injected through per-block Dense layers on the upsample path,
nearest-neighbor upsampling, and a (BN -> ReLU -> Conv 1x1) output head.

``convert_torch_state_dict`` maps a torch ``state_dict`` (the on-disk
format of every published Cellpose checkpoint) onto this module's
parameter pytree. BatchNorm runs in inference mode (running stats become
parameters), which is exact for pretrained-weight serving.

Layout is NHWC / MXU-friendly; everything is static-shape and jit/pjit
compatible. Compute dtype is configurable: float32 for bit-parity checks,
bfloat16 for production throughput.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class TorchBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d (running stats as parameters)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


class BatchConv(nn.Module):
    """BN -> ReLU -> Conv(sz), torch ``batchconv``."""

    in_features: int
    out_features: int
    sz: int
    relu: bool = True  # False mirrors torch ``batchconv0``
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = TorchBatchNorm(self.in_features, name="bn")(x)
        if self.relu:
            h = nn.relu(h)
        return nn.Conv(
            self.out_features, (self.sz, self.sz), padding="SAME",
            dtype=self.dtype, name="conv",
        )(h)


class ResDown(nn.Module):
    """torch ``resdown``: proj + two residual double-convs."""

    in_features: int
    out_features: int
    sz: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        proj = BatchConv(self.in_features, self.out_features, 1, relu=False,
                         dtype=self.dtype, name="proj")(x)
        h = BatchConv(self.in_features, self.out_features, self.sz,
                      dtype=self.dtype, name="conv_0")(x)
        h = BatchConv(self.out_features, self.out_features, self.sz,
                      dtype=self.dtype, name="conv_1")(h)
        x = proj + h
        h = BatchConv(self.out_features, self.out_features, self.sz,
                      dtype=self.dtype, name="conv_2")(x)
        h = BatchConv(self.out_features, self.out_features, self.sz,
                      dtype=self.dtype, name="conv_3")(h)
        return x + h


class BatchConvStyle(nn.Module):
    """torch ``batchconvstyle``: x (+y) + Dense(style) -> batchconv."""

    in_features: int
    out_features: int
    style_features: int
    sz: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, style, x, y=None):
        if y is not None:
            x = x + y
        feat = nn.Dense(self.in_features, dtype=self.dtype, name="full")(style)
        x = x + feat[:, None, None, :].astype(x.dtype)
        return BatchConv(self.in_features, self.out_features, self.sz,
                         dtype=self.dtype, name="conv")(x)


class ResUp(nn.Module):
    """torch ``resup``: skip-add + style-conditioned residual double-convs."""

    in_features: int
    out_features: int
    style_features: int
    sz: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, style):
        proj = BatchConv(self.in_features, self.out_features, 1, relu=False,
                         dtype=self.dtype, name="proj")(x)
        h = BatchConv(self.in_features, self.out_features, self.sz,
                      dtype=self.dtype, name="conv_0")(x)
        h = BatchConvStyle(self.out_features, self.out_features,
                           self.style_features, self.sz, dtype=self.dtype,
                           name="conv_1")(style, h, y=y)
        x = proj + h
        h = BatchConvStyle(self.out_features, self.out_features,
                           self.style_features, self.sz, dtype=self.dtype,
                           name="conv_2")(style, x)
        h = BatchConvStyle(self.out_features, self.out_features,
                           self.style_features, self.sz, dtype=self.dtype,
                           name="conv_3")(style, h)
        return x + h


class CPnetFlax(nn.Module):
    """The full CPnet graph. ``nbase`` includes the input channel count,
    e.g. cyto: (2, 32, 64, 128, 256); ``nout=3`` (flow_y, flow_x, logit)."""

    nbase: Sequence[int] = (2, 32, 64, 128, 256)
    nout: int = 3
    sz: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, style_only: bool = False):
        """(B, H, W, nbase[0]) -> ((B, H, W, nout), (B, nbase[-1]) style)."""
        x = x.astype(self.dtype)
        nbase = list(self.nbase)
        # -- downsample: resdown at each level, maxpool between levels
        xd = []
        h = x
        for n in range(len(nbase) - 1):
            if n > 0:
                h = nn.max_pool(xd[n - 1], (2, 2), strides=(2, 2))
            h = ResDown(nbase[n], nbase[n + 1], self.sz, dtype=self.dtype,
                        name=f"down_{n}")(h)
            xd.append(h)
        # -- style: full-image average pool, L2-normalized
        style = jnp.mean(xd[-1].astype(jnp.float32), axis=(1, 2))
        style = style / jnp.maximum(
            jnp.sqrt(jnp.sum(style**2, axis=1, keepdims=True)), 1e-12
        )
        if style_only:
            return style
        style_c = style.astype(self.dtype)
        # -- upsample: nbaseup = nbase[1:] + [nbase[-1]]
        nbaseup = nbase[1:] + [nbase[-1]]
        n_up = len(nbaseup) - 1
        # deepest block consumes the bottleneck twice (torch upsample.forward)
        h = ResUp(nbaseup[n_up], nbaseup[n_up - 1], nbase[-1], self.sz,
                  dtype=self.dtype, name=f"up_{n_up - 1}")(
            xd[-1], xd[-1], style_c
        )
        for n in range(n_up - 2, -1, -1):
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
            h = ResUp(nbaseup[n + 1], nbaseup[n], nbase[-1], self.sz,
                      dtype=self.dtype, name=f"up_{n}")(h, xd[n], style_c)
        out = BatchConv(nbaseup[0], self.nout, 1, dtype=jnp.float32,
                        name="output")(h.astype(jnp.float32))
        return out.astype(jnp.float32), style


# ---------------------------------------------------------------------------
# torch state_dict -> flax params
# ---------------------------------------------------------------------------


def _conv_w(t: np.ndarray) -> np.ndarray:
    """torch (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def _bn(prefix: str, sd: dict) -> dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }


def _batchconv(prefix: str, sd: dict, relu: bool = True) -> dict:
    # torch batchconv is Sequential: [0]=BN, [1]=ReLU, [2]=Conv
    # torch batchconv0 is Sequential: [0]=BN, [1]=Conv
    conv_idx = 2 if relu else 1
    return {
        "bn": _bn(f"{prefix}.0", sd),
        "conv": {
            "kernel": _conv_w(sd[f"{prefix}.{conv_idx}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.{conv_idx}.bias"], np.float32),
        },
    }


def _batchconvstyle(prefix: str, sd: dict) -> dict:
    return {
        "conv": _batchconv(f"{prefix}.conv", sd),
        "full": {
            "kernel": np.transpose(
                np.asarray(sd[f"{prefix}.full.weight"], np.float32)
            ),
            "bias": np.asarray(sd[f"{prefix}.full.bias"], np.float32),
        },
    }


def convert_torch_state_dict(sd: dict, nbase: Sequence[int] = (2, 32, 64, 128, 256)) -> dict:
    """Cellpose CPnet ``state_dict`` -> ``CPnetFlax`` params pytree.

    Accepts tensors or ndarrays as values (call ``.numpy()`` upstream or let
    ``np.asarray`` handle it). Key layout is the published checkpoints':
    ``downsample.down.res_down_{n}...``, ``upsample.up.res_up_{n}...``,
    ``output.*``.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    params: dict = {}
    n_levels = len(nbase) - 1
    for n in range(n_levels):
        p = f"downsample.down.res_down_{n}"
        params[f"down_{n}"] = {
            "proj": _batchconv(f"{p}.proj", sd, relu=False),
            "conv_0": _batchconv(f"{p}.conv.conv_0", sd),
            "conv_1": _batchconv(f"{p}.conv.conv_1", sd),
            "conv_2": _batchconv(f"{p}.conv.conv_2", sd),
            "conv_3": _batchconv(f"{p}.conv.conv_3", sd),
        }
    for n in range(n_levels):
        p = f"upsample.up.res_up_{n}"
        params[f"up_{n}"] = {
            "proj": _batchconv(f"{p}.proj", sd, relu=False),
            "conv_0": _batchconv(f"{p}.conv.conv_0", sd),
            "conv_1": _batchconvstyle(f"{p}.conv.conv_1", sd),
            "conv_2": _batchconvstyle(f"{p}.conv.conv_2", sd),
            "conv_3": _batchconvstyle(f"{p}.conv.conv_3", sd),
        }
    params["output"] = _batchconv("output", sd)
    return {"params": params}


def load_cellpose_checkpoint(path, nbase=(2, 32, 64, 128, 256), nout: int = 3):
    """Load a torch Cellpose checkpoint file -> (CPnetFlax, params).

    Published checkpoints are raw ``state_dict`` pickles (``cytotorch_0``
    etc. under ``~/.cellpose/models``); newer ones may nest under
    ``"state_dict"`` or ``"model_state_dict"``.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model_state_dict"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    sd = {k: v for k, v in sd.items() if not k.startswith(("mkldnn", "diam"))}
    model = CPnetFlax(nbase=tuple(nbase), nout=nout)
    return model, convert_torch_state_dict(sd, nbase)
