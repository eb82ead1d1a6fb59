"""Cellpose-class segmentation U-Net, TPU-first.

The reference calls the PyTorch/CUDA ``CellposeModel`` as a black box
(``segment/dispatch.py:172-248``). Here the model is in-process Flax:

- NHWC layout, bfloat16 compute / float32 params (MXU-native);
- residual double-conv blocks with GroupNorm (stateless — no BN batch
  statistics to shard) and SiLU;
- a global style vector from the bottleneck (cellpose's signature trick)
  FiLM-added into every decoder stage;
- 3-channel head: flow_y, flow_x, cell logit.

Default widths follow cellpose (32-64-128-256). Everything is static-shape
and jit/vmap/pjit-friendly; spatial partitioning of H/W under GSPMD works
because all ops are convs/elementwise.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(8, x.shape[-1]), dtype=jnp.float32)(x)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, padding="SAME")(h)
        h = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype, padding="SAME")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="proj")(x)
        return x + h


class CellposeNet(nn.Module):
    """U-Net with a global style vector; flagship model of the framework."""

    base_features: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, style_only: bool = False) -> jnp.ndarray:
        """(B, H, W, C_in) float32 -> (B, H, W, 3) float32 predictions.

        ``style_only=True`` returns just the (B, bottleneck) style vector —
        the encoder doubles as the in-process deep embedder
        (``models/embedder.py``), replacing the reference's remote
        nahual_embed zoo for on-slice featurization.
        """
        x = x.astype(self.dtype)
        feats = self.base_features
        skips = []
        h = nn.Conv(feats[0], (3, 3), dtype=self.dtype, name="stem")(x)
        for i, f in enumerate(feats):
            h = ConvBlock(f, self.dtype, name=f"down{i}a")(h)
            h = ConvBlock(f, self.dtype, name=f"down{i}b")(h)
            skips.append(h)
            if i < len(feats) - 1:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))

        # Global style vector: mean-pooled bottleneck, L2-normalized
        # (cellpose's make_style), broadcast into each decoder stage.
        style = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
        style = style / jnp.maximum(
            jnp.linalg.norm(style, axis=-1, keepdims=True), 1e-6
        )
        if style_only:
            return style

        for i in reversed(range(len(feats) - 1)):
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
            h = nn.Conv(feats[i], (3, 3), dtype=self.dtype, name=f"up{i}_reduce")(h)
            s = nn.Dense(feats[i], dtype=self.dtype, name=f"style{i}")(style)
            h = h + skips[i] + s[:, None, None, :].astype(self.dtype)
            h = ConvBlock(feats[i], self.dtype, name=f"up{i}a")(h)
            h = ConvBlock(feats[i], self.dtype, name=f"up{i}b")(h)

        out = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32, name="head")(h)
        return out.astype(jnp.float32)


def init_params(rng, in_channels: int = 2, size: int = 64, **model_kwargs):
    model = CellposeNet(**model_kwargs)
    params = model.init(rng, jnp.zeros((1, size, size, in_channels), jnp.float32))
    return model, params
