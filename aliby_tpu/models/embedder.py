"""In-process deep embedders — the TPU-native replacement for nahual_embed.

The reference ships crop tiles to a remote embedder zoo over nng RPC
(``pipe_core.py:95-120``); on TPU the encoder is just a jitted forward.
The default embedder reuses the flagship U-Net's global style vector
(its bottleneck summary), optionally projected to ``dim`` with a fixed
random projection (deterministic per seed).

The closure contract matches the engine's nahual_embed path: it consumes
the CropTiler's ``(F, C, Z, ts, ts)`` pixel block and returns a raw
``(F, dim)`` ndarray — which ``get_profiles_from_state`` wraps into
``X_<c>`` columns.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def make_embedder(
    model: str = "style",
    dim: int | None = None,
    channels: list[int] | None = None,
    seed: int = 0,
    pretrained: str | bool = True,
    **kwargs,
):
    if model != "style":
        raise ValueError(f"Unknown embedder model {model!r} (in-process: 'style')")
    from aliby_tpu.models.segment import BUNDLED_WEIGHTS
    from aliby_tpu.models.unet import CellposeNet, init_params

    net, params = init_params(
        jax.random.PRNGKey(seed), in_channels=2, size=64,
        **kwargs.get("model_kwargs", {}),
    )
    # Style embeddings come from the *trained* flagship encoder by default
    # (an untrained net is a random projection, not a deep embedding).
    weights_path = BUNDLED_WEIGHTS if pretrained is True else pretrained
    if pretrained is True and kwargs.get("model_kwargs"):
        # custom architecture can't take the bundled flagship checkpoint
        weights_path = None
    if weights_path and Path(weights_path).exists():
        from aliby_tpu.models.training import load_params

        params = load_params(weights_path, params)
    elif pretrained is not True and pretrained:
        raise FileNotFoundError(f"Embedder weights not found: {pretrained}")

    bottleneck = net.base_features[-1]
    if dim is not None and dim != bottleneck:
        proj = jax.random.normal(
            jax.random.PRNGKey(seed + 1), (bottleneck, dim)
        ) / np.sqrt(bottleneck)
    else:
        proj = None

    @jax.jit
    def _style(params, x):
        """(F, H, W, 2) -> (F, dim) style vectors (encoder-only forward)."""
        style = net.apply(params, x, style_only=True)
        if proj is not None:
            style = style @ proj
        return style

    def embed(pixels, **_ignored) -> np.ndarray:
        pixels = np.asarray(pixels, np.float32)
        if pixels.ndim == 6:
            pixels = pixels[0]
        if channels is not None:
            pixels = pixels[:, channels]
        imgs = pixels.max(axis=2) if pixels.shape[2] > 1 else pixels[:, :, 0]
        # two-channel net input: first channel + mean of the rest
        main = imgs[:, 0]
        rest = imgs[:, 1:].mean(axis=1) if imgs.shape[1] > 1 else np.zeros_like(main)
        x = np.stack([main, rest], axis=-1)
        return np.asarray(_style(params, jnp.asarray(x)))

    return embed
