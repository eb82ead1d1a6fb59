"""Remote model-server clients (the nahual-equivalent surface).

The reference offloads GPU models over pynng RPC with a per-family
``(setup, process)`` contract (``SURVEY §5.8``). On TPU the models run
in-process, but the client surface is kept for off-slice serving parity.
The wire protocol lives in ``aliby_tpu.net.wire`` (length-prefixed
numpy-aware frames over unix/tcp sockets).
"""

from __future__ import annotations

import numpy as np


def _connect(address: str):
    from aliby_tpu.net.wire import Client

    return Client(address)


def make_remote_segmenter(kind: str, channel_to_segment: int = 0, **kwargs):
    """Client closure for nahual_cellpose / nahual_baby / nahual_spotiflow."""
    address = kwargs.get("address") or (kwargs.get("segmenter_kwargs") or {}).get("address")
    if address is None:
        raise ValueError(f"{kind} requires an 'address' parameter")
    model_group = kind.removeprefix("nahual_")
    client = _connect(address)
    session = client.call(
        "setup", model=model_group, params=kwargs.get("setup_params", {})
    )

    def segment(pixels, **_ignored):
        pixels = np.asarray(pixels)
        if pixels.ndim == 6:
            pixels = pixels[0]
        sel = pixels[:, channel_to_segment]
        sel = sel.max(axis=1) if sel.shape[1] > 1 else sel[:, 0]
        result = client.call(
            "process", session=session, model=model_group, data=sel
        )
        masks = result["masks"] if isinstance(result, dict) else result
        out = [np.asarray(m).astype(np.uint16) for m in masks]
        if isinstance(result, dict) and "metadata" in result:
            return {"masks": out, "metadata": result["metadata"]}
        return out

    return segment


def make_remote_embedder(address: str | None = None, model_group: str = "embed", channels=None, **kwargs):
    if address is None:
        raise ValueError("nahual_embed requires an 'address' parameter")
    client = _connect(address)
    session = client.call("setup", model=model_group, params=kwargs.get("setup_params", {}))

    def embed(pixels, **_ignored) -> np.ndarray:
        pixels = np.asarray(pixels, np.float32)
        if channels is not None:
            pixels = pixels[:, channels]
        return np.asarray(
            client.call("process", session=session, model=model_group, data=pixels)
        )

    return embed


def make_remote_global_step(model_group: str, address: str | None = None, parameters=None, **kwargs):
    if address is None:
        raise ValueError(f"nahual_{model_group} requires an 'address' parameter")
    client = _connect(address)
    session = client.call("setup", model=model_group, params=parameters or {})

    def process(stacked, **_ignored):
        import pyarrow as pa

        stacked = np.asarray(stacked)
        if stacked.ndim == 5:  # strip get_step_output's fetcher axis
            stacked = stacked[0]
        result = client.call(
            "process", session=session, model=model_group, data=stacked
        )
        if isinstance(result, dict):
            return pa.Table.from_pydict(result)
        return result

    return process
