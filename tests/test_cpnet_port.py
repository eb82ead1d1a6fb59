"""torch->flax Cellpose (CPnet) weight port: forward bit-parity.

Real pretrained Cellpose checkpoints are torch ``state_dict`` pickles; the
cellpose package is not installable here, so the oracle below re-creates
the published CPnet graph in torch (independently authored from the
architecture spec), random-initializes it, and asserts that
``convert_torch_state_dict`` + ``CPnetFlax`` reproduce its forward pass.
Forward parity at float32 means a real cyto/nuclei checkpoint dropped into
``load_cellpose_checkpoint`` yields the same network function the
reference runs (mask parity then rests on pre/post-processing only).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from aliby_tpu.models.cpnet import (  # noqa: E402
    CPnetFlax,
    convert_torch_state_dict,
    load_cellpose_checkpoint,
)

NBASE = (2, 16, 32, 64)  # small pyramid, same topology as (2,32,64,128,256)


def _batchconv(cin, cout, sz):
    return tnn.Sequential(
        tnn.BatchNorm2d(cin, eps=1e-5),
        tnn.ReLU(inplace=True),
        tnn.Conv2d(cin, cout, sz, padding=sz // 2),
    )


def _batchconv0(cin, cout, sz):
    return tnn.Sequential(
        tnn.BatchNorm2d(cin, eps=1e-5),
        tnn.Conv2d(cin, cout, sz, padding=sz // 2),
    )


class _ResDown(tnn.Module):
    def __init__(self, cin, cout, sz):
        super().__init__()
        self.proj = _batchconv0(cin, cout, 1)
        self.conv = tnn.Sequential()
        for t in range(4):
            self.conv.add_module(
                f"conv_{t}", _batchconv(cin if t == 0 else cout, cout, sz)
            )

    def forward(self, x):
        x = self.proj(x) + self.conv[1](self.conv[0](x))
        return x + self.conv[3](self.conv[2](x))


class _BatchConvStyle(tnn.Module):
    def __init__(self, cin, cout, cstyle, sz):
        super().__init__()
        self.conv = _batchconv(cin, cout, sz)
        self.full = tnn.Linear(cstyle, cin)

    def forward(self, style, x, y=None):
        if y is not None:
            x = x + y
        feat = self.full(style)
        return self.conv(x + feat.unsqueeze(-1).unsqueeze(-1))


class _ResUp(tnn.Module):
    def __init__(self, cin, cout, cstyle, sz):
        super().__init__()
        self.proj = _batchconv0(cin, cout, 1)
        self.conv = tnn.Sequential()
        self.conv.add_module("conv_0", _batchconv(cin, cout, sz))
        for t in (1, 2, 3):
            self.conv.add_module(
                f"conv_{t}", _BatchConvStyle(cout, cout, cstyle, sz)
            )

    def forward(self, x, y, style):
        x = self.proj(x) + self.conv[1](style, self.conv[0](x), y=y)
        return x + self.conv[3](style, self.conv[2](style, x))


class _Downsample(tnn.Module):
    def __init__(self, nbase, sz):
        super().__init__()
        self.down = tnn.Sequential()
        for n in range(len(nbase) - 1):
            self.down.add_module(
                f"res_down_{n}", _ResDown(nbase[n], nbase[n + 1], sz)
            )
        self.maxpool = tnn.MaxPool2d(2, stride=2)

    def forward(self, x):
        xd = []
        for n in range(len(self.down)):
            y = self.maxpool(xd[n - 1]) if n > 0 else x
            xd.append(self.down[n](y))
        return xd


class _Upsample(tnn.Module):
    def __init__(self, nbase, sz):
        super().__init__()
        self.upsampling = tnn.Upsample(scale_factor=2, mode="nearest")
        self.up = tnn.Sequential()
        for n in range(1, len(nbase)):
            self.up.add_module(
                f"res_up_{n - 1}", _ResUp(nbase[n], nbase[n - 1], nbase[-1], sz)
            )

    def forward(self, style, xd):
        x = self.up[-1](xd[-1], xd[-1], style)
        for n in range(len(self.up) - 2, -1, -1):
            x = self.upsampling(x)
            x = self.up[n](x, xd[n], style)
        return x


class _CPnetTorch(tnn.Module):
    def __init__(self, nbase=NBASE, nout=3, sz=3):
        super().__init__()
        self.downsample = _Downsample(nbase, sz)
        nbaseup = list(nbase[1:]) + [nbase[-1]]
        self.upsample = _Upsample(nbaseup, sz)
        self.output = _batchconv(nbaseup[0], nout, 1)

    def forward(self, x):
        xd = self.downsample(x)
        flat = torch.nn.functional.avg_pool2d(
            xd[-1], kernel_size=(xd[-1].shape[-2], xd[-1].shape[-1])
        ).flatten(1)
        style = flat / torch.sum(flat**2, dim=1, keepdim=True) ** 0.5
        up = self.upsample(style, xd)
        return self.output(up), style


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = _CPnetTorch()
    # randomize BN running stats so inference-mode parity is non-trivial
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


def test_forward_parity(torch_model):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 2, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out, t_style = torch_model(torch.from_numpy(x))
    params = convert_torch_state_dict(torch_model.state_dict(), NBASE)
    model = CPnetFlax(nbase=NBASE)
    f_out, f_style = model.apply(params, np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_out), (0, 3, 1, 2)),
        t_out.numpy(), atol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(f_style), t_style.numpy(), atol=2e-4)


def test_checkpoint_file_roundtrip(torch_model, tmp_path):
    """Published checkpoints are raw state_dict pickles — load one."""
    path = tmp_path / "cytotorch_0"
    torch.save(torch_model.state_dict(), path)
    model, params = load_cellpose_checkpoint(path, nbase=NBASE)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 32, 32, 2)).astype(np.float32)
    out, style = model.apply(params, x)
    assert out.shape == (1, 32, 32, 3) and style.shape == (1, NBASE[-1])
    with torch.no_grad():
        t_out, _ = torch_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), t_out.numpy(), atol=2e-4
    )


def test_style_only_matches(torch_model):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 48, 48, 2)).astype(np.float32)
    params = convert_torch_state_dict(torch_model.state_dict(), NBASE)
    model = CPnetFlax(nbase=NBASE)
    _, style_full = model.apply(params, x)
    style = model.apply(params, x, style_only=True)
    np.testing.assert_allclose(np.asarray(style), np.asarray(style_full), atol=1e-6)


def test_cellpose_tpu_runs_ported_checkpoint(torch_model, tmp_path):
    """CellposeTPU end-to-end with a torch checkpoint: forward + flow
    reconstruction produce label masks of the right shape/dtype."""
    from aliby_tpu.models.segment import CellposeTPU

    path = tmp_path / "cyto_test.pth"
    torch.save(torch_model.state_dict(), path)
    engine = CellposeTPU(
        pretrained_path=path, model_kwargs={"nbase": NBASE},
    )
    imgs = np.random.default_rng(4).normal(size=(2, 2, 48, 48)).astype(np.float32)
    masks = engine.segment_tiles(imgs)
    assert len(masks) == 2
    assert all(m.shape == (48, 48) and m.dtype == np.uint16 for m in masks)
