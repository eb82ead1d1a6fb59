"""Legacy h5 bridge: append/skip semantics, tiler geometry, state resume."""

import numpy as np

from aliby_tpu.io.h5compat import (
    DynamicWriter,
    StateH5Writer,
    TilerH5Writer,
    read_state,
)
from aliby_tpu.io.utils import Cache, get_store_path
from aliby_tpu.tile.geometry import TileLocations


def test_dynamic_writer_skips_written_tps(tmp_path):
    w = DynamicWriter(tmp_path / "pos.h5", group="cells")
    assert w.append("area", np.asarray([1.0, 2.0]), tp=0)
    assert w.append("area", np.asarray([1.5, 2.5]), tp=1)
    # re-running tp 0 is a no-op (resume semantics)
    assert not w.append("area", np.asarray([9.0, 9.0]), tp=0)
    assert w.written_tps("area") == 2
    import h5py

    with h5py.File(tmp_path / "pos.h5") as h5:
        np.testing.assert_allclose(h5["cells/area"][0], [1.0, 2.0])


def test_tiler_writer(tmp_path):
    locs = TileLocations.from_tiler_init(np.asarray([[50.0, 60.0]]), 32)
    w = TilerH5Writer(tmp_path / "pos.h5")
    w.write(locs, tp=0)
    locs.add_drift([1.0, -2.0])
    w.write(locs, tp=1)
    import h5py

    with h5py.File(tmp_path / "pos.h5") as h5:
        assert h5["trap_info/trap_locations"].shape == (1, 2)
        np.testing.assert_allclose(h5["trap_info/drifts"][1], [1.0, -2.0])


def test_state_roundtrip(tmp_path):
    state = {
        "labels": [np.arange(12).reshape(3, 4)],
        "max_label": [11],
    }
    StateH5Writer(tmp_path / "state.h5").write(state, tp=5)
    restored = read_state(tmp_path / "state.h5")
    assert restored["timepoint"] == 5
    assert restored["max_label"] == [11]
    np.testing.assert_array_equal(restored["labels"][0], state["labels"][0])
    assert read_state(tmp_path / "nothing.h5") is None


def test_cache_and_store_path(tmp_path):
    calls = []

    def loader(k):
        calls.append(k)
        return k * 2

    cache = Cache(loader, max_items=2)
    assert cache(1) == 2 and cache(1) == 2
    assert calls == [1]
    cache(2)
    cache(3)  # evicts 1
    cache(1)
    assert calls == [1, 2, 3, 1]
    assert get_store_path("/out", ".h5", "pos1").name == "pos1.h5"
