"""Offline gates for the external-truth on-ramp (VERDICT r3 item 6).

No network is used: these tests pin the catalogue's integrity (the pinned
names/hashes the reference carries — ``/root/reference/src/aliby/
test_data.py:34-37`` and ``tests/parsers/conftest.py:14-49``) and the
offline failure mode, so that ``scripts/external_truth.py`` is one working
command on any networked machine rather than a project.
"""

import re

import pytest

from aliby_tpu import external_data as X


def test_image_tarball_pin():
    assert re.fullmatch(r"[0-9a-f]{64}", X.IMAGE_TARBALL["sha256"])
    assert X.IMAGE_TARBALL["url"].startswith("https://zenodo.org/api/records/19411429/")
    # the 5 sub-datasets the reference catalogue lists (test_data.py:43-106)
    names = [d["name"] for d in X.IMAGE_DATASETS]
    assert len(names) == 5
    assert "crop_cellpainting_256" in names
    assert sum(d["layout"] == "zarr" for d in X.IMAGE_DATASETS) == 2
    for d in X.IMAGE_DATASETS:
        if d["layout"] == "tiff_dir":
            assert d["regex"] and d["capture_order"]
            re.compile(d["regex"])  # regexes must compile


def test_swainlab_log_pins():
    # the reference's parser corpus: 16 md5-pinned real logs
    assert len(X.SWAINLAB_LOGS) == 16
    for name, entry in X.SWAINLAB_LOGS.items():
        assert re.fullmatch(r"[0-9a-f]{32}", entry["md5"]), name
        assert entry["url"].startswith("https://zenodo.org/api/records/"), name


def test_fetch_offline_error(tmp_path):
    # a guaranteed-unreachable endpoint fails fast with OfflineError (the
    # guard external_truth.py sections rely on), never a partial file
    dest = tmp_path / "x.bin"
    with pytest.raises(X.OfflineError):
        X._fetch("http://127.0.0.1:1/nope", dest, sha256="0" * 64, timeout=2.0)
    assert not dest.exists()
    assert not dest.with_suffix(".bin.part").exists()


def test_external_truth_script_imports():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "scripts" / "external_truth.py"
    spec = importlib.util.spec_from_file_location("external_truth", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # imports must resolve offline
    assert callable(mod.main)
