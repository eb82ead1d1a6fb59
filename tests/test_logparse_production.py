"""Parser tests against adversarial production-style log fixtures.

The reference pins 16 real Swain-lab logs (tests/parsers/conftest.py:14-20);
those cannot be vendored here, so these fixtures encode their documented
quirks instead: CRLF endings, non-UTF-8 bytes (latin-1 micro sign),
multi-colon general values (timestamps, Windows paths), in-table header
rows, section headers with no blank-line separation, post-start noise,
negative stage coordinates, repeated trigger lines after a stop marker.
"""

from pathlib import Path

import pytest

FIXTURES = Path(__file__).parent / "fixtures" / "logs"


def test_swainlab_production_log():
    from aliby_tpu.logparse.swainlab import parse_swainlab_logs

    m = parse_swainlab_logs(FIXTURES / "swainlab_production.log")
    assert m["channels"] == ["Brightfield", "GFP", "Cy5"]
    assert m["exposure"] == {"Brightfield": 30.0, "GFP": 100.0, "Cy5": 120.0}
    assert m["number_z_sections"] == {"Brightfield": 5, "GFP": 5, "Cy5": 1}
    assert m["sectioning_method"]["GFP"] == "PIFOC"
    # multi-colon general values survive (timestamps, windows paths)
    assert m["start_time"] == ["14:22:07"]
    assert m["acquisition_file"] == ["C:\\Users\\swain\\acq\\exp_041.txt"]
    # the latin-1 micro sign is dropped, not fatal (errors='ignore')
    assert "estradiol induction" in m["experiment_details"][0]
    # negative stage coordinates, three positions
    assert m["spatial_locations"] == {
        "pos001": (-1203.7, 884.2),
        "pos002": (-1100.1, 884.2),
        "pos003": (-996.5, 910.0),
    }
    assert m["time_settings/timeinterval"] == 300
    assert m["time_settings/ntimepoints"] == 180
    assert m["device"] == [
        ("GFP", "LED", "470nm", 12.5),
        ("Cy5", "LED", "640nm", 9.0),
    ]
    # nothing after -----Experiment started----- leaks into the metadata
    assert "garbage" not in str(m)


def test_multidgui_acq_production():
    from aliby_tpu.logparse.grammar import GrammarParser

    acq = GrammarParser("multiDGUI_acq_format").parse(
        (FIXTURES / "production_acq.txt").open()
    )
    assert [c["channel"] for c in acq["channels"]] == [
        "Brightfield", "GFPFast", "cy5",
    ]
    assert acq["channels"][2]["exposure"] == 100
    assert acq["zsectioning"] == [
        {"nsections": 3, "spacing": 0.8, "pfson": True, "anyz": False,
         "drift": 0, "zmethod": 2}
    ]
    assert acq["time_settings"] == [
        {"istimelapse": True, "timeinterval": 120, "ntimepoints": 660,
         "totaltime": 79200}
    ]
    # the positions table is terminated by the next (narrower) section
    # header, NOT swallowed as a bogus row (reference rule: short row ends
    # the table, logfile_parser_legacy.py:179)
    assert [p["posname"] for p in acq["positions"]] == [
        "pos001", "pos002", "pos003",
    ]
    assert acq["positions"][2]["group"] == 2
    assert acq["npumps"] == 2
    # multi-block lists accumulate
    assert acq["switchtimes"] == [0, 720]
    assert acq["pumprate"] == [[4.0, 0.0], [0.0, 4.0]]


def test_multidgui_log_production():
    from aliby_tpu.logparse.grammar import GrammarParser

    out = GrammarParser("multiDGUI_log_format").parse(
        (FIXTURES / "production_log.txt").open()
    )
    assert out["date"] == "11-Mar-2024"
    assert out["microscope"] == "batgirl"
    # windows path with drive-letter colon survives the regex
    assert out["acqfile"] == "D:\\AcquisitionData\\swain\\exp_041_acq.txt"
    # multi-line free-text section accumulates until the next trigger
    assert "Strain BY4741 pHluorin" in out["details"]
    assert "starvation response" in out["details"]
    assert out["expt_start"] == "11-Mar-2024 14:22:09"
    # everything after ------Time point_1------ is ignored
    assert out["microscope"] != "NOT-THE-REAL-ONE"
    assert "never be parsed" not in str(out)


def test_metadata_dispatch_on_production_fixtures():
    from aliby_tpu.logparse.metadata import parse_microscopy_logs

    meta = parse_microscopy_logs(FIXTURES / "swainlab_production.log")
    assert meta["channels"] == ["Brightfield", "GFP", "Cy5"]
