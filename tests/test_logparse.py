"""Log parsers against synthetic production-style logs."""

import textwrap

import pytest

from aliby_tpu.logparse import MetaData, parse_microscopy_logs, parse_swainlab_logs
from aliby_tpu.logparse.grammar import GrammarParser

SWAINLAB_LOG = textwrap.dedent(
    """\
    Microscope name: robin
    Acquisition settings file: C:\\acq\\exp42.txt
    Experiment name: exp42
    -----Acquisition settings-----
    Channel name,Imaging mode,Gain,Exposure,Z sections,Z spacing,Sectioning
    Brightfield,Brightfield,2,30,5,0.6,PIFOC
    GFP,GFP,2,100,5,0.6,PIFOC
    mCherry,mCherry,2,120,1,0.0,PIFOC
    Device properties:
    GFP,filterA,cubeB,2.0
    Name,X,Y,Z,Autofocus offset
    pos001,573.5,122.2,3570.1,0.0
    pos002,600.0,150.8,3570.4,0.0

    Time settings: interval: 300, frames: 180
    -----Experiment started-----
    data data data
    """
)

ACQ_TXT = textwrap.dedent(
    """\
    Channels:
    Channel name,Exposure time,Skip,Z sect.,Start time,Camera mode,EM gain,Voltage
    Brightfield,30,1,1,1,2,270,1.0
    GFP,100,1,1,1,2,270,3.5
    Z_sectioning:
    Sections,Spacing,PFSon?,AnyZ?,Drift,Method
    5,0.6,1,1,0,2
    Time_settings
    1,300,180,54000
    Points:
    Position name,X position,Y position,Z position,PFS offset,Group
    pos001,573.5,122.2,3570.1,122.5,1
    pos002,600.0,150.8,3570.4,119.5,1

    Syringe pump details: 2 pumps.
    Switch times:
    0 7200
    """
)


def test_swainlab_parser(tmp_path):
    f = tmp_path / "exp42.log"
    f.write_text(SWAINLAB_LOG)
    meta = parse_swainlab_logs(f)
    assert meta["channels"] == ["Brightfield", "GFP", "mCherry"]
    assert meta["exposure"] == {"Brightfield": 30.0, "GFP": 100.0, "mCherry": 120.0}
    assert meta["number_z_sections"]["GFP"] == 5
    assert meta["z_spacing"]["mCherry"] == 0.0
    assert meta["spatial_locations"]["pos002"] == (600.0, 150.8)
    assert meta["time_settings/timeinterval"] == 300
    assert meta["time_settings/ntimepoints"] == 180
    assert meta["device"] == [("GFP", "filterA", "cubeB", 2.0)]
    assert meta["microscope_name"] == ["robin"]


def test_grammar_acq_parser(tmp_path):
    parser = GrammarParser("multiDGUI_acq_format")
    out = parser.parse(ACQ_TXT)
    assert [row["channel"] for row in out["channels"]] == ["Brightfield", "GFP"]
    assert out["channels"][1]["exposure"] == 100
    assert out["zsectioning"][0]["spacing"] == 0.6
    assert out["zsectioning"][0]["pfson"] is True
    assert out["time_settings"][0] == {
        "istimelapse": True,
        "timeinterval": 300,
        "ntimepoints": 180,
        "totaltime": 54000,
    }
    assert out["positions"][1]["posname"] == "pos002"
    assert out["npumps"] == 2
    assert out["switchtimes"] == [0, 7200]


def test_dispatch_and_minimal(tmp_path):
    (tmp_path / "exp42.log").write_text(SWAINLAB_LOG)
    merged = parse_microscopy_logs(tmp_path)
    minimal = MetaData(merged).minimal
    assert minimal == {
        "channels": ["Brightfield", "GFP", "mCherry"],
        "ntimepoints": 180,
        "timeinterval": 300,
    }


def test_minimal_from_acq_table(tmp_path):
    (tmp_path / "exp42acq.txt").write_text(ACQ_TXT)
    merged = parse_microscopy_logs(tmp_path)
    minimal = MetaData(merged).minimal
    assert minimal["channels"] == ["Brightfield", "GFP"]
    assert minimal["ntimepoints"] == 180


def test_missing_logs_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        parse_microscopy_logs(tmp_path / "nothing")
