"""Deck-driven SUMMARY configuration (io/summaryconfig.py): the writer
emits exactly the deck-requested vectors — the reference's SummaryConfig
behavior (FlowMain.hpp readDeckInput -> SummaryConfig; SURVEY.md §2.J)."""

import os

import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case_string
from opm_tpu.io.eclsum import read_summary
from opm_tpu.io.summaryconfig import expand_requests
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

DECK = """
RUNSPEC
TITLE
 summary config test
DIMENS
 5 5 3 /
OIL
WATER
GAS
DISGAS
METRIC
START
 1 JAN 2020 /
WELLDIMS
 2 3 1 2 /
GRID
DX
 75*100 /
DY
 75*100 /
DZ
 75*10 /
TOPS
 25*2500 /
PORO
 75*0.3 /
PERMX
 75*200 /
PERMY
 75*200 /
PERMZ
 75*20 /
REGIONS
FIPNUM
 25*1 25*2 25*2 /
PROPS
PVTW
 270 1.03 4.5E-5 0.3 0 /
ROCK
 270 5E-5 /
DENSITY
 860 1030 0.9 /
PVDG
 30  0.04  0.012
 300 0.004 0.025 /
PVTO
 20  30  1.1  1.0 /
 100 300 1.3  0.6 /
/
SWOF
 0.15 0    1   0
 0.85 0.9  0   0 /
SGOF
 0    0    1   0
 0.85 0.9  0   0 /
SOLUTION
EQUIL
 2515 270 2600 0 2400 0 1 0 0 /
RSVD
 2400 20
 2600 20 /
SUMMARY
FOPR
FGOR
WBHP
/
WWCT
 'PROD' /
RPR
/
ROIP
 2 /
BPR
 1 1 1 /
 3 3 2 /
/
WXYZ
SCHEDULE
WELSPECS
 'PROD' 'G' 5 5 2515 'OIL' /
 'INJ'  'G' 1 1 2515 'WATER' /
/
COMPDAT
 'PROD' 5 5 1 3 'OPEN' 1* 1* 0.2 /
 'INJ'  1 1 1 3 'OPEN' 1* 1* 0.2 /
/
WCONPROD
 'PROD' 'OPEN' 'ORAT' 500 4* 100 /
/
WCONINJE
 'INJ' 'WATER' 'OPEN' 'RATE' 600 1* 500 /
/
TSTEP
 10 20 /
END
"""


def test_expand_requests_families():
    reqs = [("FOPR", []), ("WBHP", []), ("WWCT", [["PROD", "/"]]),
            ("RPR", []), ("ROIP", [["2", "/"]]), ("BPR", [["1", "1", "1"]]),
            ("WXYZ", []), ("WOPT", [])]
    keys, unsup, need = expand_requests(
        reqs, ["PROD", "INJ"], nreg=2, ijk_to_cell=lambda i, j, k: 0)
    assert "FOPR" in keys
    assert "WBHP:PROD" in keys and "WBHP:INJ" in keys
    assert "WWCT:PROD" in keys and "WWCT:INJ" not in keys
    assert "RPR:1" in keys and "RPR:2" in keys
    assert "ROIP:2" in keys and "ROIP:1" not in keys
    assert "BPR:1,1,1" in keys
    assert any("WXYZ" in u for u in unsup)
    assert {"region", "block", "well_totals"} <= need


def test_expand_all_mnemonic():
    keys, unsup, _ = expand_requests([("ALL", [])], ["W1"], nreg=1)
    assert "FOPT" in keys and "WBHP:W1" in keys and "WWCT:W1" in keys
    assert not unsup


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    case = load_case_string(DECK)
    out = str(tmp_path_factory.mktemp("summary_cfg"))
    sim = SimulatorFullyImplicitBlackoil(case, output_dir=out)
    sim.run()
    return sim, out


def test_deck_requested_vectors_exact(run_dir):
    sim, out = run_dir
    data = read_summary(os.path.join(out, sim._out_base()))
    # exactly TIME + the supported requested vectors, nothing else
    expected = {"TIME", "FOPR", "FGOR", "WBHP:PROD", "WBHP:INJ",
                "WWCT:PROD", "RPR:1", "RPR:2", "ROIP:2",
                "BPR:1,1,1", "BPR:3,3,2"}
    assert set(data.keys()) == expected
    # values are physical: producing oil, bhp positive, wct in [0,1]
    assert data["FOPR"][-1] > 0.0
    assert np.all(data["WBHP:PROD"] > 0.0)
    assert np.all((data["WWCT:PROD"] >= 0.0) & (data["WWCT:PROD"] <= 1.0))
    # region pressures are pv-weighted averages in BARSA: between min/max
    assert 100.0 < data["RPR:1"][-1] < 1000.0
    assert 100.0 < data["RPR:2"][-1] < 1000.0
    # block pressure ~ field pressure scale
    assert 100.0 < data["BPR:1,1,1"][-1] < 1000.0
    # ROIP region 2 holds oil
    assert data["ROIP:2"][-1] > 0.0


def test_unsupported_mnemonic_warned(run_dir):
    sim, out = run_dir
    assert any("WXYZ" in u for u in sim.summary.unsupported)
    prt = open(os.path.join(out, sim._out_base() + ".PRT")).read()
    assert "WXYZ" in prt and "WARNING" in prt


@pytest.mark.compile_heavy
def test_span_path_matches_host_path(run_dir, tmp_path):
    """The fused-span device summary (solver/fused_span.py summary_arrays
    extras) produces the same requested vectors as the host path."""
    sim_host, out_host = run_dir
    case = load_case_string(DECK)
    out2 = str(tmp_path / "span")
    sim2 = SimulatorFullyImplicitBlackoil(case, output_dir=out2, fused=True)
    sim2.run()
    assert sim2._span_runner is not None, "span path not exercised"
    d1 = read_summary(os.path.join(out_host, sim_host._out_base()))
    d2 = read_summary(os.path.join(out2, sim2._out_base()))
    assert set(d1.keys()) == set(d2.keys())
    for k in d1:
        np.testing.assert_allclose(d2[k], d1[k], rtol=1e-6, atol=1e-9,
                                   err_msg=k)


def test_region_values_consistent(run_dir):
    sim, _ = run_dir
    row = sim.summary.rows[-1]
    # region pv-weighted pressures bracket the field average
    fpr = row["FPR"]
    lo = min(row["RPR:1"], row["RPR:2"])
    hi = max(row["RPR:1"], row["RPR:2"])
    assert lo - 1.0 <= fpr <= hi + 1.0
    # region FIP sums to field FIP
    assert np.isclose(row["ROIP:1"] + row["ROIP:2"], row["FOIP"],
                      rtol=1e-10)
