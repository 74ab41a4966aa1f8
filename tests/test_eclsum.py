"""ECL binary summary round trip + on-disk layout checks."""
import datetime
import os
import struct

import numpy as np
import pytest

from opm_tpu.io.eclsum import read_ecl_file, read_summary, write_summary

PSI = 6894.757293168361
DAY = 86400.0
STB = 0.158987294928


def _rows():
    return [
        dict(time=float(t), FPR=(4000 + t) * PSI,
             **{"WBHP:PROD": (3000 - t) * PSI,
                "WOPR:PROD": 1500 * STB / DAY}) for t in (1.0, 5.0, 31.0)]


def test_round_trip(tmp_path):
    base = os.path.join(str(tmp_path), "CASE")
    write_summary(base, _rows(), dims=(10, 10, 3),
                  start_date=datetime.datetime(2015, 1, 1),
                  unit_system="FIELD")
    s = read_summary(base)
    assert np.allclose(s["TIME"], [1, 5, 31])
    assert np.allclose(s["FPR"], [4001, 4005, 4031], rtol=1e-6)
    assert np.allclose(s["WBHP:PROD"], [2999, 2995, 2969], rtol=1e-6)
    assert np.allclose(s["WOPR:PROD"], 1500, rtol=1e-6)


def test_fortran_record_structure(tmp_path):
    """Raw layout: big-endian length-prefixed records; keyword headers are
    (8s, i4, 4s) — what ECL tooling expects."""
    base = os.path.join(str(tmp_path), "CASE")
    write_summary(base, _rows(), unit_system="FIELD",
                  start_date=datetime.datetime(2015, 1, 1))
    with open(base + ".SMSPEC", "rb") as f:
        n = struct.unpack(">i", f.read(4))[0]
        assert n == 16  # header record: 8 + 4 + 4
        name, count, typ = struct.unpack(">8si4s", f.read(16))
        assert name == b"RESTART "
        assert typ == b"CHAR"
        assert struct.unpack(">i", f.read(4))[0] == 16
    blocks = read_ecl_file(base + ".SMSPEC")
    names = [b[0] for b in blocks]
    for required in ("DIMENS", "KEYWORDS", "WGNAMES", "UNITS", "STARTDAT"):
        assert required in names
    spec = {n: (t, v) for n, t, v in blocks}
    assert spec["UNITS"][1][0] == "DAYS"
    assert "PSIA" in spec["UNITS"][1]
    assert spec["STARTDAT"][1][:3] == [1, 1, 2015]


def test_char_chunking(tmp_path):
    """CHAR keywords chunk at 105 items per record."""
    base = os.path.join(str(tmp_path), "BIG")
    rows = [dict(time=1.0, **{f"WBHP:W{i}": 1e7 for i in range(150)})]
    write_summary(base, rows, unit_system="METRIC")
    s = read_summary(base)
    assert len(s) == 151
    assert np.allclose(s["WBHP:W42"], 100.0)  # barsa


def test_unrst_roundtrip_from_run(tmp_path):
    """Unified-restart output: the run writes a UNRST whose last step's
    PRESSURE matches the final state (EclipseIO restart-output role)."""
    import numpy as np

    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.io.eclsum import read_unrst
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.testcases import mini_blackoil_deck

    case = load_case_string(mini_blackoil_deck(nx=5, ny=5, nz=1,
                                               tsteps="3*10"))
    sim = SimulatorFullyImplicitBlackoil(case, output_dir=str(tmp_path))
    state = sim.run(write_restart=True)
    base = (case.runspec.title or "CASE").split()[0]
    steps = read_unrst(str(tmp_path / f"{base}.UNRST"))
    assert len(steps) == 3
    assert steps[-1]["time_days"] == 30.0
    # FIELD deck: pressures stored in PSIA
    psi = 6894.757293168361
    assert np.allclose(steps[-1]["PRESSURE"],
                       np.asarray(state.pressure) / psi, rtol=1e-12)
    assert np.all(steps[0]["SWAT"] >= 0.0)
    assert "RS" in steps[0]


def test_compare_ecl_tool(tmp_path):
    """compare_ecl (run-regressionTest.sh / compare_ecl role): identical
    runs pass, a perturbed vector fails with the named deviation."""
    import numpy as np

    from opm_tpu.io.eclsum import write_summary
    from opm_tpu.tools.compare_ecl import main as compare_main

    rows = [dict(time=t * 86400.0, FOPR=100.0 - t, FPR=2e7 + 1e4 * t,
                 FWCT=0.01 * t) for t in range(10)]
    b1 = str(tmp_path / "RUN1")
    b2 = str(tmp_path / "RUN2")
    b3 = str(tmp_path / "RUN3")
    write_summary(b1, rows)
    write_summary(b2, rows)
    rows_bad = [dict(r) for r in rows]
    rows_bad[5]["FOPR"] *= 1.2
    write_summary(b3, rows_bad)

    assert compare_main([b1, b2]) == 0
    assert compare_main([b1, b3]) == 1
    # tolerant enough: passes
    assert compare_main([b1, b3, "--rel-tol", "0.5"]) == 0
    # key filtering: FPR-only comparison ignores the FOPR deviation
    assert compare_main([b1, b3, "--keys", "FPR"]) == 0
