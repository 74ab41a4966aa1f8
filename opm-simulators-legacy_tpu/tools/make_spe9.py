"""Regenerate data/SPE9.DATA from sim/testcases.spe9_cp_deck (SPE-29110
corner-point authoring; the deck in data/ is this generator's output)."""
import os
import sys

from opm_tpu.sim.testcases import spe9_cp_deck

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "..", "data", "SPE9.DATA")
    with open(out, "w") as f:
        f.write(spe9_cp_deck())
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")
