"""Synthetic in-memory decks for tests, benchmarks, and dry runs.

Analogue of the inline fixture decks in the reference's tests/
(e.g. tests/fluid.data, the synthetic-grid setup in
examples/sim_2p_incomp_ad.cpp:93-210)."""

from __future__ import annotations

from opm_tpu.io.eclstate import EclipseCase, load_case_string


def mini_blackoil_deck(nx=10, ny=10, nz=3, *, inj_rate=100000,
                       prod_rate=20000, tsteps="10*30") -> str:
    """SPE1-like three-phase DISGAS case, scalable grid dimensions."""
    n = nx * ny * nz
    nlay = nx * ny
    return f"""
RUNSPEC
TITLE
  MINI BLACKOIL {nx}x{ny}x{nz}
DIMENS
 {nx} {ny} {nz} /
EQLDIMS
/
TABDIMS
/
OIL
GAS
WATER
DISGAS
FIELD
WELLDIMS
 2 {nz} 1 2 /
GRID
DX
 {n}*{10000.0 / nx} /
DY
 {n}*{10000.0 / ny} /
DZ
 {n}*{100.0 / nz} /
TOPS
 {nlay}*8325 /
PORO
 {n}*0.3 /
PERMX
 {n}*500 /
PERMY
 {n}*500 /
PERMZ
 {n}*50 /
PROPS
PVTW
 4014.7 1.029 3.13D-6 0.31 0 /
ROCK
 14.7 3D-6 /
SWOF
 0.12 0       1     0
 0.3  0.0002  0.8   0
 0.5  0.005   0.35  0
 0.7  0.05    0.05  0
 0.88 0.15    0.0   0
 1.0  0.30    0.0   0 /
SGOF
 0    0     1     0
 0.02 0     0.95  0
 0.2  0.08  0.35  0
 0.4  0.3   0.05  0
 0.6  0.6   0.005 0
 0.88 0.95  0.0   0 /
DENSITY
 53.66 64.49 0.0533 /
PVDG
 14.700 166.666 0.008
 1014.7 3.19700 0.0140
 2014.7 1.61400 0.0189
 3014.7 1.08000 0.0228
 4014.7 0.81100 0.0268
 5014.7 0.64900 0.0309
 9014.7 0.38600 0.0470 /
PVTO
 0.0010 14.7   1.0620 1.0400 /
 0.1800 514.7  1.2070 0.9100 /
 0.3710 1014.7 1.2950 0.8300 /
 0.6360 2014.7 1.4350 0.6950 /
 0.9300 3014.7 1.5650 0.5940 /
 1.2700 4014.7 1.6950 0.5100
        5014.7 1.6710 0.5490
        9014.7 1.5790 0.7400 /
 1.6180 5014.7 1.8270 0.4490
        9014.7 1.7370 0.6310 /
/
SOLUTION
EQUIL
 8400 4800 8500 0 8200 0 1 0 0 /
RSVD
 8200 1.270
 8500 1.270 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'PROD' 'G1' {nx} {ny} 8400 'OIL' /
 'INJ'  'G1' 1 1 8335 'GAS' /
/
COMPDAT
 'PROD' {nx} {ny} {nz} {nz} 'OPEN' 1* 1* 0.5 /
 'INJ'  1 1 1 1 'OPEN' 1* 1* 0.5 /
/
WCONPROD
 'PROD' 'OPEN' 'ORAT' {prod_rate} 4* 1000 /
/
WCONINJE
 'INJ' 'GAS' 'OPEN' 'RATE' {inj_rate} 1* 9014 /
/
TSTEP
 {tsteps} /
END
"""


def mini_blackoil_case(nx=10, ny=10, nz=3, **kw) -> EclipseCase:
    return load_case_string(mini_blackoil_deck(nx, ny, nz, **kw))


def spe9like_deck(seed=9, tsteps="10 20 3*30") -> str:
    """SPE9-class case (Killough 1995 problem shape): 24x25x15 dipping grid,
    heterogeneous lognormal permeability (the published geostatistical field
    is an external data file; a seeded lognormal field with the same layer
    statistics stands in), per-layer porosities, capillary pressure, 25
    producers + 1 water injector with the SPE9 controls."""
    import numpy as np

    nx, ny, nz = 24, 25, 15
    rng = np.random.RandomState(seed)
    poro_layers = [0.087, 0.097, 0.111, 0.16, 0.13, 0.17, 0.17, 0.08,
                   0.14, 0.13, 0.12, 0.105, 0.12, 0.116, 0.157]
    dz_layers = [20, 15, 26, 15, 16, 14, 8, 8, 18, 12, 19, 18, 20, 50, 100]
    # lognormal permeability, layer-correlated
    perm = []
    for k in range(nz):
        mu = rng.uniform(1.0, 5.0)
        layer = np.exp(rng.normal(mu, 1.2, size=nx * ny))
        perm.append(np.clip(layer, 0.01, 8000.0))
    perm = np.concatenate(perm)
    permz = perm * 0.01
    # 10-degree dip along x: the reservoir deepens with i (top at 9000 ft,
    # staying below the 8800 ft GOC so there is no initial gas cap)
    dip = np.tan(np.deg2rad(10.0)) * 300.0
    tops0 = 9000.0 + dip * np.arange(nx)
    tops = np.tile(tops0, ny)

    def arr(a, fmt="{:.6g}"):
        return "\n ".join(" ".join(fmt.format(v) for v in a[i:i + 12])
                          for i in range(0, len(a), 12))

    porov = np.concatenate([np.full(nx * ny, p) for p in poro_layers])
    dzv = np.concatenate([np.full(nx * ny, d) for d in dz_layers])

    # 25 producers on a 5x5 sublattice confined to the UPDIP oil leg:
    # the 10-degree dip puts column tops below the 9950 ft WOC for
    # i >~ 18, so producers span i = 2..14 (the real SPE9 wells sit
    # updip of the contact; the injector supports from the water leg)
    wells = []
    comps = []
    k_prod = (2, 3, 4)
    pi = 0
    for jj in range(5):
        for ii in range(5):
            pi += 1
            i = 2 + ii * 3
            j = 2 + jj * 5
            wells.append(f" 'P{pi}' 'G1' {i} {j} 9110 'OIL' /")
            comps.append(f" 'P{pi}' {i} {j} {k_prod[0]} {k_prod[-1]} "
                         "'OPEN' 1* 1* 0.5 /")
    wells.append(" 'INJ1' 'G1' 24 25 9170 'WATER' /")
    comps.append(" 'INJ1' 24 25 11 15 'OPEN' 1* 1* 0.5 /")
    prods = "\n".join(f" 'P{i}' 'OPEN' 'ORAT' 1500 4* 1000 /"
                      for i in range(1, 26))

    return f"""
RUNSPEC
TITLE
  SPE9-LIKE (seeded heterogeneity)
DIMENS
 24 25 15 /
EQLDIMS
/
TABDIMS
/
OIL
GAS
WATER
DISGAS
FIELD
WELLDIMS
 26 5 2 26 /
GRID
DX
 9000*300 /
DY
 9000*300 /
DZ
 {arr(dzv)} /
TOPS
 {arr(tops)} /
PORO
 {arr(porov)} /
PERMX
 {arr(perm)} /
PERMY
 {arr(perm)} /
PERMZ
 {arr(permz)} /
PROPS
PVTW
 3600 1.0034 1E-6 0.96 0 /
ROCK
 3600 1E-6 /
SWOF
 0.151090 0         1.0       400.0
 0.200 	  0.000002  0.91      55.0
 0.300 	  0.00024   0.60      9.2
 0.400 	  0.0015    0.33      4.5
 0.500    0.0077    0.135     2.3
 0.600    0.0262    0.0349    1.15
 0.700    0.0754    0.0049    0.57
 0.800    0.1870    0.0       0.27
 0.900    0.4000    0.0       0.13
 1.0      1.0       0.0       0.0 /
SGOF
 0.0    0.0     1.0    0.0
 0.04   0.0     0.60   0.2
 0.10   0.022   0.33   0.5
 0.20   0.1     0.10   1.0
 0.30   0.24    0.02   1.5
 0.40   0.34    0.0    2.0
 0.50   0.42    0.0    2.5
 0.60   0.50    0.0    3.0
 0.70   0.8125  0.0    3.5
 0.848910 1.0   0.0    3.9 /
DENSITY
 44.98 63.01 0.0702 /
PVDG
 14.7   178.08  0.0125
 400.0  5.4777  0.0130
 800.0  2.7392  0.0135
 1200.0 1.8198  0.0140
 1600.0 1.3648  0.0145
 2000.0 1.0957  0.0150
 2400.0 0.9099  0.0155
 2800.0 0.7799  0.0160
 3200.0 0.6871  0.0165
 3600.0 0.6035  0.0170
 4000.0 0.5432  0.0175 /
PVTO
 0.0    14.7    1.0    1.20 /
 0.165  400.0   1.012  1.17 /
 0.335  800.0   1.0255 1.14 /
 0.500  1200.0  1.038  1.11 /
 0.665  1600.0  1.051  1.08 /
 0.828  2000.0  1.063  1.06 /
 0.985  2400.0  1.075  1.03 /
 1.130  2800.0  1.087  1.00 /
 1.270  3200.0  1.0985 0.98 /
 1.390  3600.0  1.11   0.95
        4000.0  1.10802 0.9598 /
/
SOLUTION
EQUIL
 9035 3600 9950 0 8800 0 1 0 0 /
RSVD
 8800 1.39
 9950 1.39 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
{chr(10).join(wells)}
/
COMPDAT
{chr(10).join(comps)}
/
WCONPROD
{prods}
/
WCONINJE
 'INJ1' 'WATER' 'OPEN' 'RATE' 5000 1* 4543.39 /
/
TSTEP
 {tsteps} /
END
"""


def spe9like_case(**kw) -> EclipseCase:
    return load_case_string(spe9like_deck(**kw))


def spe10like_deck(nx=60, ny=220, nz=20, seed=10, tsteps="5*20") -> str:
    """SPE10-model-2-class scaling case: the published model's 60x220x85
    channelized permeability field is an external download, so a seeded
    lognormal field with channel streaks stands in at the same areal size
    (nz configurable: 85 = full-size 1.122M cells). Waterflood five-spot:
    4 corner producers + 1 center injector (the SPE10 well pattern)."""
    import numpy as np

    n = nx * ny * nz
    rng = np.random.RandomState(seed)
    # channelized-ish lognormal: smooth noise along y (channels run in y)
    perm = np.empty((nz, ny, nx))
    for k in range(nz):
        base = rng.normal(0.0, 1.0, size=(ny, nx))
        for _ in range(3):  # cheap smoothing -> correlated streaks
            base = 0.5 * base + 0.25 * np.roll(base, 1, axis=0) \
                + 0.25 * np.roll(base, 2, axis=0)
        perm[k] = np.exp(3.0 + 2.0 * base)
    perm = np.clip(perm.ravel(), 1e-3, 2e4)
    poro = np.clip(0.05 + 0.25 * (np.log(perm) - np.log(perm).min())
                   / (np.log(perm).max() - np.log(perm).min()), 0.05, 0.35)

    def arr(a):
        return "\n ".join(" ".join(f"{v:.5g}" for v in a[i:i + 16])
                          for i in range(0, len(a), 16))

    ci, cj = nx // 2 + 1, ny // 2 + 1
    prods = [(1, 1), (nx, 1), (1, ny), (nx, ny)]
    wells = [f" 'P{i+1}' 'G1' {pi} {pj} 12000 'OIL' /"
             for i, (pi, pj) in enumerate(prods)]
    wells.append(f" 'I1' 'G1' {ci} {cj} 12000 'WATER' /")
    comps = [f" 'P{i+1}' {pi} {pj} 1 {nz} 'OPEN' 1* 1* 0.5 /"
             for i, (pi, pj) in enumerate(prods)]
    comps.append(f" 'I1' {ci} {cj} 1 {nz} 'OPEN' 1* 1* 0.5 /")
    wcon = "\n".join(f" 'P{i+1}' 'OPEN' 'BHP' 5* 4000 /" for i in range(4))

    return f"""
RUNSPEC
TITLE
  SPE10-LIKE {nx}x{ny}x{nz} (seeded channels)
DIMENS
 {nx} {ny} {nz} /
EQLDIMS
/
TABDIMS
/
OIL
GAS
WATER
DISGAS
FIELD
WELLDIMS
 5 {nz} 1 5 /
GRID
DX
 {n}*20 /
DY
 {n}*10 /
DZ
 {n}*2 /
TOPS
 {nx * ny}*12000 /
PORO
 {arr(poro)} /
PERMX
 {arr(perm)} /
PERMY
 {arr(perm)} /
PERMZ
 {arr(perm * 0.1)} /
PROPS
PVTW
 6000 1.01 3E-6 0.3 0 /
ROCK
 6000 1E-6 /
SWOF
 0.2  0     1     0
 0.4  0.06  0.5   0
 0.6  0.24  0.15  0
 0.8  0.54  0.01  0
 1.0  1.0   0.0   0 /
SGOF
 0    0     1     0
 0.05 0     0.85  0
 0.3  0.12  0.3   0
 0.6  0.5   0.02  0
 0.8  0.9   0.0   0 /
DENSITY
 53 64 0.06 /
PVDG
 14.7   180  0.012
 2000   1.1  0.016
 6000   0.35 0.025
 9000   0.23 0.030 /
PVTO
 0.01  14.7  1.05  1.8 /
 0.3   2000  1.15  1.2 /
 0.8   6000  1.35  0.8
       9000  1.33  0.85 /
/
SOLUTION
EQUIL
 12030 6000 12500 0 11000 0 1 0 0 /
RSVD
 11000 0.4
 12500 0.4 /
SUMMARY
FOPR
SCHEDULE
TUNING
 0.25 365 0.1 1* 1.5 /
/
 20 /
WELSPECS
{chr(10).join(wells)}
/
COMPDAT
{chr(10).join(comps)}
/
WCONPROD
{wcon}
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 5000 1* 10000 /
/
TSTEP
 {tsteps} /
END
"""


def spe10like_case(**kw) -> EclipseCase:
    return load_case_string(spe10like_deck(**kw))


def spe9_cp_deck(seed=9) -> str:
    """The SPE9 benchmark (Killough, SPE-29110, 1995) authored as a
    corner-point deck: 24x25x15 grid, DX=DY=300 ft, the published
    per-layer thicknesses/porosities, a TRUE 10-degree dip along x
    expressed through COORD/ZCORN pillars, the published PVT and
    saturation tables (shared with spe9like_deck), 25 producers + 1
    water injector, and the full 900-day schedule with the paper's
    producer rate changes (1500 STB/D -> 100 at day 300 -> back to 1500
    at day 360). The published geostatistical permeability field is an
    external data file not redistributable here; a seeded lognormal
    field with the same layer statistics stands in (documented)."""
    import numpy as np

    nx, ny, nz = 24, 25, 15
    dz_layers = np.asarray([20, 15, 26, 15, 16, 14, 8, 8, 18, 12, 19, 18,
                            20, 50, 100], dtype=np.float64)
    cumdz = np.concatenate([[0.0], np.cumsum(dz_layers)])  # (nz+1,)
    slope = np.tan(np.deg2rad(10.0))
    # layer interfaces follow the dipped top plane:
    # z(e, kf) = 9000 + slope*300*e + cumdz[kf] at x-pillar edge e
    e = np.arange(nx + 1, dtype=np.float64)
    zedge = 9000.0 + slope * 300.0 * e                     # (nx+1,)

    # COORD: (ny+1)x(nx+1) vertical pillars (x, y, ztop, x, y, zbot)
    coord = np.empty((ny + 1, nx + 1, 6))
    X, Y = np.meshgrid(e * 300.0, np.arange(ny + 1) * 300.0)
    coord[:, :, 0] = X
    coord[:, :, 1] = Y
    coord[:, :, 2] = zedge[None, :]
    coord[:, :, 3] = X
    coord[:, :, 4] = Y
    coord[:, :, 5] = zedge[None, :] + cumdz[-1]

    # ZCORN: flat index ((((k*2+kc)*ny + j)*2 + jc)*nx + i)*2 + ic
    kk, kc, jj, jc, ii, ic = np.meshgrid(
        np.arange(nz), np.arange(2), np.arange(ny), np.arange(2),
        np.arange(nx), np.arange(2), indexing="ij")
    zcorn = zedge[ii + ic] + cumdz[kk + kc]

    def arr(a, fmt="{:.6g}"):
        a = np.asarray(a).ravel()
        return "\n ".join(" ".join(fmt.format(v) for v in a[i:i + 10])
                          for i in range(0, len(a), 10))

    base = spe9like_deck(seed=seed)
    gstart = base.index("GRID\n")
    gend = base.index("PROPS\n")
    grid_sec = (
        "GRID\nCOORD\n " + arr(coord, "{:.2f}") + " /\nZCORN\n "
        + arr(zcorn, "{:.2f}") + " /\n"
        # PORO/PERM blocks from the block-centered template
        + base[base.index("PORO\n", gstart):gend])
    deck = base[:gstart] + grid_sec + base[gend:]
    deck = deck.replace("SPE9-LIKE (seeded heterogeneity)",
                        "SPE9 corner-point (stand-in perm field)")
    # full 900-day schedule with the producer rate changes
    prods_low = "\n".join(f" 'P{i}' 'OPEN' 'ORAT' 100 4* 1000 /"
                          for i in range(1, 26))
    prods_high = "\n".join(f" 'P{i}' 'OPEN' 'ORAT' 1500 4* 1000 /"
                           for i in range(1, 26))
    tail = ("TSTEP\n 1 4 10 25 30 30 40 40 40 40 40 /\n"
            f"WCONPROD\n{prods_low}\n/\n"
            "TSTEP\n 30 30 /\n"
            f"WCONPROD\n{prods_high}\n/\n"
            "TSTEP\n 40 50 6*75 /\n"
            "END\n")
    tstart = deck.index("TSTEP\n")
    deck = deck[:tstart] + tail
    return deck


def spe9_cp_case(**kw) -> EclipseCase:
    return load_case_string(spe9_cp_deck(**kw))


def spe3like_deck(tsteps="5 10 3*15 22*30", cycling=False,
                  cycle_tsteps="10*30", blowdown_tsteps="6*30") -> str:
    """SPE3-class retrograde gas-condensate depletion (Kenyon & Behie,
    SPE-12278, black-oil conversion as in the reference's SPE3 regression,
    compareECLFiles.cmake:107-112): 9x9x4 grid, wet gas with vaporized
    oil (VAPOIL + PVTG), dead condensate oil (PVDO), immobile connate
    water. The whole column initializes as UNDERSATURATED gas (rv below
    the dew-point rv_sat via RVVD); drawdown below the dew point drops
    condensate out — the HC_GASONLY <-> HC_GASOIL switching path.

    cycling=True adds the PUBLISHED study's gas-cycling structure
    (Kenyon & Behie: separator gas reinjected dry, then blowdown) on an
    accelerated clock: `tsteps` of depletion drops condensate out, then
    the injector opens at 1.5x the offtake (45 MMscf/d dry gas:
    full reinjection plus makeup gas, so the cycle genuinely
    repressurizes) for
    `cycle_tsteps`, then shuts for a `blowdown_tsteps` blowdown — the
    harder VAPOIL direction: rv RISES where the dry front repressurizes
    saturated cells / re-vaporizes dropped-out condensate, then falls
    again in blowdown."""
    n = 9 * 9 * 4
    nlay = 9 * 9
    wspec_inj = "\n 'INJ'  'G1' 1 1 7530 'GAS' /" if cycling else ""
    compdat_inj = ("\n 'INJ'  1 1 1 2 'OPEN' 1* 1* 0.5 /"
                   if cycling else "")
    # injector exists from t=0 but stays explicitly SHUT through the
    # depletion period
    inje = ("\nWCONINJE\n 'INJ' 'GAS' 'SHUT' 'RATE' 45000 1* 6000 /\n/"
            if cycling else "")
    shut_and_blowdown = (
        "\nWCONINJE\n 'INJ' 'GAS' 'OPEN' 'RATE' 45000 1* 6000 /\n/"
        "\nTSTEP\n " + cycle_tsteps + " /"
        "\nWCONINJE\n 'INJ' 'GAS' 'SHUT' 'RATE' 45000 1* 6000 /\n/"
        "\nTSTEP\n " + blowdown_tsteps + " /" if cycling else "")
    return f"""
RUNSPEC
TITLE
  SPE3-LIKE gas condensate (VAPOIL)
DIMENS
 9 9 4 /
EQLDIMS
/
TABDIMS
/
OIL
GAS
WATER
VAPOIL
FIELD
WELLDIMS
 2 4 1 2 /
GRID
DX
 {n}*293.3 /
DY
 {n}*293.3 /
DZ
 {nlay}*30 {nlay}*30 {nlay}*50 {nlay}*50 /
TOPS
 {nlay}*7500 /
PORO
 {n}*0.13 /
PERMX
 {nlay}*130 {nlay}*40 {nlay}*20 {nlay}*150 /
PERMY
 {nlay}*130 {nlay}*40 {nlay}*20 {nlay}*150 /
PERMZ
 {nlay}*13 {nlay}*4 {nlay}*2 {nlay}*15 /
PROPS
PVTW
 3550 1.0 3E-6 0.7 0 /
ROCK
 3550 4E-6 /
SWOF
 0.16  0       1     50
 0.30  0.02    0.6   8
 0.50  0.12    0.2   3
 0.70  0.35    0.02  1
 0.90  0.8     0.0   0.2
 1.0   1.0     0.0   0.0 /
SGOF
 0.0   0.0     1.0    0
 0.05  0.0     0.65   0
 0.2   0.05    0.35   0
 0.4   0.18    0.1    0
 0.6   0.40    0.01   0
 0.78  0.75    0.0    0
 0.84  0.90    0.0    0 /
DENSITY
 45.0 63.0 0.0702 /
PVDO
 1000  1.12  0.30
 2000  1.10  0.34
 3000  1.08  0.38
 3600  1.07  0.40 /
PVTG
 500   0.0001  5.9    0.0135
       0.0     5.88   0.0134 /
 1500  0.0006  1.85   0.0150
       0.0     1.84   0.0148 /
 2500  0.0018  1.05   0.0170
       0.0009  1.045  0.0167
       0.0     1.04   0.0165 /
 3000  0.0028  0.86   0.0185
       0.0014  0.855  0.0182
       0.0     0.85   0.0180 /
 3600  0.0042  0.72   0.0210
       0.0021  0.715  0.0205
       0.0     0.71   0.0200 /
/
SOLUTION
EQUIL
 7500 3550 8600 0 8590 0 1 1 0 /
RVVD
 7400 0.0030
 8600 0.0030 /
SUMMARY
FGPR
FOPR
SCHEDULE
WELSPECS
 'PROD' 'G1' 7 7 7530 'GAS' /{wspec_inj}
/
COMPDAT
 'PROD' 7 7 3 4 'OPEN' 1* 1* 0.5 /{compdat_inj}
/
WCONPROD
 'PROD' 'OPEN' 'GRAT' 2* 30000 2* 500 /
/{inje}
TSTEP
 {tsteps} /{shut_and_blowdown}
END
"""


def spe3like_case(**kw) -> EclipseCase:
    return load_case_string(spe3like_deck(**kw))


def norne_like_deck(nx=46, ny=112, nz=22, seed=7, tsteps="5 10 3*30") -> str:
    """Norne-class synthetic: a faulted, partially-inactive corner-point
    field at the real Norne's grid dimensions (46x112x22, ~44k active
    after ACTNUM carving — the reference's Norne-init regression target,
    compareECLFiles.cmake:141-146; the real deck is licensed data). Two
    stair-step fault planes (one sealed by MULTFLT), a dipping horizon
    with a dome, lognormal layered permeability, water-oil-gas with
    DISGAS, 8 producers + 4 water injectors."""
    import numpy as np

    rng = np.random.RandomState(seed)
    dx = dy = 100.0          # meters (METRIC)
    dzl = rng.uniform(3.0, 12.0, nz)
    cum = np.concatenate([[0.0], np.cumsum(dzl)])

    # dome-shaped top surface + regional dip along y
    xe = np.arange(nx + 1) * dx
    ye = np.arange(ny + 1) * dy
    X, Y = np.meshgrid(xe, ye)              # (ny+1, nx+1)
    top = (2600.0 + 0.03 * Y
           - 120.0 * np.exp(-(((X - 2300.0) / 1500.0) ** 2
                              + ((Y - 5600.0) / 3000.0) ** 2)))
    # two fault planes along x = const: the throw is PER-CELL so the two
    # sides of the shared pillar disagree — a true stair-step fault (a
    # pillar-based offset would only ramp the cells continuously)
    f1, f2 = nx // 3, 2 * nx // 3
    cell_throw = np.zeros(nx)
    cell_throw[f1:] += 18.0
    cell_throw[f2:] += 25.0
    zpil = top                               # pillar-top depth

    coord = np.empty((ny + 1, nx + 1, 6))
    coord[:, :, 0] = X
    coord[:, :, 1] = Y
    coord[:, :, 2] = zpil
    coord[:, :, 3] = X
    coord[:, :, 4] = Y
    coord[:, :, 5] = zpil + cum[-1] + cell_throw.max()

    # zcorn: layers parallel to the (faulted) top; per-cell corner depths
    # follow the pillar tops so the fault offset is a true stair-step
    zc = np.empty((nz, 2, ny, 2, nx, 2))
    for k in range(nz):
        for kc in range(2):
            zlayer = zpil + cum[k + kc]      # (ny+1, nx+1)
            zc[k, kc, :, 0, :, 0] = zlayer[:-1, :-1] + cell_throw
            zc[k, kc, :, 0, :, 1] = zlayer[:-1, 1:] + cell_throw
            zc[k, kc, :, 1, :, 0] = zlayer[1:, :-1] + cell_throw
            zc[k, kc, :, 1, :, 1] = zlayer[1:, 1:] + cell_throw

    n = nx * ny * nz
    # ACTNUM carving: an erosional edge (inactive ring) + random holes
    act = np.ones((nz, ny, nx), dtype=int)
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    rim = (((ii - nx / 2) / (nx / 2.2)) ** 2
           + ((jj - ny / 2) / (ny / 2.05)) ** 2) > 1.0
    act[:, rim] = 0
    holes = rng.rand(nz, ny, nx) < 0.04
    act[holes] = 0

    perm = np.empty((nz, ny, nx))
    poro = np.empty((nz, ny, nx))
    for k in range(nz):
        mu = rng.uniform(2.0, 6.0)
        perm[k] = np.exp(rng.normal(mu, 1.0, (ny, nx)))
        poro[k] = np.clip(rng.normal(0.24, 0.04), 0.05, 0.35)

    def arr(a, fmt="{:.6g}"):
        a = np.asarray(a).ravel()
        return "\n ".join(" ".join(fmt.format(v) for v in a[i:i + 10])
                          for i in range(0, len(a), 10))

    # wells on active columns: producers near the dome crest, injectors
    # on the flanks
    def find_col(i0, j0):
        for r in range(0, 30):
            for di in range(-r, r + 1):
                for dj in range(-r, r + 1):
                    i, j = i0 + di, j0 + dj
                    if 0 <= i < nx and 0 <= j < ny and act[:, j, i].sum() > 8:
                        return i, j
        raise RuntimeError("no active column")

    prod_pos = [find_col(nx // 2 + di, ny // 2 + dj)
                for (di, dj) in ((-8, -20), (4, -12), (-2, 0), (8, 8),
                                 (-10, 14), (3, 22), (-5, 30), (9, -28))]
    inj_pos = [find_col(i, j) for (i, j) in
               ((6, ny // 4), (nx - 7, ny // 4), (6, 3 * ny // 4),
                (nx - 7, 3 * ny // 4))]
    wells, comps, wcon = [], [], []
    for w, (i, j) in enumerate(prod_pos):
        wells.append(f" 'P{w+1}' 'PROD' {i+1} {j+1} 2650 'OIL' /")
        comps.append(f" 'P{w+1}' {i+1} {j+1} 1 8 'OPEN' 1* 1* 0.2 /")
        wcon.append(f" 'P{w+1}' 'OPEN' 'ORAT' 1200 4* 120 /")
    for w, (i, j) in enumerate(inj_pos):
        wells.append(f" 'I{w+1}' 'INJ' {i+1} {j+1} 2700 'WATER' /")
        comps.append(f" 'I{w+1}' {i+1} {j+1} 12 22 'OPEN' 1* 1* 0.2 /")

    return f"""
RUNSPEC
TITLE
  NORNE-LIKE synthetic (faulted corner-point)
DIMENS
 {nx} {ny} {nz} /
EQLDIMS
/
TABDIMS
/
OIL
GAS
WATER
DISGAS
METRIC
WELLDIMS
 12 22 1 12 /
GRID
COORD
 {arr(coord, "{:.2f}")} /
ZCORN
 {arr(zc, "{:.2f}")} /
ACTNUM
 {arr(act.ravel(), "{:d}")} /
PORO
 {arr(poro)} /
PERMX
 {arr(perm)} /
PERMY
 {arr(perm)} /
PERMZ
 {arr(perm * 0.1)} /
FAULTS
 'FA' {f1} {f1} 1 {ny} 1 {nz} 'X' /
 'FB' {f2} {f2} 1 {ny} 1 {nz} 'X' /
/
MULTFLT
 'FA' 0.001 /
 'FB' 0.2 /
/
PROPS
PVTW
 270 1.03 4.0E-5 0.38 0 /
ROCK
 270 4.0E-5 /
SWOF
 0.15 0      0.95  2.5
 0.3  0.008  0.6   0.9
 0.5  0.09   0.2   0.35
 0.7  0.3    0.03  0.15
 0.9  0.7    0.0   0.05
 1.0  1.0    0.0   0.0 /
SGOF
 0    0     1     0
 0.05 0     0.75  0.05
 0.2  0.09  0.35  0.15
 0.4  0.3   0.1   0.3
 0.6  0.6   0.01  0.45
 0.85 0.92  0.0   0.6 /
DENSITY
 860 1025 1.02 /
PVDG
 30   0.043 0.014
 100  0.012 0.016
 200  0.0058 0.019
 300  0.0038 0.023
 400  0.0028 0.027 /
PVTO
 30   30   1.12 1.1 /
 60   75   1.18 0.9 /
 90   120  1.24 0.75 /
 120  165  1.30 0.62
      250  1.28 0.68 /
/
SOLUTION
EQUIL
 2650 270 2850 0 2500 0 1 0 0 /
RSVD
 2400 90
 2900 90 /
SUMMARY
FOPR
FPR
SCHEDULE
WELSPECS
{chr(10).join(wells)}
/
COMPDAT
{chr(10).join(comps)}
/
WCONPROD
{chr(10).join(wcon)}
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 3000 1* 420 /
 'I2' 'WATER' 'OPEN' 'RATE' 3000 1* 420 /
 'I3' 'WATER' 'OPEN' 'RATE' 3000 1* 420 /
 'I4' 'WATER' 'OPEN' 'RATE' 3000 1* 420 /
/
TSTEP
 {tsteps} /
END
"""


def norne_like_case(**kw) -> EclipseCase:
    return load_case_string(norne_like_deck(**kw))
