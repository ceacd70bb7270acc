"""The reference's pillar-contacts matrix, ported
(/root/reference/tests/test_pillars.py:254-325).  The reference
fixtures carry a pre-built PILLAR column; this engine derives PILLAR
from I-J, so the fixtures supply I/J producing the same keys.  The
volume-closure cases (compute_volumes) run through pillars_df's
phase-volume step.  API cutoff defaults now match the reference's
pillars.df (0.2 / 0.7 / 0.7); the CLI keeps the reference CLI's 0.5s.
"""
import pytest


def _frame(spark, rows, with_sgas=True, with_soil=True):
    cols = ["I", "J", "SWAT", "SOIL", "SGAS", "Z"]
    data = []
    for pillar, swat, soil, sgas, z in rows:
        i, j = (int(x) for x in pillar.split("-"))
        data.append((i, j, float(swat), float(soil), float(sgas), float(z)))
    df = spark.createDataFrame(
        data, "I int, J int, SWAT double, SOIL double, SGAS double, Z double"
    )
    if not with_sgas:
        df = df.drop("SGAS")
    if not with_soil:
        df = df.drop("SOIL")
    return df


UPFLANK = [
    ("1-1", 0.2, 0.8, 0, 950),
    ("1-1", 0.7, 0.3, 0, 951),
    ("1-1", 0.9, 0.1, 0, 952),
    ("1-1", 1, 0, 0, 953),
    ("2-1", 0.2, 1, 0, 400),  # upflank oil, no water in pillar
]

GAS_IN_WATER = [
    ("1-1", 0.2, 0.02, 0.8, 940),
    ("1-1", 0.2, 0.1, 0.7, 942),
    ("1-1", 0.2, 0.4, 0.4, 945),
    ("1-1", 0.2, 0.8, 0, 950),
    ("1-1", 0.7, 0.3, 0, 951),
    ("1-1", 0.9, 0.1, 0, 952),
    ("1-1", 1, 0, 0, 953),
    # gas saturation inside water (gas injector) — must not be a GOC
    ("1-1", 0.5, 0, 0.5, 953),
    ("1-1", 1, 0, 0, 953),
]


def _contacts(spark, rows, cols=("PILLAR", "OWC"), **kwargs):
    from res2df_spark.modules.grid import pillar_contacts

    out = pillar_contacts(_frame(spark, rows), **kwargs)
    if out is None:
        return None
    return sorted(
        tuple(r[c] for c in cols if c in out.columns) for r in out.collect()
    )


def test_no_saturation_columns_gives_nothing(spark):
    from res2df_spark.modules.grid import pillar_contacts

    df = _frame(spark, [("1-1", 1, 0, 0, 1000)], with_sgas=False,
                with_soil=False)
    out = pillar_contacts(df)
    assert out is None or out.count() == 0


def test_all_water_no_contacts(spark):
    got = _contacts(spark, [("1-1", 1, 0, 0, 1000)])
    assert not got


def test_simple_owc(spark):
    got = _contacts(
        spark, [("1-1", 1, 0, 0, 1000), ("1-1", 0.5, 0.5, 0, 999)]
    )
    assert got == [("1-1", 999.0)]


def test_simple_owc_explicit_cutoff(spark):
    got = _contacts(
        spark, [("1-1", 1, 0, 0, 1000), ("1-1", 0.5, 0.5, 0, 999)],
        soilcutoff=0.2,
    )
    assert got == [("1-1", 999.0)]


def test_bump_soilcutoff_giving_no_contact(spark):
    got = _contacts(
        spark, [("1-1", 1, 0, 0, 1000), ("1-1", 0.5, 0.5, 0, 999)],
        soilcutoff=0.6,
    )
    assert not got


def test_upflank_oil_ignored(spark):
    # default cutoffs (0.2/0.7/0.7): pillar 2-1 has no water — ignored
    got = _contacts(spark, UPFLANK)
    assert got == [("1-1", 951.0)]


def test_swatcutoff_includes_upflank(spark):
    got = _contacts(spark, UPFLANK, swatcutoff=0.05)
    assert got == [("1-1", 951.0), ("2-1", 400.0)]


@pytest.mark.parametrize(
    "soilcutoff, expected",
    [(0.05, [("1-1", 952.0)]),
     (0.25, [("1-1", 951.0)]),
     (0.7, [("1-1", 950.0)]),
     (0.8, [])],
)
def test_soilcutoff_sweep(spark, soilcutoff, expected):
    got = _contacts(spark, UPFLANK, soilcutoff=soilcutoff)
    assert (got or []) == expected


@pytest.mark.parametrize(
    "sgascutoff, goc",
    [(None, 940.0),  # default 0.7
     (0.05, 945.0),
     (0.4, 942.0),
     (0.75, 940.0)],
)
def test_goc_gas_in_water(spark, sgascutoff, goc):
    """GOC needs oil in the cell (SOIL > epsilon): the injected-gas row
    at 953 never reads as a GOC."""
    kwargs = {} if sgascutoff is None else {"sgascutoff": sgascutoff}
    got = _contacts(spark, GAS_IN_WATER, cols=("PILLAR", "OWC", "GOC"),
                    **kwargs)
    assert got == [("1-1", 951.0, goc)]


def test_empty_goc_keeps_owc(spark):
    """SGAS column present but nothing above the cutoff: the reference
    returns the OWC frame alone (merge-by-emptiness, pillars.py:312),
    never an empty inner join."""
    got = _contacts(
        spark,
        [("1-1", 1, 0, 0.0, 1000), ("1-1", 0.5, 0.5, 0.0, 999)],
        sgascutoff=0.7,
    )
    assert got == [("1-1", 999.0)]


# --- compute_volumes (through pillars_df's phase-volume step) -----------------


def test_compute_volumes_three_phase(spark):
    from res2df_spark.modules.grid import pillars_df

    import datetime

    df = spark.createDataFrame(
        [(1, 1, datetime.date(2000, 1, 1), 1.0, 0.5, 0.2, 0.8, 2.0,
          1.0, 1000.0)],
        "I int, J int, DATE date, PORV double, SWAT double, SGAS double, "
        "`1OVERBO` double, `1OVERBG` double, VOLUME double, Z double",
    )
    out = pillars_df(df, stackdates=True)
    r = out.first()
    assert r["WATVOL_SUM"] == pytest.approx(0.5)
    assert r["GASVOL_SUM"] == pytest.approx(0.2)
    assert r["OILVOL_SUM"] == pytest.approx(0.3)
    assert r["OILVOLSURF_SUM"] == pytest.approx(0.3 * 0.8)
    assert r["GASVOLSURF_SUM"] == pytest.approx(0.2 * 2)


def test_compute_volumes_two_phase(spark):
    from res2df_spark.modules.grid import pillars_df

    import datetime

    df = spark.createDataFrame(
        [(1, 1, datetime.date(2000, 1, 1), 1.0, 0.9, 1.0, 1000.0)],
        "I int, J int, DATE date, PORV double, SWAT double, VOLUME double, "
        "Z double",
    )
    out = pillars_df(df, stackdates=True)
    r = out.first()
    assert r["WATVOL_SUM"] == pytest.approx(0.9)
    assert r["OILVOL_SUM"] == pytest.approx(0.1)
    assert "GASVOL_SUM" not in out.columns
