"""The reference's zonemap lyr corpus, ported
(/root/reference/tests/test_zonemap.py:111-270): the lyr format matrix
(quoted/unquoted names, range spellings with spaces around '-', span
entries, hex/named/absent colors, '--' and '#' comment lines) through
``parse_zonemap``.  The merge_zones frame cases are the J4 broadcast
zone join, pinned by the wellcompletiondata and grid-family tests;
the reference's inferdims module (opm dimension-string injection) has
no analogue here because region counts fall out of record structure
directly (see tests/test_satfunc_equil_corpus.py's TABDIMS/NTEQUL
cases)."""
from res2df_spark.sources.aux import parse_zonemap


def _map(text):
    return {k: z for z, k in parse_zonemap(text)}


def test_lyrlist_format():
    zm = _map("""
-- Some text
'ZoneA'          1 -     5  #FFE5F7
'ZoneB'          6-     10  --no color
'ZoneC'          11-15    blue
'ZoneD'         3          #fbb
'ZoneE'         19     -20
'ZoneF'         21-22  CORNFLOWERBLUE
""")
    assert zm[1] == "ZoneA" and zm[5] == "ZoneA"
    assert zm[6] == "ZoneB" and zm[10] == "ZoneB"
    assert zm[11] == "ZoneC" and zm[15] == "ZoneC"
    # span entry continues after the previous zone's end
    assert zm[16] == "ZoneD"
    assert zm[20] == "ZoneE"
    assert zm[21] == "ZoneF" and zm[22] == "ZoneF"


def test_convert_lyrlist_to_zonemap():
    zm = _map("""
-- Some text
'ZoneA'          1 -     5
'ZoneB'         5
'ZoneC'         11-20
""")
    assert len(zm) == 20
    assert zm[10] == "ZoneB"
    assert zm[20] == "ZoneC"


def test_nonstandardzones():
    zm = _map("""
-- foo
# foo
'Eiriksson'  1-10
 Raude    20-30

# Difficult quote parsing above, might not run in ResInsight.
""")
    assert 0 not in zm
    assert zm[1] == "Eiriksson" and zm[10] == "Eiriksson"
    assert 11 not in zm and 19 not in zm
    assert zm[20] == "Raude" and zm[30] == "Raude"
    assert len(zm) == 21


def test_inverted_range_raises():
    import pytest

    with pytest.raises(ValueError):
        parse_zonemap("'Zone' 5-1\n")


def test_zonemap_df(spark):
    from res2df_spark.sources.aux import zonemap_df

    out = zonemap_df(spark, "'A' 1-2\n'B' 3-3\n")
    assert sorted(tuple(r) for r in out.collect()) == [
        (1, "A"), (2, "A"), (3, "B")
    ]
