"""The reference's common-utility test corpus, ported
(/root/reference/tests/test_common.py, 449 lines): the well-template
matching matrix, Eclipse run-length compression, and
datetime→DATES-record rendering.  The frame-level df2res /
generic_deck_table cases run through the per-keyword writers here
(tests/test_roundtrip.py, test_pvt_corpus.py); handle_wanted_keywords
is pinned in tests/test_round10_fixes.py.
"""
import datetime

import pytest

from res2df_spark.functions.strings import (
    datetime_to_ecldate,
    get_wells_matching_template,
    runlength_compress,
)


@pytest.mark.parametrize(
    "template, wells, output",
    [
        ("OP*", ["OP1", "OP2", "WI"], ["OP1", "OP2"]),
        ("B*H", ["B_1H", "BH", "B_23H", "WI"], ["B_1H", "BH", "B_23H"]),
        ("B_1H*", ["B_1H", "B_1HT2", "OB_1H"], ["B_1H", "B_1HT2"]),
        ("\\*P1", ["OP1", "WI"], ["OP1"]),
        ("B_?H", ["B_1H", "B_12H"], ["B_1H"]),
        ("\\????", ["B_1H", "D_2H", "OP1"], ["B_1H", "D_2H"]),
        pytest.param(
            "*P1",
            ["OP1"],
            None,
            marks=pytest.mark.xfail(
                raises=ValueError,
                match="Well template not allowed to start with a "
                      "wildcard character",
            ),
        ),
        pytest.param(
            "????",
            ["B_1H"],
            None,
            marks=pytest.mark.xfail(
                raises=ValueError,
                match="Well template not allowed to start with a "
                      "wildcard character",
            ),
        ),
    ],
)
def test_well_matching_template(template, wells, output):
    assert get_wells_matching_template(template, wells) == output


def test_eclcompress():
    assert not runlength_compress("")
    assert not runlength_compress(" ")
    assert runlength_compress("1 2") == "1  2"
    assert runlength_compress("1 2", sep=" ") == "1 2"
    assert runlength_compress("1 2", sep="   ") == "1   2"
    assert runlength_compress("1") == "1"
    assert runlength_compress("1 1") == "2*1"
    assert runlength_compress("1 1 1") == "3*1"
    assert runlength_compress("1     1 1") == "3*1"
    assert runlength_compress("1  \n  1 1 2") == "3*1  2"


@pytest.mark.parametrize(
    "somedate, expected",
    [
        ("2021-02-01", "1 'FEB' 2021"),
        ("2021-02-01 01:02:03", "1 'FEB' 2021 01:02:03"),
        (datetime.date(2021, 2, 1), "1 'FEB' 2021"),
        (datetime.datetime(2021, 2, 1, 0, 0, 0), "1 'FEB' 2021"),
        ("2021-02-01 000000", "1 'FEB' 2021"),
        (datetime.datetime(2021, 2, 1, 2, 3, 4), "1 'FEB' 2021 02:03:04"),
        (datetime.datetime(2021, 2, 1, 2, 3, 4, 4433),
         "1 'FEB' 2021 02:03:04"),
        pytest.param(
            "01/02/2021",
            None,
            marks=pytest.mark.xfail(raises=ValueError, match="Use ISO"),
        ),
    ],
)
def test_datetime_to_ecldate(somedate, expected):
    assert datetime_to_ecldate(somedate) == expected
