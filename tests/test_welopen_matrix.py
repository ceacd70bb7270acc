"""The reference's full WELOPEN/COMPLUMP/WLIST matrix, ported case by
case (clean-room expected frames) through the engine's deck pipeline.

Source corpus: /root/reference/tests/test_welopen.py —
WELOPEN_CASES (:8-921), test_welopen_wlist (:931-1127),
test_welopen_complump (:1179-1478).  Every reference case id appears
below with the same id.  The two direct-call groups
(test_welopen_complump_direct :1481-1554, test_applywelopen
:1557-1672) exercise the reference's INTERNAL pandas functions with
frames that cannot be produced by deck parsing (partially-zero
coordinates bypassing expand_welopen_defaults, un-unrolled K1!=K2
COMPLUMP rows, missing KEYWORD_IDX columns); this engine's single
`df()` pipeline has no equivalent bypass, so those invariants are
unreachable states here rather than portable semantics — the
deck-reachable behaviors they guard (whole-well rewrite, lump
expansion, wlist expansion) are all pinned by the deck-level cases in
this file.

Documented divergences from the reference (asserted as such):
- `complump_defaults`: the reference REFUSES defaulted COMPLUMP
  coordinates; this engine implements the simulator's wildcard
  semantics as a documented extension (modules/compdat.py:69-78), so
  the case asserts the extension's output instead of the raise.
- Error message TEXTS differ; each raise case matches this engine's
  message (semantics — which decks raise — match the reference).
"""
import datetime

import pytest

D = datetime.date


def _run(spark, deck):
    from res2df_spark.modules import compdat

    out = compdat.to_reference_shape(compdat.df(spark, deck))
    rows = out.select("DATE", "WELL", "I", "J", "K1", "K2", "OP/SH").collect()
    key = lambda t: (str(t[0]), t[1], t[2], t[3], t[4], t[6])  # noqa: E731
    return sorted(
        ((r["DATE"], r["WELL"], r["I"], r["J"], r["K1"], r["K2"], r["OP/SH"])
         for r in rows),
        key=key,
    ), key


WELOPEN_CASES = [
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="welopen-shut",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 5* /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="welopen-shut-explicit-defaults",
    ),
    # zero for every item INCLUDING C1/C2: with no COMPLUMP in the deck
    # the reference never validates the completion numbers (the
    # expansion early-returns) and the all-defaulted coordinates make
    # this a whole-well action
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 0 0 0 0 0 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="zero-values",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' -1 -1 -1 -1 -1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="negative-values",
    ),
    # STOP with items 3-7 defaulted applies to the WELL, leaving the
    # connections OPEN
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'STOP' /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "OPEN")],
        id="welopen-stop-on-well",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP2' 1 1 1 1 'OPEN' /
 'OP3' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'STOP' 1* 1* 1* /
 'OP2' 'STOP' 0  0  0  /
 'OP3' 'STOP' -1 -1 -1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "OP2", 1, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "OP3", 1, 1, 1, 1, "OPEN")],
        id="welopen-stop-on-well-explicit-defaults",
    ),
    # SHUT then STOP on the well: STOP re-OPENS the connections
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' /
/
DATES
 1 FEB 2000 /
/
WELOPEN
 'OP1' 'STOP' /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 2, 1), "OP1", 1, 1, 1, 1, "OPEN")],
        id="welopen-shut-then-stop-on-well",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 1 1 1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="welopen-shut-on-connection",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP1' 2 1 1 1 'OPEN' /
 'OP1' 1 1 2 2 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 0 1 1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 2, 2, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP1", 2, 1, 1, 1, "SHUT")],
        id="welopen-with-defaulted-I-coordinate",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 2 'OPEN' /
 'OP2' 1 1 1 1 'OPEN' /
 'OP2' 2 2 2 2 'OPEN' /
 'OP3' 1 1 1 1 'OPEN' /
 'OP3' 2 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 2*    1 /
 'OP2' 'SHUT' 0  1  0 /
 'OP3' 'SHUT' 1 -1 -1 /
/
""",
        [(D(2000, 1, 1), "OP2", 2, 2, 2, 2, "OPEN"),
         (D(2000, 1, 1), "OP3", 2, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 2, 2, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP2", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP3", 1, 1, 1, 1, "SHUT")],
        id="welopen-combinations-of-defaulted-coordinates",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1'  1 1 1 1 'OPEN' /
 'OP2'  1 1 2 2 'OPEN' /
 'PROD' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP*'  'SHUT' 1 1 0 /
/
""",
        [(D(2000, 1, 1), "PROD", 1, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP2", 1, 1, 2, 2, "SHUT")],
        id="both-wildcard-wellname-and-defaulted-coordinates",
    ),
    # WELOPEN only acts on connections defined at-or-before its date
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1'  1 1 1 1 'OPEN' /
/
DATES
 1 FEB 2000 /
/
COMPDAT
 'OP1'  2 1 1 1 'OPEN' /
/
WELOPEN
 'OP1'  'SHUT' 0 1 1 /
/
DATES
 1 MAR 2000 /
/
COMPDAT
 'OP1'  3 1 1 1 'OPEN' /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "OPEN"),
         (D(2000, 2, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 2, 1), "OP1", 2, 1, 1, 1, "SHUT"),
         (D(2000, 3, 1), "OP1", 3, 1, 1, 1, "OPEN")],
        id="welopen-defaults-compdat-changing-with-time",
    ),
    pytest.param(
        """
START
 1 JAN 2000 /
/
COMPDAT
 'OP1'  1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1'  'SHUT' 0 1 1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="welopen-defaults-start",
    ),
    pytest.param(
        """
COMPDAT
 'OP1'  1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1'  'SHUT' 0 1 1 /
/
""",
        [(None, "OP1", 1, 1, 1, 1, "SHUT")],
        id="welopen-defaults-no-dates",
    ),
    pytest.param(
        """
COMPDAT
 'OP1'  1 1 1 1 'OPEN' /
/
DATES
 1 JAN 2000 /
/
WELOPEN
 'OP1'  'SHUT' 0 1 1 /
/
""",
        [(None, "OP1", 1, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="welopen-defaults-no-start-date",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1'  1 1 1 2 'OPEN' /
/
WELOPEN
 'OP1'  'SHUT' 0 0 3 /
/
""",
        None,
        id="no-connections-matching-welopen-defaults",
        marks=pytest.mark.xfail(
            raises=ValueError,
            match="not acting on any existing connection",
        ),
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1'  1 1 1 2 'OPEN' /
/
COMPLUMP
 'OP1' 1 1 1 1 1 /
 'OP1' 1 1 1 1 2 /
/
WELOPEN
 'OP1'  'SHUT' 3* 1 0 /
/
""",
        None,
        id="defaulted-complump-in-welopen-not-supported",
        marks=pytest.mark.xfail(
            raises=ValueError,
            match="Zeros for C1/C2 is not implemented",
        ),
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'STOP' 1 1 1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="welopen-stop-on-connection-is-shut",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'POPN' 1 1 1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "OPEN")],
        id="welopen-popn-on-connection-is-open",
    ),
    # completion numbers used while the deck has no COMPLUMP at all,
    # with explicit coordinates: unparseable in the reference
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 1 1 1 1 1 /
/
""",
        None,
        id="complump_missing",
        marks=pytest.mark.xfail(raises=ValueError),
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP2' 'SHUT' 1 1 1 /
/
""",
        None,
        id="operating-on-unknown-well",
        marks=pytest.mark.xfail(raises=ValueError),
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 3 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 1 1 2  /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 3, 3, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 2, 2, "SHUT")],
        id="j-slicing",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP2' 1 1 1 1 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 0 0 0 /
 'OP2' 'OPEN' 0 0 0 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP2", 1, 1, 1, 1, "OPEN")],
        id="multiple-connnections-same-cell",
    ),
    # TSTEP stepping: 1 MAY + 1 day = 2 MAY; + (2+3) days = 7 MAY
    pytest.param(
        """
DATES
 1 MAY 2001 /
/
COMPDAT
 'OP1' 33 110 31 31 'OPEN'  /
/
WELOPEN
 'OP1' 'SHUT' 0 0 0 /
/
TSTEP
 1 /
COMPDAT
 'OP1' 34 111 32 32 'OPEN' /
/
TSTEP
 2 3 /
COMPDAT
 'OP1' 35 111 33 33 'SHUT' /
/
""",
        [(D(2001, 5, 1), "OP1", 33, 110, 31, 31, "SHUT"),
         (D(2001, 5, 2), "OP1", 34, 111, 32, 32, "OPEN"),
         (D(2001, 5, 7), "OP1", 35, 111, 33, 33, "SHUT")],
        id="multiple-time-steps",
    ),
    pytest.param(
        """
DATES
 1 MAY 2001 /
/
COMPDAT
 'OP1' 33 110 31 31 'OPEN'  /
/
WELOPEN
 'OP1' 'OPEN' 0 0 0/
/
TSTEP
 1 /
COMPDAT
 'OP1' 34 111 32 32 'OPEN' /
/
TSTEP
 2 3 /
COMPDAT
 'OP1' 35 111 33 33 'SHUT' /
/
""",
        [(D(2001, 5, 1), "OP1", 33, 110, 31, 31, "OPEN"),
         (D(2001, 5, 2), "OP1", 34, 111, 32, 32, "OPEN"),
         (D(2001, 5, 7), "OP1", 35, 111, 33, 33, "SHUT")],
        id="more-time-steps",
    ),
    pytest.param(
        """
DATES
 1 MAY 2001 /
/
COMPDAT
 'OP1' 33 110 31 31 'OPEN'  /
 'OP2' 66 110 31 31 'OPEN'  /
/
WELOPEN
 'OP2' 'OPEN' 0 0 0/
/
DATES
 2 MAY 2001 /
/
COMPDAT
 'OP1' 34 111 32 32 'OPEN' /
/
WELOPEN
 'OP1' 'SHUT' 0 0 0 /
/
DATES
 3 MAY 2001 /
/
WELOPEN
 'OP1' 'OPEN' 0 0 0 /
 'OP2' 'SHUT' 0 0 0 /
/
""",
        [(D(2001, 5, 1), "OP1", 33, 110, 31, 31, "OPEN"),
         (D(2001, 5, 1), "OP2", 66, 110, 31, 31, "OPEN"),
         (D(2001, 5, 2), "OP1", 33, 110, 31, 31, "SHUT"),
         (D(2001, 5, 2), "OP1", 34, 111, 32, 32, "SHUT"),
         (D(2001, 5, 3), "OP1", 33, 110, 31, 31, "OPEN"),
         (D(2001, 5, 3), "OP1", 34, 111, 32, 32, "OPEN"),
         (D(2001, 5, 3), "OP2", 66, 110, 31, 31, "SHUT")],
        id="date-stepping",
    ),
    pytest.param(
        """
DATES
 1 MAY 2001 /
/
COMPDAT
 'OP1' 33 110 1 2 'OPEN'  /
/
WELOPEN
 'OP1' 'SHUT' 33 110 1 /
/
DATES
 2 MAY 2001 /
/
WELOPEN
 'OP1' 'SHUT' 33 110 2 /
/
DATES
 3 MAY 2001 /
/
WELOPEN
 'OP1' 'OPEN' 0 0 0 /
/
""",
        [(D(2001, 5, 1), "OP1", 33, 110, 2, 2, "OPEN"),
         (D(2001, 5, 1), "OP1", 33, 110, 1, 1, "SHUT"),
         (D(2001, 5, 2), "OP1", 33, 110, 2, 2, "SHUT"),
         (D(2001, 5, 3), "OP1", 33, 110, 1, 1, "OPEN"),
         (D(2001, 5, 3), "OP1", 33, 110, 2, 2, "OPEN")],
        id="more-date-stepping",
    ),
    # COMPDAT after WELOPEN at the same date wins (deck order)
    pytest.param(
        """
DATES
 1 MAY 2001 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN'  /
/
DATES
 2 MAY 2001 /
/
WELOPEN
 'OP1' 'SHUT' /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN'  /
/
""",
        [(D(2001, 5, 1), "OP1", 1, 1, 1, 1, "OPEN"),
         (D(2001, 5, 2), "OP1", 1, 1, 1, 1, "OPEN")],
        id="test-xx1",
    ),
    pytest.param(
        """
DATES
 1 MAY 2001 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN'  /
/
WELOPEN
 'OP1' 'OPEN' 0 0 0 /
 'OP1' 'SHUT' 0 0 0 /
/
""",
        [(D(2001, 5, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="self-overwriting-records",
    ),
    pytest.param(
        """
DATES
 1 MAY 2001 /
/
COMPDAT
 'OP1' 1 1 1 2 'SHUT'  /
/
WELOPEN
 'OP1' 'OPEN' 0 0 0 /
 'OP1' 'SHUT' 1 1 1 /
/
""",
        [(D(2001, 5, 1), "OP1", 1, 1, 2, 2, "OPEN"),
         (D(2001, 5, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="open-and-shut-slice-multiple-welopen",
    ),
    pytest.param(
        """
DATES
  1 JAN 2000 /
/
COMPDAT
 'B_1H' 1 1 1 1 'OPEN' /
 'B_2H' 2 2 2 2 'OPEN' /
 'WI1' 3 3 3 3 'OPEN' /
/
WELOPEN
 'B*H' 'SHUT' 0 0 0 /
/
""",
        [(D(2000, 1, 1), "WI1", 3, 3, 3, 3, "OPEN"),
         (D(2000, 1, 1), "B_1H", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "B_2H", 2, 2, 2, 2, "SHUT")],
        id="multiple-wells-via-wildcard",
    ),
    pytest.param(
        """
DATES
  1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP2' 2 2 2 2 'OPEN' /
 'WI1' 3 3 3 3 'OPEN' /
/
WELOPEN
 'OP*' 'SHUT' 0 0 0 /
/
DATES
  1 FEB 2000 /
/
COMPDAT
  'OP3' 4 4 4 4 'OPEN' /
/
""",
        [(D(2000, 1, 1), "WI1", 3, 3, 3, 3, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP2", 2, 2, 2, 2, "SHUT"),
         (D(2000, 2, 1), "OP3", 4, 4, 4, 4, "OPEN")],
        id="wildcards-do-not-apply-to-future-wells",
    ),
]


@pytest.mark.parametrize("deck,expected", WELOPEN_CASES)
def test_welopen_matrix(spark, deck, expected):
    got, key = _run(spark, deck)
    assert got == sorted(expected, key=key)


WLIST_CASES = [
    pytest.param(
        """
DATES
  1 JAN 2000 /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
/
WLIST
  '*OP' NEW OP1 /
/
WELOPEN
  '*OP' 'SHUT' 0 0 0 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="wlist-one-well",
    ),
    pytest.param(
        """
DATES
  1 JAN 2000 /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
/
WLIST
  '*OP' NEW OP2 /
/
WELOPEN
  '*OP' 'SHUT' 0 0 0 /
/
""",
        None,
        id="wlist-for-different-well",
        marks=pytest.mark.xfail(
            raises=ValueError,
            match="not acting on any existing connection",
        ),
    ),
    pytest.param(
        """
DATES
  1 JAN 2000 /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
  'OP2' 1 1 1 1 'OPEN' /
/
WLIST
  '*OP' NEW OP1 OP2/
/
WELOPEN
  '*OP' 'SHUT' 0 0 0 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP2", 1, 1, 1, 1, "SHUT")],
        id="wlist-two-wells",
    ),
    # "In res2df, the WELOPEN is allowed to be before WLIST": list
    # visibility is by DATE (end-of-date state), not deck position
    pytest.param(
        """
DATES
  1 JAN 2000 /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
  'OP2' 1 1 1 1 'OPEN' /
  'IN1' 2 1 1 1 'OPEN' /
  'IN2' 2 1 1 1 'OPEN' /
/
WELOPEN
  '*OP' 'SHUT' 0 0 0 /
/
WLIST
  '*OP' NEW OP1 OP2 /
  '*IN' NEW IN1 IN2 /
/
DATES
  2 JAN 2000 /
/
WELOPEN
  '*IN' 'SHUT' 0 0 0 /
/
""",
        [(D(2000, 1, 1), "IN1", 2, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "IN2", 2, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP2", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 2), "IN1", 2, 1, 1, 1, "SHUT"),
         (D(2000, 1, 2), "IN2", 2, 1, 1, 1, "SHUT")],
        id="wlist-four-wells-two-lists",
    ),
    pytest.param(
        """
DATES
  1 JAN 2000 /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
/
WELOPEN
  '*OP' 'SHUT' 0 0 0 /
/
DATES
  2 JAN 2000/
/
WLIST
  '*OP' NEW OP2 /
/
""",
        None,
        id="futurewlist",
        marks=pytest.mark.xfail(
            raises=ValueError, match="Well list OP not defined at 2000-01-01"
        ),
    ),
    pytest.param(
        """
DATES
  1 JAN 2000 /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
/
WLIST
  '*OP' NEW OP1 /
/
WELOPEN
  '*OPS' 'SHUT' 0 0 0 /
/
""",
        None,
        id="wlist-nonexisting-name",
        marks=pytest.mark.xfail(
            raises=ValueError, match="Well list OPS not defined at 2000-01-01"
        ),
    ),
    pytest.param(
        """
DATES
  1 JAN 1999/
/
WLIST
  '*OP' NEW OP9 /
/
DATES
  1 JAN 2000 /
/
COMPDAT
  'OP1' 1 1 1 1 'OPEN' /
/
WLIST
  '*OP' NEW OP1 /
/
WELOPEN
  '*OP' 'SHUT' 0 0 0 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="redefined_wlist",
    ),
]


@pytest.mark.parametrize("deck,expected", WLIST_CASES)
def test_welopen_wlist_matrix(spark, deck, expected):
    got, key = _run(spark, deck)
    assert got == sorted(expected, key=key)


COMPLUMP_CASES = [
    pytest.param(
        """
DATES
    1 JAN 2000 /
/
COMPDAT
    'OP1' 1 1 1 1 'OPEN' /
/
COMPLUMP
    'OP1' 1 1 1 1 1 /
/
WELOPEN
    'OP1' 'SHUT' 3* 1 1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="complump-simplest",
    ),
    pytest.param(
        """
DATES
    1 JAN 2000 /
/
COMPDAT
    'OP1' 1 1 1 3 'OPEN' /
/
COMPLUMP
    'OP1' 1 1 1 2 1 /
/
DATES
    1 FEB 2000 /
/
WELOPEN
    'OP1' 'SHUT' 3* 1 1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 2, 2, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 3, 3, "OPEN"),
         (D(2000, 2, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 2, 1), "OP1", 1, 1, 2, 2, "SHUT")],
        id="complump-k-range-multiple-dates",
    ),
    pytest.param(
        """
DATES
    1 JAN 2000 /
/
COMPDAT
    'OP1' 1 1 1 5 'OPEN' /
/
COMPLUMP
    'OP1' 1 1 1 2 1 /
    'OP1' 1 1 3 4 2 /
    'OP1' 1 1 5 5 3 /
/
WELOPEN
    'OP1' 'SHUT' 3* 1 2 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 5, 5, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP1", 1, 1, 2, 2, "SHUT"),
         (D(2000, 1, 1), "OP1", 1, 1, 3, 3, "SHUT"),
         (D(2000, 1, 1), "OP1", 1, 1, 4, 4, "SHUT")],
        id="complump-range-in-welopen",
    ),
    # DOCUMENTED DIVERGENCE: the reference xfails this deck with
    # "Defaulted COMPLUMP coordinates are not supported in res2df";
    # this engine implements the wanted behavior the reference's own
    # expected-frame sketches (defaulted coordinate = wildcard,
    # modules/compdat.py:69-78), so lump 1 covers every connection
    # with I==1 and the WELOPEN shuts exactly those
    pytest.param(
        """
DATES
    1 JAN 2000 /
/
COMPDAT
    'OP1' 1 1 1 2 'OPEN' /
    'OP1' 2 1 1 1 'OPEN' /
/
COMPLUMP
    'OP1' 1 0 0 0 1 /
/
WELOPEN
    'OP1' 'SHUT' 3* 1 1 /
/
""",
        [(D(2000, 1, 1), "OP1", 2, 1, 1, 1, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT"),
         (D(2000, 1, 1), "OP1", 1, 1, 2, 2, "SHUT")],
        id="complump_defaults",
    ),
    pytest.param(
        """
COMPDAT
    'OP1' 1 1 1 2 'OPEN' /
/
COMPLUMP
    'OP1' 1 1 2 1 1 /
/
WELOPEN
    'OP1' 'SHUT' 3* 1 1 /
/
""",
        None,
        id="complump_K2<K1",
        marks=pytest.mark.xfail(
            raises=ValueError, match="K2 must be equal to or greater than K1"
        ),
    ),
    pytest.param(
        """
COMPDAT
    'OP1' 1 1 1 1 'OPEN' /
/
COMPLUMP
    'OP1' 1 1 1 1 1 /
/
WELOPEN
    'OP1' 'SHUT' 3* 1 /
/
""",
        None,
        id="complump_missingcompletion_number",
        marks=pytest.mark.xfail(
            raises=ValueError,
            match="Both or none of the completion numbers",
        ),
    ),
    pytest.param(
        """
COMPDAT
    'OP1' 1 1 1 2 'OPEN' /
/
COMPLUMP
    'OP1' 1 1 1 1 1 /
    'OP1' 1 1 2 2 2 /
/
WELOPEN
    'OP1' 'SHUT' 3* 2 1 /
/
""",
        None,
        id="welopen_C2<C1",
        marks=pytest.mark.xfail(
            raises=ValueError, match="C2 must be equal or greater than C1"
        ),
    ),
    pytest.param(
        """
COMPDAT
    'OP1' 1 1 1 1 'OPEN' /
/
COMPLUMP
    'OP1' -1 -1 -1 -1 1 /
/
WELOPEN
    'OP1' 'SHUT' 3* 1 1 /
/
""",
        None,
        id="complump_negativevalues",
        marks=pytest.mark.xfail(
            raises=ValueError,
            match="Negative values for COMPLUMP coordinates",
        ),
    ),
    pytest.param(
        """
COMPDAT
    'OP1' 1 1 1 1 'OPEN' /
/
COMPLUMP
    'OP1' 1 1 1 1 /
/
WELOPEN
    'OP1' 'SHUT' 3* -1 -1 /
/
""",
        None,
        id="welopen_negative_completionvalues",
        marks=pytest.mark.xfail(
            raises=ValueError,
            match="Negative values for C1/C2",
        ),
    ),
    pytest.param(
        """
COMPDAT
    'OP1' 1 1 1 1 'OPEN' /
/
COMPLUMP
    'OP1' 1 1 1 1 /
/
WELOPEN
    'OP1' 'SHUT' 3* 0 0 /
/
""",
        None,
        id="welopen_default_complumpvalues",
        marks=pytest.mark.xfail(
            raises=ValueError,
            match="Zeros for C1/C2 is not implemented",
        ),
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
/
COMPLUMP
 'OP1' 1 1 1 1 1 /
/
WELOPEN
 'OP1' 'SHUT' 1 1 1 1 1 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="indices_and_complump_combined",
    ),
    pytest.param(
        """
DATES
 1 JAN 2000 /
/
COMPDAT
 'OP1' 1 1 1 1 'OPEN' /
 'OP1' 1 1 2 2 'OPEN' /
/
COMPLUMP
 'OP1' 1 1 1 1 1 /
 'OP1' 1 1 2 2 2 /
/
WELOPEN
 'OP1' 'SHUT' 1 1 1 1 1 /
 'OP1' 'SHUT' 1 1 1 2 2 /
/
""",
        [(D(2000, 1, 1), "OP1", 1, 1, 2, 2, "OPEN"),
         (D(2000, 1, 1), "OP1", 1, 1, 1, 1, "SHUT")],
        id="indices_and_complump_combined_2",
    ),
]


@pytest.mark.parametrize("deck,expected", COMPLUMP_CASES)
def test_welopen_complump_matrix(spark, deck, expected):
    got, key = _run(spark, deck)
    assert got == sorted(expected, key=key)
