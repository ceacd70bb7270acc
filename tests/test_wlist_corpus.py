"""The reference's WLIST test corpus, ported
(/root/reference/tests/test_wlist.py, 625 lines): the list algebra —
NEW/ADD/DEL/MOV, recursive ``*LIST`` references, empty-list clears,
state repetition across dates, sorting, raises — exercised as
deck-string → snapshot cases through ``fold_wlist``.

The reference's ``expand_wlist`` normalizes an action frame into
NEW-only rows (NAME, WELLS-as-string, DATE); this engine's
``fold_wlist`` emits the equivalent state as (date, name, well)
snapshot rows — one row per member per date with WLIST changes.  The
one representational divergence: an EMPTY list has a NEW-""-row in the
reference's frame but simply no snapshot rows here (a membership table
cannot hold a memberless list); the WELOPEN consumer behaves the same
either way (no wells to act on).
"""
import datetime

import pytest

from res2df_spark.modules.wlist import fold_wlist
from res2df_spark.sources.deck import parse_deck

D = datetime.date
D1, D2 = D(2001, 5, 1), D(2001, 5, 2)


def snap(deck):
    return sorted(fold_wlist(parse_deck(deck)))


CASES = [
    pytest.param(
        "DATES\n 1 MAY 2001 /\n/\nWLIST\n '*OP' NEW OP1 /\n/\n",
        [(D1, "OP", "OP1")],
        id="new-single",
    ),
    pytest.param(
        # empty list: no membership rows (see module docstring)
        "DATES\n 1 MAY 2001 /\n/\nWLIST\n '*OP' NEW /\n/\n",
        [],
        id="new-empty",
    ),
    pytest.param(
        "DATES\n 1 MAY 2001 /\n/\nWLIST\n '*OP' NEW OP1 /\n/\n"
        "DATES\n 2 MAY 2001 /\n/\nWLIST\n '*OP' ADD OP2 OP3 /\n/\n",
        [(D1, "OP", "OP1"),
         (D2, "OP", "OP1"), (D2, "OP", "OP2"), (D2, "OP", "OP3")],
        id="add-across-dates",
    ),
    pytest.param(
        # construct a list from an existing list via ADD '*OP'
        "DATES\n 1 MAY 2001 /\n/\nWLIST\n '*OP' NEW OP1 /\n/\n"
        "DATES\n 2 MAY 2001 /\n/\n"
        "WLIST\n '*OPS' NEW /\n '*OPS' ADD '*OP' /\n/\n",
        [(D1, "OP", "OP1"),
         (D2, "OP", "OP1"), (D2, "OPS", "OP1")],
        id="add-from-list",
    ),
    pytest.param(
        # well names are sorted within a list
        "DATES\n 1 MAY 2001 /\n/\nWLIST\n '*OP' NEW OP2 OP1 /\n/\n",
        [(D1, "OP", "OP1"), (D1, "OP", "OP2")],
        id="new-sorts-wells",
    ),
    pytest.param(
        # NEW then ADD on the same date collapse into one state
        "DATES\n 1 MAY 2001 /\n/\n"
        "WLIST\n '*OP' NEW OP1 /\n '*OP' ADD OP2 /\n/\n",
        [(D1, "OP", "OP1"), (D1, "OP", "OP2")],
        id="new-add-same-date",
    ),
    pytest.param(
        # existing lists repeat on subsequent dates with changes
        "DATES\n 1 MAY 2001 /\n/\nWLIST\n '*OPA' NEW OP1 /\n/\n"
        "DATES\n 2 MAY 2001 /\n/\nWLIST\n '*OPB' NEW OP2 /\n/\n",
        [(D1, "OPA", "OP1"),
         (D2, "OPA", "OP1"), (D2, "OPB", "OP2")],
        id="state-repeats-on-later-dates",
    ),
    pytest.param(
        # a subsequent empty NEW clears the list (same date)
        "DATES\n 1 MAY 2001 /\n/\n"
        "WLIST\n '*OP' NEW OP1 /\n '*OP' NEW /\n/\n",
        [],
        id="empty-new-clears-same-date",
    ),
    pytest.param(
        # ... and across dates: membership exists at d1, gone at d2
        "DATES\n 1 MAY 2001 /\n/\nWLIST\n '*OP' NEW OP1 /\n/\n"
        "DATES\n 2 MAY 2001 /\n/\nWLIST\n '*OP' NEW /\n/\n",
        [(D1, "OP", "OP1")],
        id="empty-new-clears-across-dates",
    ),
    pytest.param(
        # MOV removes the moved wells from every other list
        "DATES\n 1 MAY 2001 /\n/\n"
        "WLIST\n '*OPW' NEW OP1 OP2 /\n '*OPE' NEW OP3 OP4 /\n/\n"
        "DATES\n 2 MAY 2001 /\n/\nWLIST\n '*OPC' MOV OP2 OP3 /\n/\n",
        [(D1, "OPE", "OP3"), (D1, "OPE", "OP4"),
         (D1, "OPW", "OP1"), (D1, "OPW", "OP2"),
         (D2, "OPC", "OP2"), (D2, "OPC", "OP3"),
         (D2, "OPE", "OP4"), (D2, "OPW", "OP1")],
        id="mov-removes-from-other-lists",
    ),
    pytest.param(
        "DATES\n 1 MAY 2001 /\n/\n"
        "WLIST\n '*OP' NEW OP1 OP2 OP3 /\n '*OP' DEL OP2 /\n/\n",
        [(D1, "OP", "OP1"), (D1, "OP", "OP3")],
        id="del",
    ),
    pytest.param(
        # NEW directly from another list
        "DATES\n 1 MAY 2001 /\n/\n"
        "WLIST\n '*OP' NEW OP1 /\n '*OPS' NEW '*OP' /\n/\n",
        [(D1, "OP", "OP1"), (D1, "OPS", "OP1")],
        id="new-from-list",
    ),
    pytest.param(
        # ... recursively through two levels
        "DATES\n 1 MAY 2001 /\n/\n"
        "WLIST\n '*OP' NEW OP1 /\n '*OPS' NEW '*OP' /\n"
        " '*OPSS' NEW '*OPS' /\n/\n",
        [(D1, "OP", "OP1"), (D1, "OPS", "OP1"), (D1, "OPSS", "OP1")],
        id="new-from-list-recursive",
    ),
    pytest.param(
        # wildcard well tokens pass through unexpanded — the consumer
        # (WELOPEN wildcard matching) processes them
        "DATES\n 1 MAY 2001 /\n/\nWLIST\n '*OP' NEW 'PROD*' /\n/\n",
        [(D1, "OP", "PROD*")],
        id="wildcard-wells-pass-through",
    ),
]


@pytest.mark.parametrize("deck,expected", CASES)
def test_wlist_fold_matrix(deck, expected):
    assert snap(deck) == sorted(expected)


@pytest.mark.parametrize(
    "deck,match",
    [
        pytest.param(
            "DATES\n 1 MAY 2001 /\n/\nWLIST\n '*OP' ADD OP1 /\n/\n",
            "does not exist",
            id="add-to-nonexisting-list",
        ),
        pytest.param(
            "DATES\n 1 MAY 2001 /\n/\n"
            "WLIST\n '*OP' NEW /\n '*OP' ADD '*OPS' /\n/\n",
            "does not exist",
            id="add-from-undefined-list",
        ),
    ],
)
def test_wlist_fold_raises(deck, match):
    with pytest.raises(ValueError, match=match):
        fold_wlist(parse_deck(deck))
