"""WLIST well-list state (W6/R11): the engine-layer equivalent of the
reference's WLIST accumulation (/root/reference/src/res2df/compdat.py:517-653).

WLIST is a *running* list algebra — NEW/ADD/DEL/MOV actions mutate
named well lists, NEW may reference other lists recursively (``*LIST``)
— and every action's effect depends on the full state before it.  The
reference notes this is inherently sequential; lists are tiny (names of
wells), so this is a driver-side fold over the parsed records, emitting
a snapshot of every list at each action date.  Downstream consumption
(expanding a ``*LIST`` well argument in WELOPEN) is a broadcast join of
the snapshot table.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession

from res2df_spark.sources.deck import parse_deck


def _resolve(wells: list[str], state: dict[str, list[str]]) -> list[str]:
    """Expand recursive ``*NAME`` references against current state.
    An undefined reference raises (reference compdat.py:600-604) —
    resolving it to the empty list would make a later WELOPEN on the
    list silently act on nothing.  Raw expansion only: dedup/ordering
    is each action branch's business (the reference sorts every list
    alphabetically and dedups via set() for ADD/DEL/MOV but not NEW)."""
    out: list[str] = []
    for w in wells:
        if w.startswith("*"):
            if w not in state:
                raise ValueError(
                    f"Recursive well list {w!r} does not exist at this "
                    "point in the deck"
                )
            out.extend(state[w])
        else:
            out.append(w)
    return out


def fold_wlist(records: list[dict]) -> list[tuple[_date | None, str, str]]:
    """Sequential fold over parsed deck records → snapshot rows
    (date, list_name, well) emitted after every WLIST action."""
    state: dict[str, list[str]] = {}
    cursor: _date | None = None
    pending_at: _date | None = None
    pending = False
    snapshots: list[tuple[_date | None, str, str]] = []

    def emit(at: _date | None) -> None:
        for lname, lwells in state.items():
            for w in lwells:
                # the reference strips the Eclipse-syntax asterisk from
                # list names in its output frame (compdat.py:218-220)
                snapshots.append((at, lname.lstrip("*"), w))

    for r in records:
        if r["KEYWORD"] in ("START", "DATES", "TSTEP"):
            # one snapshot per date with WLIST changes (the reference
            # emits the full list state per date, compdat.py:556-653)
            if pending and r["DATE"] != pending_at:
                emit(pending_at)
                pending = False
            cursor = r["DATE"]
            continue
        if r["KEYWORD"] != "WLIST":
            continue
        _apply_action(state, r)
        pending, pending_at = True, cursor
    if pending:
        emit(pending_at)
    return snapshots


def _apply_action(state: dict[str, list[str]], r: dict) -> None:
    """Mutate the list state with one WLIST record (NEW/ADD/DEL/MOV).

    Recursive ``*LIST`` well arguments expand ONLY for NEW/ADD — the
    reference resolves them in its ADD/NEW branch alone
    (compdat.py:584-602); a ``*X`` token in DEL/MOV stays a literal
    token that matches no well name (a no-op), never an expansion and
    never an undefined-list error."""
    name, action = r["NAME"], r["ACTION"]
    if action in ("NEW", "ADD"):
        wells = _resolve(r["WELLS"], state)
    else:
        wells = list(r["WELLS"])
    # the reference keeps every list ALPHABETICALLY SORTED
    # (compdat.py:603-645: every branch stores ' '.join(sorted(...)))
    if action == "NEW":
        # sorted but NOT deduped — the one branch the reference leaves
        # duplicates in (sorted(wells.split()), no set())
        state[name] = sorted(wells)
    elif action == "ADD":
        if name not in state:
            # reference compdat.py:608-613: ADD/DEL require the list
            raise ValueError(f"Well list {name!r} does not exist; cannot ADD")
        # merge the RESOLVED incoming wells with the stored members
        # AS-IS: a literal '*X' token that MOV stored stays literal
        # (the reference only resolves the incoming WELLS string) —
        # re-resolving stored members would expand or raise on it
        state[name] = sorted(set(state[name] + wells))
    elif action == "DEL":
        if name not in state:
            raise ValueError(f"Well list {name!r} does not exist; cannot DEL")
        # R11 set difference
        state[name] = sorted(set(state[name]) - set(wells))
    elif action == "MOV":
        for other in state:
            if other != name:
                state[other] = sorted(set(state[other]) - set(wells))
        state[name] = sorted(set(state.get(name, [])) | set(wells))
    else:
        raise ValueError(f"unknown WLIST action {action!r}")


def expand_welopen_wlists(records: list[dict]) -> list[dict]:
    """Replace ``*LIST`` well references in WELOPEN records with one
    record per member well.

    Visibility is by DATE, not deck position: the reference's
    ``expand_wlist`` (compdat.py:556-653) emits the full list state
    per DATE (end-of-date snapshots), and
    ``expand_wlist_in_welopen_df`` (:757-788) filters
    ``DATE <= action DATE`` then takes ``tail(1)`` — so a WELOPEN may
    legally precede the WLIST that defines its list within the same
    date (reference test_welopen.py 'Four wells, two lists': "In
    res2df, the WELOPEN is allowed to be before WLIST"), and a
    redefinition at the action date wins over an older one
    (test id redefined_wlist).  An undefined list raises ValueError
    like the reference."""
    # pass 1: fold the running state; record the FULL state after each
    # WLIST record keyed by its date — the last write per date is the
    # end-of-date snapshot the reference emits (MOV touches OTHER
    # lists too, hence full-state snapshots, not per-name)
    state: dict[str, list[str]] = {}
    by_date: dict = {}
    for r in records:
        if r["KEYWORD"] == "WLIST":
            _apply_action(state, r)
            by_date[r["DATE"]] = {n: tuple(ws) for n, ws in state.items()}

    def _visible(snap_date, action_date) -> bool:
        # a None deck date is earlier than any date (matches the
        # reference's treatment of undated COMPDAT rows)
        if snap_date is None:
            return True
        if action_date is None:
            return False
        return snap_date <= action_date

    def _members(name: str, action_date):
        cand = [
            d for d, snap in by_date.items()
            if _visible(d, action_date) and name in snap
        ]
        if not cand:
            raise ValueError(
                f"Well list {name[1:]} not defined at {action_date}"
            )
        latest = max(cand, key=lambda d: (d is not None, d))
        return by_date[latest][name]

    out: list[dict] = []
    for r in records:
        if r["KEYWORD"] == "WELOPEN" and (r.get("WELL") or "").startswith("*"):
            out.extend(
                dict(r, WELL=w) for w in _members(r["WELL"], r["DATE"])
            )
        else:
            out.append(r)
    return out


def df(spark: SparkSession, deck_text: str) -> DataFrame:
    """Deck text → snapshot table (DATE, NAME, WELL): membership of every
    list after each WLIST action."""
    snaps = fold_wlist(parse_deck(deck_text))
    return spark.createDataFrame(snaps, "DATE date, NAME string, WELL string")
