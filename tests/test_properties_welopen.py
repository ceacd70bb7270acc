"""Hypothesis differential test for the WELOPEN state rewrite
(modules/compdat.py df): random schedules — COMPDAT ranges, COMPLUMP
assignments, WELOPEN actions with wildcards / defaulted coordinates /
lump addressing / STOP-POPN translation, over advancing dates — run
through the Spark deck pipeline AND an independent clean-room Python
state-machine model of the reference semantics
(/root/reference/src/res2df/compdat.py applywelopen + expansions,
transcribed as rules, not code).  Round-11 brief item #5.

The generator emits only VALID decks (every action targets a well with
an existing earlier connection, lump actions only after a COMPLUMP
exists) so both sides always produce frames; raise-parity for invalid
decks is pinned case-by-case in tests/test_welopen_matrix.py.
"""
import datetime

import pytest
from hypothesis import given, settings, strategies as st

D = datetime.date

_WELLS = ["OP1", "OP2"]
_STATUSES = ["OPEN", "SHUT", "STOP", "POPN"]


# ---------------------------------------------------------------------------
# Clean-room model of the reference semantics
# ---------------------------------------------------------------------------


def _model(events):
    """events: list of dicts (kind=date/compdat/complump/welopen) in
    deck order.  Returns sorted (WELL, I, J, K, OP/SH, DATE) tuples."""
    conns = []    # rows: (well, i, j, k, status, date, idx)
    lumps = []    # rows: (well, i, j, k, n, date)
    cursor = None
    for idx, ev in enumerate(events):
        if ev["kind"] == "date":
            cursor = ev["date"]
        elif ev["kind"] == "compdat":
            for k in range(ev["k1"], ev["k2"] + 1):
                conns.append(
                    (ev["well"], ev["i"], ev["j"], k, ev["status"],
                     cursor, idx)
                )
        elif ev["kind"] == "complump":
            for k in range(ev["k1"], ev["k2"] + 1):
                lumps.append((ev["well"], ev["i"], ev["j"], k, ev["n"],
                              cursor))
        elif ev["kind"] == "welopen":
            # candidate connections: defined strictly earlier in the
            # deck, one per distinct coordinate
            if ev["well"].endswith("*"):
                pref = ev["well"][:-1]
                well_ok = lambda w: w.startswith(pref)  # noqa: E731
            else:
                well_ok = lambda w: w == ev["well"]  # noqa: E731
            cand = {}
            for (w, i, j, k, _s, _d, cidx) in conns:
                if well_ok(w) and cidx < idx:
                    cand[(w, i, j, k)] = True
            hits = []
            if ev.get("c1") is not None:
                # lump-addressed: connection's lump number (from
                # assignments dated at-or-before the action) in
                # [C1, C2]; explicit coords restrict only when ALL
                # of I, J, K are set
                for (w, i, j, k) in cand:
                    in_range = any(
                        lw == w and li == i and lj == j and lk == k
                        and ev["c1"] <= ln <= ev["c2"]
                        and (ld is None or ev_date_le(ld, cursor))
                        for (lw, li, lj, lk, ln, ld) in lumps
                    )
                    if not in_range:
                        continue
                    coords = (ev.get("i"), ev.get("j"), ev.get("k"))
                    if all(c is not None and c > 0 for c in coords):
                        if (i, j, k) != coords:
                            continue
                    hits.append((w, i, j, k))
                acts_on_well = False
            else:
                coords = (ev.get("i"), ev.get("j"), ev.get("k"))
                acts_on_well = all(c is None or c <= 0 for c in coords)
                for (w, i, j, k) in cand:
                    if all(
                        c is None or c <= 0 or c == v
                        for c, v in zip(coords, (i, j, k))
                    ):
                        hits.append((w, i, j, k))
            status = ev["status"]
            if status == "POPN":
                status = "OPEN"
            elif status == "STOP":
                status = "OPEN" if acts_on_well else "SHUT"
            for (w, i, j, k) in hits:
                conns.append((w, i, j, k, status, cursor, idx))
    # keep-last per (well, i, j, k, date) by deck position
    final = {}
    for row in conns:
        final[row[:4] + (row[5],)] = row
    return sorted(
        (w, i, j, k, s, d) for (w, i, j, k, s, d, _ix) in final.values()
    )


def ev_date_le(a, b):
    if a is None:
        return True
    if b is None:
        return False
    return a <= b


# ---------------------------------------------------------------------------
# Deck text from events
# ---------------------------------------------------------------------------


_MONTHS = {1: "JAN", 2: "FEB", 3: "MAR", 4: "APR", 5: "MAY", 6: "JUN"}


def _deck(events):
    parts = []
    for ev in events:
        if ev["kind"] == "date":
            d = ev["date"]
            parts.append(
                f"DATES\n {d.day} {_MONTHS[d.month]} {d.year} /\n/\n"
            )
        elif ev["kind"] == "compdat":
            parts.append(
                f"COMPDAT\n '{ev['well']}' {ev['i']} {ev['j']} "
                f"{ev['k1']} {ev['k2']} '{ev['status']}' /\n/\n"
            )
        elif ev["kind"] == "complump":
            parts.append(
                f"COMPLUMP\n '{ev['well']}' {ev['i']} {ev['j']} "
                f"{ev['k1']} {ev['k2']} {ev['n']} /\n/\n"
            )
        elif ev["kind"] == "welopen":
            if ev.get("c1") is not None:
                coords = " ".join(
                    str(c) if c is not None else "1*"
                    for c in (ev.get("i"), ev.get("j"), ev.get("k"))
                )
                tail = f"{coords} {ev['c1']} {ev['c2']}"
            elif ev.get("i") is None and ev.get("j") is None \
                    and ev.get("k") is None:
                tail = ""
            else:
                tail = " ".join(
                    str(c) if c is not None else "0"
                    for c in (ev.get("i"), ev.get("j"), ev.get("k"))
                )
            parts.append(
                f"WELOPEN\n '{ev['well']}' '{ev['status']}' {tail} /\n/\n"
            )
    return "".join(parts)


# ---------------------------------------------------------------------------
# Event-sequence strategy: sequential construction so every WELOPEN
# targets a live well and lump actions follow a COMPLUMP
# ---------------------------------------------------------------------------


@st.composite
def _schedule(draw):
    events = [{"kind": "date", "date": D(2000, 1, 1)}]
    month = 1
    conns_by_well = {}
    have_lump = False
    n = draw(st.integers(2, 8))
    for _ in range(n):
        choices = ["compdat", "date"]
        if conns_by_well:
            choices += ["welopen", "welopen", "complump"]
        kind = draw(st.sampled_from(choices))
        if kind == "date" and month < 6:
            month += 1
            events.append({"kind": "date", "date": D(2000, month, 1)})
        elif kind == "compdat":
            well = draw(st.sampled_from(_WELLS))
            i = draw(st.integers(1, 2))
            k1 = draw(st.integers(1, 3))
            k2 = draw(st.integers(k1, 3))
            st_ = draw(st.sampled_from(["OPEN", "SHUT"]))
            events.append({"kind": "compdat", "well": well, "i": i,
                           "j": 1, "k1": k1, "k2": k2, "status": st_})
            conns_by_well.setdefault(well, set()).update(
                (i, 1, k) for k in range(k1, k2 + 1)
            )
        elif kind == "complump":
            well = draw(st.sampled_from(sorted(conns_by_well)))
            i, j, k = draw(st.sampled_from(sorted(conns_by_well[well])))
            events.append({"kind": "complump", "well": well, "i": i,
                           "j": j, "k1": k, "k2": k,
                           "n": draw(st.integers(1, 2))})
            have_lump = True
        elif kind == "welopen":
            well = draw(st.sampled_from(sorted(conns_by_well)))
            status = draw(st.sampled_from(_STATUSES))
            mode_opts = ["well", "coords", "partial"]
            if have_lump:
                mode_opts.append("lump")
            wildcard = draw(st.booleans())
            mode = draw(st.sampled_from(mode_opts))
            ev = {"kind": "welopen", "status": status,
                  "well": "OP*" if wildcard and mode in ("well",)
                  else well}
            if mode == "coords":
                i, j, k = draw(st.sampled_from(sorted(conns_by_well[well])))
                ev.update(i=i, j=j, k=k)
            elif mode == "partial":
                i, j, k = draw(st.sampled_from(sorted(conns_by_well[well])))
                # default one or two axes (0 = wildcard); the chosen
                # connection guarantees >=1 match
                keep = draw(st.sampled_from(
                    [("i",), ("k",), ("i", "k"), ("j", "k")]
                ))
                ev.update(
                    i=i if "i" in keep else 0,
                    j=j if "j" in keep else 0,
                    k=k if "k" in keep else 0,
                )
            elif mode == "lump":
                c1 = draw(st.integers(1, 2))
                ev.update(c1=c1, c2=draw(st.integers(c1, 2)))
                ev["well"] = well  # lump actions on exact well names
            events.append(ev)
    # ensure at least one welopen so the property exercises the rewrite
    if not any(e["kind"] == "welopen" for e in events):
        well = sorted(conns_by_well)[0] if conns_by_well else None
        if well is None:
            events.append({"kind": "compdat", "well": "OP1", "i": 1,
                           "j": 1, "k1": 1, "k2": 1, "status": "OPEN"})
            well = "OP1"
        events.append({"kind": "welopen", "well": well, "status": "SHUT"})
    return events


@given(events=_schedule())
@settings(max_examples=25, deadline=None)
def test_welopen_rewrite_matches_model(spark, events):
    from res2df_spark.modules import compdat

    deck = _deck(events)
    out = compdat.df(spark, deck)
    got = sorted(
        (r["WELL"], r["I"], r["J"], r["K"], r["OP_SH"], r["DATE"])
        for r in out.select("WELL", "I", "J", "K", "OP_SH", "DATE").collect()
    )
    assert got == _model(events), f"deck:\n{deck}"


def test_model_sanity_stop_translation():
    """The model itself reproduces a hand-checked matrix case (guards
    against the differential test passing because both sides share a
    bug introduced via the model)."""
    events = [
        {"kind": "date", "date": D(2000, 1, 1)},
        {"kind": "compdat", "well": "OP1", "i": 1, "j": 1, "k1": 1,
         "k2": 2, "status": "OPEN"},
        {"kind": "welopen", "well": "OP1", "status": "STOP"},
        {"kind": "welopen", "well": "OP1", "status": "STOP", "i": 1,
         "j": 1, "k": 1},
    ]
    assert _model(events) == [
        ("OP1", 1, 1, 1, "SHUT", D(2000, 1, 1)),
        ("OP1", 1, 1, 2, "OPEN", D(2000, 1, 1)),
    ]
