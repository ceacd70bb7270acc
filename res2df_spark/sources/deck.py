"""Deck-text ingest (SURVEY.md §2.1 S1): Eclipse-style schedule text →
typed record DataFrames.

The reference delegates parsing to the opm.io C++ library
(/root/reference/src/res2df/resdatafiles.py:79-105) with JSON keyword
schemas (common.py:37-85).  This is an independent, pure-Python parser
for the schedule-section subset the engine's modules consume — decks are
small driver-side text; all downstream work is DataFrame ops.

Grammar handled: ``--`` comments, quoted/unquoted items, ``n*`` repeated
defaults and ``n*v`` repeated values, ``/`` record terminators, single-
vs multi-record keywords, and the DATES/START month-name date format
(including the Eclipse ``JLY`` alias, common.py:96-111).
"""

from __future__ import annotations

import re
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession

#: item schemas for the supported keywords: (name, kind) with kind in
#: {str,int,float}; mirrors the role of the reference's opmkeywords JSON
#: registry (schema source of truth → DataFrame schema).
KEYWORD_ITEMS: dict[str, list[tuple[str, str]]] = {
    # full opm item list (opmkeywords/WELSPECS; HEAD_I/HEAD_J are kept
    # as I/J, the engine's names for the head location)
    "WELSPECS": [
        ("WELL", "str"), ("GROUP", "str"), ("I", "int"), ("J", "int"),
        ("REF_DEPTH", "float"), ("PHASE", "str"), ("DRAIN_RADIUS", "float"),
        ("INFLOW_EQ", "str"), ("AUTO_SHUTIN", "str"), ("CROSSFLOW", "str"),
        ("P_TABLE", "int"), ("DENSITY_CALC", "str"), ("FIP_REGION", "int"),
        ("FRONTSIM1", "str"), ("FRONTSIM2", "str"), ("WELL_MODEL", "str"),
        ("POLYMER_TABLE", "int"),
    ],
    "COMPDAT": [
        ("WELL", "str"), ("I", "int"), ("J", "int"), ("K1", "int"), ("K2", "int"),
        ("OP/SH", "str"), ("SATN", "int"), ("TRAN", "float"), ("WBDIA", "float"),
        ("KH", "float"), ("SKIN", "float"), ("DFACT", "float"), ("DIR", "str"),
        ("PEQVR", "float"),
    ],
    "WELOPEN": [
        ("WELL", "str"), ("STATUS", "str"), ("I", "int"), ("J", "int"), ("K", "int"),
        ("C1", "int"), ("C2", "int"),
    ],
    "COMPLUMP": [
        ("WELL", "str"), ("I", "int"), ("J", "int"), ("K1", "int"), ("K2", "int"),
        ("N", "int"),
    ],
    # item ORDER matches opmkeywords/WCONPROD exactly — the positional
    # mapping is the contract (GRAT is followed by LRAT and RESV, not
    # VFP_TABLE)
    "WCONPROD": [
        ("WELL", "str"), ("STATUS", "str"), ("CMODE", "str"), ("ORAT", "float"),
        ("WRAT", "float"), ("GRAT", "float"), ("LRAT", "float"),
        ("RESV", "float"), ("BHP", "float"), ("THP", "float"),
        ("VFP_TABLE", "int"), ("ALQ", "float"),
    ],
    "WCONINJE": [
        ("WELL", "str"), ("TYPE", "str"), ("STATUS", "str"), ("CMODE", "str"),
        ("RATE", "float"), ("RESV", "float"), ("BHP", "float"), ("THP", "float"),
        ("VFP_TABLE", "int"), ("VAPOIL_C", "float"),
        ("GAS_STEAM_RATIO", "float"), ("SURFACE_OIL_FRACTION", "float"),
        ("SURFACE_WATER_FRACTION", "float"), ("SURFACE_GAS_FRACTION", "float"),
        ("OIL_STEAM_RATIO", "float"),
    ],
    "WCONHIST": [
        ("WELL", "str"), ("STATUS", "str"), ("CMODE", "str"), ("ORAT", "float"),
        ("WRAT", "float"), ("GRAT", "float"), ("VFP_TABLE", "int"),
        ("ALQ", "float"), ("THP", "float"), ("BHP", "float"),
        ("NGLRAT", "float"),
    ],
    "WCONINJH": [
        ("WELL", "str"), ("TYPE", "str"), ("STATUS", "str"), ("RATE", "float"),
        ("BHP", "float"), ("THP", "float"), ("VFP_TABLE", "int"),
        ("VAPOIL_C", "float"), ("SURFACE_OIL_FRACTION", "float"),
        ("SURFACE_WATER_FRACTION", "float"), ("SURFACE_GAS_FRACTION", "float"),
        ("CMODE", "str"),
    ],
    "FAULTS": [
        ("NAME", "str"), ("IX1", "int"), ("IX2", "int"), ("IY1", "int"),
        ("IY2", "int"), ("IZ1", "int"), ("IZ2", "int"), ("FACE", "str"),
    ],
    "GRUPTREE": [("CHILD", "str"), ("PARENT", "str")],
    "EDITNNC": [
        ("I1", "int"), ("J1", "int"), ("K1", "int"),
        ("I2", "int"), ("J2", "int"), ("K2", "int"), ("TRANM", "float"),
    ],
    # segment ICD/valve family (reference compdat.py:146-163; schemas
    # opmkeywords/WSEGSICD, WSEGAICD, WSEGVALV)
    "WSEGSICD": [
        ("WELL", "str"), ("SEGMENT1", "int"), ("SEGMENT2", "int"),
        ("STRENGTH", "float"), ("LENGTH", "float"), ("DENSITY_CALI", "float"),
        ("VISCOSITY_CALI", "float"), ("CRITICAL_VALUE", "float"),
        ("WIDTH_TRANS", "float"), ("MAX_VISC_RATIO", "float"),
        ("METHOD_SCALING_FACTOR", "int"), ("MAX_ABS_RATE", "float"),
        ("STATUS", "str"),
    ],
    "WSEGAICD": [
        ("WELL", "str"), ("SEGMENT1", "int"), ("SEGMENT2", "int"),
        ("STRENGTH", "float"), ("LENGTH", "float"), ("DENSITY_CALI", "float"),
        ("VISCOSITY_CALI", "float"), ("CRITICAL_VALUE", "float"),
        ("WIDTH_TRANS", "float"), ("MAX_VISC_RATIO", "float"),
        ("METHOD_SCALING_FACTOR", "int"), ("MAX_ABS_RATE", "float"),
        ("FLOW_RATE_EXPONENT", "float"), ("VISC_EXPONENT", "float"),
        ("STATUS", "str"), ("OIL_FLOW_FRACTION", "float"),
        ("WATER_FLOW_FRACTION", "float"), ("GAS_FLOW_FRACTION", "float"),
        ("OIL_VISC_FRACTION", "float"), ("WATER_VISC_FRACTION", "float"),
        ("GAS_VISC_FRACTION", "float"),
    ],
    "WSEGVALV": [
        ("WELL", "str"), ("SEGMENT_NUMBER", "int"), ("CV", "float"),
        ("AREA", "float"), ("EXTRA_LENGTH", "float"), ("PIPE_D", "float"),
        ("ROUGHNESS", "float"), ("PIPE_A", "float"), ("STATUS", "str"),
        ("MAX_A", "float"),
    ],
    # network-tree edge/node keywords (reference gruptree.py:45-182;
    # schemas opmkeywords/BRANPROP, NODEPROP, GRUPNET)
    "BRANPROP": [
        ("DOWNTREE_NODE", "str"), ("UPTREE_NODE", "str"), ("VFP_TABLE", "int"),
        ("ALQ", "float"), ("ALQ_SURFACE_DENSITY", "str"),
    ],
    "NODEPROP": [
        ("NAME", "str"), ("PRESSURE", "float"), ("AS_CHOKE", "str"),
        ("ADD_GAS_LIFT_GAS", "str"), ("CHOKE_GROUP", "str"),
        ("SOURCE_SINK_GROUP", "str"), ("NETWORK_VALUE_TYPE", "str"),
    ],
    "GRUPNET": [
        ("NAME", "str"), ("TERMINAL_PRESSURE", "float"), ("VFP_TABLE", "int"),
        ("ALQ", "float"), ("SUB_SEA_MANIFOLD", "str"),
        ("LIFT_GAS_FLOW_THROUGH", "str"), ("ALQ_SURFACE_EQV", "str"),
    ],
    # RUNSPEC dimension keywords (opmkeywords/EQLDIMS, TABDIMS) — the
    # reference's inferdims.py injects these to size tables; parsed here
    # so region counts are available without trial reparse
    "EQLDIMS": [
        ("NTEQUL", "int"), ("DEPTH_NODES_P", "int"), ("DEPTH_NODES_TAB", "int"),
        ("NTTRVD", "int"), ("NSTRVD", "int"),
    ],
    "TABDIMS": [
        ("NTSFUN", "int"), ("NTPVT", "int"), ("NSSFUN", "int"), ("NPPVT", "int"),
        ("NTFIP", "int"), ("NRPVT", "int"), ("MAX_RV_NODES", "int"),
        ("NTENDP", "int"),
    ],
}

#: Keywords whose FIRST record is a header (well meta) and whose
#: subsequent records are data rows that inherit the header items —
#: the WELSEGS/COMPSEGS shape (reference compdat.py:164-212; schemas
#: opmkeywords/WELSEGS, COMPSEGS ``records`` arrays).
HEADER_RECORD_KEYWORDS: dict[str, tuple[list[tuple[str, str]], list[tuple[str, str]]]] = {
    "WELSEGS": (
        [
            ("WELL", "str"), ("DEPTH", "float"), ("LENGTH", "float"),
            ("WELLBORE_VOLUME", "float"), ("INFO_TYPE", "str"),
            ("PRESSURE_COMPONENTS", "str"), ("FLOW_MODEL", "str"),
            ("TOP_X", "float"), ("TOP_Y", "float"),
        ],
        [
            ("SEGMENT1", "int"), ("SEGMENT2", "int"), ("BRANCH", "int"),
            ("JOIN_SEGMENT", "int"), ("SEGMENT_LENGTH", "float"),
            ("DEPTH_CHANGE", "float"), ("DIAMETER", "float"),
            ("ROUGHNESS", "float"), ("AREA", "float"), ("VOLUME", "float"),
            ("LENGTH_X", "float"), ("LENGTH_Y", "float"),
        ],
    ),
    "COMPSEGS": (
        [("WELL", "str")],
        [
            ("I", "int"), ("J", "int"), ("K", "int"), ("BRANCH", "int"),
            ("DISTANCE_START", "float"), ("DISTANCE_END", "float"),
            ("DIRECTION", "str"), ("END_IJK", "int"), ("CENTER_DEPTH", "float"),
            ("THERMAL_LENGTH", "float"), ("SEGMENT_NUMBER", "int"),
        ],
    ),
}

#: Schema defaults applied when an item is absent or ``n*``-defaulted
#: (opm returns defaults for unspecified items — the reference relies
#: on that in parse_opmio_deckrecord; values from the opmkeywords JSON).
KEYWORD_DEFAULTS: dict[str, dict[str, object]] = {
    # opmkeywords/COMPDAT: STATE 'OPEN', SAT_TABLE 0, Kh -1, SKIN 0,
    # DIR 'Z'; I/J default 0 = "take from WELSPECS" (resolved — or
    # rejected when no WELSPECS exists — in modules/compdat.df, the
    # reference's compdat.py:132-143 contract)
    "COMPDAT": {
        "I": 0, "J": 0, "OP/SH": "OPEN", "SATN": 0,
        "KH": -1.0, "SKIN": 0.0, "DIR": "Z",
    },
    # opmkeywords/WELOPEN: STATUS 'OPEN'
    "WELOPEN": {"STATUS": "OPEN"},
    # opmkeywords/WELSPECS: the reference's parse_opmio_deckrecord
    # emits these for defaulted items (D_RADIUS 0, INFLOW_EQ STD,
    # AUTO_SHUTIN SHUT, CROSSFLOW YES, P_TABLE 0, DENSITY_CALC SEG,
    # FIP_REGION 0, well_model STD, POLYMER_TABLE 0); required items
    # (WELL..PHASE) and FRONTSIM1/2 have no schema default and stay NULL
    "WELSPECS": {
        "DRAIN_RADIUS": 0.0, "INFLOW_EQ": "STD", "AUTO_SHUTIN": "SHUT",
        "CROSSFLOW": "YES", "P_TABLE": 0, "DENSITY_CALC": "SEG",
        "FIP_REGION": 0, "WELL_MODEL": "STD", "POLYMER_TABLE": 0,
    },
    # opmkeywords/EQLDIMS + TABDIMS: the RUNSPEC sizing counts the
    # table modules read (NTEQUL/NTSFUN/NTPVT...) default to the opm
    # schema values — 'TABDIMS\n 1* 2 /' must yield NTSFUN 1, not NULL
    "EQLDIMS": {"NTEQUL": 1, "DEPTH_NODES_P": 100, "DEPTH_NODES_TAB": 20,
                "NTTRVD": 1, "NSTRVD": 20},
    "TABDIMS": {"NTSFUN": 1, "NTPVT": 1, "NSSFUN": 20, "NPPVT": 20,
                "NTFIP": 1, "NRPVT": 20, "MAX_RV_NODES": 20, "NTENDP": 1},
    "WSEGSICD": {
        "LENGTH": 12.0, "DENSITY_CALI": 1000.25, "VISCOSITY_CALI": 1.45,
        "CRITICAL_VALUE": 0.5, "WIDTH_TRANS": 0.05, "MAX_VISC_RATIO": 5.0,
        "METHOD_SCALING_FACTOR": -1, "STATUS": "OPEN",
    },
    "WSEGAICD": {
        "LENGTH": 12.0, "DENSITY_CALI": 1000.25, "VISCOSITY_CALI": 1.45,
        "CRITICAL_VALUE": 0.5, "WIDTH_TRANS": 0.05, "MAX_VISC_RATIO": 5.0,
        "METHOD_SCALING_FACTOR": -1, "STATUS": "OPEN",
        "OIL_FLOW_FRACTION": 1.0, "WATER_FLOW_FRACTION": 1.0,
        "GAS_FLOW_FRACTION": 1.0, "OIL_VISC_FRACTION": 1.0,
        "WATER_VISC_FRACTION": 1.0, "GAS_VISC_FRACTION": 1.0,
    },
    "WSEGVALV": {"STATUS": "OPEN"},
    "BRANPROP": {"ALQ": 0.0, "ALQ_SURFACE_DENSITY": "NONE"},
    "NODEPROP": {"AS_CHOKE": "NO", "ADD_GAS_LIFT_GAS": "NO",
                 "NETWORK_VALUE_TYPE": "PROD"},
    "GRUPNET": {"VFP_TABLE": 0, "ALQ": 0.0, "SUB_SEA_MANIFOLD": "NO",
                "LIFT_GAS_FLOW_THROUGH": "NO", "ALQ_SURFACE_EQV": "NONE"},
    "WELSEGS": {"LENGTH": 0.0, "WELLBORE_VOLUME": 1e-05,
                "PRESSURE_COMPONENTS": "HFA", "FLOW_MODEL": "HO",
                "TOP_X": 0.0, "TOP_Y": 0.0,
                "LENGTH_X": 0.0, "LENGTH_Y": 0.0},
    "COMPSEGS": {"CENTER_DEPTH": 0.0},
    # opmkeywords/WCON*: the reference relies on opm filling these, so
    # defaulted control items must come out as VALUES, not NULLs
    # (items with no schema default — CMODE, TYPE, RATE… — stay NULL)
    "WCONPROD": {"STATUS": "OPEN", "ORAT": 0.0, "WRAT": 0.0, "GRAT": 0.0,
                 "LRAT": 0.0, "RESV": 0.0, "BHP": 1.01325, "THP": 0.0,
                 "VFP_TABLE": 0, "ALQ": 0.0},
    "WCONHIST": {"STATUS": "OPEN", "ORAT": 0.0, "WRAT": 0.0, "GRAT": 0.0,
                 "VFP_TABLE": 0, "ALQ": 0.0, "THP": 0.0, "BHP": 0.0,
                 "NGLRAT": 0.0},
    "WCONINJE": {"STATUS": "OPEN", "BHP": 6895.0, "VFP_TABLE": 0,
                 "VAPOIL_C": 0.0, "GAS_STEAM_RATIO": 0.0,
                 "SURFACE_OIL_FRACTION": 0.0, "SURFACE_WATER_FRACTION": 0.0,
                 "SURFACE_GAS_FRACTION": 0.0, "OIL_STEAM_RATIO": 0.0},
    "WCONINJH": {"STATUS": "OPEN", "VFP_TABLE": 0, "VAPOIL_C": 0.0,
                 "SURFACE_OIL_FRACTION": 0.0, "SURFACE_WATER_FRACTION": 0.0,
                 "SURFACE_GAS_FRACTION": 0.0, "CMODE": "RATE"},
}

#: Table keywords (R10, common.py:187-266): each record is a flat float
#: list reshaped to rows of ``len(columns)`` items; the record counter
#: is the region number (SATNUM/PVTNUM/EQLNUM).
TABLE_KEYWORDS: dict[str, tuple[list[str], str]] = {
    # capillary-pressure naming follows the reference RENAMERS
    # (satfunc.py:53-60): water-oil tables carry PCOW, gas-oil tables
    # PCOG — the tagged union keeps them as SEPARATE columns, not one
    # shared PC
    "SWOF": (["SW", "KRW", "KROW", "PCOW"], "SATNUM"),
    "SGOF": (["SG", "KRG", "KROG", "PCOG"], "SATNUM"),
    "SLGOF": (["SL", "KRG", "KRO", "PCOG"], "SATNUM"),
    "SWFN": (["SW", "KRW", "PCOW"], "SATNUM"),
    "SGFN": (["SG", "KRG", "PCOG"], "SATNUM"),
    "SOF2": (["SO", "KRO"], "SATNUM"),
    "SOF3": (["SO", "KROW", "KROG"], "SATNUM"),
    "SGWFN": (["SG", "KRG", "KRW", "PCGW"], "SATNUM"),
    "PVDG": (["PRESSURE", "VOLUMEFACTOR", "VISCOSITY"], "PVTNUM"),
    "PVDO": (["PRESSURE", "VOLUMEFACTOR", "VISCOSITY"], "PVTNUM"),
    "DENSITY": (["OILDENSITY", "WATERDENSITY", "GASDENSITY"], "PVTNUM"),
    "ROCK": (["PRESSURE", "COMPRESSIBILITY"], "PVTNUM"),
    # one record per PVT region (reference pvt.py:61-89, RENAMERS["PVTW"])
    "PVTW": (
        ["PRESSURE", "VOLUMEFACTOR", "COMPRESSIBILITY", "VISCOSITY", "VISCOSIBILITY"],
        "PVTNUM",
    ),
    # equil solution-family depth tables (reference equil.py:30-35)
    "RSVD": (["Z", "RS"], "EQLNUM"),
    "RVVD": (["Z", "RV"], "EQLNUM"),
    "PBVD": (["Z", "PB"], "EQLNUM"),
    "PDVD": (["Z", "PD"], "EQLNUM"),
    "EQUIL": (
        ["Z", "PRESSURE", "OWC", "PCOWC", "GOC", "PCGOC", "INITRS", "INITRV", "ACCURACY"],
        "EQLNUM",
    ),
}

#: Nested live-oil/wet-gas tables (R10 nested case, common.py:187-266):
#: each record is (outer value, then N×inner tuples) — the undersaturated
#: branch of one RS/PRESSURE node; a LONE '/' advances the region
#: counter instead of ending the keyword (the empty-record counter the
#: reference uses, common.py:230-254).
NESTED_TABLE_KEYWORDS: dict[str, tuple[str, list[str], str]] = {
    "PVTO": ("RS", ["PRESSURE", "VOLUMEFACTOR", "VISCOSITY"], "PVTNUM"),
    # inner first item is the vaporized oil-gas ratio — the reference
    # names it OGR (pvt.py:53-60), not RV
    "PVTG": ("PRESSURE", ["OGR", "VOLUMEFACTOR", "VISCOSITY"], "PVTNUM"),
}

#: keywords whose payload is exactly one record (no terminating lone /).
#: The RUNSPEC dimension keywords belong here: without the single-record
#: stop they would consume the NEXT (unregistered) keyword's tokens as a
#: phantom second record — real decks put e.g. REGDIMS right after
#: EQLDIMS and crashed the parse.
SINGLE_RECORD = {"START", "TSTEP", "EQLDIMS", "TABDIMS"}

#: zero-payload "flag" keywords (public Eclipse/OPM manuals: RUNSPEC
#: phase/unit/io switches and section headers).  Only these preserve
#: record-boundary position through the unknown-keyword skip — an
#: ARBITRARY keyword-shaped token must not, because skipped keywords
#: like RPTSCHED carry mnemonic payloads (FIP, WELSPECS, CPU ...) whose
#: names can collide with registered keywords and would otherwise
#: resume the parse mid-payload as a phantom record.  The tradeoff:
#: a zero-payload flag NOT in this set that follows a skipped keyword
#: breaks the boundary run, and the next registered keyword is
#: swallowed with it — when a deck loses records here, extend the set
#: rather than widening the rule back to arbitrary keyword shapes.
FLAG_KEYWORDS = frozenset({
    # phases / fluids
    "OIL", "WATER", "GAS", "DISGAS", "VAPOIL", "VAPWAT", "BRINE",
    "POLYMER", "SOLVENT", "THERMAL", "TEMP", "CO2STORE", "H2STORE",
    # unit systems
    "METRIC", "FIELD", "LAB", "PVT-M", "PVTM",
    # io / format switches
    "UNIFIN", "UNIFOUT", "FMTIN", "FMTOUT", "MULTIN", "MULTOUT",
    "NOSIM", "NOECHO", "ECHO", "SKIPREST", "SKIP", "SKIP100", "SKIP300",
    "NOINSPEC", "NORSSPEC",
    # model-option switches
    "DUALPORO", "DUALPERM", "API", "DIFFUSE", "SURFACT", "FOAM",
    "GASWAT", "NOWARN",
    # numerics / grid / output switches
    "IMPES", "NOGRAV", "NEWTRAN", "OLDTRAN", "NONNC", "NUMRES",
    "INIT", "NOGGF", "RPTONLY", "ENDBOX",
    # section headers (zero payload themselves)
    "RUNSPEC", "GRID", "EDIT", "PROPS", "REGIONS", "SOLUTION",
    "SUMMARY", "SCHEDULE", "OPTIMIZE",
})

#: schedule keywords that advance the date cursor (W1).
DATE_KEYWORDS = {"START", "DATES", "TSTEP"}

_MONTHS = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "JLY": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}

#: '/' is a token of its own even glued to the previous item
#: (``1 JAN 1999/`` is valid deck text — reference test decks use it)
_TOKEN_RE = re.compile(r"'[^']*'|[^\s/]+|/")


def looks_like_keyword(tok: str) -> bool:
    """Keyword-shaped token test (1-8 chars, leading letter) — the ONE
    shared boundary rule for 'a bare word inside numeric table payload
    can only be the next keyword' (used here for table keywords and by
    the VFP block scanner; widen it in one place)."""
    return bool(re.fullmatch(r"[A-Z][A-Z0-9_]{0,7}", tok))


def _strip_comment(line: str) -> str:
    """Cut a '--' comment, but only OUTSIDE quotes (single OR double —
    INCLUDE filenames accept both styles) — a plain ``split('--')``
    would truncate a quoted item like ``'A--12'`` and desynchronize
    the whole record stream."""
    if "--" not in line:
        return line
    if "'" not in line and '"' not in line:
        return line.split("--", 1)[0]
    quote: str | None = None
    for i in range(len(line) - 1):
        c = line[i]
        if quote is None and c in "'\"":
            quote = c
        elif c == quote:
            quote = None
        elif quote is None and c == "-" and line[i + 1] == "-":
            return line[:i]
    return line


def _tokenize(text: str) -> list[str]:
    toks: list[str] = []
    for line in text.splitlines():
        line = _strip_comment(line)
        for t in _TOKEN_RE.findall(line):
            toks.append(t)
            if t == "/":
                # anything after the record terminator on the same line
                # is a comment even without '--' (Eclipse convention;
                # reference test_compdat.py 'comment without -- identifier')
                break
    return toks


def _expand(items: list[str]) -> list[str | None]:
    """``3*`` → three defaults; ``2*0.5`` → two 0.5s; ``'X'`` unquoted."""
    out: list[str | None] = []
    for t in items:
        m = re.fullmatch(r"(\d+)\*(.*)", t)
        if m:
            n, v = int(m.group(1)), m.group(2)
            out.extend([v if v else None] * n)
        else:
            out.append(t)
    return out


def _coerce(raw: str | None, kind: str):
    if raw is None:
        return None
    s = raw.strip("'")
    if kind == "int":
        return int(s)
    if kind == "float":
        return float(s)
    return s


def known_keywords() -> set[str]:
    """Every keyword this parser has a schema for — shared with the VFP
    block parser so a VFP table stops at the first following keyword
    instead of swallowing WELSPECS records into its value list."""
    return (
        set(KEYWORD_ITEMS) | DATE_KEYWORDS | set(TABLE_KEYWORDS)
        | set(NESTED_TABLE_KEYWORDS) | set(HEADER_RECORD_KEYWORDS)
        | {"WLIST", "VFPPROD", "VFPINJ"}
    )


def _parse_date(items: list[str]) -> date:
    """``1 'JAN' 2000`` (optionally with a time-of-day item)."""
    if len(items) < 3:
        raise ValueError(f"malformed DATES record: {items!r}")
    d, mon, y = items[0], items[1].strip("'").upper(), items[2]
    if mon[:3] not in _MONTHS:
        raise ValueError(f"unknown month {items[1]!r} in DATES record")
    try:
        return date(int(y), _MONTHS[mon[:3]], int(d))
    except (ValueError, OverflowError) as exc:
        raise ValueError(f"malformed DATES record: {items!r}") from exc


def parse_deck(text: str) -> list[dict]:
    """Deck text → flat record list, each a dict with ``KEYWORD_IDX``
    (monotone position of the keyword instance in the deck — the
    ordering contract every window operator relies on), ``KEYWORD``,
    ``RECORD_IDX``, ``DATE`` (the cursor value, W1 applied at parse
    time for date keywords only — data records carry None; cursor
    propagation across data records is the engine's ffill), and the
    typed items per KEYWORD_ITEMS."""
    toks = _tokenize(text)
    records: list[dict] = []
    cursor: date | None = None
    kw_idx = -1
    i = 0
    known = known_keywords()

    def _skip_block(j: int) -> int:
        """Skip an unhandled keyword's payload: resume at a known keyword
        in record-boundary position — a data token that merely equals a
        keyword name mid-record cannot mis-resume the parse.

        Boundary position means: the immediate next token, any token
        after a '/' record terminator, or after an unbroken run of
        KNOWN zero-payload flag keywords (FLAG_KEYWORDS) from such a
        point — flags chain without terminators, and without the run
        rule a RUNSPEC like ``DIMENS … / OIL WATER START …`` would
        swallow START (and with it the whole date cursor) inside the
        DIMENS skip.  The run is restricted to the curated flag set:
        an arbitrary keyword-shaped token must NOT hold the boundary,
        or a skipped mnemonic keyword like ``RPTSCHED FIP WELSPECS
        CPU /`` would resume the parse at its WELSPECS mnemonic and
        emit a phantom record."""
        at_boundary = True
        while j < len(toks):
            t = toks[j]
            if t in known and at_boundary:
                return j
            if t == "/":
                at_boundary = True
            elif not (at_boundary and t in FLAG_KEYWORDS):
                at_boundary = False
            j += 1
        return j

    while i < len(toks):
        kw = toks[i]
        i += 1
        if kw not in known or kw in ("VFPPROD", "VFPINJ"):
            # unknown keywords and VFP blocks (parsed by modules/vfp.py)
            # are skipped; their numeric payload never contains a known
            # keyword in record-boundary position.
            i = _skip_block(i)
            continue
        kw_idx += 1
        rec_idx = 0
        region = 1
        header: dict | None = None
        while i < len(toks):
            # A record starting with a known keyword means the current
            # keyword ended WITHOUT a lone '/' — the table-keyword style
            # whose record count the reference infers via trial reparse
            # (inferdims.py:18-84); token lookahead resolves it here.
            if toks[i] in known:
                break
            # Numeric-table keywords additionally end at any UNKNOWN
            # keyword-shaped token: their records are pure numbers /
            # defaults, so a bare uppercase word can only be the next
            # (unregistered) keyword — without this, 'SWOF ... PMAX ...'
            # would crash on float('PMAX') or, worse, silently absorb a
            # numeric payload as phantom table rows.  Record-style
            # keywords (WELSPECS etc.) are exempt: their records START
            # with well names that look exactly like keywords.
            if (
                kw in TABLE_KEYWORDS or kw in NESTED_TABLE_KEYWORDS
            ) and looks_like_keyword(toks[i]):
                break
            rec: list[str] = []
            while i < len(toks) and toks[i] != "/":
                rec.append(toks[i])
                i += 1
            i += 1  # consume '/'
            if not rec:
                if kw in NESTED_TABLE_KEYWORDS:
                    region += 1  # empty record = next region, not EOK
                    continue
                if kw in SINGLE_RECORD and kw in KEYWORD_ITEMS and rec_idx == 0:
                    # 'EQLDIMS\n/' is a fully-DEFAULTED single record
                    # (opm emits one record of schema defaults), not an
                    # empty keyword
                    row = {"KEYWORD_IDX": kw_idx, "KEYWORD": kw,
                           "RECORD_IDX": 0, "DATE": None}
                    defaults = KEYWORD_DEFAULTS.get(kw, {})
                    for name, _ in KEYWORD_ITEMS[kw]:
                        row[name] = defaults.get(name)
                    records.append(row)
                break  # lone '/' terminates a multi-record keyword
            if kw == "START" or kw == "DATES":
                cursor = _parse_date(rec)
                records.append(
                    {"KEYWORD_IDX": kw_idx, "KEYWORD": kw, "RECORD_IDX": rec_idx,
                     "DATE": cursor}
                )
            elif kw == "TSTEP":
                # defaulted 'n*' items expand to None — no time advance;
                # a TSTEP before any START/DATES starts the clock at the
                # reference's documented fallback 1900-01-01
                # (gruptree.py:101-105 "No date parsed ... Using
                # 1900-01-01") instead of crashing.
                for step in _expand(rec):
                    if step is None:
                        continue
                    if cursor is None:
                        cursor = date(1900, 1, 1)
                    cursor = cursor + timedelta(days=float(step))
                records.append(
                    {"KEYWORD_IDX": kw_idx, "KEYWORD": kw, "RECORD_IDX": rec_idx,
                     "DATE": cursor}
                )
            elif kw in NESTED_TABLE_KEYWORDS:
                outer_name, inner_cols, region_col = NESTED_TABLE_KEYWORDS[kw]
                vals = [_coerce(v, "float") for v in _expand(rec)]
                outer, rest = vals[0], vals[1:]
                k = len(inner_cols)
                for ri in range(0, len(rest), k):
                    chunk = rest[ri : ri + k]
                    row = {"KEYWORD_IDX": kw_idx, "KEYWORD": kw,
                           "RECORD_IDX": rec_idx, "DATE": None,
                           region_col: region, "ROW_IDX": ri // k,
                           outer_name: outer}
                    for name, v in zip(inner_cols, chunk):
                        row[name] = v
                    for name in inner_cols[len(chunk):]:
                        row[name] = None
                    records.append(row)
            elif kw in TABLE_KEYWORDS:
                # R10: flat float list → n×k rows; region = record no.
                cols, region = TABLE_KEYWORDS[kw]
                vals = [_coerce(v, "float") for v in _expand(rec)]
                k = len(cols)
                # EQUIL-style fixed single-row tables may come shorter
                # than the item list — the chunk loop NULL-pads them;
                # a MULTI-row payload that is not a multiple of k is a
                # corrupt table (a dropped value shifts every later
                # column) — opm rejects it, and silently emitting a
                # short phantom last row would hand satfunc/pvt
                # consumers misaligned data
                if len(vals) > k and len(vals) % k:
                    raise ValueError(
                        f"{kw} record {rec_idx} has {len(vals)} values, "
                        f"not a multiple of its {k} columns "
                        f"({', '.join(cols)}) — corrupt table payload"
                    )
                for ri in range(0, len(vals), k):
                    chunk = vals[ri : ri + k]
                    row = {"KEYWORD_IDX": kw_idx, "KEYWORD": kw,
                           "RECORD_IDX": rec_idx, "DATE": None,
                           region: rec_idx + 1, "ROW_IDX": ri // k}
                    for name, v in zip(cols, chunk):
                        row[name] = v
                    for name in cols[len(chunk):]:
                        row[name] = None
                    records.append(row)
            elif kw == "WLIST":
                # variable-arity record: NAME ACTION well [well ...]
                expanded = [t.strip("'") if t else t for t in _expand(rec)]
                if len(expanded) < 2:
                    raise ValueError(f"malformed WLIST record: {rec!r}")
                records.append(
                    {"KEYWORD_IDX": kw_idx, "KEYWORD": kw, "RECORD_IDX": rec_idx,
                     "DATE": None, "NAME": expanded[0], "ACTION": expanded[1],
                     "WELLS": [w for w in expanded[2:] if w is not None]}
                )
            elif kw in HEADER_RECORD_KEYWORDS:
                head_items, rec_items = HEADER_RECORD_KEYWORDS[kw]
                defaults = KEYWORD_DEFAULTS.get(kw, {})
                expanded = _expand(rec)
                if header is None:
                    # first record = well header, inherited by data rows
                    header = {}
                    for (name, kind), raw in zip(head_items, expanded):
                        v = _coerce(raw, kind)
                        header[name] = defaults.get(name) if v is None else v
                    for name, _ in head_items[len(expanded):]:
                        header[name] = defaults.get(name)
                    continue  # header is not itself an output row
                row = {"KEYWORD_IDX": kw_idx, "KEYWORD": kw,
                       "RECORD_IDX": rec_idx, "DATE": None, **header}
                for (name, kind), raw in zip(rec_items, expanded):
                    v = _coerce(raw, kind)
                    row[name] = defaults.get(name) if v is None else v
                for name, _ in rec_items[len(expanded):]:
                    row[name] = defaults.get(name)
                records.append(row)
            else:
                row: dict = {"KEYWORD_IDX": kw_idx, "KEYWORD": kw,
                             "RECORD_IDX": rec_idx, "DATE": None}
                defaults = KEYWORD_DEFAULTS.get(kw, {})
                expanded = _expand(rec)
                for (name, kind), raw in zip(KEYWORD_ITEMS[kw], expanded):
                    v = _coerce(raw, kind)
                    row[name] = defaults.get(name) if v is None else v
                for name, _ in KEYWORD_ITEMS[kw][len(expanded):]:
                    row[name] = defaults.get(name)
                records.append(row)
            rec_idx += 1
            if kw in SINGLE_RECORD:
                break
    return records


_SPARK_KIND = {"str": "string", "int": "int", "float": "double"}


def fill_dates(recs: list[dict]) -> list[dict]:
    """W1 date-cursor fill applied at the parse layer: records arrive in
    deck order, date-keyword rows already carry their resolved DATE, so
    one sequential pass stamps every data record with the cursor.  This
    is the exact semantics of the engine's distributed ffill (W1) —
    used here because deck text is driver-bounded by nature; the Spark
    ffill window remains the path for distributed logs (PRT, summary)."""
    cursor = None
    out = []
    for r in recs:
        if r["KEYWORD"] in DATE_KEYWORDS and r["DATE"] is not None:
            cursor = r["DATE"]
        elif r["DATE"] is None and cursor is not None:
            r = dict(r, DATE=cursor)
        out.append(r)
    return out


def deck_records(
    spark: SparkSession, text: str, keyword: str,
    records: list[dict] | None = None,
) -> DataFrame:
    """Records of one keyword as a typed DataFrame, with the shared
    ordering/state columns (KEYWORD_IDX, RECORD_IDX, DATE — DATE filled
    for date keywords, None otherwise).  Pass pre-parsed ``records``
    (e.g. ``fill_dates(parse_deck(text))``) to reuse one parse across
    many keyword frames."""
    recs = [
        r for r in (records if records is not None else parse_deck(text))
        if r["KEYWORD"] == keyword or keyword == "*"
    ]
    base = "KEYWORD_IDX long, KEYWORD string, RECORD_IDX long, DATE date"
    if keyword in NESTED_TABLE_KEYWORDS:
        outer_name, inner_cols, region = NESTED_TABLE_KEYWORDS[keyword]
        schema = base + f", `{region}` int, ROW_IDX int, `{outer_name}` double" + "".join(
            f", `{n}` double" for n in inner_cols
        )
        cols = (["KEYWORD_IDX", "KEYWORD", "RECORD_IDX", "DATE", region, "ROW_IDX",
                 outer_name] + inner_cols)
    elif keyword in TABLE_KEYWORDS:
        tcols, region = TABLE_KEYWORDS[keyword]
        schema = base + f", `{region}` int, ROW_IDX int" + "".join(
            f", `{n}` double" for n in tcols
        )
        cols = ["KEYWORD_IDX", "KEYWORD", "RECORD_IDX", "DATE", region, "ROW_IDX"] + tcols
    elif keyword in HEADER_RECORD_KEYWORDS:
        head_items, rec_items = HEADER_RECORD_KEYWORDS[keyword]
        items = head_items + rec_items
        schema = base + "".join(f", `{n}` {_SPARK_KIND[k]}" for n, k in items)
        cols = ["KEYWORD_IDX", "KEYWORD", "RECORD_IDX", "DATE"] + [n for n, _ in items]
    else:
        items = KEYWORD_ITEMS.get(keyword, [])
        schema = base + "".join(f", `{n}` {_SPARK_KIND[k]}" for n, k in items)
        cols = ["KEYWORD_IDX", "KEYWORD", "RECORD_IDX", "DATE"] + [n for n, _ in items]
    rows = [tuple(r.get(c) for c in cols) for r in recs]
    return spark.createDataFrame(rows, schema)


def schedule_events(spark: SparkSession, text: str, records=None) -> DataFrame:
    """All records of all keywords, dates resolved at parse time for the
    date keywords — the substrate for the W1 ffill date cursor.
    ``records`` reuses an existing ``parse_deck`` result."""
    recs = records if records is not None else parse_deck(text)
    rows = [
        (r["KEYWORD_IDX"], r["KEYWORD"], r["RECORD_IDX"], r["DATE"]) for r in recs
    ]
    return spark.createDataFrame(
        rows, "KEYWORD_IDX long, KEYWORD string, RECORD_IDX long, DATE date"
    )


def read_deck(path: str, max_depth: int = 16) -> str:
    """Read deck text with INCLUDE files spliced in recursively — the
    reference relies on opm's parser doing this natively
    (resdatafiles.py get_deck); here it is a text-level preprocessor so
    every downstream deck consumer (parse_deck and the module layer)
    sees one flat deck.

    Semantics: the ``INCLUDE`` keyword is followed by one record
    holding the (optionally quoted) filename — on the SAME line or the
    next non-blank line — terminated by ``/`` (spaced, glued, or alone
    on a following line); unquoted paths may contain slashes; relative
    paths resolve against the INCLUDING file's directory (so nested
    includes in sibling dirs work like Eclipse).  ``--`` comments are
    stripped quote-aware when locating the filename (a path like
    ``'A--12.inc'`` survives) but the surrounding deck text is passed
    through untouched.  A missing file, a missing terminator, or
    nesting beyond ``max_depth`` raises — silently dropping an include
    (or swallowing the deck lines after it) would parse a structurally
    valid but WRONG deck.

    An ``INCLUDE`` token only counts as the directive at a RECORD-
    BOUNDARY position (the same rule as ``_skip_block``): after a ``/``
    record terminator, after keyword-shaped single-token lines
    (sections, flags, unregistered keyword heads), or at file start.  A
    line whose first token merely equals INCLUDE inside an open record
    (an unregistered keyword's multi-line payload) passes through as
    data instead of raising.  The one irresolvable-at-text-level case —
    a ``/``-terminated data record whose FIRST token is INCLUDE sitting
    exactly at a boundary — still resolves as a directive and fails
    LOUDLY on the missing file, never silently mis-splices.
    """
    import os

    kw_shaped = re.compile(r"[A-Za-z][A-Za-z0-9_\-]{0,11}$")

    def _read(p: str, depth: int) -> str:
        if depth > max_depth:
            raise ValueError(
                f"INCLUDE nesting deeper than {max_depth} at {p!r} "
                "(include cycle?)"
            )
        with open(p) as f:
            lines = f.read().splitlines()
        base = os.path.dirname(os.path.abspath(p))
        out: list[str] = []
        i = 0
        at_boundary = True
        while i < len(lines):
            stripped = _strip_comment(lines[i]).strip()
            # split, don't prefix-match: "INCLUDE\t'f' /" (tab) must
            # match and a keyword like INCLUDEX must not
            head = stripped.split(None, 1)
            if not head or head[0].upper() != "INCLUDE" or not at_boundary:
                out.append(lines[i])
                toks = stripped.split()
                if toks and not (
                    at_boundary and len(toks) == 1 and kw_shaped.fullmatch(toks[0])
                ):
                    # record data opens a record; a '/' terminator
                    # (bare, glued to an unquoted value, or glued to a
                    # CLOSED quoted value — ``'OIL'/`` is item +
                    # terminator to the tokenizer) closes it — and
                    # everything AFTER the terminator on the same line
                    # is Eclipse comment text ("0 1 / output control"),
                    # so the first terminator DECIDES the line's
                    # boundary state.  A quoted token whose quote is
                    # still open at the '/' (``'/path/x'`` path chars)
                    # is NOT a terminator.
                    for t in toks:
                        glued = len(t) > 1 and t.endswith("/") and (
                            t[0] not in "'\""
                            or (len(t) > 2 and t[-2] == t[0])
                        )
                        if t == "/" or glued:
                            at_boundary = True
                            break
                        at_boundary = False
                i += 1
                continue
            # the filename record: rest of the keyword line, else the
            # following non-blank line(s)
            rec, j = (head[1].strip() if len(head) > 1 else ""), i
            while not rec:
                j += 1
                if j >= len(lines):
                    raise ValueError(f"INCLUDE at end of {p!r} has no filename")
                rec = _strip_comment(lines[j]).strip()
            m = re.match(r"'([^']+)'|\"([^\"]+)\"|(\S+)", rec)
            fname = next(g for g in m.groups() if g is not None)
            rest = rec[m.end():].strip()
            if m.group(3):
                # unquoted: slashes are path chars, but a GLUED trailing
                # '/' is the record terminator
                if len(fname) > 1 and fname.endswith("/"):
                    fname, rest = fname[:-1], "/"
                if fname == "/":
                    raise ValueError(
                        f"malformed INCLUDE record in {p!r}: {rec!r}"
                    )
            # the terminator must be on the record line or ALONE on a
            # following line — scanning past arbitrary deck text to the
            # next '/' would silently swallow whole keywords
            terminated = rest.startswith("/")
            while not terminated:
                j += 1
                if j >= len(lines):
                    raise ValueError(
                        f"INCLUDE record in {p!r} is missing its '/' terminator"
                    )
                nxt = _strip_comment(lines[j]).strip()
                if not nxt:
                    continue
                if nxt.startswith("/"):
                    terminated = True
                else:
                    raise ValueError(
                        f"INCLUDE record in {p!r} is missing its '/' "
                        f"terminator (found {lines[j]!r} instead)"
                    )
            inc = fname if os.path.isabs(fname) else os.path.join(base, fname)
            if not os.path.isfile(inc):
                raise FileNotFoundError(
                    f"INCLUDE file {fname!r} (from {p!r}) not found at {inc!r}"
                )
            out.append(_read(inc, depth + 1))
            i = j + 1
        return "\n".join(out)

    return _read(path, 0)
