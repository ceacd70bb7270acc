"""Auxiliary dimension sources (SURVEY §2.1 S8/S9).

* ``zonemap`` — lyr-format layer→zone text
  (/root/reference/src/res2df/common.py:859-952): lines of
  ``'ZoneName' k1-k2`` (or a single k), ``--`` comments, optional color
  token.  Tiny file → parsed driver-side into a broadcastable dim table.
* ``parameters`` — key-value files (txt/json) discovered next to a case
  (/root/reference/src/res2df/parameters.py:18-183); returned as a dict
  and attachable to any DataFrame as literal columns (J12)."""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

#: the W3C/CSS SVG color keyword set (public spec,
#: https://www.w3.org/TR/css-color-3/#svg-color) — the same list the
#: reference checks against, so a stray non-color token makes the line
#: FAIL its number parse (reference rejects such files) instead of
#: being silently swallowed as a color.
_SVG_COLOR_NAMES = frozenset("""
aliceblue antiquewhite aqua aquamarine azure beige bisque black
blanchedalmond blue blueviolet brown burlywood cadetblue chartreuse
chocolate coral cornflowerblue cornsilk crimson cyan darkblue darkcyan
darkgoldenrod darkgray darkgreen darkgrey darkkhaki darkmagenta
darkolivegreen darkorange darkorchid darkred darksalmon darkseagreen
darkslateblue darkslategray darkslategrey darkturquoise darkviolet
deeppink deepskyblue dimgray dimgrey dodgerblue firebrick floralwhite
forestgreen fuchsia gainsboro ghostwhite gold goldenrod gray grey green
greenyellow honeydew hotpink indianred indigo ivory khaki lavender
lavenderblush lawngreen lemonchiffon lightblue lightcoral lightcyan
lightgoldenrodyellow lightgray lightgreen lightgrey lightpink
lightsalmon lightseagreen lightskyblue lightslategray lightslategrey
lightsteelblue lightyellow lime limegreen linen magenta maroon
mediumaquamarine mediumblue mediumorchid mediumpurple mediumseagreen
mediumslateblue mediumspringgreen mediumturquoise mediumvioletred
midnightblue mintcream mistyrose moccasin navajowhite navy oldlace
olive olivedrab orange orangered orchid palegoldenrod palegreen
paleturquoise palevioletred papayawhip peachpuff peru pink plum
powderblue purple red rosybrown royalblue saddlebrown salmon sandybrown
seagreen seashell sienna silver skyblue slateblue slategray slategrey
snow springgreen steelblue tan teal thistle tomato turquoise violet
wheat white whitesmoke yellow yellowgreen
""".split())


def _is_color(token: str) -> bool:
    """Reference ``is_color`` (common.py:847-856): '#RRGGBB' / '#RGB'
    hex, or an SVG color keyword (exact list — a merely-alphabetic
    non-color token must NOT be swallowed; the reference fails such
    lines at the number parse and rejects the file)."""
    return (
        bool(re.fullmatch(r"#([0-9a-fA-F]{6}|[0-9a-fA-F]{3})", token))
        or token.lower() in _SVG_COLOR_NAMES
    )


def parse_zonemap(text: str) -> list[tuple[str, int]]:
    """lyr text → [(zone, k), ...] — the reference's
    parse_lyrfile + convert_lyrlist_to_zonemap composition
    (common.py:859-952):

    * ``--`` comments stripped and ``#``-leading lines skipped;
    * ``'Zone' a-b`` is an absolute layer range (``a > b`` raises);
    * ``'Zone' n`` is a SPAN: layers ``prev_to+1 .. prev_to+1+n``
      (``1 .. 1+n`` for the first entry) — the reference's
      convert_lyrlist_to_zonemap arithmetic, to_layer = from + span;
    * an optional trailing color token (hex or named) is dropped;
    * later entries overwrite earlier ones per layer (dict semantics).

    One documented divergence: a span entry following another span
    entry resolves against the previous entry's EFFECTIVE end layer,
    where the reference raises KeyError (it only records to_layer for
    range entries)."""
    import shlex

    lines = [ln.split("--", 1)[0].strip() for ln in text.splitlines()]
    lines = [ln for ln in lines if ln and not ln.startswith("#")]
    zonemap: dict[int, str] = {}
    prev_to: int | None = None
    for line in lines:
        try:
            toks = shlex.split(line)
        except ValueError as exc:
            raise ValueError(f"bad lyr line: {line!r}") from exc
        if len(toks) < 2:
            raise ValueError(f"bad lyr line: {line!r}")
        zone, rest = toks[0], toks[1:]
        if rest and _is_color(rest[-1]):
            rest = rest[:-1]
        numbers = " ".join(rest).split("-")
        try:
            if len(numbers) == 2:
                k1, k2 = int(numbers[0]), int(numbers[1])
                if k1 > k2:
                    raise ValueError("from_layer higher than to_layer")
            elif len(numbers) == 1:
                span = int(numbers[0])
                k1 = (prev_to + 1) if prev_to is not None else 1
                k2 = k1 + span
            else:
                raise ValueError("too many '-' separators")
        except ValueError as exc:
            raise ValueError(f"bad lyr line: {line!r}") from exc
        prev_to = k2
        for k in range(k1, k2 + 1):
            zonemap[k] = zone
    return [(z, k) for k, z in sorted(zonemap.items())]


def zonemap_df(spark: SparkSession, text: str) -> DataFrame:
    """lyr text → (K, ZONE) dim table (broadcast it against cell/conn
    tables — J4)."""
    return spark.createDataFrame(
        [(k, z) for z, k in parse_zonemap(text)], "K int, ZONE string"
    )


def _load_yaml(content: str) -> dict:
    """parameters.yml loader (reference parameters.py:118-135), gated
    behind an import-try so a yaml-less environment degrades to
    txt/json only."""
    try:
        import yaml
    except ImportError:  # pragma: no cover
        return {}
    try:
        data = yaml.safe_load(content)
    except yaml.YAMLError as exc:
        raise ValueError(f"malformed parameters yaml: {exc}") from exc
    return data if isinstance(data, dict) else {}


def _parse_parameterstxt(content: str) -> dict:
    """``parameters.txt`` → dict, matching the reference's
    load_parameterstxt (parameters.py:60-87): lines after a ``#`` are
    comments, keys stay strings, and values get pandas-read_csv-style
    COLUMN-level inference — the whole value column becomes int if every
    value parses as int, else float if every value parses as float, else
    all values stay strings; an all-True/False column becomes bool.
    Documented divergences from the pandas loader: a value may contain
    whitespace (the reference's single-whitespace sep raises on such
    lines), and NA tokens ('NULL', 'NaN', empty) stay literal strings
    instead of becoming NaN values, which keeps attach_parameters
    literals well-typed."""
    import re

    pairs: list[tuple[str, str]] = []
    for line in content.splitlines():
        line = line.split("#", 1)[0]
        parts = line.split(None, 1)
        if len(parts) == 2:
            pairs.append((parts[0], parts[1].strip()))
    # STRICT numeric formats, not python casts: float('-nan') /
    # float('+infinity') succeed and would smuggle non-finite literals
    # into attach_parameters, and int('1_000') / unicode digits parse
    # values pandas' reader keeps as strings — the regexes accept
    # exactly the decimal forms read_csv infers
    _int_re = re.compile(r"[+-]?\d+")
    _float_re = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")
    _BOOL_TOKENS = {"TRUE", "True", "true", "FALSE", "False", "false"}
    if pairs and all(_int_re.fullmatch(v) and v.isascii() for _, v in pairs):
        return {k: int(v) for k, v in pairs}
    if pairs and all(_float_re.fullmatch(v) and v.isascii() for _, v in pairs):
        return {k: float(v) for k, v in pairs}
    if pairs and all(v in _BOOL_TOKENS for _, v in pairs):
        # pandas bool-column inference: an all-boolean value column
        # reads as bool dtype in the reference's load_parameterstxt;
        # pandas' parser recognizes the TRUE/True/true spellings (not
        # arbitrary case-folds like tRuE), so match that token set
        return {k: v in ("TRUE", "True", "true") for k, v in pairs}
    return dict(pairs)


def load_parameters(
    path: str, search_parents: int = 2, filebase: str | None = None
) -> dict:
    """Find and merge ``parameters.json`` / ``parameters.yml`` /
    ``parameters.txt`` / bare ``parameters`` in the case directory and
    up to ``search_parents`` levels above.

    Reference parity (parameters.py:18-57 find_parameter_files +
    :89-115 load_all): the search runs nearest-dir first and json
    before yml before txt within a dir, and the FIRST occurrence of a
    key wins — i.e. nearest dir beats parents, json beats yml beats
    txt in the same dir.  Dict-valued keys (grouped json) are dropped
    as in load() (parameters.py:178-183).

    ``filebase`` is the reference's ``--paramfile`` contract
    (summary.py:531-556): an ABSOLUTE path loads exactly that file; a
    relative name replaces the default candidate names in the same
    nearest-dir-first search."""
    merged: dict = {}
    if filebase and os.path.isabs(filebase):
        if not os.path.isfile(filebase):
            # a named-but-absent file is a user error worth a clear
            # message, not a raw open() traceback (and unlike the
            # relative search below, there is no other place to look)
            raise FileNotFoundError(
                f"parameter file {filebase!r} does not exist"
            )
        with open(filebase) as f:
            return {
                k: v
                for k, v in _load_any(f.read()).items()
                if not isinstance(v, dict)
            }
    d = os.path.abspath(path if os.path.isdir(path) else os.path.dirname(path))
    dirs = [d]
    for _ in range(search_parents):
        d = os.path.dirname(d)
        dirs.append(d)
    # candidate names per filebase, mirroring find_parameter_files
    # (parameters.py:44-48): filebase+'.json'/'.yml'/'.txt' plus the
    # bare name — listed lowest-precedence FIRST here because the
    # update-loop below lets the last write win (json beats yml beats
    # txt beats bare, same net precedence as the reference's
    # first-found-wins order)
    base = filebase or "parameters"
    names = (base, f"{base}.txt", f"{base}.yml", f"{base}.json")
    # Iterate lowest-precedence first so dict.update leaves the
    # highest-precedence (nearest dir, json-first) value standing.
    for d in reversed(dirs):
        for fname in names:
            p = os.path.join(d, fname)
            if not os.path.isfile(p):
                continue
            with open(p) as f:
                content = f.read()
            merged.update(
                {k: v for k, v in _load_any(content).items() if not isinstance(v, dict)}
            )
    if filebase and not merged:
        # an explicitly-named filebase matching nothing anywhere in the
        # search path is almost certainly a typo — warn (the DEFAULT
        # discovery staying empty is normal for cases without params)
        import warnings

        warnings.warn(
            f"parameter file {filebase!r} not found in {dirs}",
            RuntimeWarning,
            stacklevel=2,
        )
    return merged


def _load_any(content: str) -> dict:
    """Content-sniffing parameter loader, matching the reference's
    load() (parameters.py:118-160): try yaml first (json is a yaml
    subset, so a bare 'parameters' file holding json parses here), then
    explicit json (covers a yaml-less environment), then the txt
    key-value format.  Binding the format to the FILENAME — the earlier
    scheme — fed a json-bearing bare 'parameters' file to the txt
    parser and attached junk keys like '{"key":' to every row."""
    try:
        data = _load_yaml(content)
        if data:
            return data
    except ValueError:
        pass
    try:
        data = json.loads(content)
        if isinstance(data, dict):
            return data
    except ValueError:
        pass
    return _parse_parameterstxt(content)


def attach_parameters(df: DataFrame, params: dict) -> DataFrame:
    """J12: broadcast scalar parameters onto every row as literal
    columns (summary.py:529-564)."""
    return df.withColumns({k: F.lit(v) for k, v in params.items()})
