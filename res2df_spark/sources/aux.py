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

_LYR_RE = re.compile(
    r"""^\s*(?:'([^']+)'|(\S+))\s+(\d+)(?:\s*-\s*(\d+))?\s*(?:(\#[0-9a-fA-F]{6}|\w+))?\s*$"""
)


def parse_zonemap(text: str) -> list[tuple[str, int]]:
    """lyr text → [(zone, k), ...] with ranges expanded."""
    out: list[tuple[str, int]] = []
    for line in text.splitlines():
        line = line.split("--", 1)[0].strip()
        if not line:
            continue
        m = _LYR_RE.match(line)
        if not m:
            raise ValueError(f"bad lyr line: {line!r}")
        zone = m.group(1) or m.group(2)
        k1 = int(m.group(3))
        k2 = int(m.group(4)) if m.group(4) else k1
        if k2 < k1:
            # a reversed range would silently produce ZERO layers for
            # the zone — fail like any other malformed lyr line
            raise ValueError(f"reversed k-range in lyr line: {line!r}")
        out.extend((zone, k) for k in range(k1, k2 + 1))
    return out


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


def load_parameters(path: str, search_parents: int = 2) -> dict:
    """Find and merge ``parameters.txt`` / ``parameters.yml`` /
    ``parameters.json`` in the case directory and up to
    ``search_parents`` levels above (the reference looks in ., ..,
    ../.. — parameters.py:18-60,118-135)."""
    merged: dict = {}
    d = os.path.abspath(path if os.path.isdir(path) else os.path.dirname(path))
    dirs = [d]
    for _ in range(search_parents):
        d = os.path.dirname(d)
        dirs.append(d)
    for d in reversed(dirs):  # nearest file wins on key conflicts
        for fname, loader in (
            ("parameters.json", lambda s: json.loads(s)),
            ("parameters.yml", _load_yaml),
            ("parameters.txt", None),
        ):
            p = os.path.join(d, fname)
            if not os.path.exists(p):
                continue
            with open(p) as f:
                content = f.read()
            if loader:
                merged.update(loader(content))
            else:
                for line in content.splitlines():
                    parts = line.split(None, 1)
                    if len(parts) == 2:
                        merged[parts[0]] = parts[1].strip()
    return merged


def attach_parameters(df: DataFrame, params: dict) -> DataFrame:
    """J12: broadcast scalar parameters onto every row as literal
    columns (summary.py:529-564)."""
    return df.withColumns({k: F.lit(v) for k, v in params.items()})
