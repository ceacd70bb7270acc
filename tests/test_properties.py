"""Property-based tests (hypothesis): operator equivalence against
pandas/numpy reference semantics on randomized inputs — a layer the
reference's own suite lacks (SURVEY §5 notes no property testing)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from res2df_spark.sinks.writers import rle_encode
from tests.conftest import rows

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(st.integers(min_value=0, max_value=3), max_size=50))
@settings(max_examples=100, deadline=None)
def test_rle_roundtrip(vals):
    """RLE text decodes back to the input vector."""
    text = rle_encode(vals)
    decoded: list[int] = []
    for tok in text.split():
        if "*" in tok:
            n, v = tok.split("*")
            decoded.extend([int(v)] * int(n))
        else:
            decoded.append(int(tok))
    assert decoded == vals


@given(
    left=st.lists(st.integers(0, 100), min_size=1, max_size=20),
    right=st.lists(
        st.tuples(st.integers(0, 100), st.floats(-10, 10, allow_nan=False)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
)
@_slow
def test_asof_matches_pandas_merge_asof(spark, left, right):
    """asof_join ≡ pandas merge_asof(direction='backward') on one key."""
    from res2df_spark.operators.asof import asof_join

    ldf = spark.createDataFrame([("k", t, i) for i, t in enumerate(left)], "k string, t long, qid long")
    rdf = spark.createDataFrame([("k", t, v) for t, v in right], "k string, t long, v double")
    got = {
        r["qid"]: r["v"]
        for r in asof_join(ldf, rdf, on=["k"], left_time="t", right_time="t", value_cols=["v"]).collect()
    }
    lp = pd.DataFrame({"t": left, "qid": range(len(left))}).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(right, columns=["t", "v"]).sort_values("t", kind="mergesort")
    exp = pd.merge_asof(lp, rp, on="t", direction="backward")
    for _, row in exp.iterrows():
        g = got[row["qid"]]
        if pd.isna(row["v"]):
            assert g is None
        else:
            assert g == row["v"]


@given(
    left=st.lists(st.integers(0, 100), min_size=1, max_size=20),
    right=st.lists(
        st.tuples(st.integers(0, 100), st.floats(-10, 10, allow_nan=False)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    tol=st.integers(0, 20),
)
@_slow
def test_asof_tolerance_matches_pandas(spark, left, right, tol):
    """asof_join(tolerance) ≡ pandas merge_asof(tolerance=...) backward."""
    from res2df_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [("k", t, i) for i, t in enumerate(left)], "k string, t long, qid long"
    )
    rdf = spark.createDataFrame(
        [("k", t, v) for t, v in right], "k string, t long, v double"
    )
    got = {
        r["qid"]: r["v"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t",
            value_cols=["v"], tolerance_expr=str(tol),
        ).collect()
    }
    lp = pd.DataFrame({"t": left, "qid": range(len(left))}).sort_values(
        "t", kind="mergesort"
    )
    rp = pd.DataFrame(right, columns=["t", "v"]).sort_values("t", kind="mergesort")
    exp = pd.merge_asof(lp, rp, on="t", direction="backward", tolerance=tol)
    for _, row in exp.iterrows():
        g = got[row["qid"]]
        if pd.isna(row["v"]):
            assert g is None
        else:
            assert g == row["v"]


@given(
    pts=st.lists(
        st.tuples(
            # round x to 1e-6 grid: at denormal-scale x-gaps pandas'
            # slope (y1-y0)/(x1-x0) overflows to ±inf, so the oracle
            # itself is wrong there, not the operator under test
            st.floats(0, 100, allow_nan=False).map(lambda v: round(v, 6)),
            st.one_of(st.none(), st.floats(-5, 5, allow_nan=False)),
        ),
        min_size=2,
        max_size=15,
        unique_by=lambda t: t[0],
    )
)
@_slow
def test_interpolate_matches_pandas(spark, pts):
    """interpolate_linear ≡ pandas Series.interpolate(method='index',
    limit_area='inside')."""
    from res2df_spark.operators.interpolate import interpolate_linear

    df = spark.createDataFrame([("g", x, y) for x, y in pts], "g string, x double, y double")
    out = interpolate_linear(df, "x", "y", partition_by=["g"], out_col="f")
    got = {r["x"]: r["f"] for r in out.collect()}

    s = pd.Series(
        [y for _, y in sorted(pts)], index=[x for x, _ in sorted(pts)], dtype=float
    )
    exp = s.interpolate(method="index", limit_area="inside")
    for x, e in exp.items():
        g = got[x]
        if pd.isna(e):
            assert g is None, (x, g, e)
        else:
            assert g is not None and abs(g - e) < 1e-9, (x, g, e)


@given(
    vals=st.lists(st.integers(0, 2), min_size=1, max_size=30),
)
@_slow
def test_rle_distributed_matches_serial(spark, vals):
    from res2df_spark.sinks.writers import rle_encode_distributed

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "idx int, v int")
    runs = rle_encode_distributed(df, "idx", "v").orderBy("start_idx").collect()
    text = " ".join(
        f"{r.run_length}*{r.value}" if r.run_length > 1 else str(r.value) for r in runs
    )
    assert text == rle_encode(vals)


@given(
    texts=st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=120), min_size=1, max_size=8
    ),
    chunk=st.integers(2, 40),
    overlap=st.integers(0, 20),
)
@_slow
def test_doc_chunks_reconstruct(spark, texts, chunk, overlap):
    """Dropping each chunk's overlap prefix and concatenating rebuilds
    the document exactly; every chunk is within [1, chunk] chars."""
    from res2df_spark.llm.curation import doc_chunks

    if overlap >= chunk:
        overlap = chunk - 1
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = doc_chunks(df, chunk_chars=chunk, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text
    for i, t in enumerate(texts):
        if not t:
            assert i not in by_doc
            continue
        chunks = [by_doc[i][k] for k in sorted(by_doc[i])]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == t
        assert all(1 <= len(c) <= chunk for c in chunks)


@given(
    ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=30, unique=True),
    toks=st.integers(1, 50),
    target=st.integers(1, 100),
)
@_slow
def test_pack_sequences_matches_serial(spark, ids, toks, target):
    """Sharded packing ≡ a serial per-shard simulation."""
    from res2df_spark.llm.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, "w " * toks) for i in ids], "doc_id long, text string"
    )
    out = pack_sequences(df, target_tokens=target, n_shards=4).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        before = 0
        for r in rows:
            assert r.n_tokens == toks
            assert r.bin_id == before // target
            before += r.n_tokens


@given(
    soup=st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po", "Ps", "Pe"),
            whitelist_characters="/*'\n\t-",
        ),
        max_size=400,
    )
)
@settings(max_examples=200, deadline=None)
def test_parse_deck_never_crashes(soup):
    """Robustness fuzz: arbitrary token soup must parse to a list or
    raise ValueError — never an uncaught TypeError/IndexError/KeyError.
    (The reference leans on opm's C parser for this hardening; the
    pure-Python schedule parser needs its own.)"""
    from res2df_spark.sources.deck import parse_deck

    try:
        recs = parse_deck(soup)
    except ValueError:
        return
    assert isinstance(recs, list)


@given(
    soup=st.text(alphabet="AB 12/*'\n", max_size=200),
    kw=st.sampled_from(["COMPDAT", "WELSPECS", "DATES", "WELOPEN"]),
)
@settings(max_examples=100, deadline=None)
def test_parse_deck_with_keyword_prefix_never_crashes(soup, kw):
    """Same fuzz but anchored with a real keyword header, driving the
    record-splitting and typed-item paths."""
    from res2df_spark.sources.deck import parse_deck

    try:
        recs = parse_deck(kw + "\n" + soup)
    except ValueError:
        return
    assert isinstance(recs, list)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc ax by cz dq".split()), min_size=1, max_size=30),
        min_size=1, max_size=8,
    )
)
def test_segment_dedup_matches_python_reference(spark, docs):
    """remove_repeated_segments relies on array_distinct preserving
    first-occurrence order — pin that against a direct reference."""
    from res2df_spark.llm.dedup import remove_repeated_segments

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in remove_repeated_segments(df, sep=" ").collect()}
    for i, toks in enumerate(docs):
        expected = list(dict.fromkeys(toks))  # first-occurrence order
        assert got[i].n_segments == len(toks)
        assert got[i].n_unique == len(expected)
        assert got[i].dedup_text == " ".join(expected)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=32),
                 min_size=1, max_size=8),
        min_size=1, max_size=6,
    )
)
def test_quantize_matches_numpy_reference(spark, vecs):
    from res2df_spark.llm.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for i, v in enumerate(vecs):
        lo, hi = min(v), max(v)
        if hi == lo:
            expected = [0] * len(v)
        else:
            expected = [int(np.floor((x - lo) * 255.0 / (hi - lo) + 0.5)) for x in v]
        assert list(got[i].codes) == expected
        assert got[i].lo == lo and got[i].hi == hi


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(1, 4),
)
@_slow
def test_tfidf_matches_pandas_reference(spark, docs, k):
    """tfidf_topk ≡ a direct pandas tf·ln(N/df) computation with the
    same (ROUNDED score desc, term asc) tie-break.  Ranking must use
    the 6dp-rounded score on both sides: ln is only 1-ulp-reproducible
    across math libraries, so unrounded ranking flips exact ties (e.g.
    2·ln(9/3) vs 1·ln(9/1)) between the JVM and libm."""
    import math

    from res2df_spark.llm.vocab import tfidf_topk

    rows_in = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    sdf = spark.createDataFrame(rows_in, "doc_id int, text string")
    got = rows(tfidf_topk(sdf, k=k), "doc_id", "term", "tf", "df", "tfidf", "rnk")

    # N counts documents contributing >= 1 term (zero-token docs have
    # no postings and must not inflate idf)
    n_docs = sum(1 for toks in docs if toks)
    tf: dict[tuple[int, str], int] = {}
    for i, toks in enumerate(docs):
        for t in toks:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    df: dict[str, int] = {}
    for (_i, t) in tf:
        df[t] = df.get(t, 0) + 1
    expected = []
    for i in range(len(docs)):
        terms = [(t, c) for (d, t), c in tf.items() if d == i]
        scored = sorted(
            (
                (-round(c * math.log(n_docs / df[t]), 6), t, c)
                for t, c in terms
            )
        )
        for rnk, (neg, t, c) in enumerate(scored[:k], start=1):
            expected.append((i, t, c, df[t], -neg, rnk))
    assert sorted(got) == sorted(expected)


@given(
    counts=st.lists(st.integers(1, 200), min_size=1, max_size=5),
    alpha=st.floats(0.2, 1.0),
)
@_slow
def test_temperature_mix_rates_property(spark, counts, alpha):
    """Per-source keep counts stay within hash-binomial bounds of the
    p^alpha target rate, the rarest source always keeps everything,
    and membership is deterministic."""
    from pyspark.sql import functions as F

    from res2df_spark.llm.curation import temperature_mix

    rows_in = []
    i = 0
    for s, n in enumerate(counts):
        for _ in range(n):
            rows_in.append((i, f"s{s}"))
            i += 1
    df = spark.createDataFrame(rows_in, "doc_id long, source string")
    out = temperature_mix(df, alpha=alpha)
    kept = {
        r[0]: r[1]
        for r in rows(out.groupBy("source").count(), "source", "count")
    }
    min_n = min(counts)
    max_ratio = min_n ** (alpha - 1.0)
    for s, n in enumerate(counts):
        rate = min(round(256 * (n ** (alpha - 1.0)) / max_ratio) / 256, 1.0)
        got = kept.get(f"s{s}", 0)
        if n == min_n:
            assert got == n  # rarest source keeps everything
        # binomial bound: expectation n·rate ± 4·sqrt(n·rate·(1-rate)) + 1
        mu = n * rate
        tol = 4 * (n * rate * (1 - rate)) ** 0.5 + 1
        assert mu - tol <= got <= mu + tol, (s, n, rate, got)


# ---------------------------------------------------------------------------
# Round-5 operators: pagerank mass conservation, containment vs a
# brute-force python reference, line-dedup subsequence invariants.


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    iters=st.integers(1, 3),
)
@_slow
def test_pagerank_mass_and_reference(spark, edges, iters):
    """Distributed PageRank equals a dict-based power iteration, and
    when every node has out-edges total mass stays exactly 1."""
    from res2df_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, damping=0.85, iterations=iters).collect()
    }
    nodes = sorted({f"n{a}" for a, _ in edges} | {f"n{b}" for _, b in edges})
    n = len(nodes)
    out: dict[str, list[str]] = {}
    for a, b in edges:
        out.setdefault(f"n{a}", []).append(f"n{b}")
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        nxt = {v: 0.15 / n for v in nodes}
        for u, dsts in out.items():
            for v in dsts:
                nxt[v] += 0.85 * r[u] / len(dsts)
        r = nxt
    for v in nodes:
        assert abs(got[v] - r[v]) < 1e-5, v
    if all(v in out for v in nodes):  # no dangling nodes
        assert abs(sum(got.values()) - 1.0) < 1e-4


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=12),
        min_size=2,
        max_size=6,
    )
)
@_slow
def test_containment_matches_python_sets(spark, docs):
    """containment_pairs (word tokens) equals brute-force set math."""
    from res2df_spark.llm.dedup import containment_pairs

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        (r["d1"], r["d2"]): (r["n_shared"], r["c1"], r["c2"])
        for r in containment_pairs(df, threshold=0.5, shingle_k=None).collect()
    }
    sets = [set(d) for d in docs]
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            if inter and max(inter / len(sets[i]), inter / len(sets[j])) >= 0.5:
                want[(i, j)] = inter
    assert set(got) == set(want)
    for (i, j), (n_shared, c1, c2) in got.items():
        assert n_shared == want[(i, j)]
        assert abs(c1 - round(n_shared / len(sets[i]), 6)) < 1e-9
        assert abs(c2 - round(n_shared / len(sets[j]), 6)) < 1e-9


@given(
    docs=st.lists(
        st.lists(st.sampled_from("pqrs"), min_size=0, max_size=20),
        min_size=1,
        max_size=5,
    ),
    window=st.integers(2, 5),
)
@_slow
def test_line_dedup_invariants(spark, docs, window):
    """kept_text tokens are an ordered sub-sequence of the original,
    n_kept ≤ n_segments, and a doc with globally unique segments is
    untouched."""
    from res2df_spark.llm.dedup import cross_doc_segment_dedup

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = {
        r["doc_id"]: r
        for r in cross_doc_segment_dedup(df, window=window).collect()
    }
    for i, toks in enumerate(docs):
        if not toks:
            assert i not in out  # empty docs yield no segments
            continue
        row = out[i]
        assert 0 <= row["n_kept"] <= row["n_segments"]
        kept = row["kept_text"].split() if row["kept_text"] else []
        # ordered subsequence check
        it = iter(toks)
        assert all(any(k == t for t in it) for k in kept)


@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),          # group
            st.integers(0, 4),                          # date index
            st.floats(-100, 100, allow_nan=False),      # v1
            st.one_of(st.none(), st.floats(-5, 5, allow_nan=False)),  # v2
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@_slow
def test_dates_to_headers_stack_roundtrip(spark, data):
    """dates_to_headers ∘ stack_dated_columns is the identity on any
    stacked frame (one row per (id, date)): pivoting to NAME@date
    headers and melting back reproduces exactly the non-NULL cells."""
    import datetime as dt

    from pyspark.sql import functions as F

    from res2df_spark.operators.reshape import (
        dates_to_headers,
        stack_dated_columns,
    )

    base = dt.date(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (g, dt.datetime.combine(base + dt.timedelta(days=30 * di), dt.time()), v1, v2)
            for g, di, v1, v2 in data
        ],
        "g string, DATE timestamp, V1 double, V2 double",
    )
    wide = dates_to_headers(df, ["g"])
    back = stack_dated_columns(
        wide, ["g"], [c for c in wide.columns if "@" in c],
        var_name="name", date_name="d", value_name="v",
    ).filter(F.col("v").isNotNull())
    got = {
        (r.g, r.name, r.d.isoformat(), round(r.v, 9)) for r in back.collect()
    }
    want = set()
    for g, di, v1, v2 in data:
        d = (base + dt.timedelta(days=30 * di)).isoformat()
        want.add((g, "V1", d, round(v1, 9)))
        if v2 is not None:
            want.add((g, "V2", d, round(v2, 9)))
    assert got == want


@given(
    cols=st.lists(
        st.lists(
            st.one_of(st.none(), st.integers(-3, 3)), min_size=0, max_size=8
        ),
        min_size=1,
        max_size=5,
    ).filter(lambda cs: len({len(c) for c in cs}) == 1)
)
@_slow
def test_drop_constant_columns_matches_pandas_unique(spark, cols):
    """drop_constant_columns ≡ the reference's pandas rule
    (grid.py:590-620): drop iff len(col.unique()) == 1 with NaN/None
    counting as a value; empty frames are returned unchanged."""
    from res2df_spark.modules.grid import drop_constant_columns

    n = len(cols[0])
    names = [f"c{i}" for i in range(len(cols))]
    pdf = pd.DataFrame({nm: pd.array(c, dtype="Int64") for nm, c in zip(names, cols)})
    schema = ", ".join(f"{nm} long" for nm in names)
    df = spark.createDataFrame(
        [tuple(None if pd.isna(x) else int(x) for x in row)
         for row in pdf.itertuples(index=False)],
        schema,
    ) if n else spark.createDataFrame([], schema)
    out = drop_constant_columns(df)
    if n == 0:
        expect = names  # reference: empty frame returned unchanged
    else:
        expect = [nm for nm in names if len(pdf[nm].unique()) != 1]
    assert out.columns == expect


# ---------------------------------------------------------------------------
# J11 use_wellconnstatus merge (round 10): Spark merge + zone aggregate
# vs an independent pandas model of the reference semantics
# (wellcompletiondata.py:143-215) on randomized inputs.
# ---------------------------------------------------------------------------

_WELLS = ["W1", "W2", "W3"]
_DATES = [pd.Timestamp("2020-01-01"), pd.Timestamp("2020-02-01"),
          pd.Timestamp("2020-03-01")]

_compdat_row = st.tuples(
    st.sampled_from(_WELLS),
    st.integers(1, 2), st.integers(1, 2), st.integers(1, 3),
    st.sampled_from(["OPEN", "SHUT"]),
    st.sampled_from(range(len(_DATES))),
    st.integers(0, 50),
)
_conn_row = st.tuples(
    st.sampled_from(_WELLS),
    st.integers(1, 2), st.integers(1, 2), st.integers(1, 3),
    st.sampled_from(range(len(_DATES))),
    st.sampled_from(["OPEN", "SHUT"]),
)


def _wcd_model(compdat, connstatus, zmap):
    """Clean-room pandas model of the reference merge + aggregation:
    keep-FIRST compdat match per connection (engine tie order
    DATE, OP_SH, KH), wells absent from connstatus fall back to
    compdat, KH fillna(0), NaN-zone groups dropped, zone OPEN iff any
    connection OPEN with KH summed over open connections only."""
    cd = compdat.copy()
    cd["ZONE"] = cd["K"].map(zmap)
    cd = cd.sort_values(["DATE", "OP_SH", "KH"], kind="mergesort")
    key = ["WELL", "I", "J", "K"]
    first = cd.drop_duplicates(key, keep="first")[[*key, "KH", "ZONE"]]
    merged = connstatus.merge(first, on=key, how="left")
    fallback = cd[~cd["WELL"].isin(connstatus["WELL"].unique())]
    out = pd.concat([merged, fallback], ignore_index=True)
    out["KH"] = out["KH"].fillna(0.0)
    out = out[out["ZONE"].notna()]
    recs = []
    for (w, z, d), g in out.groupby(["WELL", "ZONE", "DATE"]):
        op = g[g["OP_SH"] == "OPEN"]
        recs.append((w, z, d.date(), "OPEN" if len(op) else "SHUT",
                     float(op["KH"].sum()) if len(op) else 0.0))
    return sorted(recs)


@given(
    compdat=st.lists(_compdat_row, min_size=1, max_size=12),
    connstatus=st.lists(_conn_row, min_size=0, max_size=10),
)
@_slow
def test_wcd_connstatus_merge_matches_pandas_model(spark, compdat, connstatus):
    from res2df_spark.modules import wellcompletiondata

    zmap = {1: "UP", 2: "LO"}  # K=3 deliberately unmapped
    cd_pdf = pd.DataFrame(
        compdat, columns=["WELL", "I", "J", "K", "OP_SH", "DI", "KH"]
    )
    cd_pdf["DATE"] = cd_pdf["DI"].map(dict(enumerate(_DATES)))
    cd_pdf["KH"] = cd_pdf["KH"].astype(float)
    cs_pdf = pd.DataFrame(
        connstatus, columns=["WELL", "I", "J", "K", "DI", "OP_SH"]
    ).drop_duplicates(["WELL", "I", "J", "K", "DI"])
    cs_pdf["DATE"] = cs_pdf["DI"].map(dict(enumerate(_DATES)))

    conns = spark.createDataFrame(
        [(r.WELL, r.I, r.J, r.K, r.OP_SH, r.DATE.date(), r.KH)
         for r in cd_pdf.itertuples()],
        "WELL string, I int, J int, K int, OP_SH string, DATE date, KH double",
    )
    cs = spark.createDataFrame(
        [(r.WELL, r.I, r.J, r.K, r.DATE.date(), r.OP_SH)
         for r in cs_pdf.itertuples()],
        "WELL string, I int, J int, K int, DATE date, `OP/SH` string",
    )
    zonemap = spark.createDataFrame(list(zmap.items()), "K int, ZONE string")
    out = wellcompletiondata.df(conns, zonemap, connstatus=cs)
    got = sorted(
        (r["WELL"], r["ZONE"], r["DATE"], r["OP/SH"], float(r["KH"]))
        for r in out.collect()
    )
    want = _wcd_model(
        cd_pdf[["WELL", "I", "J", "K", "OP_SH", "DATE", "KH"]],
        cs_pdf[["WELL", "I", "J", "K", "DATE", "OP_SH"]].rename(
            columns={"OP_SH": "OP_SH"}
        ),
        zmap,
    )
    assert got == want


# ---------------------------------------------------------------------------
# trans composition (round 10): trans_full(vectors, coords, group, nnc)
# vs an independent pandas model of the reference pipeline
# (trans.py:104-219) on randomized grids.
# ---------------------------------------------------------------------------

_cell = st.tuples(
    st.integers(1, 2), st.integers(1, 2), st.integers(1, 2),  # I, J, K
    st.integers(1, 3),                                        # FIPNUM
    st.integers(0, 20), st.integers(0, 20), st.integers(0, 20),  # TRAN*
)


def _trans_model(grid, nnc, region="FIPNUM"):
    """Clean-room pandas model: directional faces for TRAN*>0 with
    synthesized neighbour addresses, NNC union, both-cell region merge
    (inner), boundary filter, min-max pair key with summed TRAN."""
    faces = []
    for _, r in grid.iterrows():
        for vec, (di, dj, dk), d in (("TRANX", (1, 0, 0), "I"),
                                     ("TRANY", (0, 1, 0), "J"),
                                     ("TRANZ", (0, 0, 1), "K")):
            if r[vec] > 0:
                faces.append((r.I, r.J, r.K, r.I + di, r.J + dj, r.K + dk,
                              d, float(r[vec])))
    for _, r in nnc.iterrows():
        faces.append((r.I1, r.J1, r.K1, r.I2, r.J2, r.K2, "NNC",
                      float(r.TRAN)))
    # itertuples keeps dtypes; iterrows would upcast FIPNUM to float
    # and corrupt the pair-key strings
    fip = {(r.I, r.J, r.K): int(getattr(r, region)) for r in grid.itertuples()}
    agg: dict[str, float] = {}
    for i1, j1, k1, i2, j2, k2, d, tran in faces:
        f1, f2 = fip.get((i1, j1, k1)), fip.get((i2, j2, k2))
        if f1 is None or f2 is None or f1 == f2:
            continue  # inner merge drop / boundary filter
        key = f"{min(f1, f2)}-{max(f1, f2)}"
        agg[key] = agg.get(key, 0.0) + tran
    return sorted((k, round(v, 6)) for k, v in agg.items())


@given(
    cells=st.lists(_cell, min_size=1, max_size=8, unique_by=lambda c: c[:3]),
    nnc_tran=st.integers(0, 10),
)
@_slow
def test_trans_group_matches_pandas_model(spark, cells, nnc_tran):
    from res2df_spark.modules.grid import trans_full

    grid_pdf = pd.DataFrame(
        cells, columns=["I", "J", "K", "FIPNUM", "TRANX", "TRANY", "TRANZ"]
    ).astype({"TRANX": float, "TRANY": float, "TRANZ": float})
    nnc_pdf = pd.DataFrame(
        [(1, 1, 1, 2, 2, 2, float(nnc_tran))] if nnc_tran else [],
        columns=["I1", "J1", "K1", "I2", "J2", "K2", "TRAN"],
    )
    grid = spark.createDataFrame(
        grid_pdf, "I int, J int, K int, FIPNUM int, TRANX double, "
                  "TRANY double, TRANZ double",
    )
    nnc = spark.createDataFrame(
        nnc_pdf, "I1 int, J1 int, K1 int, I2 int, J2 int, K2 int, TRAN double",
    ) if len(nnc_pdf) else None
    out = trans_full(grid, vectors=["FIPNUM"], group=True, nnc=nnc)
    got = sorted(
        (r["FIPNUMPAIR"], round(float(r["TRAN"]), 6)) for r in out.collect()
    )
    assert got == _trans_model(grid_pdf, nnc_pdf)


# ---------------------------------------------------------------------------
# asof_enrich_stream vectorization (round 10): the merge_asof-based
# _enrich_batch vs a transcription of the one-pass walk semantics it
# replaced, on randomized micro-batches with randomized carried state,
# including multi-batch state threading.
# ---------------------------------------------------------------------------


def _walk_model(pdf, cur):
    """The round-9 per-row walk, as the semantic model: sorted
    (ts, probe, value) with NaT first; NULL probe flags dropped;
    obs before probes at equal times; state advances on
    (ts, payload) >= current with NULL-smallest payload order;
    NULL-time probes and past-state probes get None."""
    def null(v):
        return v is None or (isinstance(v, float) and v != v) or pd.isna(v)

    def cmp(a, b):
        for x, y in zip(a, b):
            xn, yn = null(x), null(y)
            if xn and yn:
                continue
            if xn or yn:
                return -1 if xn else 1
            if x == y:
                continue
            return -1 if x < y else 1
        return 0

    pdf = pdf[pdf["probe"].notna()]
    pdf = pdf.sort_values(["ts", "probe", "v"], kind="mergesort",
                          na_position="first")
    cur = list(cur) if cur is not None else None
    matched = []
    for r in pdf.itertuples():
        if bool(r.probe):
            if cur is None or pd.isna(r.ts) or cur[0] > r.ts:
                matched.append((r.Index, None))
            else:
                matched.append((r.Index, cur[1]))
        else:
            if pd.isna(r.ts):
                continue
            vals = [r.v]
            if cur is None or r.ts > cur[0] or (
                r.ts == cur[0] and cmp(vals, cur[1:]) >= 0
            ):
                cur = [r.ts] + vals
    return matched, cur


_ts_vals = [pd.Timestamp("2020-01-01") + pd.Timedelta(hours=h)
            for h in range(4)] + [pd.NaT]
_v_vals = [None, 1.0, 2.0]
_row = st.tuples(
    st.sampled_from(range(len(_ts_vals))),
    st.sampled_from([True, False, None]),
    st.sampled_from(range(len(_v_vals))),
)


def _mk_pdf(rows):
    return pd.DataFrame({
        "ts": pd.Series([_ts_vals[t] for t, _, _ in rows],
                        dtype="datetime64[ns]"),
        "probe": pd.Series([p for _, p, _ in rows], dtype="object"),
        "v": pd.Series([_v_vals[v] for _, _, v in rows], dtype="object"),
    })


def _norm_state(cur):
    if cur is None:
        return None
    return (pd.Timestamp(cur[0]), None if pd.isna(cur[1]) else cur[1])


@given(
    rows=st.lists(_row, min_size=0, max_size=14),
    state_v=st.sampled_from(range(len(_v_vals))),
    has_state=st.booleans(),
    split=st.integers(0, 14),
)
@settings(max_examples=120, deadline=None)
def test_enrich_batch_matches_walk_model(rows, state_v, has_state, split):
    from res2df_spark.streaming.ops import _enrich_batch

    cur0 = ([pd.Timestamp("2020-01-01T01:00:00"), _v_vals[state_v]]
            if has_state else None)

    def run_vec(batches):
        cur = cur0
        got = []
        for b in batches:
            out, cur = _enrich_batch(b.copy(), cur, "ts", "probe", ["v"])
            if out is not None:
                got.extend(
                    (r.ts if not pd.isna(r.ts) else None,
                     None if r.v is None or pd.isna(r.v) else r.v)
                    for r in out.itertuples()
                )
        return sorted(got, key=str), _norm_state(cur)

    def run_walk(batches):
        cur = cur0
        got = []
        for b in batches:
            matched, cur = _walk_model(b, cur)
            sub = b.loc[[i for i, _ in matched]]
            got.extend(
                (ts if not pd.isna(ts) else None, m)
                for (_, m), ts in zip(matched, sub["ts"])
            )
        return sorted(got, key=str), _norm_state(cur)

    pdf = _mk_pdf(rows)
    # single batch
    assert run_vec([pdf]) == run_walk([pdf])
    # the same rows split across two micro-batches, state threaded
    cut = min(split, len(pdf))
    parts = [pdf.iloc[:cut].reset_index(drop=True),
             pdf.iloc[cut:].reset_index(drop=True)]
    assert run_vec(parts) == run_walk(parts)
