"""Reference-corpus language-model quality scoring (CCNet lineage:
Wenzek et al. 2020 score documents by perplexity under a LM trained on
a trusted corpus; Brown-corpus-style char n-gram smoothing).

This is the simplified distributable form: a character-n-gram unigram
model with add-one smoothing, trained on a trusted slice of the corpus,
scores every document by mean log-probability of its character n-grams.
Low scores = text unlike the reference distribution (mojibake, binary
spew, wrong language); the score feeds the same gate machinery as
``llm.curation.quality_filter``.

Scale shape: the TRAINED MODEL is bounded by the alphabet, not the
corpus — at most |Σ|^n distinct n-grams (a few thousand for char
bigrams) — so training is one partial-agg groupBy that collapses 100 TB
of text into a kilobyte-scale table, and scoring ships that table to
executors as a map literal evaluated entirely inside codegen: zero
shuffles, zero joins, zero Python on the scoring path.  (For word-level
models whose vocabulary is NOT bounded, swap the map literal for a
broadcast join on the exploded grams — same two-stage shape, one extra
exchange on the doc id.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Hard bound on model size for the map-literal scoring path; char
#: bigrams over any realistic alphabet sit far below this.
MAX_MODEL_SIZE = 100_000


def char_ngrams(text: Column | str, n: int = 2) -> Column:
    """Overlapping character n-grams of lowercased text →
    array<string> (empty for texts shorter than n).  Pure sequence +
    substring transform — codegen'd, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.lower(c)
    ln = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(ln - F.lit(n - 1), F.lit(0)))
    return F.when(
        ln >= n, F.transform(idx, lambda i: F.substring(t, i, n))
    ).otherwise(F.array().cast("array<string>"))


def train_char_lm(train: DataFrame, text_col: str = "text", n: int = 2) -> dict:
    """Count character n-grams over the trusted corpus and return the
    smoothed model as ``{"counts": {gram: cnt}, "total": N, "vocab": V}``.

    One explode + one partial-agg groupBy; the result is alphabet-bounded
    (≤ |Σ|^n rows), so collecting it to the driver is a metadata-sized
    transfer — the same bounded-collect contract as the IVF centroids in
    llm/similarity.py.  Raises if the vocabulary exceeds
    ``MAX_MODEL_SIZE`` (use the broadcast-join variant then).
    """
    counts = (
        train.select(F.explode(char_ngrams(F.col(text_col), n)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = counts.collect()
    if len(rows) > MAX_MODEL_SIZE:
        raise ValueError(
            f"char-{n}-gram vocabulary {len(rows)} exceeds {MAX_MODEL_SIZE}; "
            "use a broadcast-join scorer for unbounded vocabularies"
        )
    model = {r["g"]: r["c"] for r in rows}
    if not model:
        # an empty model is silently "perfect": floor_logp = ln(1/1) = 0
        # would score EVERY document 0.0 (probability 1) and a quality
        # gate thresholding on lm_score keeps/rejects everything
        # uniformly with no signal — fail at training time instead
        raise ValueError(
            f"char-{n}-gram training produced an EMPTY model (every "
            f"train row NULL or shorter than {n} chars) - fix the "
            "train slice; scoring against it would rate all text "
            "probability 1"
        )
    return {"counts": model, "total": sum(model.values()), "vocab": len(model)}


def lm_quality_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    passthrough: tuple = (),
) -> DataFrame:
    """Score every document by mean natural-log probability of its char
    n-grams under the add-one-smoothed model:
    ``logp(g) = ln((count(g) + 1) / (total + vocab + 1))`` — unseen
    grams get the +1 floor.  Returns (id, n_grams, lm_score), score NULL
    for documents shorter than n characters.

    Scoring is a single map-side expression — no shuffle, no UDF, the
    per-doc mean is a left-fold ``aggregate`` over the n-gram array
    (deterministic summation order).  The lookup has two compilations:

    * **dense path** (n=2, byte-alphabet model): the text is split ONCE
      into a materialized code-point array (`split('') → ascii`, O(L)),
      and each gram is an O(1) indexed load from a 65536-slot table at
      ``codes[i]·256 + codes[i+1]``.  Two things here are load-bearing:
      the code array must be a real projected column (a lambda that
      captures an unmaterialized expression re-evaluates it per access
      — a measured 25× blowup), and grams must NOT be built with
      ``substring(t, i, n)`` (char-position seeks on UTF8 strings are
      O(i), making the scan O(L²) per doc — the substring form measured
      3.8× slower on the sf0.1 corpus).
    * **map-literal fallback** (n≠2 or wider alphabets): ``element_at``
      on a literal map.  Spark's literal maps are array-backed, so each
      lookup is a LINEAR scan of the vocabulary — correct but ~|V|×
      slower per gram; the dense path exists precisely because that
      scan dominated the benchmark (6.8 s → sub-second at sf0.1).
    """
    denom = float(model["total"] + model["vocab"] + 1)
    import math

    floor_logp = math.log(1.0 / denom)
    dense_ok = n == 2 and all(
        len(g) == 2 and ord(g[0]) < 256 and ord(g[1]) < 256
        for g in model["counts"]
    )
    if dense_ok:
        dense = [floor_logp] * 65536
        for g, c in model["counts"].items():
            dense[ord(g[0]) * 256 + ord(g[1])] = math.log((c + 1.0) / denom)
        # The table rides along as a ONE-ROW broadcast dimension rather
        # than an array literal: a 65536-element literal becomes a
        # 65536-child expression the driver re-analyzes on every action
        # (seconds of planning), while a broadcast row ships the table
        # to executors once and the plan stays a handful of nodes.
        spark = docs.sparkSession
        lut_df = spark.createDataFrame([(dense,)], "__lm_vals: array<double>")
        docs = docs.crossJoin(F.broadcast(lut_df)).withColumn(
            "__lm_codes",
            F.transform(F.split(F.lower(F.col(text_col)), ""), F.ascii),
        )
        codes = F.col("__lm_codes")
        vals = F.col("__lm_vals")
        # size(codes) is the char count; NULL text → NULL size, which
        # greatest() skips → k = 0 → NULL score, matching the gram path
        k = F.greatest(F.size(codes) - 1, F.lit(0))

        def lk(a0, a1):
            return F.when(
                (a0 < 256) & (a1 < 256),
                F.element_at(vals, a0 * 256 + a1 + 1),
            ).otherwise(F.lit(floor_logp))

        # sequence(1, 0) DESCENDS ([1, 0]) and element_at(_, 0) is an
        # ANSI error — short/empty/NULL texts need the empty-array arm
        idx = F.when(k > 0, F.sequence(F.lit(1), k)).otherwise(
            F.array().cast("array<int>")
        )
        logp = F.aggregate(
            idx,
            F.lit(0.0),
            lambda acc, i: acc
            + lk(F.element_at(codes, i), F.element_at(codes, i + 1)),
        )
        return docs.select(
            F.col(id_col),
            *[F.col(c) for c in passthrough],
            k.cast("long").alias("n_grams"),
            F.when(k > 0, F.round(logp / k, 4)).alias("lm_score"),
        )
    else:
        flat = []
        for g, c in sorted(model["counts"].items()):
            flat.append(F.lit(g))
            flat.append(F.lit(float(math.log((c + 1.0) / denom))))
        lut = (
            F.create_map(*flat)
            if flat
            else F.create_map().cast("map<string,double>")
        )

        def logp_of(g):
            return F.coalesce(F.element_at(lut, g), F.lit(floor_logp))

    grams = char_ngrams(F.col(text_col), n)
    k = F.size(grams)
    logp = F.aggregate(grams, F.lit(0.0), lambda acc, g: acc + logp_of(g))
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        k.cast("long").alias("n_grams"),
        F.when(k > 0, F.round(logp / k, 4)).alias("lm_score"),
    )
