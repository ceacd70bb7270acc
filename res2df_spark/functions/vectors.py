"""Dense-vector arithmetic over ``array<float>`` columns — the substrate
for embedding similarity search.  Pure higher-order functions
(``zip_with`` + ``aggregate``): JVM-side, no Python round-trip, and the
double accumulator keeps precision stable for the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Length-mismatched vectors yield NULL (``zip_with`` NULL-pads the
    shorter side, and NULL products poison the sum) — callers treating
    NULL similarity as "no match" thereby skip corrupt rows rather than
    scoring them; validate dimensionality upstream where a loud failure
    is wanted (profile the column or assert ``size()`` once per table,
    not per pair)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity with a zero-norm guard: a direction-less
    (all-zero) vector has similarity 0.0 to everything — without the
    guard, ANSI mode (this session's default) ABORTS the whole job on
    the division by zero, so one empty-document embedding would kill a
    corpus-scale ANN/dedup run.

    A NULL vector yields NULL (the same skip-corrupt-rows contract as
    :func:`dot` for length mismatches) — a missing embedding must read
    as "unknown", not as "dissimilar to everything", or a novelty scan
    would rate every corrupt row maximally novel.  The top-k scorers
    additionally filter NULL embeddings up front."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).when(
        a.isNotNull() & b.isNotNull(), F.lit(0.0)
    )
