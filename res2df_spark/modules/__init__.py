"""Datatype modules — the engine-layer equivalents of the reference's
per-datatype ``df()`` entry points, built purely from the operator
library over deck-records DataFrames."""
