"""Multimodal columns: opaque binary payloads with typed metadata.

The north-star pipeline treats image/audio/video as ``binary`` columns
plus metadata (mime, byte length, content hash).  All Spark-side
plumbing — schema, partition sizing, Arrow batch shape — is real; the
actual codec step is stubbed (decode libraries are not in this
environment) behind ``decoder=`` hooks:

* pass ``decoder=None`` (default) → deterministic fake features derived
  from the payload bytes (length, first/last byte, md5-derived values) —
  stable across engines and useful for testing the plumbing;
* pass a real decoder (e.g. PIL/torchaudio wrapper) in production.

Design for 100 TB: ``mapInPandas`` streams Arrow record batches, so an
executor never materializes more than ``spark.sql.execution.arrow.
maxRecordsPerBatch`` payloads; binary payloads stay off the driver; the
feature schema is fixed so downstream is pure relational.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def feature_schema(id_type=LongType(), id_name: str = "doc_id") -> StructType:
    """Schema of an extracted feature record: typed metadata plus one
    ``features array<double>`` column — arity-independent, so a real
    embedder emitting hundreds of dims plugs in without editing the
    module (the feature COUNT travels as data in ``n_features``, and
    the schema never changes with it).  ``id_type``/``id_name`` follow
    the input id column: integral ids come back as longs, anything
    else as strings, and the field keeps the CALLER'S column name so
    downstream joins on the original key resolve
    (:func:`extract_features` passes both through from its input)."""
    return StructType(
        [
            StructField(id_name, id_type),
            StructField("n_bytes", LongType()),
            StructField("content_md5", StringType()),
            StructField("features", ArrayType(DoubleType())),
            StructField("n_features", LongType()),
        ]
    )


#: Default feature-record schema (long ids).
FEATURE_SCHEMA = feature_schema()


def attach_binary_metadata(
    df: DataFrame, payload_col: str = "payload", mime: str = "application/octet-stream"
) -> DataFrame:
    """Typed metadata columns for an opaque binary payload column."""
    b = F.col(payload_col)
    return df.withColumns(
        {
            "mime": F.lit(mime),
            "n_bytes": F.octet_length(b).cast("long"),
            "content_md5": F.md5(b),
        }
    )


def _fake_features(payload: bytes, n_features: int = 2) -> tuple[float, ...]:
    """Deterministic stand-in for a decode→embed step: ``n_features``
    doubles in [0, 1) from chained md5 digests.  Block 0 is
    md5(payload); block b > 0 is md5(hexdigest₀ + str(b)) — HEX-STRING
    chaining so an ANSI-SQL oracle reproduces every block; each block's
    32 hex chars yield four 8-nibble doubles.  Replace with a real
    decoder in production; the Spark plumbing is identical."""
    h0 = hashlib.md5(payload).hexdigest()
    feats: list[float] = []
    block = 0
    h = h0
    while len(feats) < n_features:
        if block > 0:
            h = hashlib.md5((h0 + str(block)).encode()).hexdigest()
        for j in range(4):
            if len(feats) == n_features:
                break
            feats.append(int(h[8 * j : 8 * j + 8], 16) / 2**32)
        block += 1
    return tuple(feats)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], tuple[float, ...]] | None = None,
    n_features: int = 2,
) -> DataFrame:
    """Decode/feature-extract binary payloads via ``mapInPandas``.

    Arrow streams record batches through the Python worker; each batch
    yields one feature frame.  ``decoder`` maps payload bytes → a
    feature tuple of EXACTLY ``n_features`` values (validated per call
    — a short tuple would otherwise IndexError mid-corpus in a worker
    and a long one would silently lose features); the default is the
    deterministic fake (see module docstring) at that arity.  Because
    the output schema is ``features array<double>`` + ``n_features``
    (not per-feature columns), a real 512-dim embedder plugs in by
    passing ``decoder=..., n_features=512`` without touching the Spark
    side.
    """
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    if not isinstance(df.schema[payload_col].dataType, BinaryType):
        df = df.withColumn(payload_col, F.col(payload_col).cast("binary"))
    dec = decoder or (lambda p: _fake_features(p, n_features))
    # id dtype follows the input: integral ids come back as longs (the
    # string transport below reconverts exactly), anything else (uuid
    # strings, composite keys) stays a string — feature_schema(id_type)
    # is how the output schema tracks it
    from pyspark.sql.types import ByteType, IntegerType, ShortType

    integral = isinstance(
        df.schema[id_col].dataType,
        (LongType, IntegerType, ShortType, ByteType),
    )
    schema = feature_schema(
        LongType() if integral else StringType(), id_name=id_col
    )

    def _checked(p: bytes):
        f = dec(p)
        if len(f) != n_features:
            raise ValueError(
                f"decoder returned {len(f)} features but n_features="
                f"{n_features} was declared — fix the decoder or the "
                "declaration"
            )
        return [float(v) for v in f]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            # NULL payloads stay in the output (row count preserved)
            # with NULL features — a missing binary must not abort the
            # corpus-wide featurization job
            payloads = [None if p is None else bytes(p) for p in pdf[payload_col]]
            feats = [None if p is None else _checked(p) for p in payloads]
            yield pd.DataFrame(
                {
                    # ids travel as strings (see the select below); for
                    # integral inputs convert object->Int64 exactly (a
                    # NULL-bearing batch of raw longs would arrive
                    # float64-with-NaN, where astype silently corrupts
                    # ids above 2^53); non-integral ids stay strings
                    id_col: (
                        pdf[id_col].astype("Int64") if integral else pdf[id_col]
                    ),
                    "n_bytes": [None if p is None else len(p) for p in payloads],
                    "content_md5": [
                        None if p is None else hashlib.md5(p).hexdigest()
                        for p in payloads
                    ],
                    "features": feats,
                    "n_features": [
                        None if f is None else len(f) for f in feats
                    ],
                }
            )

    return df.select(
        F.col(id_col).cast("string").alias(id_col), payload_col
    ).mapInPandas(run, schema)


def frame_schema(id_type=LongType(), id_name: str = "doc_id") -> StructType:
    """Schema of a sampled frame record (one row per kept frame) —
    ``id_type``/``id_name`` follow the input id column exactly like
    :func:`feature_schema`."""
    return StructType(
        [
            StructField(id_name, id_type),
            StructField("frame_idx", LongType()),
            StructField("n_frames", LongType()),
            StructField("frame_bytes", LongType()),
            StructField("frame_md5", StringType()),
        ]
    )


#: Default frame-record schema (long ids).
FRAME_SCHEMA = frame_schema()


def chunk_bytes(payload: bytes, frame_size: int) -> list[bytes]:
    """Default fake demuxer: fixed-size byte blocks (last block ragged).
    A real container demuxer (mp4/mkv frame extraction) plugs in via the
    ``splitter=`` hook with the identical signature."""
    return [payload[i : i + frame_size] for i in range(0, len(payload), frame_size)]


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 64,
    every_n: int = 10,
    splitter: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Split each binary payload into frames and keep every
    ``every_n``-th one (frames 0, n, 2n, …) — the video frame-sampling
    primitive of the north-star pipeline.

    ``splitter`` maps payload bytes → ordered list of frame byte
    strings; the default chunks into fixed ``frame_size`` blocks (a
    deterministic fake codec — swap in a real demuxer without touching
    the Spark side).  One input row fans out to
    ``ceil(n_frames / every_n)`` output rows carrying the frame index,
    total frame count, frame byte length and content hash.

    100 TB design: ``mapInPandas`` streams Arrow record batches, so an
    executor holds one batch of payloads at a time; the fan-out happens
    inside the Python worker (no explode of a giant array column), and
    the output is a fixed relational schema.  NULL/empty payloads yield
    no rows.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if splitter is None and frame_size < 1:
        raise ValueError(f"frame_size must be >= 1, got {frame_size}")
    if not isinstance(df.schema[payload_col].dataType, BinaryType):
        df = df.withColumn(payload_col, F.col(payload_col).cast("binary"))
    split = splitter or (lambda p: chunk_bytes(p, frame_size))
    # id dtype/name follow the input, exactly like extract_features:
    # integral ids come back as longs (exact string round-trip),
    # anything else (uuids, 'img-001') stays a string instead of dying
    # in int() mid-corpus
    from pyspark.sql.types import ByteType, IntegerType, ShortType

    integral = isinstance(
        df.schema[id_col].dataType,
        (LongType, IntegerType, ShortType, ByteType),
    )
    schema = frame_schema(
        LongType() if integral else StringType(), id_name=id_col
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                id_col: [],
                "frame_idx": [],
                "n_frames": [],
                "frame_bytes": [],
                "frame_md5": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                # skip NULL payloads AND NULL ids: a frame row without an
                # owning doc id is unjoinable downstream, and int(None)
                # would crash the worker mid-corpus.  ids travel as
                # strings (see the select below), so int() stays exact
                # above 2^53 even in NULL-bearing batches.
                if payload is None or pd.isna(doc_id):
                    continue
                frames = split(bytes(payload))
                for idx in range(0, len(frames), every_n):
                    out[id_col].append(int(doc_id) if integral else doc_id)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(len(frames))
                    out["frame_bytes"].append(len(frames[idx]))
                    out["frame_md5"].append(hashlib.md5(frames[idx]).hexdigest())
            yield pd.DataFrame(out)

    return df.select(
        F.col(id_col).cast("string").alias(id_col), payload_col
    ).mapInPandas(run, schema)


def export_tar_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    meta_cols: Sequence[str] = (),
    salt: str = "tar",
) -> DataFrame:
    """WebDataset-style sharded tar export: every sample becomes two tar
    members — ``<id>.bin`` (the binary payload) and ``<id>.json`` (the
    metadata sidecar) — written into ``shard-NNNNN.tar`` files under
    ``out_dir``.

    Sharding is deterministic content hashing (md5(salt‖id) mod
    n_shards — the same engine-portable bucketing as
    ``llm.curation.hash_split``), so a sample lands in the same shard
    on every run and any partitioning.  Each shard is assembled by
    exactly ONE task (``repartition(n_shards, shard)`` then
    ``mapInPandas`` with the stdlib ``tarfile``): payload bytes stream
    executor-side into the tar — nothing is collected to the driver.
    Members are appended in Arrow-batch order within the shard;
    ``sort_within_partitions(id)`` upstream makes the member order
    reproducible too.

    Returns the (shard, n_samples, n_bytes) manifest.  At 100 TB pick
    ``n_shards`` so shards land near the usual 0.1-1 GiB WebDataset
    target; the export is embarrassingly parallel across shards.

    Crash hygiene: attempts write ``.shard-NNNNN.tar.tmp-<uuid>`` and
    commit via atomic rename; a caught failure removes its own temps,
    and a HARD-killed attempt's orphans (SIGKILL/OOM — no cleanup runs)
    are swept by the next attempt that commits the same shard, once
    they are stale (mtime > 1 h — a live speculative twin's temp stays
    fresh while it writes).  Any remaining dot-temp in ``out_dir`` is
    always safe to delete by hand.
    """
    import json as _json

    # full-width (32-bit) hash before the modulo: the 256-bucket helper
    # would cap the export at 256 distinct shards and skew sizes whenever
    # 256 % n_shards != 0 — real exports want thousands of shards
    shard32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col("__id"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    keyed = (
        # NULL ids are unshardable (md5(NULL) is NULL → int(NaN) would
        # crash mid-export) and their tar members would be unnamable —
        # drop them up front, like sample_frames
        df.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).cast("string").alias("__id"),
            F.col(payload_col).alias("__payload"),
            *[F.col(c) for c in meta_cols],
        )
        .withColumn("__shard", (shard32 % n_shards).cast("int"))
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", "__id")
    )
    meta_names = list(meta_cols)

    def write_shards(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import os
        import tarfile
        import uuid

        import pandas as pd

        tars: dict[int, tarfile.TarFile] = {}
        tmp_paths: dict[int, str] = {}
        counts: dict[int, list[int]] = {}
        os.makedirs(out_dir, exist_ok=True)
        import io as _io

        # write-temp-then-rename: each ATTEMPT streams into its own
        # uniquely-named temp file and commits with an atomic replace
        # only after a clean close.  Two concurrent attempts of the same
        # task (speculation, a zombie task surviving a stage retry)
        # would otherwise interleave writes into one shard-NNNNN.tar and
        # corrupt it invisibly; with the rename protocol each attempt's
        # file is self-consistent and identical (the partition is
        # deterministic and sorted), so whichever replace lands last
        # leaves a valid shard.
        try:
            for pdf in batches:
                cols = [pdf["__shard"], pdf["__id"], pdf["__payload"]]
                cols += [pdf[name] for name in meta_names]
                for sh, rid, payload, *meta_vals in zip(*cols):
                    sh = int(sh)
                    if sh not in tars:
                        tmp_paths[sh] = os.path.join(
                            out_dir,
                            f".shard-{sh:05d}.tar.tmp-{uuid.uuid4().hex}",
                        )
                        tars[sh] = tarfile.open(tmp_paths[sh], "w")
                        counts[sh] = [0, 0]
                    payload = bytes(payload or b"")
                    meta = {"id": rid}
                    # numpy scalars (np.int64/np.float64) are not JSON
                    # serializable and default=str would silently turn
                    # every numeric sidecar field into a string —
                    # unwrap to native Python first
                    meta.update(
                        (k, v.item() if hasattr(v, "item") else v)
                        for k, v in zip(meta_names, meta_vals)
                    )
                    mbytes = _json.dumps(meta, default=str).encode()
                    for suffix, data in ((".bin", payload), (".json", mbytes)):
                        info = tarfile.TarInfo(name=f"{rid}{suffix}")
                        info.size = len(data)
                        tars[sh].addfile(info, _io.BytesIO(data))
                    counts[sh][0] += 1
                    counts[sh][1] += len(payload)
        except BaseException:
            # failed attempt: close and remove its temps — never commit
            # a half-written tar over a (possibly valid) earlier one
            for sh, t in tars.items():
                t.close()
                try:
                    os.remove(tmp_paths[sh])
                except OSError:
                    pass
            raise
        for sh, t in tars.items():
            t.close()
            try:
                os.replace(
                    tmp_paths[sh], os.path.join(out_dir, f"shard-{sh:05d}.tar")
                )
            except FileNotFoundError:
                # our temp was swept by a concurrently-committing twin's
                # janitor below (only possible when this attempt stalled
                # >1h mid-write and the twin already committed the SAME
                # shard — partitions are deterministic and sorted, so
                # the committed bytes are identical).  Losing our copy
                # is harmless; failing the attempt would be a spurious
                # strike toward spark.task.maxFailures.
                pass
        # sweep orphaned temps (ADVICE r8): a hard-killed attempt
        # (SIGKILL/OOM/speculation kill) skips the except-cleanup above
        # and strands its .shard-NNNNN.tar.tmp-<uuid> forever; repeated
        # retries would accumulate them.  Only temps for shards THIS
        # attempt just committed, and only when stale (mtime > 1h old):
        # a live speculative twin writes continuously so its temp stays
        # fresh, while an orphan's mtime froze at kill time.  One
        # listdir per task attempt, not per shard.
        import time as _time

        committed = {f".shard-{sh:05d}.tar.tmp-" for sh in tars}
        if committed:
            now = _time.time()
            own = set(tmp_paths.values())
            for name in os.listdir(out_dir):
                p = os.path.join(out_dir, name)
                if (
                    p not in own
                    and any(name.startswith(pre) for pre in committed)
                ):
                    try:
                        if now - os.path.getmtime(p) > 3600:
                            os.remove(p)
                    except OSError:
                        pass  # concurrently removed / still owned
        yield pd.DataFrame(
            {
                "shard": list(counts),
                "n_samples": [c[0] for c in counts.values()],
                "n_bytes": [c[1] for c in counts.values()],
            }
        )

    manifest = (
        keyed.mapInPandas(write_shards, schema="shard int, n_samples long, n_bytes long")
        .groupBy("shard")
        .agg(
            F.sum("n_samples").cast("long").alias("n_samples"),
            F.sum("n_bytes").cast("long").alias("n_bytes"),
        )
    )
    # a writer must be EAGER: the tar files exist when this returns, and
    # the lazy plan is never re-run (a second run would re-write shards).
    # The manifest is shard-count-sized, so materializing it is tiny.
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(
        rows, "shard int, n_samples long, n_bytes long"
    )
