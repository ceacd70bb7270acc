"""Streaming operators (extension beyond the batch-only reference).

* ``status_change_stream`` — the streaming variant of W3
  (/root/reference/src/res2df/wellconnstatus.py:34-86: emit an event
  when a per-connection state flips).  Batch W3 is a ``lag()`` window;
  in a stream the previous state is per-key mutable state, kept with
  ``applyInPandasWithState`` (Arrow-batched, partitioned by key — each
  executor holds only its keys' state, so state size scales out).
* ``windowed_rollup_stream`` — watermarked tumbling-window aggregation
  (the streaming shape of A1-style rollups with bounded late data).
"""

from __future__ import annotations

import itertools
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _enrich_batch(pdf, cur, ts_col, probe_col, value_cols):
    """One (key, micro-batch) step of :func:`asof_enrich_stream`,
    extracted as a pure pandas function so the vectorized semantics are
    property-testable against the one-pass walk model without a
    streaming query.

    ``pdf``: the key's micro-batch rows; ``cur``: the carried state as
    ``[obs_ts, *values]`` or None.  Returns ``(probe_output_df_or_None,
    new_state_list_or_None)``."""
    import pandas as pd

    # NULL probe flags are malformed (the contract is non-null
    # boolean) — neither probes nor observations; drop them before
    # the cast (bool(nan) is True and emitted phantom probes)
    pdf = pdf[pdf[probe_col].notna()]
    pdf = pdf.sort_values(
        # obs (False) before probes (True) at equal times; value
        # columns last so equal-time duplicate observations line up
        # in payload order (NULLs smallest = na_position='first');
        # merge_asof then takes the LAST equal-time right row — the
        # batch engine's struct-order winner, state included
        [ts_col, probe_col, *value_cols],
        kind="mergesort",
        na_position="first",
    ).reset_index(drop=True)
    is_probe = pdf[probe_col].astype(bool)
    vcols = [ts_col, *value_cols]
    obs = pdf.loc[~is_probe & pdf[ts_col].notna(), vcols]
    if cur is not None:
        # Re-coerce the carried state time ONLY for datetime batches:
        # state round-trips through a python list, where a Timestamp
        # decays to datetime and would mis-compare against a
        # datetime64 column.  Numeric/string as-of keys (the walk
        # model supported any ordered type) pass through untouched —
        # pd.Timestamp(int) would misread an int key as nanoseconds.
        if pd.api.types.is_datetime64_any_dtype(pdf[ts_col]):
            state_ts = pd.Timestamp(cur[0])
        else:
            state_ts = cur[0]
        # in-batch observations older than the carried state can
        # never advance it — drop them so the merge reproduces the
        # one-pass walk exactly (a probe between an old obs and
        # the state time gets NULL, never a rewind)
        obs = obs[obs[ts_col] >= state_ts]
        state_row = pd.DataFrame(
            {ts_col: [state_ts],
             **{c: [v] for c, v in zip(value_cols, cur[1:])}}
        )
        eff = pd.concat([state_row, obs], ignore_index=True).sort_values(
            vcols, kind="mergesort", na_position="first"
        )
    else:
        eff = obs
    new_cur = cur
    if len(eff):
        last = eff.iloc[-1]
        new_cur = [last[ts_col]] + [last[c] for c in value_cols]
    probes = pdf[is_probe.values]
    if not len(probes):
        return None, new_cur
    out = probes.reset_index(drop=True)
    # NULL-time probes never match (batch parity); merge the rest
    tagged = {c: f"__v_{c}" for c in value_cols}
    filled = pd.DataFrame(
        index=out.index, columns=list(tagged.values()), dtype="object"
    )
    live = out[ts_col].notna().values
    if live.any() and len(eff):
        merged = pd.merge_asof(
            out.loc[live, [ts_col]],
            eff.rename(columns=tagged),
            on=ts_col,
            direction="backward",
            allow_exact_matches=True,
        )
        for c in tagged.values():
            vals = merged[c].astype("object")
            filled.loc[live, c] = vals.where(pd.notna(vals), None).values
    for c, tc in tagged.items():
        out[c] = filled[tc].where(pd.notna(filled[tc]), None)
    return out, new_cur


def asof_enrich_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    probe_col: str,
    value_cols: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming point-in-time enrichment — the streaming twin of the
    batch J9 ``asof_join`` (operators/asof.py) for one unified stream:
    rows with ``probe_col`` true are PROBES (facts to enrich and emit),
    rows with it false are OBSERVATIONS (consumed into per-key state).
    Each probe is emitted once, with its ``value_cols`` REPLACED by the
    latest observation at-or-before its time for the same keys —
    ``merge_asof(direction='backward')`` on ordered arrival.

    Per key the state is ONE observation (its time + value columns), so
    state size is #keys × payload, never the history — the property
    that makes point-in-time enrichment viable unbounded at 100 TB/day
    (a stream-stream interval join would have to buffer both sides for
    the watermark horizon; the lookback here is UNBOUNDED backward at
    constant state).

    Within a micro-batch rows are processed in ``ts_col`` order with
    NULL timestamps FIRST, observations BEFORE probes at equal times
    (backward includes at-time matches), and equal-time duplicate
    observations resolving to the payload tuple sorting LAST with NULLs
    smallest — byte-for-byte the batch engine's tiebreak, so the finite
    available-now replay is hash-checkable against the same LATERAL
    oracle as ``j9_asof_join``.  The tiebreak holds ACROSS batches too:
    the state comparator replays the same (time, payload) ordering, so
    an equal-time duplicate arriving in a later micro-batch cannot
    displace a higher-sorting one by mere arrival order.

    Cross-batch guarantees (the standard stateful contract, stated
    precisely): a NULL-time probe always gets NULL payload regardless
    of state; a probe NEVER matches an observation after its own time —
    if newer observations have already advanced the state past a
    late-arriving probe, that probe conservatively gets NULL payload
    (the single-observation state cannot recover the older observation
    a batch join would have found; it never fabricates a future match).
    A late observation older than the state's cannot rewind
    already-emitted probes — in-batch observations older than the
    carried state are likewise inert (they can never advance the
    state, so a probe between their time and the state's time still
    gets NULL).  Within one batch — and therefore in the available-now
    replay — results equal the batch join exactly.

    Rows with a NULL ``probe_col`` are DROPPED: the flag contract is
    non-null boolean (a NULL flag is neither a probe to emit nor an
    observation to consume; round 9 emitted such rows as probes
    because ``bool(nan)`` is True).

    CPU shape: fully vectorized per (key, micro-batch) — one pandas
    mergesort + one ``pd.merge_asof`` (backward, exact matches
    allowed) against the effective observation set with the carried
    state prepended as a synthetic observation row; no per-row Python
    loop.  The equal-time tiebreak (observations before probes,
    duplicate observations resolving to the payload tuple sorting
    LAST with NULLs smallest — the batch engine's struct order) is
    carried by the sort: ``merge_asof`` takes the last right-side row
    at a matching time, which after the [time, payload] mergesort is
    exactly the walk's winner, state included.  Cost is bounded by
    micro-batch size, never corpus size; state stays one observation
    per key.  Measured on a 500k-row single-key micro-batch: the
    round-9 per-row walk (with its per-row dict building and output
    appends) did ~0.12M rows/s, this form ~0.9M rows/s (~8×);
    against a LEANER walk that only advances state and counts matches,
    the probe harness (tools/scale_probe.probe_enrich_throughput)
    measures ~3× — the honest bound pair.  The gap widens with
    payload width.

    Output schema: the input minus ``probe_col``, probe rows only.
    """
    key_cols, value_cols = list(key_cols), list(value_cols)
    out_fields = [f for f in stream.schema.fields if f.name != probe_col]
    out_names = [f.name for f in out_fields]
    out_schema = StructType(out_fields)
    state_schema = StructType(
        [StructField("__obs_ts", TimestampType())]
        + [stream.schema[c] for c in value_cols]
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        cur = list(state.get) if state.exists else None
        chunks = [pdf for pdf in pdfs]
        if not chunks:
            if cur is not None:
                state.update(tuple(cur))
            return
        pdf = pd.concat(chunks, ignore_index=True)
        out, new_cur = _enrich_batch(pdf, cur, ts_col, probe_col, value_cols)
        if new_cur is not None:
            state.update(tuple(new_cur))
        if out is not None:
            yield out[out_names]

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def status_change_stream(
    events: DataFrame,
    key_cols: Sequence[str],
    state_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit one row per state *change* per key from a streaming DataFrame.

    Within a micro-batch, rows are processed in ``ts_col`` order with
    NULL timestamps FIRST (matching the batch W3 lag() window's default
    ``ASC NULLS FIRST`` ordering — pandas would otherwise put NaT last
    and scan the same data in the opposite order); the last seen state
    per key is carried across batches as group state.  The state column
    is compared as a STRING (cast on entry, so non-string state columns
    work instead of dying in Arrow conversion).  Output schema: key
    columns + (ts, new_status).

    Note: cross-batch ordering relies on the watermark bounding
    out-of-order arrival, the same contract as any stateful streaming
    op.
    """
    key_cols = list(key_cols)
    events = events.withColumn(state_col, F.col(state_col).cast("string"))
    out_fields = [events.schema[c] for c in key_cols] + [
        StructField("ts", TimestampType()),
        StructField("new_status", StringType()),
    ]
    out_schema = StructType(out_fields)
    state_schema = StructType([StructField("last_status", StringType())])

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        last = state.get[0] if state.exists else None
        changes = []
        # concat before the sort: a group's micro-batch may span several
        # Arrow chunks, and chunk-local sorting would scan out of order
        chunks = [pdf for pdf in pdfs]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ts_col, kind="mergesort", na_position="first"
            )
            for ts, st in zip(pdf[ts_col], pdf[state_col]):
                if st != last:
                    changes.append((ts, st))
                    last = st
        state.update((last,))
        if changes:
            out = pd.DataFrame(changes, columns=["ts", "new_status"])
            for c, v in zip(key_cols, key):
                out.insert(0, c, v)
            yield out[ [*key_cols, "ts", "new_status"] ]

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_MEM_SEQ = itertools.count()


def run_available_now(
    stream: DataFrame,
    name: str = "avail_now",
    output_mode: str = "complete",
    timeout_sec: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame over all currently-available input
    (``Trigger.AvailableNow``) into an in-memory sink and return the
    result as a batch DataFrame.

    This is the batch-replay harness for the streaming operators: the
    SAME streaming plan (watermarks, stateful aggregation, micro-batch
    scheduling) runs to completion on a finite source, which makes
    streaming semantics oracle-checkable against plain SQL over the same
    files.  On a cluster the identical plan runs unbounded by swapping
    the trigger and sink; nothing in the operator changes.
    """
    spark = stream.sparkSession
    qname = f"{name}_{next(_MEM_SEQ)}"
    query = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = query.awaitTermination(timeout_sec)
    if not finished:
        query.stop()
        raise TimeoutError(f"streaming query {qname} did not drain in {timeout_sec}s")
    # materialize, then drop the in-memory sink table: without the drop
    # every replay leaks its full result into driver memory for the
    # lifetime of the session (the suite runs dozens per sweep)
    out = spark.table(qname).localCheckpoint()
    spark.catalog.dropTempView(qname)
    return out


def windowed_rollup_stream(
    events: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window count/sum per key with a watermark for late data.

    The streaming shape of the reference's grouped aggregations (A1/A4):
    partial aggregation map-side per micro-batch, final state per
    (window, key) — emitted once the watermark passes the window end."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *key_cols,
            "n",
            "total",
        )
    )


def session_rollup_stream(
    events: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key session windows via Spark's native ``session_window``:
    consecutive events closer than ``gap`` merge into one session whose
    window is ``[first_ts, last_ts + gap)``.  State per open session,
    closed (and emitted) once the watermark passes ``last_ts + gap``.

    The streaming shape of ``operators/sessionize.session_stats`` (the
    batch form yields ordinal session ids; this form yields the window
    bounds) — the two agree on membership: a gap of ``gap`` or more
    splits (only OVERLAPPING ``[t, t+gap)`` windows merge).
    Oracle-checked under AvailableNow replay against a batch
    gap-sessionization in SQL."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            *key_cols,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key,
    with state bounded by the watermark (``dropDuplicatesWithinWatermark``
    — late duplicates beyond the watermark are the documented
    approximation, the standard streaming-dedup contract).

    The streaming shape of the LLM pipeline's exact dedup
    (llm/dedup.exact_duplicates): at ingest time this removes exact
    repeats before they ever land in the corpus."""
    wm = events.withWatermark(ts_col, watermark)
    try:
        return wm.dropDuplicatesWithinWatermark(list(key_cols))
    except AttributeError:  # pragma: no cover - older Spark
        import warnings

        # dropDuplicates without the event-time column in the keys
        # NEVER evicts state — the docstring's bounded-state contract
        # does not hold on this fallback path
        warnings.warn(
            "dropDuplicatesWithinWatermark unavailable on this Spark; "
            "falling back to dropDuplicates, whose dedup state grows "
            "UNBOUNDED (one entry per distinct key, never evicted)",
            RuntimeWarning,
            stacklevel=2,
        )
        return wm.dropDuplicates([*key_cols])


def summary_ingest_stream(spark, watch_dir: str):
    """Streaming ensemble ingest: watch ``watch_dir`` for new
    realizations (a simulator fleet landing runs as it finishes) and
    emit long summary rows tagged with REAL — the streaming twin of
    ``sources.eclbin.summary_long_many``.

    The watch TRIGGER is the ``*.UNSMRY`` file — the LAST file the
    simulator writes — and the sibling SMSPEC is read locally.  The
    reverse (watching SMSPEC and probing for UNSMRY) would permanently
    drop any realization whose UNSMRY had not landed yet: the streaming
    checkpoint marks a file processed exactly once, so a skipped
    sibling is never retried.  A missing SMSPEC next to a finished
    UNSMRY is genuinely anomalous and raises.  As with any file
    streaming source, producers must write-then-rename (or write
    elsewhere and move) so a half-written file is never listed.

    ``readStream.format("binaryFile")`` tracks seen files in the
    checkpoint, so each realization is parsed exactly once, one file
    per task; decode is the same numpy ``mapInPandas`` as the batch
    path.  Downstream the stream composes with the other streaming
    ops (e.g. windowed_rollup_stream) or a parquet ``writeStream``
    sink partitioned by REAL."""
    import os
    import re

    from res2df_spark.sources.eclbin import summary_long_pandas

    files = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; this is
        # binaryFile's fixed one
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.UNSMRY")
        .load(watch_dir)
        .select("path", "content")
    )

    def parse(batches):
        for pdf in batches:
            for path, unsmry_buf in zip(pdf["path"], pdf["content"]):
                # binaryFile reports a percent-encoded file: URI
                # (spaces arrive as %20); decode before local
                # filesystem access or the SMSPEC-sibling probe fails
                # on perfectly valid paths with a wrong diagnosis
                from urllib.parse import unquote, urlparse

                scheme = urlparse(path).scheme
                if path.startswith("file:"):
                    local = unquote(urlparse(path).path)
                elif scheme in ("", None):
                    local = path
                else:
                    # the SMSPEC sibling is read through the LOCAL
                    # filesystem inside this Python worker; probing an
                    # hdfs://s3a:// URI with os.path would misdiagnose
                    # a present sibling as missing — fail with the real
                    # limitation instead of the wrong diagnosis
                    raise NotImplementedError(
                        f"summary_ingest_stream reads the SMSPEC sibling "
                        f"worker-locally; {scheme}:// paths need a "
                        "mounted filesystem or the batch "
                        "summary_long_many path"
                    )
                smspec = os.path.splitext(local)[0] + ".SMSPEC"
                if not os.path.exists(smspec):
                    raise FileNotFoundError(
                        f"UNSMRY landed without its SMSPEC sibling: {local}"
                    )
                with open(smspec, "rb") as f:
                    sbuf = f.read()
                out = summary_long_pandas(sbuf, bytes(unsmry_buf))
                # the realization tag must match a WHOLE path component
                # (ERT's realization-N directories, any case) — a bare
                # re.search would match inside 'montreal-2' and
                # mislabel every row
                real = None
                for part in local.replace("\\", "/").split("/"):
                    pm = re.fullmatch(
                        r"real(?:ization)?[-_]?(\d+)", part, re.IGNORECASE
                    )
                    if pm:
                        real = pm.group(1)
                out["REAL"] = (
                    real
                    if real is not None
                    else os.path.splitext(os.path.basename(local))[0]
                )
                yield out

    return files.mapInPandas(
        parse, schema="DATE timestamp, VECTOR string, VALUE double, REAL string"
    )


def near_dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    num_hashes: int = 32,
    band_size: int = 4,
) -> DataFrame:
    """Streaming near-duplicate detection: MinHash+LSH at ingest time.

    Entirely stateless per row up to the state store: the signature is
    the array-expression MinHash (functions/textan.minhash_signature —
    no shuffle, no Python), banded into ``num_hashes/band_size`` keys;
    ``dropDuplicatesWithinWatermark`` on the band key then lets one
    document claim each band.  ACROSS micro-batches the earlier batch's
    claim wins; WITHIN a micro-batch the winner is the first row
    encountered in task/partition order — NOT necessarily the earliest
    timestamp or lowest id (the same contract as Spark's streaming
    dedup itself; batch ``minhash_lsh_candidates`` is the
    order-deterministic form).  Output rows are the surviving
    (band_idx, band_key, doc) claims — a document that appears in NO
    output row had every band already claimed by earlier traffic, i.e.
    it is a near-duplicate candidate of something already ingested
    (same banding contract as the batch minhash_lsh_candidates).

    State is one entry per distinct band key within the watermark —
    bounded, partitioned by key, scales out with executors.  Documents
    with no tokens produce no claims (mirrors the batch exclusion of
    empty element sets).

    Hot band keys (boilerplate text at corpus scale) are NOT a blowup
    risk here, unlike the batch pair enumeration: only the FIRST
    arrival claims a key, every later colliding row is dropped, and
    state stays one entry per key regardless of how many documents
    collide — the streaming formulation is intrinsically capped.

    Consume with :func:`near_dup_verdicts` to turn the surviving
    claims into per-document verdicts.
    """
    from res2df_spark.functions.textan import tokens

    if num_hashes % band_size != 0:
        # same contract as the batch _minhash_bands: silent floor
        # division would discard hashes AND desynchronize band keys
        # from any batch-built index
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by band_size "
            f"({band_size})"
        )
    n_bands = num_hashes // band_size
    # SHARED signature builder (functions/textan.minhash_signature):
    # identical seeded-digest arithmetic as the batch _minhash_bands, so
    # band keys stay byte-identical with any batch-built index — and one
    # md5 evaluation per (token, digest chunk) via its let-bound digest
    # (the HOF-recapture cost an earlier inline copy existed to avoid
    # is now avoided INSIDE the shared builder; two copies of
    # band-key-critical arithmetic would drift).
    from res2df_spark.functions.textan import minhash_signature

    sig = minhash_signature(F.col("__toks"), num_hashes)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "|", *[F.element_at("__sig", b * band_size + j + 1) for j in range(band_size)]
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    claimed = (
        docs.withColumn("__toks", tokens(F.col(text_col)))
        .withColumn("__sig", sig)
        # empty docs: the fold yields an all-NULL signature → no claims
        .filter(F.size(F.array_compact("__sig")) == num_hashes)
        .select(id_col, ts_col, F.explode(bands).alias("band"))
        .select(id_col, ts_col, "band.band_idx", "band.band_key")
        .withWatermark(ts_col, watermark)
    )
    return claimed.dropDuplicatesWithinWatermark(["band_idx", "band_key"])


def near_dup_verdicts(
    docs: DataFrame,
    claims: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document verdict from :func:`near_dedup_stream` claims.

    ``claims`` is the (collected) sink output of the stream; ``docs``
    is the corresponding batch document set.  A document that won ZERO
    bands had every band already claimed by earlier traffic — it is a
    near-duplicate candidate of something previously ingested.  Empty
    documents never claim (they are excluded from banding), so their
    verdict is NULL, not candidate.

    One count aggregation on (uniform) doc id + one broadcast-size
    left join — batch-side, runs after or alongside the stream.
    """
    from res2df_spark.functions.textan import tokens

    won = claims.groupBy(id_col).agg(F.count(F.lit(1)).alias("bands_won"))
    # NULL text tokenizes to NULL, and when(~NULL) would fall through
    # to the candidate branch — coalesce so NULL-text docs get the
    # documented NULL verdict like empty-string docs
    has_toks = F.coalesce(F.size(tokens(F.col(text_col))) > 0, F.lit(False))
    return (
        docs.select(id_col, has_toks.alias("__has"))
        .join(won, id_col, "left")
        .select(
            id_col,
            F.coalesce("bands_won", F.lit(0)).alias("bands_won"),
            F.when(~F.col("__has"), F.lit(None).cast("boolean"))
            .otherwise(F.coalesce("bands_won", F.lit(0)) == 0)
            .alias("is_near_dup_candidate"),
        )
    )


def curate_stream(docs, **thresholds):
    """Streaming ingest curation: the batch quality gate
    (llm/curation.quality_filter) applied to an unbounded document
    stream — map-only expressions are trigger-agnostic, so the SAME
    operator (same rule bitmask, same metrics) curates at ingest with
    zero state: no watermark, no aggregation buffers, append-mode
    output.  This is the shape a 100 TB pipeline wants — reject junk
    the moment it lands instead of re-scanning the lake nightly."""
    from res2df_spark.llm.curation import quality_filter

    return quality_filter(docs, **thresholds)


def funnel_stream(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    type_col: str,
    steps: Sequence[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming funnel tracking with custom group state
    (``applyInPandasWithState``): per user, the completion time of each
    funnel step is carried as state; whenever a user ADVANCES a step
    (an event of the next needed type, strictly after the previous
    step's completion), one append-only row
    ``(user, step, ts)`` is emitted — a funnel-advancement event log.

    Equivalence to the batch form
    (operators/eventanalytics.funnel_steps): the greedy in-order scan
    picks the earliest valid completion of each next step, which IS the
    conditional-min chain — so under AvailableNow replay the emitted
    advancement set equals the batch per-user step times, and the
    oracle is plain SQL.  State per user is ``len(steps)`` timestamps,
    bounded regardless of event volume.

    Cross-batch caveat (the standard stateful-streaming contract): an
    event arriving in a LATER micro-batch than a same-step event with a
    larger timestamp can produce a later advancement time than the
    batch min — once a step is recorded it is never retracted.
    Within-``watermark`` ordering makes the two agree; the suite oracle
    replays a single-file source (one micro-batch), where the
    equivalence is unconditional.
    """
    steps = list(steps)
    out_schema = StructType(
        [
            events.schema[user_col],
            StructField("step", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [StructField(f"t_{i}", TimestampType()) for i in range(len(steps))]
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        times = list(state.get) if state.exists else [None] * len(steps)
        depth = sum(1 for t in times if t is not None)
        advanced = []
        # a group's rows can arrive as SEVERAL Arrow chunks; sorting each
        # chunk independently would scan events out of time order, so
        # concatenate the whole micro-batch before the single sort
        chunks = [pdf for pdf in pdfs]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ts_col, kind="mergesort"
            )
            for ts, typ in zip(pdf[ts_col], pdf[type_col]):
                if depth >= len(steps):
                    break
                # a NULL event time has no place on the funnel's time
                # axis: the batch form's min() skips NULLs, and a NaT
                # recorded at depth 0 would block every later 'ts >
                # times[0]' comparison for the whole batch AND
                # round-trip through state as None (step re-emitted
                # next batch)
                if pd.isna(ts):
                    continue
                if typ != steps[depth]:
                    continue
                if depth > 0 and not ts > times[depth - 1]:
                    continue
                times[depth] = ts
                advanced.append((depth + 1, ts))
                depth += 1
        state.update(tuple(times))
        if advanced:
            out = pd.DataFrame(advanced, columns=["step", "ts"])
            out.insert(0, user_col, key[0])
            yield out

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def decontaminate_stream(
    docs: DataFrame,
    benchmark: DataFrame,
    shingle_k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming benchmark decontamination: the batch contamination
    check (llm/curation.contamination_check) reshaped to run STATELESS
    on an unbounded ingest stream — eval-set hygiene enforced the
    moment a document lands instead of by a nightly lake re-scan.

    The batch form's per-document aggregation (explode shingles → join
    → groupBy doc) would be a stateful streaming aggregation; here the
    whole document arrives in one row, so the overlap is computed
    ROW-LOCALLY instead: the document's distinct shingle set is an
    array expression, the benchmark's distinct shingle set rides as a
    ONE-ROW static dimension (stream-static cross join with a broadcast
    one-row side is stateless), and the overlap is ``array_intersect``.
    No watermark, no state, append mode; per-document cost is
    O(|benchmark| + |doc|) hash work, bounded by the eval-suite size —
    benchmarks are thousands of documents by definition (the same
    bounded-model contract as llm/lm.py's scoring table).  For
    benchmark sets beyond single-array size, fall back to the batch
    join form on a micro-batch `foreachBatch` instead.

    Emits exactly the batch check's rows: (id, n_shingles,
    n_contaminated, contamination, is_contaminated), documents too
    short to form a shingle produce no row — so a finite replay
    (``run_available_now``) is oracle-checkable against the SAME SQL as
    the batch `decontaminate` query.
    """
    from res2df_spark.functions.textan import shingles, tokens

    # token arrays materialized before the shingle transform (HOF
    # lambda capture re-evaluates the split per element otherwise)
    bench_arr = (
        benchmark.withColumn("__toks", tokens(text_col))
        .select(
            F.explode(shingles(F.col("__toks"), shingle_k)).alias("__s")
        )
        .distinct()
        .agg(F.sort_array(F.collect_list("__s")).alias("__bench"))
    )
    doc_sh = F.array_distinct(shingles(F.col("__toks"), shingle_k))
    n = F.size("__sh").cast("long")
    inter = F.size(F.array_intersect("__sh", "__bench")).cast("long")
    return (
        docs.withColumn("__toks", tokens(text_col))
        .select(F.col(id_col), doc_sh.alias("__sh"))
        .filter(F.size("__sh") > 0)
        .crossJoin(F.broadcast(bench_arr))
        .select(
            F.col(id_col),
            n.alias("n_shingles"),
            inter.alias("n_contaminated"),
            F.round(inter / n, 6).alias("contamination"),
            (inter / n >= threshold).alias("is_contaminated"),
        )
    )


def semantic_claims_stream(
    new: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "centroid_id",
    n_coarse: int | None = None,
) -> DataFrame:
    """Streaming incremental SemDeDup claims — the embedding twin of
    ``near_dup_verdicts``, fully STATELESS: every arriving vector is
    assigned to its cluster ROW-LOCALLY (the two-level coarse→fine rule
    of ``similarity.two_level_assign`` re-expressed as folds over
    one-row broadcast model arrays, so no streaming groupBy argmin),
    then joined against the PERSISTED cluster-assigned index on the
    cluster id — a stream-static equality join, stateless and append-
    mode — and every indexed vector with cosine ≥ ``threshold`` is
    emitted as a claim (new_id, match_id, centroid_id, cos_sim).
    Novelty is the ABSENCE of claims for an id (the same contract as
    the band-claim stream: per-row aggregation would be stateful, so
    the consumer — or a downstream batch job — decides keep/drop).

    Model-size contract: the centroid set rides as one-row broadcast
    arrays (coarse list + a coarse→fines map), so k·dim doubles must
    fit a broadcast row — the same bounded-model contract as llm/lm.py;
    for centroid sets beyond that, run the batch
    ``similarity.semantic_novelty`` per micro-batch via foreachBatch.
    All tie-breaks go to the LOWER id (sorted model arrays + strict-
    less folds), so an AvailableNow replay is oracle-checkable.
    """
    from res2df_spark.functions.vectors import dot, l2_norm
    from res2df_spark.llm.similarity import _coarse_fine_model, _sq_dist

    # the fine/coarse/fc frames come from the SAME builder as the
    # batch two_level_assign — one construction, so stream and batch
    # cannot drift on coarse selection or tie-break semantics; here
    # they roll up further into ONE broadcast row (sorted coarse array
    # + coarse→fines map) for row-local assignment
    _fine, coarse, fc = _coarse_fine_model(centroids, n_coarse)
    model = (
        coarse.agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__coid").alias("c"),
                                        F.col("__cov").alias("v")))
            ).alias("__coarse")
        )
        .crossJoin(
            fc.groupBy("__coid")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col("centroid_id").alias("c"),
                                            F.col("__fv").alias("v")))
                ).alias("__fines")
            )
            .agg(
                F.map_from_entries(
                    F.sort_array(
                        F.collect_list(F.struct("__coid", "__fines"))
                    )
                ).alias("__fmap")
            )
        )
    )

    cid_type = centroids.schema["centroid_id"].dataType

    def argmin(cands, vec):
        # fold over a (c asc)-sorted array replicating the batch
        # min(struct(d, c)) ordering EXACTLY, including its null
        # semantics: a NULL distance sorts FIRST (Spark struct
        # ordering), so a NULL-element vector lands on the lowest-id
        # candidate on both paths instead of poisoning every
        # subsequent comparison; ties on d keep the earlier (lower-id)
        # candidate because the array is sorted and the test is strict
        init = F.struct(
            F.lit(None).cast("double").alias("d"),
            F.lit(None).cast(cid_type).alias("c"),
            F.lit(False).alias("set"),
        )

        def step(acc, s):
            d = _sq_dist(vec, s["v"])
            better = (
                ~acc["set"]
                | (d.isNull() & acc["d"].isNotNull())
                | (d.isNotNull() & acc["d"].isNotNull() & (d < acc["d"]))
            )
            return F.struct(
                F.when(better, d).otherwise(acc["d"]).alias("d"),
                F.when(better, s["c"]).otherwise(acc["c"]).alias("c"),
                F.lit(True).alias("set"),
            )

        return F.aggregate(cands, init, step, lambda acc: acc["c"])

    vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    assigned = (
        new.select(F.col(id_col), vecd.alias("__v"))
        .filter(F.col("__v").isNotNull())
        .crossJoin(F.broadcast(model))
        .withColumn("__coid", argmin(F.col("__coarse"), F.col("__v")))
        .withColumn(
            "centroid_id", argmin(F.col("__fmap")[F.col("__coid")], F.col("__v"))
        )
        .select(F.col(id_col), "centroid_id", "__v",
                l2_norm(F.col("__v")).alias("__n"))
    )
    idx = index.select(
        F.col(cluster_col).alias("centroid_id"),
        F.col(id_col).alias("__mid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__iv"),
    ).withColumn("__in", l2_norm(F.col("__iv")))
    denom = F.col("__n") * F.col("__in")
    sim = F.when(denom > 0, dot(F.col("__v"), F.col("__iv")) / denom).otherwise(
        F.lit(0.0)
    )
    return (
        assigned.join(idx, "centroid_id")
        .withColumn("__cos", sim)
        .filter(F.col("__cos") >= threshold)
        .select(
            F.col(id_col),
            F.col("__mid").alias("match_id"),
            "centroid_id",
            F.round("__cos", 6).alias("cos_sim"),
        )
    )


def anomaly_stream(
    events: DataFrame,
    stats: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    min_events: int = 5,
    z_threshold: float = 2.5,
) -> DataFrame:
    """Streaming per-key z-score anomaly detection: the batch operator
    (operators/eventanalytics.value_anomalies) split into its natural
    production shape — the per-key moment table is TRAINED on history
    (``user_value_stats`` over the lake) and arriving events score
    against it through a stream-static equi-join on the key, which is
    STATELESS in Structured Streaming (no watermark, append mode; the
    static side is re-read per micro-batch, so a nightly stats refresh
    is picked up automatically).

    The scoring arithmetic is the SAME code as the batch form
    (``score_value_anomalies`` — not a copy), so a finite replay over
    the events the stats were trained on is oracle-checkable against
    the same SQL; batch/stream parity cannot drift.  At 100 TB the
    static side is one row per key — a key-partitioned join, and the
    stream side never accumulates state.
    """
    from res2df_spark.operators.eventanalytics import score_value_anomalies

    return score_value_anomalies(
        events,
        stats,
        user_col=user_col,
        value_col=value_col,
        id_col=id_col,
        min_events=min_events,
        z_threshold=z_threshold,
    )
