"""SparkSession bootstrap tuned for the res2df_spark engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads);
the same configuration keys are the ones that matter on a 1000-executor
cluster: AQE (runtime re-planning, skew-join splitting, partition
coalescing), a generous broadcast threshold (every dimension table in the
res2df data model — zonemaps, parameters, vector metadata, region/nation
— is tiny next to the fact tables), and Arrow for the few pandas-UDF
paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configuration applied to sessions we create AND (where runtime-settable)
#: to sessions handed to us by a driver.
RUNTIME_CONF = {
    # AQE: runtime shuffle-partition coalescing + skew-join handling are
    # the main levers that make one static config survive 1000x scale-up.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dim tables (region/nation/zonemap/smry_meta/parameters) are small;
    # broadcast aggressively so fact-side joins never shuffle the big side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Deterministic timestamp semantics for oracle comparison.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for the pandas-UDF paths (multimodal decode, WLIST fold).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver's events table stores TIMESTAMP(NANOS) which Spark's
    # reader rejects; read as int64 nanos and convert in the catalog.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


#: Session conf naming a RELIABLE checkpoint directory (HDFS/S3/local
#: path) for iterative operators.  Unset (the default) → iterative ops
#: truncate lineage with ``localCheckpoint`` (executor-memory-resident,
#: fine on local mode and short jobs); set → they use ``checkpoint()``
#: so a mid-job executor loss replays from durable storage instead of
#: failing the job.  The ``RES2DF_SPARK_CHECKPOINT_DIR`` env var is an
#: equivalent launcher-side switch.
CHECKPOINT_DIR_CONF = "spark.res2df.checkpointDir"


def _ck_parts(p: str | None) -> tuple[str, str] | None:
    """Split a checkpoint-directory path/URI into (authority, path) for
    comparison.  ``authority`` is ``scheme://netloc`` for remote URIs,
    ``"file:"`` for explicitly-local URIs (any number of slashes —
    Spark and users write both), and ``""`` for a bare path — the
    scheme-LESS form is kept distinct from ``file:`` because it
    qualifies to whatever ``fs.defaultFS`` is, which need not be local;
    ``path`` is slash-normalized."""
    if not p:
        return None
    import posixpath
    from urllib.parse import urlparse

    u = urlparse(str(p))
    path = posixpath.normpath("/" + (u.path or "/").lstrip("/"))
    if u.scheme == "":
        return ("", path)
    if u.scheme == "file":
        return ("file:", path)
    return (f"{u.scheme}://{u.netloc}", path)


def _same_ck_dir(
    want: str | None, have: str | None, default_fs: str | None = None
) -> bool:
    """Whether conf value ``want`` and context parent ``have`` name the
    same checkpoint directory.  Paths compare by normalized EQUALITY —
    never ``endswith``, which skipped the re-point when the conf
    CHANGED to a directory whose path is a suffix of the old one
    (``/data/ck`` → ``/ck``).  Authorities compare equal when both name
    one.  A SCHEME-LESS ``want`` qualifies to the context's DEFAULT
    filesystem: on a cluster whose default FS is HDFS/S3, conf
    ``/ckpt`` comes back from ``getCheckpointDir`` as
    ``hdfs://nn:8020/ckpt/<uuid>`` — demanding authority equality there
    would re-point (a mkdirs RPC + a fresh uuid dir) on EVERY
    truncation — so it matches a ``have`` that is also scheme-less
    (both qualify to the same filesystem, whatever it is) or one on
    exactly the authority the default FS names (``file:`` when
    ``fs.defaultFS`` is local, that filesystem otherwise), and nothing
    else: conf changed from ``s3a://bkt/ckpt`` to ``/ckpt`` must
    re-point to the default FS rather than silently keep landing on the
    bucket, and symmetrically a LOCAL ``have`` left over from an old
    ``file:///ckpt`` conf must re-point to HDFS when the default FS is
    remote.  With ``default_fs`` unknown (None — e.g. no JVM gateway
    under Spark Connect), the scheme-less form keeps the tolerant
    any-authority behavior: per-call re-point churn is the worse
    failure mode there.  An EXPLICIT ``want`` scheme (``file:`` or
    remote) always demands authority equality.  ``default_fs`` may be
    a callable (lazy: the JVM round-trip is only paid when a
    scheme-less conf actually needs the authority)."""
    w, h = _ck_parts(want), _ck_parts(have)
    if w is None or h is None:
        return False
    if w[1] != h[1]:
        return False
    if w[0] == h[0]:
        return True
    if w[0] != "":
        return False
    if callable(default_fs):
        default_fs = default_fs()
    d = _ck_parts(default_fs) if default_fs else None
    if d is None:
        return True
    # a bare-path default FS is local; its effective authority is file:
    return h[0] == (d[0] or "file:")


def truncate_lineage(df, eager: bool = True):
    """Truncate a DataFrame's lineage — the per-round guard every
    iterative operator (pagerank, kmeans_fit, connected_components,
    bpe_train) MUST apply so the logical plan stays O(1) deep across
    rounds.

    Durability switch: with :data:`CHECKPOINT_DIR_CONF` (or the
    ``RES2DF_SPARK_CHECKPOINT_DIR`` env var) set, this is a RELIABLE
    ``checkpoint()`` to that directory — on a 1000-executor cluster,
    where failure-free multi-round iteration is not an assumption, an
    executor loss replays the round from durable storage.  Unset, it
    falls back to ``localCheckpoint`` (blocks cached on executors —
    cheaper, but lineage is GONE on executor failure, so a lost block
    fails the job).  One shared helper so the switch lands in every
    iterative operator at once."""
    spark = df.sparkSession
    ckdir = spark.conf.get(CHECKPOINT_DIR_CONF, None) or os.environ.get(
        "RES2DF_SPARK_CHECKPOINT_DIR"
    )
    if ckdir:
        sc = spark.sparkContext
        # keep the context's checkpoint dir in sync with the conf: the
        # dir sticks to the SparkContext, so a conf change mid-session
        # must re-point it (see _same_ck_dir for the comparison rules —
        # normalized-path equality plus scheme-less-conf tolerance)
        current = sc.getCheckpointDir()
        # getCheckpointDir returns <dir>/<random-uuid> (Spark appends a
        # per-setCheckpointDir uuid segment), so compare the PARENT —
        # matching against the full value would re-point the dir (a
        # mkdirs RPC + a fresh uuid directory) on EVERY truncation
        parent = current.rstrip("/").rsplit("/", 1)[0] if current else None

        def default_fs():
            # a scheme-less conf value qualifies to fs.defaultFS, so the
            # authority comparison needs it — fetched LAZILY because the
            # py4j round-trip only matters on the scheme-less path, and
            # iterative operators truncate every round (no JVM gateway →
            # None and _same_ck_dir keeps the tolerant behavior)
            try:
                return sc._jsc.hadoopConfiguration().get("fs.defaultFS")
            except Exception:
                return None

        if not _same_ck_dir(ckdir, parent, default_fs):
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def _parse_byte_conf(value) -> int:
    """Parse a Spark byte-size conf value.  Spark accepts bare integers
    (bytes) or unit-suffixed strings ('128m', '1g', '512kb' — JavaUtils
    byteStringAs semantics), so an externally-configured session can
    legally hand us either form."""
    import re

    s = str(value).strip().lower()
    m = re.fullmatch(r"(\d+)\s*([kmgtp]?)b?", s)
    if m is None:
        raise ValueError(f"unparseable byte size: {value!r}")
    mult = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3,
            "t": 1024**4, "p": 1024**5}[m.group(2)]
    return int(m.group(1)) * mult


def get_spark(app_name: str = "res2df-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's configuration.

    The master resolves in order: explicit argument → ``SPARK_MASTER``
    env → an EXTERNALLY configured ``spark.master`` (spark-submit
    --master, cluster launchers) → ``local[$SPARK_GRAFT_CPUS]``.
    Unconditionally calling ``.master()`` here would silently override
    a submit-time cluster master with local mode."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER")
    if master is None:
        # Under spark-submit the JVM gateway pre-exists and owns
        # spark.master; a fresh SparkConf() in a bare python process has
        # NO JVM attached and is an empty dict, so probing it alone can
        # never see a submit-time --master — detect submission via the
        # env vars spark-submit/pyspark set before user code runs.
        submitted = (
            "PYSPARK_GATEWAY_PORT" in os.environ
            or "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
        )
        if not submitted:
            from pyspark import SparkConf

            # last resort: a JVM already attached in-process (e.g. an
            # earlier SparkContext) exposes system properties here
            if not SparkConf().contains("spark.master"):
                master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def spread(df, min_partitions: int | None = None):
    """Ensure a DataFrame has at least ``min_partitions`` partitions
    (default: the cluster's default parallelism).

    CPU-bound per-row work (signature hashing, array transforms) is
    throughput-limited by partition count, not data size: a small parquet
    file arrives as ONE partition and pins the whole stage to one core.
    On a real cluster large inputs already have enough splits — then this
    is a no-op (we only widen, never shrink, and only when the scan has
    fewer partitions than cores)."""
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Metadata-only split estimate: len(inputFiles) never touches data,
    # while df.rdd.getNumPartitions() under AQE can execute query stages
    # just to learn the count.  Fewer files than cores → widen; a
    # non-file source (createDataFrame fixtures) reports [] → widen too
    # (they are tiny, the shuffle is free).
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    n_splits = len(files)
    if 0 < n_splits < n:
        # a few LARGE files still scan as many natural splits — estimate
        # them from file sizes before paying a full-data repartition
        # (a single 10 GB parquet would otherwise be shuffled for
        # nothing, and its ~80 natural splits COLLAPSED to n)
        try:
            from urllib.parse import unquote, urlparse

            max_bytes = _parse_byte_conf(
                df.sparkSession.conf.get(
                    "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
                )
            )
            total = 0
            for f in files:
                p = urlparse(f)
                if p.scheme not in ("", "file"):
                    # remote FS: size via the Hadoop FileSystem API —
                    # "trust the file count" here would re-create the
                    # exact pathology above (one 10 GB s3 object
                    # shuffled and its natural splits collapsed to n)
                    jvm = df.sparkSession._jvm
                    jsc = df.sparkSession._jsc
                    hpath = jvm.org.apache.hadoop.fs.Path(f)
                    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
                    total += fs.getFileStatus(hpath).getLen()
                    continue
                total += os.path.getsize(unquote(p.path) if p.scheme else f)
            n_splits = max(n_splits, -(-total // max_bytes))
        except Exception:
            # unreadable file sizes (local OSError or a Hadoop/Py4J
            # failure on remote FS) or an unparseable conf value: fall
            # back to the raw file count rather than crash the caller —
            # this whole block is a best-effort split ESTIMATE
            pass
    if n_splits < n:
        return df.repartition(n)
    return df


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally-created session
    (e.g. the verification driver's).  Static conf (memory, master) is
    left untouched."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some builds
            pass
    return spark
