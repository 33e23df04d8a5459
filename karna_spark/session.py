"""SparkSession construction with scale-aware defaults.

The reference (elliot14A/karna) declares only a capability surface —
"query tabular files ... using SQL" (reference README.md:2) — with no
engine code; this module is where the Spark-native engine pins the
execution posture: AQE on (runtime re-planning, skew-join handling,
partition coalescing), Arrow transfer for the Python boundary, UTC
session timezone so results are comparable across engines.

Local test mode runs ``local[N]`` (one JVM); at cluster scale the same
builder is used with ``master`` left to spark-submit. Every config here
is a public Spark conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100 TB design point, all overridable:
# - AQE re-plans shuffles at runtime (coalesces small partitions, splits
#   skewed ones, demotes sort-merge to broadcast when a side turns out
#   small). This is the main "survives 100× scale-up" lever.
# - shuffle.partitions is a *starting* parallelism; AQE coalesces down.
#   On a real cluster this should be ~2-3× total cores; locally ~cores.
# - maxPartitionBytes 128m keeps scan partitions executor-memory-sized.
_SCALE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Parquet pushdown is on by default; pinned here as documentation of
    # the contract the query layer relies on (SURVEY.md §4).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Runtime bloom-filter semi-join reduction (V8): ON as posture, with
    # Spark's stock size thresholds — at cluster scale a selective dim
    # filter prunes the fact shuffle; at fixture scale the 10 GB
    # application-side threshold keeps everyday plans unchanged. The V8
    # query lowers the threshold for itself; pinning the defaults here
    # makes tune_session reset them for every subsequent query.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10GB",
    # File-listing posture: Spark launches a DISTRIBUTED listing job
    # (one task per path) whenever a read plans more than this many
    # paths. The snapshot store reads hand Spark an explicit leaf-dir
    # list from the manifest — there is nothing to discover, and on a
    # many-partition table the default (32) turns every read/write
    # planning pass into a hundreds-of-tasks no-op job (measured: a
    # 373-dir scan spent its first stage on 373 listing tasks before
    # a 32-task data scan). Driver-side listing of ≤4096 known paths
    # is milliseconds on any filesystem; past that the distributed
    # path takes over (genuinely unknown trees, e.g. glob sources).
    "spark.sql.sources.parallelPartitionDiscovery.threshold": "4096",
}


def default_parallelism() -> int:
    """Local parallelism: $SPARK_GRAFT_CPUS if set, else host cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def shuffle_partitions_default() -> int | None:
    """Resolve the shuffle-partition override, if any.

    Precedence: ``$SPARK_GRAFT_SHUFFLE_PARTITIONS`` (cluster operators
    pin this to ~2-3× total executor cores) > local parallelism. Returns
    None when the env var is set to the empty string, meaning "leave the
    session's existing value alone".
    """
    env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if env is not None:
        return max(1, int(env)) if env.strip() else None
    return default_parallelism()


def get_spark(
    app_name: str = "karna_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master=None`` honors an ambient cluster (spark-submit) and falls
    back to ``local[N]`` for standalone runs — the same code path the
    driver and tests use.
    """
    cores = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cores}]")
    confs = dict(_SCALE_CONFS)
    resolved = shuffle_partitions or shuffle_partitions_default() or cores
    confs["spark.sql.shuffle.partitions"] = str(resolved)
    # Local mode: the driver JVM is the only executor; give it headroom
    # but only when we are the ones creating the session.
    confs.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    confs.setdefault("spark.ui.enabled", "false")
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Records the shuffle-partition value tune_session itself pinned, so a
# later call can tell "still our autotune" from "operator overrode it".
_AUTOTUNE_MARKER = "spark.karna.shuffle.autotuned"


def _shuffle_partitions_pinned(spark: SparkSession) -> bool:
    """True when spark.sql.shuffle.partitions was *explicitly* set (by
    the session builder, spark-submit --conf, or a runtime conf.set) as
    opposed to merely reading back Spark's stock default. An operator
    who deliberately pins 200 must not be clobbered."""
    key = "spark.sql.shuffle.partitions"
    try:
        # SQLConf.settings holds only explicitly-set entries (Scala
        # protected[spark] compiles to public, so py4j can reach it).
        # Builder options and spark-submit --conf are merged into these
        # settings at session creation, so this single check covers
        # every pinning path — and, unlike the static SparkConf, it
        # *clears* on conf.unset, restoring "stock default" status.
        return bool(
            spark._jsparkSession.sessionState().conf().settings().containsKey(key)
        )
    except Exception:
        pass
    try:
        # Fallback when session internals are unreachable (e.g. a
        # Connect session): the static SparkConf still reflects
        # builder/submit pinning, just not runtime set/unset.
        return bool(spark.sparkContext.getConf().contains(key))
    except Exception:
        return False


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable confs to an existing session.

    The driver may hand us an already-built SparkSession (see
    ``__spark_entry__.entry``); static confs (driver memory, master)
    can't change post-hoc, but the SQL confs that shape plans can.
    """
    confs = dict(_SCALE_CONFS)
    # The driver's plain session defaults to 200 shuffle partitions —
    # far too many for local fixture scales (200 tiny tasks per
    # exchange). Override only when the session still carries Spark's
    # stock default: a deliberate setting (cluster operator pinning
    # ~2-3× total cores, or $SPARK_GRAFT_SHUFFLE_PARTITIONS) wins —
    # detected as "explicitly set" rather than by comparing to 200, so
    # an operator who pins exactly 200 keeps it. Our own earlier
    # tune_session set IS an explicit set, so the marker conf records
    # the value *we* pinned: the session counts as autotuned only while
    # the live value still equals the marker — a user conf.set after we
    # tuned makes the marker stale and their value sticks.
    key = "spark.sql.shuffle.partitions"
    target = shuffle_partitions_default()
    marker = spark.conf.get(_AUTOTUNE_MARKER, "")
    ours = marker != "" and marker == spark.conf.get(key, "")
    if target is not None and (ours or not _shuffle_partitions_pinned(spark)):
        confs[_AUTOTUNE_MARKER] = str(target)
        confs[key] = str(target)
        # Let AQE coalesce from a higher starting parallelism than the
        # final setting, so large shuffles are not under-parallelized.
        confs.setdefault(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(target * 4, 64)),
        )
    for k, v in confs.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — keep its value
    return spark
