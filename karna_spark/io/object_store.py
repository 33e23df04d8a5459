"""Object-store access configuration (SURVEY.md §2.1 S4).

The reference's infra runs MinIO — an S3-compatible object store — as
the home of the tabular files (reference docker-compose.yaml:21-40).
On Spark the *entire* difference between local files and object storage
is the URI scheme plus Hadoop S3A configuration: every reader/writer in
this engine (catalog.read_table, sinks.write_table) already works on
``s3a://bucket/key`` paths once these confs are set.

No network I/O happens here (and none is possible in the test
container) — this module only sets public Hadoop confs on the session,
and is unit-tested as such. The settings mirror widely-published S3A
tuning guidance for large sequential parquet scans.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def configure_s3(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
    ssl: bool = False,
) -> SparkSession:
    """Point the session's Hadoop S3A client at an S3/MinIO endpoint.

    ``path_style=True`` is required for MinIO (no virtual-host buckets).
    Credentials should come from the deployment's secret store; this
    signature mirrors the reference's MINIO_ROOT_USER/PASSWORD env
    wiring (reference docker-compose.yaml:24-26).
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", endpoint)
    hconf.set("fs.s3a.access.key", access_key)
    hconf.set("fs.s3a.secret.key", secret_key)
    hconf.set("fs.s3a.path.style.access", str(path_style).lower())
    hconf.set("fs.s3a.connection.ssl.enabled", str(ssl).lower())
    # Scan-throughput settings for 100 TB sequential parquet reads:
    # random policy reads only the ranges the parquet footer asks for.
    hconf.set("fs.s3a.experimental.input.fadvise", "random")
    hconf.set("fs.s3a.connection.maximum", "96")
    hconf.set("fs.s3a.fast.upload", "true")
    # Committers: the magic/staging committer avoids O(files) S3
    # renames on write. This is the bare Hadoop key — the
    # ``spark.hadoop.`` prefix applies only when routed through Spark
    # confs, and would be a dead key on the Hadoop configuration.
    hconf.set(
        "mapreduce.outputcommitter.factory.scheme.s3a",
        "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory",
    )
    return spark


def s3_uri(bucket: str, key: str = "") -> str:
    """Canonical ``s3a://`` URI for a bucket/key."""
    key = key.lstrip("/")
    return f"s3a://{bucket}/{key}" if key else f"s3a://{bucket}"
