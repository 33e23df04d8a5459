"""S4 conf surface: configure_s3 must land every fs.s3a conf on the
session's live Hadoop configuration (the one S3A filesystem instances
read), and s3_uri must produce canonical s3a:// paths.

No network I/O — the sandbox has no object store; what a MinIO user
exercises first is exactly this conf plumbing, so it gets a unit test
(reference docker-compose.yaml:21-40 runs MinIO as the file home).
"""

from __future__ import annotations

from karna_spark.io.object_store import configure_s3, s3_uri


def test_configure_s3_lands_on_hadoop_conf(spark):
    configure_s3(
        spark,
        endpoint="http://minio.local:9000",
        access_key="AKIDEXAMPLE",
        secret_key="SECRETEXAMPLE",
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    expected = {
        "fs.s3a.endpoint": "http://minio.local:9000",
        "fs.s3a.access.key": "AKIDEXAMPLE",
        "fs.s3a.secret.key": "SECRETEXAMPLE",
        # MinIO has no virtual-host buckets; SSL off for a local http
        # endpoint — the defaults for the reference's compose topology.
        "fs.s3a.path.style.access": "true",
        "fs.s3a.connection.ssl.enabled": "false",
        # Scan-throughput settings for large sequential parquet reads.
        "fs.s3a.experimental.input.fadvise": "random",
        "fs.s3a.connection.maximum": "96",
        "fs.s3a.fast.upload": "true",
        # Bare Hadoop key (no spark.hadoop. prefix): the committer
        # factory S3A write paths actually consult.
        "mapreduce.outputcommitter.factory.scheme.s3a":
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory",
    }
    for key, want in expected.items():
        assert hconf.get(key) == want, key


def test_configure_s3_flags_follow_arguments(spark):
    configure_s3(
        spark,
        endpoint="https://s3.example.com",
        access_key="k",
        secret_key="s",
        path_style=False,
        ssl=True,
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.path.style.access") == "false"
    assert hconf.get("fs.s3a.connection.ssl.enabled") == "true"
    assert hconf.get("fs.s3a.endpoint") == "https://s3.example.com"


def test_configure_s3_returns_same_session(spark):
    assert configure_s3(spark, "e", "a", "s") is spark


def test_s3_uri_shapes():
    assert s3_uri("bucket") == "s3a://bucket"
    assert s3_uri("bucket", "key.parquet") == "s3a://bucket/key.parquet"
    # Leading slashes must not produce s3a://bucket//path.
    assert s3_uri("bucket", "/a/b/c.parquet") == "s3a://bucket/a/b/c.parquet"
    assert s3_uri("bucket", "dir/part=1/f.pq") == "s3a://bucket/dir/part=1/f.pq"


def test_read_table_through_non_file_scheme_end_to_end(spark, tmp_path):
    """S4 behavior test (r7 verdict item 6): exercise read_table and
    write_table through a NON-file: URI scheme end to end. The sandbox
    has no S3 endpoint (and no hadoop-aws jars), but Spark's Hadoop
    filesystem abstraction is scheme-dispatched — the bundled viewfs://
    filesystem mounts an arbitrary target URI behind its own scheme, so
    the whole path-resolution → FileSystem.get → open/list/rename
    machinery an object-store read exercises runs for real here, with
    only the innermost byte transport differing from S3A."""
    from karna_spark.catalog import read_table
    from karna_spark.io.sinks import write_table

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set(
        "fs.viewfs.mounttable.karnatest.link./warehouse",
        "file://" + str(tmp_path),
    )
    base = "viewfs://karnatest/warehouse"

    src = spark.range(100).selectExpr("id", "id % 7 AS grp")
    write_table(src, f"{base}/tbl.parquet")
    got = read_table(spark, f"{base}/tbl.parquet")
    assert got.count() == 100
    assert sorted(got.columns) == ["grp", "id"]
    # Format dispatch by extension works through the scheme too.
    write_table(src, f"{base}/tbl.csv", fmt="csv")
    csv = read_table(spark, f"{base}/tbl.csv")
    assert csv.count() == 100
    # And the files really landed under the mounted local target.
    import glob as _glob

    assert _glob.glob(str(tmp_path / "tbl.parquet" / "*.parquet"))
