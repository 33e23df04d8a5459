"""Avro object-container source/sink (io/avro_io.py, S1-family).

The codec is self-contained (no spark-avro in the sandbox), so these
tests cover the spec surface the sink/source claim: primitive types +
nullable unions, executor-side encode/decode, per-partition container
files, empty partitions, and the loud failures (unsupported types,
corrupt containers)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from karna_spark.io.avro_io import (
    _decode_container,
    _encode_container,
    _zigzag_decode,
    _zigzag_encode,
    read_avro,
    write_avro,
)


def test_zigzag_roundtrip_edge_values():
    for n in (0, 1, -1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)):
        v, pos = _zigzag_decode(_zigzag_encode(n), 0)
        assert v == n and pos == len(_zigzag_encode(n))


def test_container_roundtrip_all_types(spark, tmp_path):
    df = spark.createDataFrame([
        Row(k=1, name="alpha", score=1.5, ok=True,
            day=datetime.date(2024, 3, 1), blob=b"\x00\x01"),
        Row(k=2, name=None, score=None, ok=False, day=None, blob=None),
        Row(k=-3, name="β~%", score=-2.25, ok=None,
            day=datetime.date(1969, 12, 31), blob=b""),
    ]).repartition(2)
    out = str(tmp_path / "t")
    n_files = write_avro(df, out)
    assert n_files == 2
    back = read_avro(spark, out)
    key = lambda r: (r["k"] is None, r["k"])  # noqa: E731
    got = sorted(back.collect(), key=key)
    want = sorted(df.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert back.schema.simpleString() == (
        "struct<k:bigint,name:string,score:double,ok:boolean,"
        "day:date,blob:binary>"
    )


def test_empty_partitions_write_empty_containers(spark, tmp_path):
    df = spark.createDataFrame([Row(k=1, v="x")]).repartition(4)
    out = str(tmp_path / "e")
    assert write_avro(df, out) == 4
    rows = read_avro(spark, out).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1, "x")]


def test_unsupported_type_refused(spark, tmp_path):
    df = spark.createDataFrame([Row(k=1, arr=[1, 2])])
    with pytest.raises(ValueError, match="unsupported column type"):
        write_avro(df, str(tmp_path / "bad"))


def test_corrupt_container_fails_loudly(tmp_path):
    avro = {
        "type": "record", "name": "row",
        "fields": [{"name": "k", "type": ["null", "long"]}],
    }
    buf = bytearray(_encode_container([(1,), (2,)], avro))
    assert _decode_container(bytes(buf))[1] == [(1,), (2,)]
    with pytest.raises(ValueError, match="not an Avro"):
        _decode_container(b"PAR1" + bytes(buf[4:]))
    buf[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync marker"):
        _decode_container(bytes(buf))


def test_container_property_roundtrip():
    """Property gate: arbitrary rows of every supported primitive
    round-trip bit-exactly through the pure codec (no Spark in the
    loop — this pins the byte format itself)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    avro = {
        "type": "record", "name": "row",
        "fields": [
            {"name": "a", "type": ["null", "long"]},
            {"name": "b", "type": ["null", "double"]},
            {"name": "c", "type": ["null", "string"]},
            {"name": "d", "type": ["null", "boolean"]},
            {"name": "e", "type": ["null", "bytes"]},
            {"name": "f", "type": ["null", {"type": "int",
                                            "logicalType": "date"}]},
        ],
    }
    row = st.tuples(
        st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.none() | st.floats(allow_nan=False, allow_infinity=False),
        st.none() | st.text(max_size=40),
        st.none() | st.booleans(),
        st.none() | st.binary(max_size=40),
        st.none() | st.dates(),
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(row, max_size=25))
    def roundtrip(rows):
        _, back = _decode_container(_encode_container(rows, avro))
        assert back == rows

    roundtrip()
