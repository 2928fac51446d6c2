"""read_parquet_compat: TIMESTAMP(NANOS) columns must convert with
integer division — epoch-nanos exceed double's 53-bit mantissa, so a
float divide lands ~13% of timestamps 1 µs off."""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quality_spark.sources.parquet_compat import read_parquet_compat

# float(NS)/1000 rounds to ...0001 µs; the true value is ...0000 µs.
NS_BAD = 1_700_000_000_000_000_896
assert int(float(NS_BAD) / 1000) != NS_BAD // 1000


@pytest.fixture(scope="module")
def nanos_parquet():
    d = tempfile.mkdtemp(prefix="qs_nanos_")
    path = f"{d}/t.parquet"
    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([NS_BAD, NS_BAD + 1104], pa.timestamp("ns")),
        }
    )
    pq.write_table(tbl, path, use_deprecated_int96_timestamps=False)
    yield path
    shutil.rmtree(d, ignore_errors=True)


def test_nanos_truncate_exact(spark, nanos_parquet):
    df = read_parquet_compat(spark, nanos_parquet)
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = {r["id"]: r["ts"] for r in df.collect()}
    epoch = datetime.datetime(1970, 1, 1)
    got_us = {k: round((v - epoch).total_seconds() * 1e6) for k, v in rows.items()}
    # exact floor-division truncation, no float rounding
    assert got_us[1] == NS_BAD // 1000
    assert got_us[2] == (NS_BAD + 1104) // 1000


def test_compat_read_restores_session_conf(spark, nanos_parquet):
    """read_parquet_compat must not leak nanosAsLong into the session:
    a later PLAIN read of a nanos file should still fail loudly rather
    than silently surfacing raw-long columns (code-review regression).
    The compat frame itself stays readable after restore — the long
    schema is inferred eagerly and sticks."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    df = read_parquet_compat(spark, nanos_parquet)
    assert spark.conf.get(key, None) in (None, "false")
    assert df.count() > 0  # still executable after the conf restore
    with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL|Illegal Parquet type"):
        spark.read.parquet(nanos_parquet).collect()


def test_nanos_detected_in_partitioned_layout(spark, tmp_path):
    """Footer probe must find data files nested under hive partition
    directories, not just at the top level."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "corpus"
    (root / "lang=en").mkdir(parents=True)
    t = pa.table({"ts": pa.array([123_456_789], type=pa.timestamp("ns"))})
    pq.write_table(t, str(root / "lang=en" / "part-0.parquet"))
    df = read_parquet_compat(spark, str(root))
    assert df.schema["ts"].dataType.simpleString() == "timestamp"


def test_read_parquet_compat_uri_path(spark, tmp_path):
    """Round 12: nanos detection works on URI paths too — the footer
    is read through the JVM parquet reader (any Hadoop filesystem),
    not pyarrow-on-local-path. A file:// nanos table must read
    identically to the plain local path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quality_spark.sources.parquet_compat import (
        _nanos_columns,
        _nanos_columns_jvm,
        read_parquet_compat,
    )

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [1700000000123456789, 1700000001000000001, 0],
                pa.timestamp("ns"),
            ),
        }
    )
    local = str(tmp_path / "nanos.parquet")
    pq.write_table(tbl, local)
    uri = f"file://{local}"
    assert _nanos_columns_jvm(spark, uri) == _nanos_columns(local) == ["ts"]
    a = read_parquet_compat(spark, local)
    b = read_parquet_compat(spark, uri)
    assert a.schema == b.schema
    assert dict(a.dtypes)["ts"] == "timestamp"
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb and len(ka) == 3
    # directory layout: the first data file's footer drives detection
    (tmp_path / "nanodir").mkdir()
    d = str(tmp_path / "nanodir")
    pq.write_table(tbl, f"{d}/part-0.parquet")
    assert _nanos_columns_jvm(spark, f"file://{d}") == ["ts"]
