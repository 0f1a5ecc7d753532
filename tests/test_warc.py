"""io/warc.py: record-level spec shape, malformed-input rejection, and
the distributed write→read roundtrip against the pages synthesis."""

from __future__ import annotations

import gzip

import pytest

from tests.conftest import SF_SMALL
from unmixing_spark.io.warc import CRLF, build_record, parse_warc
from unmixing_spark.queries import registry


def test_record_roundtrip_plain_and_gzip():
    url = "https://src0.example.com/en/42"
    html = b"<html><body>hello</body></html>"
    for gz in (False, True):
        rec = build_record(url, 1735689600, html, gzip_record=gz)
        [(u, ep, h)] = list(parse_warc(rec))
        assert (u, ep, h) == (url, 1735689600, html)
    # per-record gzip members concatenate into a multi-member stream
    stream = b"".join(
        build_record(f"{url}?i={i}", 1735689600 + i, html + bytes([48 + i]))
        for i in range(3))
    recs = list(parse_warc(stream))
    assert len(recs) == 3
    assert [r[1] for r in recs] == [1735689600, 1735689601, 1735689602]
    assert all(r[2].endswith(bytes([48 + i])) for i, r in enumerate(recs))


def test_record_is_spec_shaped():
    rec = build_record("https://x.example.com/p", 1735689600, b"<html/>",
                       gzip_record=False)
    head, _, rest = rec.partition(CRLF + CRLF)
    lines = head.split(CRLF)
    assert lines[0] == b"WARC/1.0"
    keys = {ln.split(b":")[0] for ln in lines[1:]}
    assert {b"WARC-Type", b"WARC-Record-ID", b"WARC-Date",
            b"WARC-Target-URI", b"Content-Type",
            b"Content-Length"} <= keys
    assert rest.startswith(b"HTTP/1.1 200 OK" + CRLF)
    assert rec.endswith(CRLF + CRLF)
    # deterministic: identical inputs, identical bytes
    assert rec == build_record("https://x.example.com/p", 1735689600,
                               b"<html/>", gzip_record=False)


def test_malformed_records_raise():
    good = build_record("https://x.example.com/p", 1735689600, b"<html/>",
                        gzip_record=False)
    with pytest.raises(ValueError, match="magic"):
        list(parse_warc(b"HTTP/1.1 200 OK" + CRLF + good))
    with pytest.raises(ValueError, match="truncated WARC record content"):
        list(parse_warc(good[:-10]))
    with pytest.raises(ValueError, match="terminator"):
        list(parse_warc(good[:-4] + b"XXXX"))
    with pytest.raises(ValueError, match="Content-Length"):
        bad = good.replace(b"Content-Length: ", b"Content-Size: ", 1)
        list(parse_warc(bad))
    with pytest.raises(ValueError, match="truncated WARC header"):
        list(parse_warc(b"WARC/1.0" + CRLF + b"WARC-Type: response"))


def test_distributed_roundtrip_byte_identical(spark, tmp_path):
    from pyspark.sql import functions as F

    from unmixing_spark import dialect as D
    from unmixing_spark import pipeline
    from unmixing_spark.io.warc import read_warc, write_warc
    from unmixing_spark.pagegen import pages_sql

    pipeline.register_tables(spark, SF_SMALL, ("documents",))
    pages = spark.sql(f"""
        SELECT url, {D.ts_to_epoch('warc_ts', D.SPARK)} AS warc_epoch, html
        FROM ({pages_sql(D.SPARK)})
    """).repartition(3, "url")
    out = str(tmp_path / "warc")
    (tmp_path / "warc").mkdir()
    n = write_warc(pages, out, gzip_records=True)
    src = {r["url"]: (r["warc_epoch"], bytes(r["html"]))
           for r in pages.collect()}
    assert n == len(src)

    back = read_warc(spark, out)
    got = {r["url"]: (r["warc_epoch"], bytes(r["html"]))
           for r in back.collect()}
    assert got == src   # byte-identical html + epoch per url
    # the reader parallelizes per file: one input file per writer
    # partition with >0 rows
    n_files = len(list((tmp_path / "warc").iterdir()))
    assert 1 <= n_files <= 3
    assert back.rdd.getNumPartitions() == n_files


def test_warc_roundtrip_query_registered(spark):
    out = registry()["q_warc_roundtrip"].spark_fn(spark, SF_SMALL)
    pdf = out.toPandas()
    assert len(pdf) == 500
    assert pdf["html_sha"].nunique() == pdf["url"].nunique() == 500


def test_wet_record_roundtrip_and_linkage():
    """Conversion records round-trip byte-exactly (plain + gzip), carry
    the spec headers, and their WARC-Refers-To is the uuid5 id the
    response record for the same url carries."""
    import uuid

    from unmixing_spark.io.warc import build_conversion_record, parse_wet

    url = "https://src0.example.com/en/42"
    text = "hello web é world"
    for gz in (False, True):
        rec = build_conversion_record(url, 1735689600, text.encode(),
                                      gzip_record=gz)
        [(u, ep, t)] = list(parse_wet(rec))
        assert (u, ep, t) == (url, 1735689600, text)
    raw = build_conversion_record(url, 1735689600, text.encode(),
                                  gzip_record=False)
    head = raw.split(CRLF + CRLF, 1)[0].decode()
    assert "WARC-Type: conversion" in head
    assert "Content-Type: text/plain" in head
    refers = str(uuid.uuid5(uuid.NAMESPACE_URL, url))
    assert f"WARC-Refers-To: <urn:uuid:{refers}>" in head
    resp = build_record(url, 1735689600, b"<html/>", gzip_record=False)
    assert f"WARC-Record-ID: <urn:uuid:{refers}>" in resp.decode()


def test_mixed_warc_wet_stream_filters_by_type():
    """A stream holding response AND conversion records: parse_warc
    yields only responses, parse_wet only conversions; malformed
    conversion records still raise."""
    from unmixing_spark.io.warc import build_conversion_record, parse_wet

    url = "https://src1.example.com/de/7"
    stream = (build_record(url, 1735689600, b"<html>x</html>")
              + build_conversion_record(url, 1735689600, b"x"))
    assert [r[2] for r in parse_warc(stream)] == [b"<html>x</html>"]
    assert [r[2] for r in parse_wet(stream)] == ["x"]
    bad = build_conversion_record(url, 1735689600, b"x",
                                  gzip_record=False)[:-2]
    with pytest.raises(ValueError):
        list(parse_wet(bad))


def test_wet_distributed_roundtrip_byte_identical(spark, tmp_path):
    """write_wet → read_wet over the pages synthesis preserves every
    (url, epoch, text) byte-exactly."""
    from unmixing_spark import dialect as D
    from unmixing_spark.io.warc import read_wet, write_wet
    from unmixing_spark.pagegen import pages_sql
    from unmixing_spark.pipeline import register_tables

    register_tables(spark, SF_SMALL, ("documents",))
    pages = spark.sql(f"""
        SELECT url, {D.ts_to_epoch('warc_ts', D.SPARK)} AS warc_epoch, text
        FROM ({pages_sql(D.SPARK)})
    """).repartition(3, "url")
    out = str(tmp_path / "wet")
    import os
    os.makedirs(out)
    n = write_wet(pages, out, gzip_records=True)
    src = {(r.url, r.warc_epoch, r.text) for r in pages.collect()}
    assert n == len(src)
    back = {(r.url, r.warc_epoch, r.text)
            for r in read_wet(spark, out).collect()}
    assert back == src


def test_wat_record_roundtrip_and_linkage():
    """Metadata records round-trip byte-exactly (plain + gzip), carry the
    spec headers (WARC-Type: metadata, Content-Type: application/json),
    and their WARC-Refers-To is the uuid5 id of the response record for
    the same url — the WAT sidecar's linkage contract."""
    import uuid

    from unmixing_spark.io.warc import build_metadata_record, parse_wat

    url = "https://src0.example.com/en/42"
    wat = '{"Envelope":{"Payload-Metadata":{"Actual-Content-Length":7}}}'
    for gz in (False, True):
        rec = build_metadata_record(url, 1735689600, wat.encode(),
                                    gzip_record=gz)
        [(u, ep, j)] = list(parse_wat(rec))
        assert (u, ep, j) == (url, 1735689600, wat)
    raw = build_metadata_record(url, 1735689600, wat.encode(),
                                gzip_record=False)
    head = raw.split(CRLF + CRLF, 1)[0].decode()
    assert "WARC-Type: metadata" in head
    assert "Content-Type: application/json" in head
    refers = str(uuid.uuid5(uuid.NAMESPACE_URL, url))
    assert f"WARC-Refers-To: <urn:uuid:{refers}>" in head
    # a mixed stream: parse_wat skips response records, and vice versa
    stream = build_record(url, 1735689600, b"<html/>",
                          gzip_record=False) + raw
    assert [r[2] for r in parse_wat(stream)] == [wat]
    assert [r[2] for r in parse_warc(stream)] == [b"<html/>"]


def test_wat_distributed_roundtrip_byte_identical(spark, tmp_path):
    """write_wat → read_wat over the pages synthesis preserves every
    (url, epoch, wat_json) byte-exactly."""
    from unmixing_spark import dialect as D
    from unmixing_spark.io.warc import read_wat, write_wat
    from unmixing_spark.pagegen import pages_sql
    from unmixing_spark.pipeline import register_tables
    from unmixing_spark.queries.warc_q import _wat_json_sql

    register_tables(spark, SF_SMALL, ("documents",))
    pages = spark.sql(f"""
        SELECT url, warc_epoch, {_wat_json_sql(D.SPARK)} AS wat_json
        FROM (
          SELECT url, {D.ts_to_epoch('warc_ts', D.SPARK)} AS warc_epoch,
                 html, text
          FROM ({pages_sql(D.SPARK)})
        )
    """).repartition(3, "url")
    out = str(tmp_path / "wat")
    import os
    os.makedirs(out)
    n = write_wat(pages, out, gzip_records=True)
    src = {(r.url, r.warc_epoch, r.wat_json) for r in pages.collect()}
    assert n == len(src)
    back = {(r.url, r.warc_epoch, r.wat_json)
            for r in read_wat(spark, out).collect()}
    assert back == src
    # every payload is well-formed JSON with the envelope keys
    import json
    for _, _, j in back:
        env = json.loads(j)["Envelope"]
        assert {"Payload-Metadata", "WARC-Header-Metadata"} <= env.keys()
