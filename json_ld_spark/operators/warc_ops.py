"""Distributed WARC ingestion operators over binary payload columns.

The parse (sources/warc.py — real gzip members, strict ISO 28500
framing) runs inside Arrow-batched ``mapInPandas``: one crawl file
per row, no Python in any other stage, no shuffle until the caller
aggregates. The synthesizer emits REAL .warc.gz bytes whose record
headers and body bytes are closed forms of (file_id, record_idx,
byte_idx), so the DuckDB oracle replays header fields and body
statistics with no codec in the loop — the same gate discipline as
the media codecs."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_STATS_SCHEMA = (
    "file_id long, record_idx int, warc_type string, target_uri string, "
    "n_bytes int, sum_bytes bigint, min_byte int, max_byte int"
)

_TYPES = ("response", "request", "metadata")


def synthesize_warc_files(spark: SparkSession, n: int = 240) -> DataFrame:
    """(file_id, payload): each payload a real .warc.gz — one gzip
    member per record, deterministic bytes (gzip mtime=0). Closed
    forms the oracle replays:

      n_records(fid)        = 2 + fid % 4
      warc_type(rid)        = [response, request, metadata][rid % 3]
      target_uri(fid, rid)  = https://example-{fid % 7}.org/p/{fid}/{rid}
      body_len(fid, rid)    = 100 + (fid*5 + rid*11) % 200
      body_byte(fid,rid,j)  = (fid*7 + rid*13 + j*3) % 256
    """

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from json_ld_spark.sources.warc import build_warc_gz

        for pdf in it:
            rows = []
            for fid in pdf["id"]:
                fid = int(fid)
                records = []
                for rid in range(2 + fid % 4):
                    length = 100 + (fid * 5 + rid * 11) % 200
                    body = bytes(
                        (fid * 7 + rid * 13 + j * 3) % 256
                        for j in range(length)
                    )
                    headers = {
                        "WARC-Type": _TYPES[rid % 3],
                        "WARC-Record-ID": (
                            f"<urn:uuid:{fid:08d}-{rid:04d}>"
                        ),
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": (
                            f"https://example-{fid % 7}.org/p/{fid}/{rid}"
                        ),
                    }
                    records.append((headers, body))
                rows.append((fid, build_warc_gz(records)))
            yield pd.DataFrame(rows, columns=["file_id", "payload"])

    return spark.range(n).mapInPandas(
        _gen, schema="file_id long, payload binary"
    )


def synthesize_warc_html(spark: SparkSession, n: int = 240) -> DataFrame:
    """(file_id, payload): .warc.gz crawl files whose response bodies
    are REAL HTML pages (UTF-8) — the input for the end-to-end crawl
    pipeline gate (WARC framing → HTML strip → URL canonicalization →
    domain stats). Closed forms:

      n_records(fid) = 2 + fid % 3, every record a 'response'
      page(fid, rid) = title 'Page {fid}-{rid}', one <p> with
        'content {(fid*7 + rid*13) % 101} &amp; text', two links:
          HTTP://Example-{rid % 4}.COM:80/A/{fid % 6}/
            ?utm_source=z&b=2&a=1#f
          https://news.co.uk/x/{fid % 3}
    """

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from json_ld_spark.sources.warc import build_warc_gz

        for pdf in it:
            rows = []
            for fid in pdf["id"]:
                fid = int(fid)
                records = []
                for rid in range(2 + fid % 3):
                    html = (
                        f"<html><head><title>Page {fid}-{rid}</title>"
                        "<style>p { x: y; }</style></head><body>"
                        "<!-- boilerplate -->"
                        f"<p>content {(fid * 7 + rid * 13) % 101} "
                        "&amp; text</p>"
                        f'<a href="HTTP://Example-{rid % 4}.COM:80'
                        f'/A/{fid % 6}/?utm_source=z&b=2&a=1#f">l1</a>'
                        f'<a href="https://news.co.uk/x/{fid % 3}">l2</a>'
                        "</body></html>"
                    )
                    headers = {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:uuid:h{fid:08d}-{rid:04d}>",
                        "WARC-Target-URI": (
                            f"https://crawl-{fid % 11}.org/{fid}/{rid}"
                        ),
                    }
                    records.append((headers, html.encode("utf-8")))
                rows.append((fid, build_warc_gz(records)))
            yield pd.DataFrame(rows, columns=["file_id", "payload"])

    return spark.range(n).mapInPandas(
        _gen, schema="file_id long, payload binary"
    )


def warc_html_pages(files: DataFrame) -> DataFrame:
    """(file_id, record_idx, target_uri, html): parse the WARC
    framing and decode response bodies as UTF-8 — the handoff from
    container parsing to the JVM-side HTML/URL expression chain.
    Non-response records are skipped; strict framing as everywhere."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from json_ld_spark.sources.warc import parse_warc_gz

        for pdf in it:
            rows = []
            for fid, payload in zip(pdf["file_id"], pdf["payload"]):
                fid = int(fid)
                for rid, (headers, body) in enumerate(
                    parse_warc_gz(bytes(payload))
                ):
                    if headers.get("WARC-Type") != "response":
                        continue
                    rows.append((
                        fid,
                        rid,
                        headers.get("WARC-Target-URI", ""),
                        body.decode("utf-8"),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["file_id", "record_idx", "target_uri", "html"],
            )

    return files.mapInPandas(
        _batches,
        schema=(
            "file_id long, record_idx int, target_uri string, html string"
        ),
    )


def warc_record_stats(files: DataFrame) -> DataFrame:
    """Parse every WARC file and emit one row per record with header
    fields and exact integer body statistics. Strict: a payload that
    fails the spec's framing raises (a synthetic payload failing to
    parse is a bug, mirroring decode_stats)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from json_ld_spark.sources.warc import parse_warc_gz

        for pdf in it:
            rows = []
            for fid, payload in zip(pdf["file_id"], pdf["payload"]):
                fid = int(fid)
                for rid, (headers, body) in enumerate(
                    parse_warc_gz(bytes(payload))
                ):
                    rows.append((
                        fid,
                        rid,
                        headers.get("WARC-Type", ""),
                        headers.get("WARC-Target-URI", ""),
                        len(body),
                        int(sum(body)),
                        int(min(body)) if body else 0,
                        int(max(body)) if body else 0,
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_id", "record_idx", "warc_type", "target_uri",
                    "n_bytes", "sum_bytes", "min_byte", "max_byte",
                ],
            )

    return files.mapInPandas(_batches, schema=WARC_STATS_SCHEMA)
