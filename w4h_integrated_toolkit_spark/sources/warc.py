"""WARC (Web ARChive, ISO 28500) source — pure-stdlib record codec.

Crawl corpora arrive as WARC files: at 100 TB the ingest edge of a web
training-data pipeline is "directories of .warc(.gz) blobs", and the
very first distributed step is record extraction — split each blob into
(URI, HTTP status, content type, body) rows that the downstream
curation stack (html_extract → canonicalize_url → quality/dedup)
consumes. This module is that step, in the repo's vendored-codec
pattern (audiocodec/videocodec precedent: the sandbox has no warcio, so
the format is implemented from its public spec, with an ENCODER used by
tests and the driver gate to prove the parser by round-trip).

Format support (fail-loud, never silently partial):

- WARC/1.0 and WARC/1.1 record framing: a CRLF-delimited header block,
  ``Content-Length``-framed payload, two-CRLF record boundary.
- Plain files AND per-record-gzipped files (the Common Crawl layout —
  each record its own gzip member; stdlib zlib handles member chaining).
- HTTP ``response`` records: payload splits into status / headers /
  body (the body is what curation wants; non-HTTP payloads pass through
  whole).

Scale shape: one input row per WARC blob → ``mapInPandas`` (Arrow
batches; the record split is sequential WITHIN a blob by format design
— gzip members chain and Content-Length framing is cumulative — so the
parallel unit is the FILE, exactly how a 1000-executor cluster eats a
crawl bucket of millions of ~1 GB WARCs). Bodies stay opaque binary;
only typed metadata columns are aggregate-friendly, mirroring
operators/multimodal.py's payload/meta discipline.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "encode_warc",
    "encode_warc_record",
    "parse_warc",
    "split_http_response",
    "warc_records",
    "WARC_RECORD_SCHEMA",
]

_GZIP_MAGIC = b"\x1f\x8b"


def encode_warc_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    warc_date: str = "2024-01-01T00:00:00Z",
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    content_type: str | None = None,
) -> bytes:
    """One WARC/1.0 record: header block + Content-Length-framed payload
    + the spec's two-CRLF boundary. Deterministic given its inputs (the
    date and record id are caller-supplied, never wall-clock), so tests
    and the driver gate can pin exact bytes."""
    lines = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: {record_id}",
        f"WARC-Date: {warc_date}",
    ]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}")
    if content_type is not None:
        lines.append(f"Content-Type: {content_type}")
    lines.append(f"Content-Length: {len(payload)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8")
    return head + payload + b"\r\n\r\n"


def encode_warc(records: list[bytes], gzip_members: bool = False) -> bytes:
    """Concatenate encoded records into one WARC blob; with
    ``gzip_members=True`` each record becomes its own gzip member (the
    Common Crawl layout — members chain, so range readers can seek to a
    record without decompressing the whole file)."""
    if not gzip_members:
        return b"".join(records)
    out = []
    for rec in records:
        comp = zlib.compressobj(9, zlib.DEFLATED, 31)  # wbits 31 = gzip
        out.append(comp.compress(rec) + comp.flush())
    return b"".join(out)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a chain of gzip members (stdlib zlib loop — each
    member's trailer is followed by the next member's magic)."""
    out = []
    rest = data
    while rest:
        if rest[:2] != _GZIP_MAGIC:
            raise ValueError(
                f"gzip member chain broken: expected magic 1f8b, got "
                f"{rest[:2]!r} with {len(rest)} bytes left"
            )
        obj = zlib.decompressobj(31)
        try:
            out.append(obj.decompress(rest))
            out.append(obj.flush())
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member: {e}") from e
        rest = obj.unused_data
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict]:
    """Split one WARC blob (plain or gzip-membered — auto-detected by
    magic) into record dicts: ``version``, ``headers`` (original-case
    names in a dict keyed by lower-cased name), ``payload`` bytes.
    Malformed framing raises — a torn record means a torn file, and a
    crawl pipeline wants that loud (the caller decides skip-vs-abort at
    the FILE level, never silently inside one)."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        while data[pos : pos + 2] == b"\r\n":  # inter-record padding
            pos += 2
        if pos >= n:
            break
        end_hdr = data.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            raise ValueError(f"unterminated WARC header block at byte {pos}")
        try:
            block = data[pos:end_hdr].decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"non-UTF-8 WARC header block at byte {pos}") from e
        lines = block.split("\r\n")
        version = lines[0].strip()
        if not version.startswith("WARC/"):
            raise ValueError(
                f"record at byte {pos} does not start with a WARC version "
                f"line (got {version!r})"
            )
        headers: dict[str, str] = {}
        for line in lines[1:]:
            name, sep, value = line.partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            headers[name.strip().lower()] = value.strip()
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError(f"record at byte {pos} has no Content-Length")
        body_start = end_hdr + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError(
                f"truncated record at byte {pos}: Content-Length {length} "
                f"but only {len(payload)} payload bytes remain"
            )
        records.append(
            {"version": version, "headers": headers, "payload": payload}
        )
        pos = body_start + length
    return records


def split_http_response(payload: bytes) -> tuple[int | None, dict, bytes]:
    """Split an HTTP-response record payload into (status, headers,
    body). A payload that is not an HTTP message (no ``HTTP/`` prefix)
    returns ``(None, {}, payload)`` — non-HTTP records pass through
    whole rather than half-parsed."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    end_hdr = payload.find(b"\r\n\r\n")
    if end_hdr < 0:
        raise ValueError("HTTP payload has no header/body separator")
    head = payload[:end_hdr].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"malformed HTTP status line {lines[0]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in lines[1:]:
        name, sep, value = line.partition(":")
        if sep:
            headers[name.strip().lower()] = value.strip()
    return status, headers, payload[end_hdr + 4 :]


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_payload_bytes", T.LongType()),
    ]
)


def warc_records(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Explode a binary WARC-blob column into one row per contained
    record: ``(id, record_idx, warc_type, target_uri, warc_date,
    http_status, http_content_type, payload, n_payload_bytes)``. For
    HTTP ``response`` records the emitted payload is the HTTP BODY
    (status/content-type lifted into their typed columns — what the
    curation stack consumes); other records pass their payload through
    whole with NULL http fields.

    Arrow-batched ``mapInPandas``, map-side, zero shuffles: the
    parallel unit is the blob (file), the only unit WARC's cumulative
    framing allows — a crawl bucket of millions of files saturates any
    executor count. Pair with ``spark.read.format("binaryFile")`` to
    ingest a directory of ``.warc(.gz)`` files."""
    out_schema = T.StructType(
        [df.schema[id_col]] + list(WARC_RECORD_SCHEMA.fields)
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                for i, rec in enumerate(parse_warc(bytes(blob))):
                    h = rec["headers"]
                    payload = rec["payload"]
                    status, http_headers, body = (
                        split_http_response(payload)
                        if h.get("warc-type") == "response"
                        else (None, {}, payload)
                    )
                    rows.append(
                        (
                            rid,
                            i,
                            h.get("warc-type"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            status,
                            http_headers.get("content-type"),
                            body,
                            len(body),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[id_col] + [f.name for f in WARC_RECORD_SCHEMA]
            )

    return df.select(id_col, content_col).mapInPandas(kernel, out_schema)
