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
    and the driver gate can pin exact bytes. Field values carrying CR or
    LF raise — an injected line break would tear the framing (or smuggle
    a bogus header) and break the encode→parse round-trip guarantee."""
    fields = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", warc_date),
    ]
    if target_uri is not None:
        fields.append(("WARC-Target-URI", target_uri))
    if content_type is not None:
        fields.append(("Content-Type", content_type))
    for name, value in fields:
        if "\r" in value or "\n" in value:
            raise ValueError(
                f"{name} value contains a line break ({value!r}) — "
                "refusing to emit torn/smuggled framing"
            )
    lines = ["WARC/1.0"] + [f"{n}: {v}" for n, v in fields]
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


def _gunzip_members(data: bytes, chunk_size: int = 1 << 20) -> bytes:
    """Decompress a chain of gzip members. Streaming by OFFSET over a
    memoryview — never re-materializing the tail per member (the naive
    `rest = obj.unused_data` loop copies O(members × file-size) bytes;
    a real Common Crawl file has tens of thousands of members). Each
    member must reach ``eof`` (trailer CRC/ISIZE verified by zlib) —
    a blob cut mid-member or mid-trailer raises instead of silently
    dropping or passing unverified records."""
    out = []
    view = memoryview(data)
    pos, n = 0, len(data)
    while pos < n:
        member_start = pos  # error offsets point at the MEMBER, not the
        # chunk cursor (which may have advanced megabytes past it)
        if bytes(view[pos : pos + 2]) != _GZIP_MAGIC:
            raise ValueError(
                f"gzip member chain broken at byte {pos}: expected magic "
                f"1f8b, got {bytes(view[pos : pos + 2])!r}"
            )
        obj = zlib.decompressobj(31)
        try:
            while not obj.eof:
                if pos >= n:
                    raise ValueError(
                        f"truncated gzip member starting at byte "
                        f"{member_start}: stream ended before the "
                        "member's trailer (records would be silently "
                        "lost or unverified)"
                    )
                chunk = view[pos : pos + chunk_size]
                out.append(obj.decompress(chunk))
                pos += len(chunk) - len(obj.unused_data)
            out.append(obj.flush())
        except zlib.error as e:
            raise ValueError(
                f"corrupt gzip member starting at byte {member_start}: {e}"
            ) from e
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
        last_name: str | None = None
        for line in lines[1:]:
            if line[:1] in (" ", "\t"):
                # spec-legal LWS continuation: the folded text belongs
                # to the PREVIOUS field's value
                if last_name is None:
                    raise ValueError(
                        f"continuation line with no preceding header: "
                        f"{line!r}"
                    )
                headers[last_name] += " " + line.strip()
                continue
            name, sep, value = line.partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header line {line!r}")
            last_name = name.strip().lower()
            if last_name in headers:
                # repeated fields are spec-legal (WARC-Concurrent-To);
                # preserve every value, comma-joined, instead of
                # silently keeping the last one
                headers[last_name] += ", " + value.strip()
            else:
                headers[last_name] = value.strip()
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError(f"record at byte {pos} has no Content-Length")
        except ValueError:
            # a repeated Content-Length comma-joins ('2, 2') and a folded
            # one grows whitespace text — either way the framing is
            # ambiguous, and ambiguity in the LENGTH field is framing
            # damage: fail loud WITH context, never guess a boundary
            raise ValueError(
                f"record at byte {pos} has a non-integer Content-Length "
                f"({headers['content-length']!r}) — repeated or folded "
                "length fields make the record boundary ambiguous"
            )
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
    body). Any payload that cannot be split as an HTTP message — no
    ``HTTP/`` prefix, no header/body separator (LF-only servers exist
    in real crawls), a non-numeric status — returns ``(None, {},
    payload)``: in-payload HTTP damage is a per-RECORD condition, not
    WARC framing damage, so it must never abort the surrounding file
    (callers see a NULL status and decide). Only the WARC layer itself
    is fail-loud."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    end_hdr = payload.find(b"\r\n\r\n")
    if end_hdr < 0:
        return None, {}, payload
    head = payload[:end_hdr].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    # isdecimal, not isdigit: int() rejects Unicode digit-LIKE chars
    # ('²'.isdigit() is True but int('²') raises) — mojibake status
    # lines must pass through, not abort. Then bound to the RFC's
    # 3-digit range so a garbage numeric run can't overflow the typed
    # int32 status column downstream.
    if len(parts) < 2 or not parts[1].isdecimal():
        return None, {}, payload
    status = int(parts[1])
    if not (100 <= status <= 999):
        return None, {}, payload
    headers: dict[str, str] = {}
    last_name: str | None = None
    for line in lines[1:]:
        if line[:1] in (" ", "\t"):
            # obs-fold continuation (multipart boundaries etc.): belongs
            # to the previous field; with no previous field the line is
            # in-payload damage — skipped, never fatal (lenient layer)
            if last_name is not None:
                headers[last_name] += " " + line.strip()
            continue
        name, sep, value = line.partition(":")
        if sep:
            last_name = name.strip().lower()
            headers[last_name] = value.strip()
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
                if blob is None:
                    # the module's fail-loud family, with context — not
                    # a bare TypeError from bytes(None) deep in the
                    # executor; callers filter NULL blobs deliberately
                    raise ValueError(
                        f"NULL WARC blob for {id_col}={rid}; filter "
                        "NULL content rows before warc_records (an "
                        "unreadable file is a file-level decision)"
                    )
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
