"""Web-corpus ingestion: WARC record parsing as an Arrow stage.

The shape every LLM-pretraining text pipeline starts from: Common
Crawl ships as WARC files (ISO 28500) — concatenated records, each a
``WARC/1.x`` version line + CRLF-delimited named headers + blank line
+ ``Content-Length`` bytes of body + a two-CRLF record separator. A
100 TB crawl is millions of such members; the scalable read is
(shard_payload → record manifest) fan-out inside ``mapInPandas`` so
shard parsing parallelizes with the scan and bodies never route
through the driver.

Pure-Python byte parsing, no library — same honesty rules as
``sources/multimodal.py``: truncated or malformed records terminate
the walk (parsed prefix is returned), non-WARC payloads are None.

Reference contrast: the reference ingests one local PDF at a time
(data_ingestion.py:110-134); a web-scale corpus arrives as WARC shards
instead, and this module is that source done Spark-first.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("rec_index", T.IntegerType(), False),
        T.StructField("warc_type", T.StringType(), False),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("content_length", T.LongType(), False),
        T.StructField("body", T.BinaryType(), False),
    ]
)


def warc_records(
    payload: bytes | None, max_records: int = 64
) -> list[tuple[str, str | None, int, bytes]] | None:
    """Walk a WARC payload into ``[(warc_type, target_uri,
    content_length, body_bytes), ...]``.

    Per ISO 28500: each record is ``WARC/`` version line, CRLF header
    lines (``name: value``, names case-insensitive), one blank line,
    exactly ``Content-Length`` body bytes, then CRLFCRLF before the
    next record. The walk stops at the first truncated or malformed
    record (parsed prefix is still returned — a torn tail shard yields
    its complete records, never garbage — the same truncate-don't-guess
    contract as the tar/Avro walkers); payloads that don't start with
    ``WARC/`` return None, and so does a FIRST record with a missing or
    non-integer Content-Length (the only format-recognition signal a
    magic-less framing offers); a later record with broken
    Content-Length truncates there, since every offset past it would be
    a guess."""
    if payload is None or not payload.startswith(b"WARC/"):
        return None
    out: list[tuple[str, str | None, int, bytes]] = []
    i = 0
    n = len(payload)
    while i < n and len(out) < max_records:
        if not payload.startswith(b"WARC/", i):
            break
        hdr_end = payload.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            break  # truncated header
        lines = payload[i:hdr_end].decode("ascii", "replace").split("\r\n")
        fields: dict[str, str] = {}
        for line in lines[1:]:
            name, _, value = line.partition(":")
            fields[name.strip().lower()] = value.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            clen = -1
        if clen < 0:
            # first record: not recognizably WARC. Later record:
            # truncate — offsets past a broken length are guesses.
            return None if not out else out
        body_off = hdr_end + 4
        if body_off + clen > n:
            break  # truncated body: keep the parsed prefix
        out.append(
            (
                fields.get("warc-type", ""),
                fields.get("warc-target-uri"),
                clen,
                payload[body_off : body_off + clen],
            )
        )
        i = body_off + clen
        if payload.startswith(b"\r\n\r\n", i):
            i += 4  # the spec's two-CRLF record separator
        elif i < n:
            break  # malformed separator: stop, keep prefix
    return out or None


def warc_manifest(media: DataFrame, max_records: int = 64) -> DataFrame:
    """(media_id, payload) → one row per WARC record (type, target
    URI, declared length, body bytes) via Arrow ``mapInPandas`` — the
    shard fan-out a crawl-scale corpus read needs: shards parse in
    parallel with the scan, unparseable payloads emit no rows."""

    def _go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, types, uris, lens, bodies = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                recs = warc_records(
                    None if payload is None else bytes(payload), max_records
                )
                if recs is None:
                    continue
                for ri, (wtype, uri, clen, body) in enumerate(recs):
                    ids.append(int(mid))
                    idxs.append(ri)
                    types.append(wtype)
                    uris.append(uri)
                    lens.append(clen)
                    bodies.append(body)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "rec_index": idxs,
                    "warc_type": types,
                    "target_uri": uris,
                    "content_length": lens,
                    "body": bodies,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _go, WARC_RECORD_SCHEMA
    )
