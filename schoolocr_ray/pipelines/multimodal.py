"""Multimodal column plumbing: opaque ``binary`` payload columns with typed
metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the decode step is a clearly
marked deterministic fake behind ``DecoderStub`` (raises
``NotImplementedError`` for real codecs); everything Ray-side — schema,
small-batch sizing for large binary rows, actor signature, output layout —
is real and tested.  A payload is a fake container format:

    b"IMG1" + width:uint16 + height:uint16 + body bytes

built deterministically from the documents table for tests/benchmarks.
"""
from __future__ import annotations

import hashlib
import struct

import pyarrow as pa
import ray.data

MAGIC = b"IMG1"


def make_payloads(sf_dir: str) -> ray.data.Dataset:
    """Derive a deterministic binary-payload table from ``documents``:
    (doc_id, payload binary, media_type, declared_w, declared_h)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads, ws, hs = [], [], []
        for did, t in zip(ids, batch.column("text").to_pylist()):
            body = t.encode()
            w = 16 + (did % 48)
            h = 16 + ((did * 7) % 48)
            payloads.append(MAGIC + struct.pack("<HH", w, h) + body)
            ws.append(w)
            hs.append(h)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/fake"] * len(ids), pa.string()),
            "declared_w": pa.array(ws, pa.int32()),
            "declared_h": pa.array(hs, pa.int32()),
        })

    return ds.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)


class DecoderStub:
    """Actor: 'loads the codec' once per actor; decodes the fake container.

    Real image decode would go exactly here (``__init__`` imports the codec,
    ``__call__`` decodes per batch); unsupported media types raise
    NotImplementedError at construction, not mid-stream."""

    def __init__(self, media_type: str = "image/fake") -> None:
        if media_type != "image/fake":
            raise NotImplementedError(
                f"codec for {media_type} not available in this container")
        self.media_type = media_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, lens, digests = [], [], [], []
        for buf in batch.column("payload").to_pylist():
            if buf[:4] != MAGIC:
                ws.append(-1)
                hs.append(-1)
            else:
                w, h = struct.unpack("<HH", buf[4:8])
                ws.append(w)
                hs.append(h)
            lens.append(len(buf))
            digests.append(hashlib.sha1(buf).hexdigest()[:16])
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_bytes": pa.array(lens, pa.int64()),
            "digest": pa.array(digests, pa.string()),
        })


def decode_features(sf_dir: str, batch_size: int = 64) -> ray.data.Dataset:
    """Decode/feature-extract over binary payloads: small batches (large
    binary rows), actor pool, typed metadata out."""
    payloads = make_payloads(sf_dir)
    return payloads.map_batches(DecoderStub, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=batch_size,
                                concurrency=(1, 4))
