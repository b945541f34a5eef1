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

from ..util import docs_empty, typed_empty

MAGIC = b"IMG1"


def make_payloads(sf_dir: str) -> ray.data.Dataset:
    """Derive a deterministic binary-payload table from ``documents``:
    (doc_id, payload binary, media_type, declared_w, declared_h)."""
    # shared coalescing read helper (micro-block shattering fix): a small
    # documents table otherwise splits into 64 8-row blocks and every
    # downstream actor-pool stage pays per-task setup 64 times
    from .text import _read_docs

    ds = _read_docs(sf_dir)

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
                body = buf
            else:
                w, h = struct.unpack("<HH", buf[4:8])
                ws.append(w)
                hs.append(h)
                body = buf[8:]
            lens.append(len(buf))
            # digest of the DECODED body (sha256 so the DuckDB oracle can
            # reproduce it from the source text)
            digests.append(hashlib.sha256(body).hexdigest()[:16])
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
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "width": "int32", "height": "int32", "n_bytes": "int64", "digest": "object"})  # noqa: E501
    payloads = make_payloads(sf_dir)
    return payloads.map_batches(DecoderStub, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=batch_size,
                                concurrency=(1, 4))


class ResizeStub:
    """Actor: resize-to-target over the fake container — rewrites the
    header dims to fit within (target_w, target_h) preserving aspect ratio
    and truncates the body proportionally (the byte-level stand-in for a
    real thumbnail op; a real resize kernel goes in ``__call__`` with the
    codec loaded in ``__init__``)."""

    def __init__(self, target_w: int = 32, target_h: int = 32) -> None:
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for buf in batch.column("payload").to_pylist():
            if buf[:4] != MAGIC:
                out.append(buf)
                continue
            w, h = struct.unpack("<HH", buf[4:8])
            scale = min(self.tw / max(w, 1), self.th / max(h, 1), 1.0)
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            body = buf[8:]
            keep = max(1, int(len(body) * (nw * nh) / max(w * h, 1)))
            out.append(MAGIC + struct.pack("<HH", nw, nh) + body[:keep])
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "payload": pa.array(out, pa.binary()),
            "media_type": batch.column("media_type"),
        })


def resize(sf_dir: str, target_w: int = 32, target_h: int = 32,
           batch_size: int = 64) -> ray.data.Dataset:
    """Resize stage over binary payloads, then re-decode to verify the new
    dims — the decode -> transform -> decode plumbing pattern."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "width": "int32", "height": "int32", "n_bytes": "int64", "digest": "object"})  # noqa: E501
    payloads = make_payloads(sf_dir)
    small = payloads.map_batches(
        ResizeStub, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=(1, 4),
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h})
    return small.map_batches(DecoderStub, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=batch_size,
                             concurrency=(1, 4))


def frame_sample(sf_dir: str, every: int = 7, batch_size: int = 64) -> ray.data.Dataset:
    """Frame-sampling plumbing for a 'video' payload: treat each 64-byte
    body chunk as a frame, emit one row per sampled frame (flat_map shape —
    more rows out than in), with (doc_id, frame_idx, n_bytes, digest)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "frame_idx": "int32", "n_bytes": "int64", "digest": "object"})  # noqa: E501

    def sample(batch: pa.Table) -> pa.Table:
        ids, fidx, lens, digests = [], [], [], []
        for did, buf in zip(batch.column("doc_id").to_pylist(),
                            batch.column("payload").to_pylist()):
            body = buf[8:] if buf[:4] == MAGIC else buf
            frames = [body[i:i + 64] for i in range(0, len(body), 64)]
            for i in range(0, len(frames), every):
                ids.append(did)
                fidx.append(i)
                lens.append(len(frames[i]))
                digests.append(hashlib.sha1(frames[i]).hexdigest()[:12])
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "n_bytes": pa.array(lens, pa.int64()),
            "digest": pa.array(digests, pa.string()),
        })

    return make_payloads(sf_dir).map_batches(
        sample, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)
