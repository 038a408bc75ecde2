"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/feature-extracted by an actor-pool map_batches stage.

The image/audio libraries are not in this container, so the actual
codec work is STUBBED behind ``MediaDecodeStage.decode_real`` (raises
NotImplementedError) and a deterministic fake (md5-derived dimensions)
— but the Ray-side plumbing is real and tested: binary column schema,
small batch size for large payloads, actor-pool signature with
per-actor setup, hive-partitioned output layout.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

MEDIA_TYPES = ("image", "audio", "video")
# large binary payloads ⇒ small batches so batch × concurrency fits the
# worker heap (the guide's memory rule); real deployments size this from
# payload stats
MEDIA_BATCH_SIZE = 64


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Build the multimodal table shape from documents: payload bytes +
    typed metadata. Stands in for read_binary_files / a blob store."""
    ids = pc.cast(batch["doc_id"], pa.int64())
    payload = pa.array([t.encode("utf-8")
                        for t in batch["text"].to_pylist()], pa.large_binary())
    mtype = pa.array([MEDIA_TYPES[int(i) % 3] for i in ids.to_pylist()],
                     pa.string())
    return pa.table({"doc_id": ids, "media_type": mtype,
                     "payload": payload})


class MediaDecodeStage:
    """Actor-pool decode/feature stage: construct-once state (a real
    deployment loads the codec/model here), per-batch __call__.

    Use as ``ds.map_batches(MediaDecodeStage, concurrency=N,
    batch_size=MEDIA_BATCH_SIZE, batch_format="pyarrow")``.
    """

    def __init__(self, use_real_codecs: bool = False):
        self.use_real_codecs = use_real_codecs
        # once-per-actor setup lives here (codec init, model load)

    @staticmethod
    def decode_real(payload: bytes, media_type: str) -> dict:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "deterministic fake decode is used instead")

    @staticmethod
    def decode_fake(payload: bytes, media_type: str) -> dict:
        """Deterministic stand-in: dimensions derived from the payload
        digest, so outputs are stable and oracle-checkable."""
        h = hashlib.md5(payload).hexdigest()
        return {
            "n_bytes": len(payload),
            "width": 64 + int(h[0:2], 16),
            "height": 64 + int(h[2:4], 16),
            "duration_ms": int(h[4:8], 16) if media_type != "image" else 0,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = (self.decode_real if self.use_real_codecs
                  else self.decode_fake)
        feats = [decode(p, m) for p, m in
                 zip(batch["payload"].to_pylist(),
                     batch["media_type"].to_pylist())]
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_type": batch["media_type"],
            "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
            "width": pa.array([f["width"] for f in feats], pa.int64()),
            "height": pa.array([f["height"] for f in feats], pa.int64()),
            "duration_ms": pa.array([f["duration_ms"] for f in feats],
                                    pa.int64()),
        })


def media_features(docs_ds, concurrency=2):
    """documents → synth multimodal table → actor-pool decode stage."""
    media = docs_ds.map_batches(synth_media_batch, batch_format="pyarrow")
    return media.map_batches(MediaDecodeStage,
                             concurrency=concurrency,
                             batch_size=MEDIA_BATCH_SIZE,
                             batch_format="pyarrow")
