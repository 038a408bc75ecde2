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


N_FRAME_SAMPLES = 4
FRAME_MS = 100  # fixed 10 fps for the deterministic fake container


class FrameSampleStage:
    """1→N frame sampling for video payloads (actor pool): each video
    row expands to N_FRAME_SAMPLES evenly-spaced frame rows with a
    per-frame feature. The container probe and frame decode are the
    stubbed codec work (deterministic md5 fakes); the Ray shape — 1→N
    expansion inside an actor-pool map_batches, small batches, bounded
    output rows per input row — is the real deliverable.

    Frame positions are floor(j·(n_frames-1)/3) for j in 0..3, so the
    first and last frames are always sampled (n_frames ≥ 8 keeps the
    four positions distinct)."""

    def __init__(self):
        pass  # real deployment: open the demuxer/codec once per actor

    @staticmethod
    def probe_frames(payload: bytes) -> int:
        """Fake container metadata: 8..32 frames from the digest."""
        return 8 + int(hashlib.md5(payload).hexdigest()[8:10], 16) % 25

    @staticmethod
    def frame_feature(payload: bytes, frame_idx: int) -> int:
        """Fake per-frame decode: one byte of md5(payload ':' idx)."""
        h = hashlib.md5(payload + b":" + str(frame_idx).encode())
        return int(h.hexdigest()[0:2], 16)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # defensive re-filter (frame_samples pre-filters video rows in a
        # cheap task stage so non-video payload bytes never reach the
        # actor pool; a caller feeding mixed batches still gets correct
        # output)
        keep = pc.equal(pc.cast(batch["media_type"], pa.string()), "video")
        batch = batch.filter(keep)
        ids, idxs, ts, feat = [], [], [], []
        for d, p in zip(batch["doc_id"].to_pylist(),
                        batch["payload"].to_pylist()):
            nf = self.probe_frames(p)
            for j in range(N_FRAME_SAMPLES):
                fi = (j * (nf - 1)) // (N_FRAME_SAMPLES - 1)
                ids.append(d)
                idxs.append(fi)
                ts.append(fi * FRAME_MS)
                feat.append(self.frame_feature(p, fi))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_ts_ms": pa.array(ts, pa.int64()),
            "brightness": pa.array(feat, pa.int64()),
        })


def frame_samples(docs_ds, concurrency=2):
    """documents → synth multimodal table → video-only 1→N frame rows.

    Non-video rows are dropped in a cheap task-pool pre-filter so their
    payload bytes are never serialized into the actor pool (2/3 of the
    synthetic corpus — the same pruning rule as windows.py's pre())."""
    media = docs_ds.map_batches(synth_media_batch, batch_format="pyarrow")

    def only_video(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["media_type"], "video"))

    media = media.map_batches(only_video, batch_format="pyarrow")
    return media.map_batches(FrameSampleStage,
                             concurrency=concurrency,
                             batch_size=MEDIA_BATCH_SIZE,
                             batch_format="pyarrow")
