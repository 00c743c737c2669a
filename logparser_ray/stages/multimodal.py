"""Multimodal column plumbing (build-brief extras).

Images / audio / video are opaque ``binary`` columns with typed metadata.
The Ray-side plumbing — schema, actor-pool stage shape, batch sizing,
output layout — is real and tested; the actual decode kernels are STUBBED
(``decoder="fake"`` is a deterministic stand-in) because no image/audio
libraries exist in this container. Swap ``_decode_fake`` for a real
PIL/torchaudio call site; nothing else changes.

Scale notes: binary payloads are large → small ``batch_size`` (default 64)
so batch × concurrency fits worker heaps; actors amortize decoder init.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),  # images/video; -1 otherwise
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio; -1 otherwise
    ]
)


def make_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media fixture with the canonical schema."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads = [rng.integers(0, 256, size=int(rng.integers(128, 1024)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.where(kinds != "audio", rng.integers(16, 512, n), -1).astype(np.int32)),
            "height": pa.array(np.where(kinds != "audio", rng.integers(16, 512, n), -1).astype(np.int32)),
            "sample_rate": pa.array(np.where(kinds == "audio", 16_000, -1).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 8-float feature vector
    derived from a sha256 of the payload. Replace with PIL/ffmpeg/torchaudio."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:32], dtype=np.float32).copy()


class MediaFeaturizer:
    """Actor-pool stage: decode → feature-extract each media row.

    ``decoder='fake'`` (default) uses the deterministic stub;
    ``decoder='real'`` raises NotImplementedError until a decode library is
    available (clearly-marked stub per the build brief).
    """

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        if decoder == "real":
            raise NotImplementedError(
                "no image/audio decode libraries in this container; "
                "plug PIL/torchaudio here"
            )
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.stack([_decode_fake(p, k)[:8] for p, k in zip(payloads, kinds)])
        n_bytes = np.array([len(p) for p in payloads], dtype=np.int64)
        out = batch.drop_columns(["payload"])  # features replace the heavy bytes
        out = out.append_column("n_bytes", pa.array(n_bytes))
        out = out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1).astype(np.float32)), 8
            ),
        )
        return out


def featurize_media(ds, concurrency=(1, 4), batch_size: int = 64):
    """The canonical multimodal stage wiring: actor pool, small batches."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


class MediaResizer:
    """Actor-pool stage: resize images/video frames to ``(target_w, target_h)``.

    The decode+resample kernel is STUBBED (no image libs in this container):
    the fake path rewrites the metadata and emits a deterministic payload of
    the right nominal size, so the schema contract, batch sizing, and
    actor-pool wiring are real. Plug PIL's ``Image.resize`` at the marked
    call site; audio rows pass through untouched.
    """

    def __init__(self, target_w: int = 224, target_h: int = 224, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError("plug PIL/ffmpeg resize here")
        self.w, self.h = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = np.asarray(batch["kind"].to_pylist(), dtype=object)
        visual = kinds != "audio"
        payloads = batch["payload"].to_pylist()
        new_payloads = [
            (hashlib.sha256(p).digest() * ((self.w * self.h * 3) // 32 + 1))[
                : self.w * self.h * 3
            ]
            if v
            else p  # <- replace with real resample
            for p, v in zip(payloads, visual)
        ]
        w = np.where(visual, self.w, -1).astype(np.int32)
        h = np.where(visual, self.h, -1).astype(np.int32)
        out = batch.drop_columns(["payload", "width", "height"])
        out = out.append_column("width", pa.array(w))
        out = out.append_column("height", pa.array(h))
        out = out.append_column("payload", pa.array(new_payloads, pa.binary()))
        return out


class FrameSampler:
    """Actor-pool stage: sample ``n_frames`` evenly from each video payload.

    Emits one row PER FRAME (row-expanding map — the flat_map shape); images
    and audio pass through with ``frame_idx = -1``. Frame extraction is
    STUBBED with deterministic byte slices; plug ffmpeg at the call site.
    """

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError("plug ffmpeg frame extraction here")
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in ("media_id", "kind", "frame_idx", "payload")}
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind == "video":
                step = max(1, len(payload) // self.n_frames)
                for fi in range(self.n_frames):
                    rows["media_id"].append(mid)
                    rows["kind"].append(kind)
                    rows["frame_idx"].append(fi)
                    rows["payload"].append(payload[fi * step : (fi + 1) * step])
            else:
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["frame_idx"].append(-1)
                rows["payload"].append(payload)
        return pa.table(
            {
                "media_id": pa.array(rows["media_id"], pa.int64()),
                "kind": pa.array(rows["kind"], pa.string()),
                "frame_idx": pa.array(rows["frame_idx"], pa.int32()),
                "payload": pa.array(rows["payload"], pa.binary()),
            }
        )


def resize_media(ds, target_w: int = 224, target_h: int = 224, concurrency=(1, 4)):
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h},
        batch_format="pyarrow",
        batch_size=64,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def sample_frames(ds, n_frames: int = 4, concurrency=(1, 4)):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=64,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
