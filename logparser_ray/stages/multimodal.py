"""Multimodal column plumbing (build-brief extras).

Images / audio / video are opaque ``binary`` columns with typed metadata.
Two decoder backends behind one seam:

- ``decoder="real"`` — pure-numpy codecs for formats that need no external
  library: **PPM (P6)** images, **PCM16 WAV** audio, and "video" as a
  concatenated PPM frame stream. Decode, feature-extract, nearest-neighbor
  resize, and frame sampling are all REAL kernels (header parse +
  ``np.frombuffer`` + vectorized math). A PIL/ffmpeg/torchaudio call site
  would slot into the same methods for richer formats.
- ``decoder="fake"`` — the deterministic sha256 stand-in kept for opaque
  fixtures whose payloads are not parseable media.

Scale notes: binary payloads are large → small ``batch_size`` (default 64)
so batch × concurrency fits worker heaps; actors amortize decoder init.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# pure-numpy codecs (no external libraries)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _parse_ppm(payload: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Parse one P6 PPM at ``offset`` → ((h, w, 3) uint8, end offset)."""
    if payload[offset : offset + 2] != b"P6":
        raise ValueError(f"not a P6 PPM payload at byte {offset}")
    # header = magic, width, height, maxval separated by whitespace
    fields, pos = [], offset + 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    img = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(
        h, w, 3
    )
    return img, pos + h * w * 3


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8 (header parse + frombuffer)."""
    return _parse_ppm(payload)[0]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 samples → minimal PCM16 mono RIFF/WAVE."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 mono RIFF/WAVE → (samples int16, sample_rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate, data = None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, sample_rate


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Concatenated-PPM 'video' stream → list of single-frame payloads."""
    frames, pos = [], 0
    while pos < len(payload):
        _img, end = _parse_ppm(payload, pos)
        frames.append(payload[pos:end])
        pos = end
    return frames

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


def make_real_media_table(n: int = 48, seed: int = 5) -> pa.Table:
    """Deterministic REAL media fixture: decodable PPM images, PCM16 WAV
    audio, and concatenated-PPM 'videos' — same canonical schema."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads, widths, heights, rates = [], [], [], []
    for k in kinds:
        if k == "audio":
            rate = 8_000
            t = np.arange(int(rng.integers(400, 2_000))) / rate
            freq = float(rng.uniform(100, 1_000))
            samples = (np.sin(2 * np.pi * freq * t) * 12_000).astype(np.int16)
            payloads.append(encode_wav(samples, rate))
            widths.append(-1)
            heights.append(-1)
            rates.append(rate)
        else:
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            n_frames = 1 if k == "image" else int(rng.integers(2, 6))
            frames = [
                encode_ppm(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
                for _ in range(n_frames)
            ]
            payloads.append(b"".join(frames))
            widths.append(w)
            heights.append(h)
            rates.append(-1)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.asarray(widths, np.int32)),
            "height": pa.array(np.asarray(heights, np.int32)),
            "sample_rate": pa.array(np.asarray(rates, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for opaque payloads: 8-float feature vector
    derived from a sha256 of the payload."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:32], dtype=np.float32).copy()


def _features_real(payload: bytes, kind: str) -> np.ndarray:
    """REAL decode + feature extraction (8 floats per row):

    - image/video: [width, height, n_frames, mean R, mean G, mean B,
      global std, mean luma] over the decoded pixel array(s)
    - audio: [duration_s, sample_rate/1e3, rms, zero-crossing rate,
      mean, std, peak, 0] over the decoded int16 samples
    """
    if kind == "audio":
        samples, rate = decode_wav(payload)
        x = samples.astype(np.float64) / 32768.0
        zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
        return np.array(
            [
                len(x) / rate,
                rate / 1e3,
                float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                zcr,
                float(np.mean(x)) if len(x) else 0.0,
                float(np.std(x)) if len(x) else 0.0,
                float(np.max(np.abs(x))) if len(x) else 0.0,
                0.0,
            ],
            dtype=np.float32,
        )
    frames = split_ppm_frames(payload)
    imgs = np.stack([decode_ppm(f).astype(np.float64) for f in frames])
    mean_rgb = imgs.mean(axis=(0, 1, 2))
    luma = imgs @ np.array([0.299, 0.587, 0.114])
    return np.array(
        [
            imgs.shape[2],  # width
            imgs.shape[1],  # height
            len(frames),
            mean_rgb[0],
            mean_rgb[1],
            mean_rgb[2],
            float(imgs.std()),
            float(luma.mean()),
        ],
        dtype=np.float32,
    )


class MediaFeaturizer:
    """Actor-pool stage: decode → feature-extract each media row.

    ``decoder='real'`` runs the pure-numpy PPM/WAV codecs (see module
    docstring); ``decoder='fake'`` keeps the deterministic sha256 stand-in
    for opaque payloads.
    """

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self._extract = _features_real if decoder == "real" else _decode_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.stack([self._extract(p, k)[:8] for p, k in zip(payloads, kinds)])
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


def featurize_media(ds, concurrency=(1, 4), batch_size: int = 64, decoder: str = "fake"):
    """The canonical multimodal stage wiring: actor pool, small batches."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def _resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resample via index gather — pure numpy, vectorized."""
    src_h, src_w = img.shape[:2]
    rows = np.minimum((np.arange(h) * src_h) // h, src_h - 1)
    cols = np.minimum((np.arange(w) * src_w) // w, src_w - 1)
    return img[rows[:, None], cols[None, :]]


class MediaResizer:
    """Actor-pool stage: resize images/video frames to ``(target_w, target_h)``.

    ``decoder='real'`` decodes each PPM frame and resamples it with a
    vectorized nearest-neighbor gather (pure numpy), re-encoding as PPM;
    ``decoder='fake'`` emits a deterministic payload of the right nominal
    size for opaque fixtures. Audio rows pass through untouched either way.
    """

    def __init__(self, target_w: int = 224, target_h: int = 224, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.w, self.h = target_w, target_h
        self.decoder = decoder

    def _resize_payload(self, payload: bytes) -> bytes:
        if self.decoder == "real":
            return b"".join(
                encode_ppm(_resize_nearest(decode_ppm(f), self.w, self.h))
                for f in split_ppm_frames(payload)
            )
        return (hashlib.sha256(payload).digest() * ((self.w * self.h * 3) // 32 + 1))[
            : self.w * self.h * 3
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = np.asarray(batch["kind"].to_pylist(), dtype=object)
        visual = kinds != "audio"
        payloads = batch["payload"].to_pylist()
        new_payloads = [
            self._resize_payload(p) if v else p for p, v in zip(payloads, visual)
        ]
        w = np.where(visual, self.w, -1).astype(np.int32)
        h = np.where(visual, self.h, -1).astype(np.int32)
        out = batch.drop_columns(["payload", "width", "height"])
        out = out.append_column("width", pa.array(w))
        out = out.append_column("height", pa.array(h))
        out = out.append_column("payload", pa.array(new_payloads, pa.binary()))
        return out


class FrameSampler:
    """Actor-pool stage: sample up to ``n_frames`` evenly from each video
    payload.

    Emits one row PER FRAME (row-expanding map — the flat_map shape); images
    and audio pass through with ``frame_idx = -1``. ``decoder='real'``
    parses the concatenated-PPM stream and emits whole decodable frames;
    ``decoder='fake'`` slices deterministic byte windows for opaque
    fixtures.
    """

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.n_frames = n_frames
        self.decoder = decoder

    def _frames_of(self, payload: bytes) -> list[bytes]:
        if self.decoder == "real":
            frames = split_ppm_frames(payload)
            if len(frames) <= self.n_frames:
                return frames
            idx = (np.arange(self.n_frames) * len(frames)) // self.n_frames
            return [frames[i] for i in idx]
        step = max(1, len(payload) // self.n_frames)
        return [payload[fi * step : (fi + 1) * step] for fi in range(self.n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in ("media_id", "kind", "frame_idx", "payload")}
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind == "video":
                for fi, frame in enumerate(self._frames_of(payload)):
                    rows["media_id"].append(mid)
                    rows["kind"].append(kind)
                    rows["frame_idx"].append(fi)
                    rows["payload"].append(frame)
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


def resize_media(
    ds, target_w: int = 224, target_h: int = 224, concurrency=(1, 4), decoder: str = "fake"
):
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={
            "target_w": target_w,
            "target_h": target_h,
            "decoder": decoder,
        },
        batch_format="pyarrow",
        batch_size=64,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def sample_frames(ds, n_frames: int = 4, concurrency=(1, 4), decoder: str = "fake"):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=64,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
