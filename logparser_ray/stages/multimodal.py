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
