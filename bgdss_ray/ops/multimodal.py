"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``large_binary`` columns with a
``media_meta`` struct (mime, width, height, duration_ms, n_frames). The
decode/feature stages are actor-pool map_batches classes whose Ray-side
plumbing (schema, batch sizing, actor signature, output layout) is real and
tested; the actual codec call is stubbed — the container ships no
image/audio libraries — behind ``decode_backend``:

- "fake" (default): a deterministic hash-derived decode, so pipelines and
  tests run end-to-end with stable outputs;
- "pil"/"ffmpeg": raise NotImplementedError with a clear message (wire the
  real library here on a cluster image that has it).

Batch sizes for binary payloads must stay small (blocks are payload-bound,
not row-bound): stages default to batch_size=64.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_META = pa.struct(
    [
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
        pa.field("n_frames", pa.int32()),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("payload", pa.large_binary()),
        pa.field("media_meta", MEDIA_META),
    ]
)


def synth_media_table(ids: list[str], kind: str = "image") -> pa.Table:
    """Deterministic fake media rows (payload bytes derived from id).

    md5-family derivation (not blake2b) and an ASCII-hex payload body so
    the DuckDB oracle for the decode gate reconstructs payload AND
    features exactly (md5/md5_number_upper + repeat work on VARCHAR)."""
    payloads, metas = [], []
    for i in ids:
        h = hashlib.md5(i.encode()).digest()
        size = 256 + h[0] * 16
        payloads.append((hashlib.md5(i.encode()).hexdigest() * (size // 32)).encode())
        if kind == "image":
            metas.append(
                {"mime": "image/png", "width": 64 + h[1], "height": 64 + h[2],
                 "duration_ms": 0, "n_frames": 1}
            )
        else:
            metas.append(
                {"mime": "audio/wav", "width": 0, "height": 0,
                 "duration_ms": 1000 + h[1] * 100, "n_frames": 0}
            )
    return pa.Table.from_arrays(
        [
            pa.array(ids, type=pa.string()),
            pa.array(payloads, type=pa.large_binary()),
            pa.array(metas, type=MEDIA_META),
        ],
        schema=MEDIA_SCHEMA,
    )


class MediaDecoder:
    """Actor-pool stage: payload → decoded features.

    __init__ loads the (stubbed) codec once per actor — the reference's
    'heavyweight session per worker' pattern. __call__ is per batch.
    Output adds: decoded_ok:bool, feat: fixed_size_list<float,16>.
    """

    FEAT_DIM = 16

    def __init__(self, decode_backend: str = "fake"):
        if decode_backend == "fake":
            self.backend = self._fake_decode
        elif decode_backend == "pil":
            # guarded optional extra: the real codec wires in when the
            # cluster image ships Pillow; this container does not, so the
            # boundary raises the documented NotImplementedError here and
            # the PIL test skips (tests/test_ops_multimodal.py)
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "decode backend 'pil' needs Pillow; this container "
                    "ships none — install it on the cluster image."
                ) from e
            self._pil_image = Image
            self.backend = self._pil_decode
        elif decode_backend == "ffmpeg":
            raise NotImplementedError(
                "decode backend 'ffmpeg' needs the real library; this "
                "container ships none — wire it here on a cluster image."
            )
        else:
            raise ValueError(f"unknown decode backend {decode_backend!r}")

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        """Deterministic 16-dim 'embedding' from payload bytes: four
        chained md5 digests (payload || '0'..'3'), little-endian uint32
        lanes scaled to [0,1) — each lane is ``(md5_number(payload || k)
        >> 32*t) & 0xffffffff / 2^32`` in the DuckDB oracle."""
        d = b"".join(
            hashlib.md5(payload + str(k).encode()).digest() for k in range(4)
        )
        return (
            np.frombuffer(d, dtype=np.uint32).astype(np.float64) / np.float64(2**32)
        )

    def _pil_decode(self, payload: bytes) -> np.ndarray:
        """Real decode (Pillow): grayscale-resize to 4x4 and normalize —
        a deterministic 16-dim visual signature."""
        import io

        img = self._pil_image.open(io.BytesIO(payload)).convert("L")
        small = img.resize((4, 4))
        return np.asarray(small, dtype=np.float64).reshape(self.FEAT_DIM) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self.backend(p) for p in payloads])
        ok = np.array([len(p) > 0 for p in payloads])
        return batch.append_column(
            "decoded_ok", pa.array(ok)
        ).append_column(
            "feat", pa.array(list(feats), type=pa.list_(pa.float64(), self.FEAT_DIM))
        )


class FrameSampler:
    """Actor-pool stage for video-like payloads: emit one row per sampled
    frame (flat_map-shaped inside map_batches). Frame 'content' is a
    deterministic slice of the payload; the real frame grab goes where the
    stub is."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        metas = batch.column("media_meta").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_frame, out_ts, out_bytes = [], [], [], []
        for mid, meta, payload in zip(ids, metas, payloads):
            dur = meta["duration_ms"] or 0
            n = max(1, dur // self.every_ms) if dur else 1
            for f in range(n):
                out_id.append(mid)
                out_frame.append(f)
                out_ts.append(f * self.every_ms)
                lo = (f * 16) % max(1, len(payload) - 16)
                out_bytes.append(payload[lo : lo + 16])
        return pa.Table.from_arrays(
            [
                pa.array(out_id, type=pa.string()),
                pa.array(out_frame, type=pa.int32()),
                pa.array(out_ts, type=pa.int32()),
                pa.array(out_bytes, type=pa.large_binary()),
            ],
            names=["media_id", "frame_idx", "ts_ms", "frame_bytes"],
        )


def decode_media(ds, concurrency: int = 2, batch_size: int = 64,
                 decode_backend: str = "fake"):
    """Actor-pool decode stage (small batches: payloads dominate block size)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decode_backend": decode_backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
