"""Multimodal plumbing: schema, actor-pool decode, frame sampling, stubs."""

import numpy as np
import pytest
import ray.data as rd

from bgdss_ray.ops.multimodal import (
    MEDIA_SCHEMA,
    FrameSampler,
    MediaDecoder,
    decode_media,
    synth_media_table,
)


def test_media_table_schema():
    t = synth_media_table([f"m{i}" for i in range(10)])
    assert t.schema.equals(MEDIA_SCHEMA)
    assert all(len(p) >= 256 for p in t.column("payload").to_pylist())


def test_decode_actor_pool(ray_session):
    t = synth_media_table([f"m{i}" for i in range(20)])
    out = decode_media(rd.from_arrow(t), concurrency=2, batch_size=8).to_pandas()
    assert out["decoded_ok"].all()
    assert all(len(f) == MediaDecoder.FEAT_DIM for f in out["feat"])
    # deterministic: same payload → same features across runs
    out2 = decode_media(rd.from_arrow(t), concurrency=2, batch_size=8).to_pandas()
    a = np.asarray(out.sort_values("media_id")["feat"].tolist())
    b = np.asarray(out2.sort_values("media_id")["feat"].tolist())
    assert np.array_equal(a, b)


def test_real_backends_are_clearly_stubbed():
    with pytest.raises(NotImplementedError, match="decode backend"):
        MediaDecoder(decode_backend="pil")
    with pytest.raises(ValueError):
        MediaDecoder(decode_backend="nope")


def test_frame_sampler(ray_session):
    t = synth_media_table([f"v{i}" for i in range(5)], kind="audio")
    out = rd.from_arrow(t).map_batches(
        FrameSampler(every_ms=500), batch_format="pyarrow", batch_size=4
    ).to_pandas()
    # one row per sampled frame, ts spaced by every_ms
    g = out[out.media_id == "v0"].sort_values("frame_idx")
    assert (np.diff(g["ts_ms"]) == 500).all()
    assert out.groupby("media_id")["frame_idx"].min().eq(0).all()


def test_pil_backend_boundary(ray_session):
    """The 'pil' backend decodes real PNG bytes where Pillow exists and
    raises the documented NotImplementedError where it doesn't (this
    container) — the stub boundary itself is exercised either way."""
    import numpy as np
    import pytest
    import ray.data as rd

    from bgdss_ray.ops.multimodal import MediaDecoder, decode_media

    try:
        from PIL import Image
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            MediaDecoder(decode_backend="pil")
        return

    import io

    import pyarrow as pa

    rows = []
    for i in range(4):
        img = Image.new("L", (8, 8), color=i * 40)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append(buf.getvalue())
    t = pa.table(
        {
            "media_id": pa.array([f"m{i}" for i in range(4)]),
            "payload": pa.array(rows, type=pa.large_binary()),
        }
    )
    out = decode_media(
        rd.from_arrow(t), concurrency=1, decode_backend="pil"
    ).to_pandas()
    assert out["decoded_ok"].all()
    feats = np.stack(out["feat"].to_list())
    assert feats.shape == (4, 16)
    # uniform gray images decode to uniform normalized features
    assert np.allclose(feats[0], 0.0) and np.allclose(feats[3], 120 / 255.0)
