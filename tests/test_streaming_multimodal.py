"""Streaming (availableNow-drained) + multimodal plumbing tests."""

import math
import shutil

import pytest

from sparkgraph.multimodal import (
    FakeDecodeBackend,
    image_features,
    resize_plan,
    sample_frames,
    synth_media,
)
from sparkgraph.streaming import (
    run_to_memory,
    stream_edges_from_files,
    streaming_dedup,
    streaming_degrees,
    windowed_event_counts,
)

from tests.fixtures import GRAPH_MAIN
from tests.oracles import symmetrize


def test_streaming_degrees_match_batch(spark, assets_dir, tmp_path):
    src_dir = tmp_path / "edges_in"
    src_dir.mkdir()
    shutil.copy(f"{assets_dir}/graph_main.txt", src_dir / "part1.txt")
    edges = stream_edges_from_files(spark, str(src_dir))
    assert edges.isStreaming
    got = {
        r.id: r.deg
        for r in run_to_memory(streaming_degrees(edges), "deg_t", "update").collect()
    }
    from collections import Counter
    want = Counter(s for s, _ in symmetrize(GRAPH_MAIN))
    assert got == dict(want)


def test_windowed_event_counts(spark, tmp_path):
    import pandas as pd

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:10", "2024-01-01 00:00:50",
                 "2024-01-01 00:01:10", "2024-01-01 00:02:05"]
            ),
            "event_type": ["click", "click", "click", "error"],
        }
    ).astype({"ts": "datetime64[us]"}).to_parquet(events_dir / "p1.parquet")
    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(
        str(events_dir)
    )
    out = run_to_memory(windowed_event_counts(stream), "win_t", "update")
    rows = {(str(r.window_start), r.event_type): r.n for r in out.collect()}
    assert rows[("2024-01-01 00:00:00", "click")] == 2
    assert rows[("2024-01-01 00:01:00", "click")] == 1
    assert rows[("2024-01-01 00:02:00", "error")] == 1


def test_streaming_dedup_drops_repeat_content(spark, tmp_path):
    import pandas as pd

    d = tmp_path / "docs_in"
    d.mkdir()
    pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01"] * 3),
            "text": ["same text", "same text", "other"],
        }
    ).astype({"ts": "datetime64[us]"}).to_parquet(d / "p1.parquet")
    stream = spark.readStream.schema("ts timestamp, text string").parquet(str(d))
    out = run_to_memory(streaming_dedup(stream), "dedup_t", "append")
    texts = sorted(r.text for r in out.collect())
    assert texts == ["other", "same text"]


def test_image_features_deterministic_and_batched(spark):
    media = synth_media(spark, 12).repartition(3)
    feats = {r.media_id: (r["mean"], r["std"]) for r in image_features(media).collect()}
    assert set(feats) == {i for i in range(12) if i % 3 == 0}  # images only
    again = {r.media_id: (r["mean"], r["std"]) for r in image_features(media.repartition(5)).collect()}
    assert feats == again  # partitioning-independent (hash-seeded decode)
    for m, s in feats.values():
        assert 0.0 < m < 1.0 and 0.0 < s < 1.0


def test_decode_backend_stub_raises(spark):
    from sparkgraph.multimodal import DecodeBackend

    with pytest.raises(NotImplementedError):
        DecodeBackend().decode_image(b"", 1, 1, 1)


def test_resize_plan_geometry(spark):
    media = synth_media(spark, 6).filter("kind = 'image'")
    plans = {r.media_id: r for r in resize_plan(media, target=224).collect()}
    rows = {r.media_id: r for r in media.select("media_id", "meta").collect()}
    for mid, p in plans.items():
        w, h = rows[mid].meta.width, rows[mid].meta.height
        assert math.isclose(p.scale, 224 / min(w, h), rel_tol=1e-6)
        assert min(p.out_width, p.out_height) == 224


def test_sample_frames(spark):
    media = synth_media(spark, 9)
    frames = sample_frames(media, every_n=25).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    # video ids are 2,5,8 with n_frames 102,105,108
    assert by_id[2] == [0, 25, 50, 75, 100]
    assert all(i % 25 == 0 for idx in by_id.values() for i in idx)


def test_bmp_backend_real_decode_roundtrip(spark):
    """Real codec path: deterministic RGB images -> BMP bytes -> Spark
    image_features with BmpDecodeBackend -> exact float64 mean/std."""
    import numpy as np

    from sparkgraph.multimodal import BmpDecodeBackend, encode_bmp, image_features

    rng = np.random.RandomState(42)
    rows, want = [], {}
    for i, (w, h) in enumerate([(5, 3), (17, 9), (32, 32), (1, 1)]):
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        data = encode_bmp(px)
        # decoder round-trips the exact pixels (incl. row padding, BGR flip)
        back = BmpDecodeBackend().decode_image(data, w, h, 3)
        assert back.shape == (h, w, 3) and (back == px.astype(np.float32)).all()
        meta = {"width": w, "height": h, "channels": 3, "sample_rate": 0, "n_frames": 0}
        rows.append((i, "image", bytearray(data), meta))
        f = px.astype(np.float64)
        want[i] = (f.mean(), f.std(), w, h)
    from sparkgraph.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.media_id: (r.mean, r.std, r.width, r.height)
        for r in image_features(df, backend=BmpDecodeBackend()).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][2:] == want[i][2:]
        assert abs(got[i][0] - want[i][0]) < 1e-9, i
        assert abs(got[i][1] - want[i][1]) < 1e-9, i


def test_bmp_backend_top_down_and_rejects(spark):
    import numpy as np
    import pytest as _pytest

    from sparkgraph.multimodal import BmpDecodeBackend, encode_bmp

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = bytearray(encode_bmp(px))
    # flip to top-down: negate height, reverse row order in the body
    data[22:26] = (-2).to_bytes(4, "little", signed=True)
    stride = (3 * 3 + 3) & ~3
    body = bytes(data[54:])
    data[54:] = body[stride:] + body[:stride]
    back = BmpDecodeBackend().decode_image(bytes(data), 3, 2, 3)
    assert (back == px.astype(np.float32)).all()
    with _pytest.raises(ValueError, match="not a BMP"):
        BmpDecodeBackend().decode_image(b"nope", 1, 1, 3)


def test_wav_backend_real_decode_roundtrip(spark):
    """Real audio codec path: synthetic sine/noise -> WAV bytes -> Spark
    audio_features with WavDecodeBackend -> exact rms/peak (within 16-bit
    quantization)."""
    import numpy as np

    from sparkgraph.multimodal import (
        MEDIA_SCHEMA,
        WavDecodeBackend,
        audio_features,
        encode_wav,
    )

    rng = np.random.RandomState(7)
    rows, want = [], {}
    for i, n in enumerate([800, 1601, 1]):
        samples = (rng.rand(n) * 1.6 - 0.8).astype(np.float64)
        data = encode_wav(samples, 8000)
        back = WavDecodeBackend().decode_audio(data, 8000)
        assert back.shape == (n,)
        assert np.abs(back - samples).max() < 1.0 / 32768 + 1e-9  # quantization only
        q = back.astype(np.float64)
        meta = {"width": 0, "height": 0, "channels": 0, "sample_rate": 8000, "n_frames": 0}
        rows.append((i, "audio", bytearray(data), meta))
        want[i] = (n, float(np.sqrt((q * q).mean())), float(np.abs(q).max()))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.media_id: (r.n_samples, r.rms, r.peak, r.sample_rate)
        for r in audio_features(df, backend=WavDecodeBackend()).collect()
    }
    assert set(got) == set(want)
    for i, (n, rms, peak) in want.items():
        assert got[i][0] == n and got[i][3] == 8000
        assert abs(got[i][1] - rms) < 1e-12 and abs(got[i][2] - peak) < 1e-12


def test_wav_backend_stereo_and_rejects():
    import numpy as np
    import pytest as _pytest

    from sparkgraph.multimodal import WavDecodeBackend, encode_wav

    # hand-build a stereo file from two mono encodes' bodies
    left = np.array([0.5, -0.5, 0.25], dtype=np.float64)
    right = np.array([0.0, 1.0 - 1 / 32768, -0.25], dtype=np.float64)
    inter = np.empty(6, dtype=np.float64)
    inter[0::2], inter[1::2] = left, right
    mono_bytes = encode_wav(inter, 8000)
    data = bytearray(mono_bytes)
    data[22:24] = (2).to_bytes(2, "little")  # declare 2 channels
    back = WavDecodeBackend().decode_audio(bytes(data), 8000)
    lq = np.round(left * 32768) / 32768
    rq = np.clip(np.round(right * 32768), -32768, 32767) / 32768
    assert np.abs(back - (lq + rq) / 2).max() < 1e-9
    with _pytest.raises(ValueError, match="RIFF"):
        WavDecodeBackend().decode_audio(b"nope", 8000)


def test_png_backend_real_decode_roundtrip(spark):
    """Compressed codec path (VERDICT r3 #6): RGB and RGBA pixels -> PNG
    bytes (rows cycling all five scanline filters) -> exact pixel round-trip
    through the stdlib-zlib decoder, and through Spark image_features."""
    import numpy as np

    from sparkgraph.multimodal import (
        MEDIA_SCHEMA,
        PngDecodeBackend,
        encode_png,
        image_features,
    )

    rng = np.random.RandomState(11)
    be = PngDecodeBackend()
    rows, want = [], {}
    cases = [(5, 3, 3), (17, 9, 3), (16, 16, 4), (1, 1, 3), (7, 1, 4)]
    for i, (w, h, ch) in enumerate(cases):
        px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
        data = encode_png(px)  # filters cycle 0..4 across rows
        back = be.decode_image(data, w, h, ch)
        assert back.shape == (h, w, ch) and (back == px.astype(np.float32)).all(), i
        meta = {"width": w, "height": h, "channels": ch, "sample_rate": 0, "n_frames": 0}
        rows.append((i, "image", bytearray(data), meta))
        f = px.astype(np.float64)
        want[i] = (f.mean(), f.std(), w, h)
    # gradient image: makes filters 1/3/4 produce long runs (worth covering
    # beyond random pixels, where prediction never wins)
    g = np.tile(np.arange(64, dtype=np.uint8)[None, :, None], (8, 1, 3))
    for ftyp in range(5):
        assert (
            PngDecodeBackend().decode_image(encode_png(g, filters=[ftyp]), 64, 8, 3)
            == g.astype(np.float32)
        ).all(), ftyp

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.media_id: (r.mean, r.std, r.width, r.height)
        for r in image_features(df, backend=PngDecodeBackend()).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][2:] == want[i][2:]
        assert abs(got[i][0] - want[i][0]) < 1e-9, i
        assert abs(got[i][1] - want[i][1]) < 1e-9, i


def test_png_backend_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from sparkgraph.multimodal import PngDecodeBackend, _PNG_SIG, encode_png

    be = PngDecodeBackend()
    with _pytest.raises(ValueError, match="not a PNG"):
        be.decode_image(b"nope", 1, 1, 3)
    # 16-bit depth / palette / interlace must be refused, not mis-decoded
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    ihdr_at = len(_PNG_SIG) + 8
    data[ihdr_at + 8] = 16  # bit depth byte inside IHDR
    with _pytest.raises(ValueError, match="only 8-bit"):
        be.decode_image(bytes(data), 2, 2, 3)


def test_mulaw_backend_real_decode_roundtrip(spark):
    """Companded (compressed) audio codec path: G.711 mu-law WAV bytes ->
    float samples within one quantization step; exact idempotence; Spark
    audio_features agrees with the numpy reduce."""
    import numpy as np

    from sparkgraph.multimodal import (
        MEDIA_SCHEMA,
        MulawWavDecodeBackend,
        audio_features,
        encode_mulaw_wav,
    )

    rng = np.random.RandomState(9)
    be = MulawWavDecodeBackend()
    rows, want = [], {}
    for i, n in enumerate([800, 4000, 1]):
        x = np.clip(rng.randn(n) * 0.4, -1, 1)
        data = encode_mulaw_wav(x, 8000)
        y = be.decode_audio(data, 8000)
        assert len(y) == n
        assert np.abs(y - x).max() < 0.032  # one mu-law step at full scale
        # companding is exactly idempotent: decode o encode is a projection
        assert (be.decode_audio(encode_mulaw_wav(y, 8000), 8000) == y).all()
        meta = {"width": 0, "height": 0, "channels": 0, "sample_rate": 8000, "n_frames": 0}
        rows.append((i, "audio", bytearray(data), meta))
        yy = y.astype(np.float64)
        want[i] = (n, np.sqrt((yy * yy).mean()), np.abs(yy).max())

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.media_id: (r.n_samples, r.rms, r.peak)
        for r in audio_features(df, backend=MulawWavDecodeBackend()).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9, i
        assert abs(got[i][2] - want[i][2]) < 1e-9, i

    import pytest as _pytest

    from sparkgraph.multimodal import encode_wav

    with _pytest.raises(ValueError, match="only 8-bit mu-law"):
        MulawWavDecodeBackend().decode_audio(encode_wav(np.zeros(4), 8000), 8000)
