"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns with a typed metadata struct — the
schema/partitioning/UDF plumbing is real and tested. Codecs sit behind
``DecodeBackend``: ``BmpDecodeBackend`` (uncompressed 24-bit BMP),
``PngDecodeBackend`` (DEFLATE-compressed 8-bit RGB/RGBA PNG, all five
scanline filters, stdlib zlib), ``WavDecodeBackend`` (16-bit PCM
RIFF/WAVE), and ``MulawWavDecodeBackend`` (G.711 μ-law companded audio)
are REAL pure-numpy/stdlib decoders — actual pixels and samples, tested
round-trip; PIL/libav slot in at deployment for the remaining compressed
formats (JPEG/MP3/video). ``FakeDecodeBackend`` remains the
deterministic stand-in (bytes → hashed pseudo pixels/samples) so every
downstream stage — batching, feature extraction, resize geometry, frame
sampling — is exercised end-to-end for formats without an in-tree codec.

All heavy lifting is ``mapInPandas`` over Arrow batches: decode cost is
amortized per batch, output schemas are fixed StructTypes, and partitioning
is preserved (one media blob never crosses a batch boundary).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, n_frames:int>"
)


class DecodeBackend:
    """Swap-in point for real codecs (PIL/libav/...). Implementations decode
    one blob to a float32 numpy array."""

    def decode_image(self, data: bytes, width: int, height: int, channels: int) -> np.ndarray:
        raise NotImplementedError("no image codec in this environment")

    def decode_audio(self, data: bytes, sample_rate: int) -> np.ndarray:
        raise NotImplementedError("no audio codec in this environment")


class BmpDecodeBackend(DecodeBackend):
    """REAL image decode, zero external deps: uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB, bottom-up or top-down) parsed with numpy.
    Output is float32 HxWx3 RGB in [0, 255] — the pixel values, not a fake.
    Closes the codec seam for the one format a pure numpy/stdlib container
    can decode; swap in PIL/libav for the rest at deployment."""

    def decode_image(self, data: bytes, width: int, height: int, channels: int) -> np.ndarray:
        if data[:2] != b"BM":
            raise ValueError("not a BMP file")
        pixel_off = int.from_bytes(data[10:14], "little")
        hdr_size = int.from_bytes(data[14:18], "little")
        if hdr_size < 40:
            raise ValueError("unsupported BMP header")
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        bpp = int.from_bytes(data[28:30], "little")
        compression = int.from_bytes(data[30:34], "little")
        if bpp != 24 or compression != 0:
            raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        px = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pixel_off)
        rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        return rows[:, :, ::-1].astype(np.float32)  # BGR -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Inverse of BmpDecodeBackend for tests/fixtures: HxWx3 uint8 RGB →
    uncompressed bottom-up 24-bit BMP bytes."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, bottom-up
    raw = body.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(raw)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raw).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + raw


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class PngDecodeBackend(DecodeBackend):
    """REAL COMPRESSED-image decode, zero external deps: 8-bit truecolor
    PNG (color type 2 = RGB, 6 = RGBA; all five scanline filters 0-4;
    non-interlaced) — DEFLATE inflation via stdlib ``zlib``, unfiltering in
    numpy (Sub is a per-pixel cumsum, Up is one vectorized row add; Average
    and Paeth walk pixels with vectorized channel math). Output is float32
    HxWxC in [0, 255]. Closes the "compressed format" seam with real
    pixels; PIL/libav still slot in for JPEG/MP3/video at deployment."""

    def decode_image(self, data: bytes, width: int, height: int, channels: int) -> np.ndarray:
        import zlib

        if data[:8] != _PNG_SIG:
            raise ValueError("not a PNG file")
        pos, ihdr, idat = 8, None, []
        while pos + 8 <= len(data):
            ln = int.from_bytes(data[pos : pos + 4], "big")
            typ = data[pos + 4 : pos + 8]
            if typ == b"IHDR":
                ihdr = data[pos + 8 : pos + 8 + ln]
            elif typ == b"IDAT":
                idat.append(data[pos + 8 : pos + 8 + ln])
            elif typ == b"IEND":
                break
            pos += 12 + ln  # length + type + payload + crc
        if ihdr is None or not idat:
            raise ValueError("missing IHDR/IDAT chunk")
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
        if depth != 8 or ctype not in (2, 6) or interlace != 0:
            raise ValueError(
                f"only 8-bit non-interlaced RGB(A) PNG supported "
                f"(depth={depth}, color_type={ctype}, interlace={interlace})"
            )
        ch = 3 if ctype == 2 else 4
        stride = w * ch
        raw = zlib.decompress(b"".join(idat))
        if len(raw) != h * (1 + stride):
            raise ValueError("IDAT size does not match dimensions")
        scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
        filters = scan[:, 0]
        rows = scan[:, 1:].astype(np.int32)
        out = np.zeros((h, stride), dtype=np.int32)
        zero_px = np.zeros(ch, dtype=np.int32)
        for y in range(h):
            f, row = int(filters[y]), rows[y]
            prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
            if f == 0:  # None
                rec = row
            elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-ch] → cumsum
                rec = (np.cumsum(row.reshape(w, ch), axis=0) & 255).reshape(stride)
            elif f == 2:  # Up
                rec = (row + prev) & 255
            elif f == 3:  # Average
                px, pv = row.reshape(w, ch), prev.reshape(w, ch)
                rec = np.empty((w, ch), dtype=np.int32)
                left = zero_px
                for i in range(w):
                    left = (px[i] + ((left + pv[i]) >> 1)) & 255
                    rec[i] = left
                rec = rec.reshape(stride)
            elif f == 4:  # Paeth
                px, pv = row.reshape(w, ch), prev.reshape(w, ch)
                rec = np.empty((w, ch), dtype=np.int32)
                left = ul = zero_px
                for i in range(w):
                    b = pv[i]
                    p = left + b - ul
                    pa, pb, pc = abs(p - left), abs(p - b), abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, ul)
                    )
                    left = (px[i] + pred) & 255
                    rec[i] = left
                    ul = b
                rec = rec.reshape(stride)
            else:
                raise ValueError(f"bad PNG filter type {f}")
            out[y] = rec
        return out.reshape(h, w, ch).astype(np.float32)


def encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Inverse of PngDecodeBackend for tests/fixtures: HxWxC uint8 (C=3 RGB
    or C=4 RGBA) → non-interlaced 8-bit PNG. ``filters`` picks per-row
    scanline filters (cycled); the default cycles 0..4 so one round-trip
    exercises every unfilter path. Filtering itself is fully vectorized."""
    import zlib

    h, w, ch = pixels.shape
    if ch not in (3, 4):
        raise ValueError("encode_png supports RGB (3) or RGBA (4) pixels")
    ctype = 2 if ch == 3 else 6
    stride = w * ch
    recon = pixels.astype(np.int32).reshape(h, stride)
    zero = np.zeros(ch, dtype=np.int32)
    lines = []
    for y in range(h):
        f = (filters[y % len(filters)] if filters else y % 5) & 7
        cur = recon[y]
        prev = recon[y - 1] if y else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([zero, cur[:-ch]])
        ul = np.concatenate([zero, prev[:-ch]])
        if f == 0:
            raw = cur
        elif f == 1:
            raw = cur - left
        elif f == 2:
            raw = cur - prev
        elif f == 3:
            raw = cur - ((left + prev) >> 1)
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            raw = cur - pred
        else:
            raise ValueError(f"bad PNG filter type {f}")
        lines.append(bytes([f]) + (raw & 255).astype(np.uint8).tobytes())
    comp = zlib.compress(b"".join(lines))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + zlib.crc32(typ + payload).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")


class WavDecodeBackend(DecodeBackend):
    """REAL audio decode, zero external deps: 16-bit PCM RIFF/WAVE parsed
    with stdlib byte math + numpy. Output is float32 samples in [-1, 1)
    (channel-interleaved frames averaged down to mono). Closes the audio
    codec seam the same way BmpDecodeBackend does for images; swap in
    libav/soundfile for compressed formats at deployment."""

    def decode_audio(self, data: bytes, sample_rate: int) -> np.ndarray:
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos, n_channels, bits, body = 12, None, None, None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            sz = int.from_bytes(data[pos + 4 : pos + 8], "little")
            if cid == b"fmt ":
                fmt = int.from_bytes(data[pos + 8 : pos + 10], "little")
                if fmt != 1:
                    raise ValueError(f"only PCM supported (fmt={fmt})")
                n_channels = int.from_bytes(data[pos + 10 : pos + 12], "little")
                bits = int.from_bytes(data[pos + 22 : pos + 24], "little")
            elif cid == b"data":
                body = data[pos + 8 : pos + 8 + sz]
            pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if body is None or n_channels is None:
            raise ValueError("missing fmt/data chunk")
        if bits != 16:
            raise ValueError(f"only 16-bit PCM supported (bits={bits})")
        samples = np.frombuffer(body, dtype="<i2").astype(np.float32) / 32768.0
        if n_channels > 1:
            samples = samples[: len(samples) - len(samples) % n_channels]
            samples = samples.reshape(-1, n_channels).mean(axis=1)
        return samples


class MulawWavDecodeBackend(DecodeBackend):
    """REAL companded-audio decode, zero external deps: G.711 μ-law
    RIFF/WAVE (format tag 7, 8-bit samples — the classic telephony
    compression, 2:1 vs 16-bit PCM). Expansion is one vectorized table-free
    numpy expression (ITU-T G.711: sign/exponent/mantissa unpack). Output
    matches WavDecodeBackend: float32 mono in [-1, 1)."""

    def decode_audio(self, data: bytes, sample_rate: int) -> np.ndarray:
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos, n_channels, bits, fmt, body = 12, None, None, None, None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            sz = int.from_bytes(data[pos + 4 : pos + 8], "little")
            if cid == b"fmt ":
                fmt = int.from_bytes(data[pos + 8 : pos + 10], "little")
                n_channels = int.from_bytes(data[pos + 10 : pos + 12], "little")
                bits = int.from_bytes(data[pos + 22 : pos + 24], "little")
            elif cid == b"data":
                body = data[pos + 8 : pos + 8 + sz]
            pos += 8 + sz + (sz & 1)
        if body is None or n_channels is None:
            raise ValueError("missing fmt/data chunk")
        if fmt != 7 or bits != 8:
            raise ValueError(f"only 8-bit mu-law supported (fmt={fmt}, bits={bits})")
        u = ~np.frombuffer(body, dtype=np.uint8) & 0xFF  # stored complemented
        sign = np.where(u & 0x80, -1.0, 1.0)
        exponent = (u >> 4) & 0x07
        mantissa = (u & 0x0F).astype(np.int32)
        # G.711 expansion: ((2*m + 33) << e) - 33, in 8159-max units
        magnitude = (((2 * mantissa + 33) << exponent) - 33).astype(np.float32)
        samples = (sign * magnitude / 8159.0).astype(np.float32)
        if n_channels > 1:
            samples = samples[: len(samples) - len(samples) % n_channels]
            samples = samples.reshape(-1, n_channels).mean(axis=1)
        return samples


def encode_mulaw_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Inverse of MulawWavDecodeBackend for tests: float samples in [-1, 1)
    → mono 8-bit G.711 μ-law RIFF/WAVE (vectorized compression)."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    mag = np.minimum((np.abs(x) * 8159.0).astype(np.int32), 8159)
    mag33 = mag + 33
    # segment e holds mag33 in [2^(e+5), 2^(e+6)); top code (7,15) absorbs
    # the clip edge (mag33 = 8192 = 2^13 exactly)
    exponent = np.clip(np.floor(np.log2(mag33)).astype(np.int32) - 5, 0, 7)
    mantissa = np.clip((mag33 >> (exponent + 1)) - 16, 0, 15)
    u = (np.where(x < 0, 0x80, 0) | (exponent << 4) | mantissa).astype(np.uint8)
    body = (~u & 0xFF).astype(np.uint8).tobytes()
    fmt = (
        b"fmt "
        + (18).to_bytes(4, "little")
        + (7).to_bytes(2, "little")     # mu-law
        + (1).to_bytes(2, "little")     # mono
        + sample_rate.to_bytes(4, "little")
        + sample_rate.to_bytes(4, "little")  # byte rate (1 byte/sample)
        + (1).to_bytes(2, "little")     # block align
        + (8).to_bytes(2, "little")     # bits
        + (0).to_bytes(2, "little")     # cbSize
    )
    data = b"data" + len(body).to_bytes(4, "little") + body
    riff_body = b"WAVE" + fmt + data
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Inverse of WavDecodeBackend for tests/fixtures: float samples in
    [-1, 1) → mono 16-bit PCM RIFF/WAVE bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767)
    body = pcm.astype("<i2").tobytes()
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")    # PCM
        + (1).to_bytes(2, "little")    # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")    # block align
        + (16).to_bytes(2, "little")   # bits
    )
    data = b"data" + len(body).to_bytes(4, "little") + body
    riff_body = b"WAVE" + fmt + data
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


class FakeDecodeBackend(DecodeBackend):
    """Deterministic stand-in: pixels/samples derived from sha256 of the
    bytes — stable across runs and partitionings."""

    def _seeded(self, data: bytes, n: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big") % (2**32)
        return np.random.RandomState(seed).rand(n).astype(np.float32)

    def decode_image(self, data, width, height, channels):
        return self._seeded(data, width * height * channels).reshape(
            height, width, channels
        )

    def decode_audio(self, data, sample_rate):
        return self._seeded(data, sample_rate)  # 1 second of fake samples


def image_features(
    df: DataFrame, backend: DecodeBackend | None = None, batch_size_hint: int = 64
) -> DataFrame:
    """media rows (kind='image') → (media_id, mean, std, width, height).
    Decode + reduce per Arrow batch; only scalars leave Python."""
    backend = backend or FakeDecodeBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b[b["kind"] == "image"]
            if b.empty:
                continue
            metas = b["meta"].tolist()
            widths = np.array([m["width"] for m in metas], dtype=np.int32)
            heights = np.array([m["height"] for m in metas], dtype=np.int32)
            chans = np.array([m["channels"] for m in metas], dtype=np.int32)
            # decode is inherently per-blob (variable-size opaque bytes); the
            # reduce is vectorized over the whole Arrow batch: one flat pixel
            # buffer + segment-wise reduceat instead of per-image Python math.
            # Upcast to float64 BEFORE reducing: uint8 codec output would wrap
            # mod 256 in flat*flat, and float32 sequential accumulation loses
            # precision on large images.
            flat = np.concatenate(
                [
                    backend.decode_image(bytes(d), w, h, c).ravel().astype(np.float64)
                    for d, w, h, c in zip(b["data"], widths, heights, chans)
                ]
            )
            sizes = (widths.astype(np.int64) * heights * chans)
            starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
            sums = np.add.reduceat(flat, starts)
            sumsq = np.add.reduceat(flat * flat, starts)
            mean = sums / sizes
            std = np.sqrt(np.maximum(sumsq / sizes - mean * mean, 0.0))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].to_numpy(),
                    "mean": mean.astype(np.float64),
                    "std": std.astype(np.float64),
                    "width": widths,
                    "height": heights,
                }
            )

    return df.mapInPandas(
        run, "media_id long, mean double, std double, width int, height int"
    )


def audio_features(
    df: DataFrame, backend: DecodeBackend | None = None
) -> DataFrame:
    """media rows (kind='audio') → (media_id, n_samples, rms, peak,
    sample_rate). Decode per blob, reduce vectorized per Arrow batch in
    float64 (same upcast discipline as image_features); only scalars leave
    Python."""
    backend = backend or FakeDecodeBackend()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b[b["kind"] == "audio"]
            if b.empty:
                continue
            rates = np.array(
                [m["sample_rate"] for m in b["meta"]], dtype=np.int32
            )
            decoded = [
                backend.decode_audio(bytes(d), int(r)).astype(np.float64)
                for d, r in zip(b["data"], rates)
            ]
            sizes = np.array([len(a) for a in decoded], dtype=np.int64)
            # reduceat needs every segment non-empty: pad zero-sample blobs
            # with one silent sample (stats for them come out 0 either way)
            padded = [a if len(a) else np.zeros(1, np.float64) for a in decoded]
            psizes = np.maximum(sizes, 1)
            flat = np.concatenate(padded)
            starts = np.concatenate(([0], np.cumsum(psizes)[:-1]))
            sumsq = np.add.reduceat(flat * flat, starts)
            rms = np.sqrt(sumsq / psizes)
            peak = np.maximum.reduceat(np.abs(flat), starts)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].to_numpy(),
                    "n_samples": sizes,
                    "rms": rms,
                    "peak": peak,
                    "sample_rate": rates,
                }
            )

    return df.mapInPandas(
        run,
        "media_id long, n_samples long, rms double, peak double, sample_rate int",
    )


def resize_plan(df: DataFrame, target: int = 224) -> DataFrame:
    """Resize geometry (pure column math — no decode needed): scale factor and
    output dims preserving aspect ratio, shorter side = target."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = target / F.least(w, h).cast("double")
    return df.select(
        "media_id",
        F.round(scale, 6).alias("scale"),
        F.ceil(w * scale).cast("int").alias("out_width"),
        F.ceil(h * scale).cast("int").alias("out_height"),
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video rows → one row per sampled frame index (no decode: the frame
    index plan is column math; pair with a decode backend for pixels)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def synth_media(spark, n: int = 20) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        data = hashlib.sha256(str(i).encode()).digest() * 4
        meta = {
            "width": 32 + (i % 4) * 16 if kind == "image" else 0,
            "height": 32 + (i % 3) * 16 if kind == "image" else 0,
            "channels": 3 if kind == "image" else 0,
            "sample_rate": 8000 if kind == "audio" else 0,
            "n_frames": 100 + i if kind == "video" else 0,
        }
        rows.append((i, kind, bytearray(data), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
