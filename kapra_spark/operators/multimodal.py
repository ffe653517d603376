"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decoders (round-3 state):

- **PNG images — REAL decode**, pure stdlib: chunk parse + zlib
  inflate + full scanline unfilter (None/Sub/Up/Average/Paeth) for
  8-bit gray/RGB/RGBA. No external codec needed.
- **WAV audio — REAL decode** via the stdlib ``wave`` module
  (PCM16 -> float32 mono waveform).
- **video — REAL decode for RIFF/AVI**: uncompressed raw 24-bit
  BI_RGB DIB frames (pure ``struct`` + NumPy chunk walking) AND
  motion-JPEG streams (per-frame baseline JPEG via the from-scratch
  ITU-T T.81 codec in ``functions/jpeg.py``, incl. the OpenDML
  missing-DHT convention). The AVI/RIFF container and
  BITMAPINFOHEADER layouts are public spec. Other codecs
  (MP4/H.264/...) still raise — no codec libs in this container —
  and fall back to the loudly-marked stub. The frame-sampling
  planner and all Spark plumbing are real either way.

All the Spark-side machinery is real and tested either way: schema,
partition-friendly layout, Arrow batch shapes, UDF signatures, frame
sampling, and feature extraction run identically with any decoder
swapped in (the ``decoder`` argument).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), False),     # opaque bytes
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def fake_media_df(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        rows.append((
            f"m{i:06d}", kind,
            {"image": "image/png", "audio": "audio/wav",
             "video": "video/mp4"}[kind],
            int(rng.integers(32, 1024)) if kind != "audio" else None,
            int(rng.integers(32, 1024)) if kind != "audio" else None,
            int(rng.integers(1000, 60000)) if kind != "image" else None,
            bytes(rng.integers(0, 256, size=size, dtype=np.uint8)),
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codecs (stdlib-only)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer (8-bit gray/RGB/RGBA, no interlace).
    ``filter_type`` applies one scanline filter to every row — useful
    to exercise the decoder's unfilter paths in tests."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]

    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int64)
    for y in range(h):
        row = img[y].astype(np.int64)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:   # Sub
            left = np.vstack([np.zeros((1, ch), np.int64), row[:-1]])
            filt = (row - left) % 256
        elif filter_type == 2:   # Up
            filt = (row - prev) % 256
        else:
            raise ValueError("encoder supports filter 0/1/2")
        raw.append(filter_type)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def png_decode(payload: bytes) -> np.ndarray:
    """REAL PNG decode, stdlib-only: chunk walk, zlib inflate, full
    unfilter (None/Sub/Up/Average/Paeth). Supports 8-bit gray/RGB/RGBA,
    no interlace — the shapes a training pipeline normalizes to
    anyway. Returns (h, w, ch) uint8."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, bytearray(), None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _, _, interlace = meta
    if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"png_decode handles 8-bit gray/RGB/RGBA non-interlaced "
            f"(got depth={depth}, color_type={color_type}, "
            f"interlace={interlace})")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 2:     # Up
            cur = (line + prev) % 256
        elif f == 1:     # Sub: cur[i] = (line[i] + cur[i-ch]) % 256.
            # Mod distributes over addition, so the left-to-right
            # sequential recurrence is exactly a per-channel cumsum
            # taken mod 256 (int64 cumsum cannot overflow: w*255 << 2^63)
            cur = (np.cumsum(line.reshape(w, ch), axis=0) % 256).reshape(stride)
        elif f == 3:     # Average: w-step recurrence, channels vectorized
            line2 = line.reshape(w, ch)
            prev2 = prev.reshape(w, ch)
            cur2 = np.empty((w, ch), dtype=np.int64)
            a = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                a = (line2[x] + (a + prev2[x]) // 2) % 256
                cur2[x] = a
            cur = cur2.reshape(stride)
        elif f == 4:     # Paeth: w-step recurrence, channels vectorized
            line2 = line.reshape(w, ch)
            prev2 = prev.reshape(w, ch)
            cur2 = np.empty((w, ch), dtype=np.int64)
            a = np.zeros(ch, dtype=np.int64)   # left (current row)
            c = np.zeros(ch, dtype=np.int64)   # up-left (previous row)
            for x in range(w):
                b = prev2[x]                   # up
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a,
                                np.where(pb <= pc, b, c))
                a = (line2[x] + pred) % 256
                cur2[x] = a
                c = b
            cur = cur2.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def wav_encode(samples: np.ndarray, rate: int = 16000,
               channels: int | None = None) -> bytes:
    """PCM16 WAV writer (stdlib ``wave``); ``samples`` float in [-1, 1]
    shaped (n,) or (n, channels). The channel count is derived from the
    sample shape; passing ``channels`` explicitly is only a cross-check
    (a mismatch would silently interleave wrongly, so it raises)."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    if channels is not None and channels != s.shape[1]:
        raise ValueError(
            f"channels={channels} does not match sample shape {s.shape}")
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV decode via stdlib ``wave``: PCM16 -> (float32 mono
    waveform in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        n, chans, width, rate = (f.getnframes(), f.getnchannels(),
                                 f.getsampwidth(), f.getframerate())
        if width != 2:
            raise NotImplementedError(f"PCM16 only (sampwidth={width})")
        pcm = np.frombuffer(f.readframes(n), dtype="<i2")
    x = pcm.reshape(-1, chans).mean(axis=1) / 32768.0
    return x.astype(np.float32), rate


def avi_encode(frames: np.ndarray, fps: int = 10, codec: str = "DIB",
               quality: int = 85, restart_interval: int = 1) -> bytes:
    """RIFF/AVI writer (pure ``struct``): one 'vids' stream + an idx1
    index. The AVI/RIFF container and BITMAPINFOHEADER layouts are the
    public Microsoft/OpenDML spec. ``frames`` is uint8 (n, h, w, 3) RGB.

    ``codec="DIB"`` writes raw BI_RGB 24-bit DIB frames ('00db'
    chunks, bottom-up BGR rows padded to 4-byte stride).
    ``codec="MJPG"`` writes one baseline JPEG per frame ('00dc'
    chunks, :func:`kapra_spark.functions.jpeg.jpeg_encode`, 4:2:0,
    DHT segments OMITTED per the OpenDML motion-JPEG convention —
    decoders must assume the ITU-T T.81 Annex-K tables)."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3:
        raise ValueError(f"frames must be (n, h, w, 3) uint8, got {fr.shape}")
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"codec must be 'DIB' or 'MJPG', got {codec!r}")
    n, h, w, _ = fr.shape
    stride = (w * 3 + 3) // 4 * 4
    row_pad = stride - w * 3

    def chunk(tag: bytes, data: bytes) -> bytes:
        return tag + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) % 2 else b"")

    def lst(list_type: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", list_type + data)

    frame_bytes = []
    if codec == "MJPG":
        from kapra_spark.functions.jpeg import jpeg_encode
        for i in range(n):
            # default restart_interval=1 (one MCU per entropy
            # segment): a few bytes of marker overhead per MCU buys
            # segment-level parallel decode — jpeg_decode_batch turns
            # every segment of every frame into a vectorized lockstep
            # lane; pass restart_interval=0 for the legacy unsegmented
            # layout
            frame_bytes.append(jpeg_encode(
                fr[i], quality=quality, subsample="420",
                include_dht=False, restart_interval=restart_interval))
    else:
        for i in range(n):
            # bottom-up rows, BGR channel order, stride-padded
            bgr = fr[i, ::-1, :, ::-1]
            if row_pad:
                rows = np.zeros((h, stride), dtype=np.uint8)
                rows[:, :w * 3] = bgr.reshape(h, w * 3)
                frame_bytes.append(rows.tobytes())
            else:
                frame_bytes.append(bgr.tobytes())
    mjpg = codec == "MJPG"
    fsize = max(len(fb) for fb in frame_bytes) if mjpg else h * stride
    compression = struct.unpack("<I", b"MJPG")[0] if mjpg else 0
    fourcc = b"MJPG" if mjpg else b"DIB "
    frame_tag = b"00dc" if mjpg else b"00db"
    avih = struct.pack("<14I", 1_000_000 // fps, fsize * fps, 0, 0x10,
                       n, 0, 1, fsize, w, h, 0, 0, 0, 0)
    strh = (b"vids" + fourcc + struct.pack("<I2HI", 0, 0, 0, 0)
            + struct.pack("<6I", 1, fps, 0, n, fsize, 0xFFFFFFFF)
            + struct.pack("<I4H", 0, 0, 0, w, h))
    strf = struct.pack("<I2i2HI5I", 40, w, h, 1, 24, compression,
                       fsize, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_data, idx, off = b"", b"", 4
    for fb in frame_bytes:
        movi_data += chunk(frame_tag, fb)
        idx += frame_tag + struct.pack("<3I", 0x10, off, len(fb))
        off += 8 + len(fb) + (len(fb) % 2)
    body = hdrl + lst(b"movi", movi_data) + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body


_MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


def avi_decode(payload: bytes) -> tuple[np.ndarray, float]:
    """REAL AVI decode (pure ``struct`` + NumPy) for uncompressed
    BI_RGB 24-bit DIB video AND motion-JPEG (biCompression='MJPG'):
    walks the RIFF chunk tree, reads frame geometry from the
    BITMAPINFOHEADER, collects '00db'/'00dc' frame chunks, and either
    unpacks bottom-up stride-padded BGR rows (DIB) or decodes each
    frame as a baseline JPEG via
    :func:`kapra_spark.functions.jpeg.jpeg_decode` (MJPG — incl. the
    OpenDML missing-DHT convention). Returns (frames uint8
    (n, h, w, 3) RGB, fps). Other codecs (MP4/H.264, ...) raise
    NotImplementedError — no codec libraries exist in this
    environment."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI payload")
    w = h = None
    compression = None
    scale, rate = 1, 10
    in_vids = False          # strf applies to the LAST-SEEN strh's
    frames_raw = []          # stream type (audio strf = WAVEFORMATEX)

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, compression, scale, rate, in_vids
        while pos + 8 <= end:
            tag = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            data0 = pos + 8
            if tag == b"LIST":
                walk(buf, data0 + 4, data0 + size)
            elif tag == b"strh":
                in_vids = buf[data0:data0 + 4] == b"vids"
                if in_vids:
                    scale, rate = struct.unpack_from("<2I", buf, data0 + 20)
            elif tag == b"strf" and in_vids and w is None:
                _, w, h, _, bits, compression = struct.unpack_from(
                    "<I2i2HI", buf, data0)
                if compression not in (0, _MJPG_FOURCC) or (
                        compression == 0 and bits != 24):
                    raise NotImplementedError(
                        f"only uncompressed 24-bit BI_RGB and MJPG AVI are "
                        f"decodable here (bits={bits}, "
                        f"compression={compression:#x}); other codecs need "
                        f"external libraries")
            elif tag in (b"00db", b"00dc"):
                frames_raw.append(buf[data0:data0 + size])
            pos = data0 + size + (size % 2)

    walk(payload, 12, len(payload))
    if w is None or not frames_raw:
        raise NotImplementedError("no decodable 'vids' stream found")
    fps = rate / max(1, scale)
    if compression == _MJPG_FOURCC:
        from kapra_spark.functions.jpeg import jpeg_decode_batch
        decoded = []
        # batch decode: all frames' restart segments become lanes of
        # one vectorized lockstep pass (serial fallback per frame when
        # a stream carries no restart segmenting)
        for i, img in enumerate(jpeg_decode_batch(
                [bytes(fb) for fb in frames_raw])):
            if img.ndim == 2:                  # grayscale MJPG frame
                img = np.repeat(img[:, :, None], 3, axis=2)
            if img.shape[0] != abs(h) or img.shape[1] != w:
                raise NotImplementedError(
                    f"MJPG frame {i} geometry {img.shape[:2]} does not "
                    f"match BITMAPINFOHEADER ({abs(h)}, {w})")
            decoded.append(img)
        return np.stack(decoded), fps
    bottom_up = h > 0          # negative biHeight = top-down DIB
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames_raw):
        if len(fb) < h * stride:
            raise NotImplementedError(
                f"frame {i} truncated ({len(fb)} < {h * stride})")
        rows = np.frombuffer(fb, dtype=np.uint8,
                             count=h * stride).reshape(h, stride)
        if bottom_up:
            rows = rows[::-1]
        out[i] = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
    fps = rate / max(1, scale)
    return out, fps


def real_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Production decode dispatch: REAL for PNG images, WAV audio
    (stdlib codecs above), and RIFF/AVI video (raw DIB or MJPG);
    other video codecs fall back to :func:`stub_decoder` (no
    MP4/H.264 codec exists in this environment — loudly stubbed,
    swappable).

    Features (all computed from actually-decoded samples/pixels):
    image -> [h, w, ch, mean, std] + 11-bin gray histogram (16 dims);
    audio -> [dur_s, rms, zero-cross rate] + 13-bin FFT magnitude
    spectrum (16 dims)."""
    if kind == "image":
        img = png_decode(payload).astype(np.float32)
        gray = img.mean(axis=2)
        hist, _ = np.histogram(gray, bins=11, range=(0, 256))
        head = np.array([img.shape[0], img.shape[1], img.shape[2],
                         float(img.mean()), float(img.std())], np.float32)
        return np.concatenate(
            [head, (hist / max(1, gray.size)).astype(np.float32)])
    if kind == "audio":
        x, rate = wav_decode(payload)
        zc = float(np.mean(np.abs(np.diff(np.signbit(x)))))
        spec = np.abs(np.fft.rfft(x.astype(np.float64)))
        hist = np.interp(np.linspace(0, len(spec) - 1, 13),
                         np.arange(len(spec)), spec)
        head = np.array([len(x) / rate,
                         float(np.sqrt(np.mean(x ** 2))), zc], np.float32)
        denom = max(1e-9, float(hist.max()))
        return np.concatenate([head, (hist / denom).astype(np.float32)])
    if kind == "video":
        # REAL decode for RIFF/AVI (raw 24-bit DIB frames or MJPG);
        # other codecs (MP4/H.264/...) still have no decoder in this
        # environment and fall back to the loud stub.
        try:
            fr, fps = avi_decode(payload)
        except NotImplementedError:
            return stub_decoder(payload, kind)
        luma = fr.astype(np.float32).mean(axis=3)
        hist, _ = np.histogram(luma, bins=10, range=(0, 256))
        head = np.array([fr.shape[0], fr.shape[1], fr.shape[2],
                         fr.shape[0] / max(1e-9, fps),
                         float(luma.mean()), float(luma.std())], np.float32)
        return np.concatenate(
            [head, (hist / max(1, luma.size)).astype(np.float32)])
    raise NotImplementedError(f"no decoder for kind={kind!r}")


def stub_decoder(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode — the real pipeline would call PIL/librosa/ffmpeg
    here. Deterministic fake: interpret bytes as a uint8 stream and
    produce an 8-dim byte-histogram embedding. Raises for unknown
    kinds exactly like a real decoder would."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    b = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(b, bins=8, range=(0, 256))
    return (hist / max(1, len(b))).astype(np.float32)


def synthetic_media_df(spark: SparkSession, n: int = 24,
                       seed: int = 42,
                       video_codec: str = "DIB") -> DataFrame:
    """Deterministic media table with REAL payloads: valid PNGs
    (random small images, rotating scanline filters) and valid PCM16
    WAVs (seeded sine + noise), and valid AVIs (seeded frames;
    ``video_codec`` picks raw "DIB" or motion-JPEG "MJPG" streams).
    Metadata columns are truthful."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            ch = [1, 3, 4][i % 9 // 3]
            img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            payload = png_encode(img, filter_type=(i // 3) % 3)
            rows.append((f"m{i:06d}", kind, "image/png", w, h, None,
                         payload))
        elif kind == "audio":
            rate = 8000
            dur = float(rng.uniform(0.1, 0.5))
            t = np.arange(int(rate * dur)) / rate
            freq = float(rng.uniform(100, 1000))
            x = (0.5 * np.sin(2 * np.pi * freq * t)
                 + 0.05 * rng.standard_normal(len(t)))
            payload = wav_encode(np.clip(x, -1, 1), rate=rate)
            rows.append((f"m{i:06d}", kind, "audio/wav", None, None,
                         int(dur * 1000), payload))
        else:
            # real uncompressed RIFF/AVI payload (raw DIB frames);
            # odd widths exercise the 4-byte row-stride padding
            nf = int(rng.integers(2, 6))
            h, w = int(rng.integers(6, 16)), int(rng.integers(6, 17))
            fps = int(rng.integers(5, 30))
            fr = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            # restart_interval=0: keep the LEGACY unsegmented MJPG
            # layout here — the media_features_mjpg oracle digest pins
            # n_bytes of these exact payloads (r5 fingerprint); the
            # restart-segmented fast-decode layout is the avi_encode
            # default for new data
            payload = avi_encode(fr, fps=fps, codec=video_codec,
                                 restart_interval=0)
            rows.append((f"m{i:06d}", kind, "video/x-msvideo", w, h,
                         int(nf / fps * 1000), payload))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def extract_features(media_df: DataFrame, decoder=stub_decoder,
                     batch_kind: str | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of
    binary payloads -> float feature vectors). Swap ``decoder`` for a
    real codec without touching the Spark plumbing."""

    def fn(batches):
        for pdf in batches:
            feats = [decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "feature": feats,
            })

    df = media_df
    if batch_kind:
        df = df.filter(F.col("kind") == batch_kind)
    return df.mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(media_df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing for video: one output row per sampled
    frame offset (sequence+explode on metadata — no decode needed to
    plan the work, which is what matters for partitioning at scale).
    Feed the result to :func:`decode_sampled_frames` for real pixels."""
    vids = media_df.filter(F.col("kind") == "video")
    return (vids.select(
        "media_id", "payload",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"),
                             F.lit(every_ms))).alias("frame_ms")))


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("frame_ms", T.IntegerType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("luma_mean", T.FloatType(), False),
    T.StructField("luma_std", T.FloatType(), False),
])


def decode_sampled_frames(media_df: DataFrame,
                          every_ms: int = 5000) -> DataFrame:
    """REAL sampled-frame decode: one output row per ``every_ms``
    offset per video, with the nearest frame's geometry and luma
    stats from an actual AVI decode (raw DIB or MJPG streams).
    Payloads that are not decodable AVI are SKIPPED (no decodable
    pixels here; the loud stub path covers them in
    :func:`extract_features`).

    Scale shape: takes the MEDIA table directly (not the exploded
    plan from :func:`sample_frames`) so each payload crosses the
    Arrow boundary exactly ONCE — exploding first would duplicate
    the video bytes into every frame row. The unit of parallelism is
    therefore the media row; the frame fan-out happens inside the
    batch, where the byte stream is decoded once and sliced per
    offset. :func:`sample_frames` remains the metadata-only planner
    for sinks that only need offsets."""

    def fn(batches):
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_ms", "frame_idx",
                                   "height", "width", "luma_mean",
                                   "luma_std")}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                try:
                    frames, fps = avi_decode(payload)
                except NotImplementedError:
                    continue
                dur = 0 if dur is None or pd.isna(dur) else int(dur)
                for ms in range(0, dur + 1, every_ms):
                    idx = min(len(frames) - 1,
                              int(round(ms / 1000.0 * fps)))
                    luma = frames[idx].astype(np.float32).mean(axis=2)
                    out["media_id"].append(mid)
                    out["frame_ms"].append(ms)
                    out["frame_idx"].append(idx)
                    out["height"].append(frames.shape[1])
                    out["width"].append(frames.shape[2])
                    out["luma_mean"].append(float(luma.mean()))
                    out["luma_std"].append(float(luma.std()))
            yield pd.DataFrame(out)

    vids = media_df.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms")
    return vids.mapInPandas(fn, FRAME_SCHEMA)
