"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

The lake treats media as ``binary`` content plus a typed metadata struct
(`MEDIA_META`), exactly like a 100 TB training-data pipeline would:
blobs never enter JVM expression evaluation; every decode / resize /
frame-sample / feature step is an Arrow-batched ``mapInPandas`` pass so
bytes move Python-side once per stage and memory is bounded by the Arrow
batch size (see ``media_batch_conf``), not the partition size.

Decoders — three tiers:
  * REAL stdlib/numpy decoders: BMP (24/32-bit uncompressed), PPM/PGM
    (netpbm binary), WAV PCM audio (stdlib ``wave``), and PNG (8-bit
    gray/RGB/±alpha, non-interlaced: stdlib ``zlib`` inflate + full
    scanline filter reconstruction — None/Sub/Up/Average/Paeth). These
    parse actual bytes produced by any standard tool.
  * the deterministic ``MMRW`` raw container (12-byte header: magic,
    uint16 width/height/channels/frames, packed frame bytes) — the
    canonical internal representation; resize/sample emit it, and tests
    synthesize it for byte-exact checks.
  * remaining compressed codecs (arithmetic-coded JPEG/MP4…, plus PNG's
    palette / 16-bit / interlaced corners) require PIL/ffmpeg, absent in this
    environment — that path is import-gated and raises
    ``NotImplementedError`` with the reason; the mapInPandas plumbing
    is identical, so installing the lib changes one function.

Row-count contracts (what the tests pin):
  decode_media:   1 row in → 1 row out  (adds meta, drops nothing)
  resize_images:  1 row in → 1 row out  (content rewritten, w×h×c bytes)
  sample_frames:  1 row in → ceil(frames/every_n) rows out (explode)
  media_features: 1 row in → 1 row out  (adds array<float> embedding)
  audio_features: 1 row in → 1 row out  (adds rms/zcr/centroid)
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"MMRW"

# ISO-BMFF brands that really are MP4 movie containers (the shapes the
# moov/mvhd metadata walk understands). HEIC/AVIF stills (heic/mif1/
# avif/miaf) and QuickTime (qt  ) never list any of these — they sniff
# as octet-stream rather than pretending to be video. The check scans
# the ftyp box's COMPATIBLE brands too (standard sniffing fallback):
# exotic major brands routinely list isom/mp42 there.
_MP4_BRANDS = frozenset([
    b"isom", b"iso2", b"iso3", b"iso4", b"iso5", b"iso6", b"iso7",
    b"iso8", b"iso9", b"mp41", b"mp42", b"mp4v", b"mp71", b"avc1",
    b"avc2", b"avc3", b"avc4", b"dash", b"cmfc", b"cmf2", b"f4v ",
    b"M4V ", b"M4VP", b"MSNV",
])


def _isobmff_brands(blob: bytes) -> list[bytes]:
    """Major + compatible brands from a leading ftyp box (empty when
    the box is malformed/truncated — callers fall through to
    octet-stream rather than guessing)."""
    if len(blob) < 16 or blob[4:8] != b"ftyp":
        return []
    (size,) = struct.unpack_from(">I", blob, 0)
    if size < 16 or size % 4:
        return []
    end = min(size, len(blob))
    # bytes 8-12 major brand, 12-16 minor version, 16+ compatible brands
    return [blob[8:12]] + [blob[o:o + 4] for o in range(16, end - 3, 4)]
HEADER_FMT = "<4sHHHH"  # magic, width, height, channels, frames
HEADER_SIZE = struct.calcsize(HEADER_FMT)

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio; NULL for images
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def media_batch_conf(spark, max_records_per_batch: int = 64) -> None:
    """Bound Arrow batch row-count so big blobs can't blow executor RAM.

    64 rows × ~16 MB blob ≈ 1 GB peak per batch — tune per corpus. This
    is THE scale knob for binary columns: partition size stays large
    (good for scan throughput), batch size stays small (good for Python
    heap).
    """
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(max_records_per_batch)
    )


# ------------------------------------------------------------------ encode


def encode_raw(width: int, height: int, channels: int = 3, frames: int = 1, seed: int = 0) -> bytes:
    """Build a deterministic fake 'raw' container (test/codec fixture).

    Frame bytes are a repeating digest stream seeded by (seed, frame) —
    stable across processes, no RNG state.
    """
    body = bytearray()
    frame_len = width * height * channels
    for f in range(frames):
        chunk = b""
        i = 0
        while len(chunk) < frame_len:
            chunk += hashlib.blake2b(
                f"{seed}:{f}:{i}".encode(), digest_size=32
            ).digest()
            i += 1
        body += chunk[:frame_len]
    return struct.pack(HEADER_FMT, MAGIC, width, height, channels, frames) + bytes(body)


def _decode_header(blob: bytes) -> tuple[int, int, int, int]:
    magic, w, h, c, fr = struct.unpack_from(HEADER_FMT, blob, 0)
    if magic != MAGIC:
        raise ValueError("not an MMRW container")
    return w, h, c, fr


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB → standard 24-bit bottom-up BMP bytes."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    assert c == 3, "24-bit BMP encoder takes RGB"
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    body = rows.tobytes()
    info = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def encode_ppm(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """(n,) or (n, ch) float in [-1, 1] → 16-bit PCM WAV bytes."""
    import wave

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(arr * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# --------------------------------------------------- real stdlib decoders


def sniff_mime(blob: bytes) -> str:
    """Identify a blob by magic bytes (the formats this layer decodes)."""
    if blob[:4] == MAGIC:
        return "application/x-mmrw"
    if blob[:2] == b"BM":
        return "image/bmp"
    if blob[:2] == b"P6":
        return "image/x-portable-pixmap"
    if blob[:2] == b"P5":
        return "image/x-portable-graymap"
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return "audio/wav"
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        return "video/x-msvideo"
    if blob[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if len(blob) >= 12 and blob[4:8] == b"ftyp":
        # any ISO-BMFF container carries 'ftyp' — HEIC/AVIF stills and
        # QuickTime would otherwise sniff as video and send _blob_meta
        # walking a moov that may not exist. Gate on the brand list
        # (major + compatible); unrecognized brand sets fall through to
        # octet-stream instead of a silent zero-dims parse.
        if any(b in _MP4_BRANDS for b in _isobmff_brands(blob)):
            return "video/mp4"
    return "application/octet-stream"


def _decode_bmp(blob: bytes) -> "np.ndarray":
    """Uncompressed 24/32-bit BMP → (h, w, c) uint8 RGB(A) array.

    Real parser: BITMAPFILEHEADER pixel offset, BITMAPINFOHEADER dims,
    4-byte row padding, bottom-up row order, BGR(A)→RGB(A) swizzle.
    """
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", blob, 10)
    _hsize, w, h, _planes, bpp, comp = struct.unpack_from("<IiihhI", blob, 14)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"only uncompressed 24/32-bit BMP (bpp={bpp}, comp={comp})")
    c = bpp // 8
    bottom_up = h > 0
    h = abs(h)
    stride = (w * c + 3) & ~3
    rows = np.frombuffer(blob, np.uint8, h * stride, pix_off).reshape(h, stride)
    arr = rows[:, : w * c].reshape(h, w, c)
    if bottom_up:
        arr = arr[::-1]
    order = [2, 1, 0] + ([3] if c == 4 else [])
    return np.ascontiguousarray(arr[:, :, order])


def _decode_netpbm(blob: bytes) -> "np.ndarray":
    """Binary PPM (P6) / PGM (P5), maxval ≤ 255 → (h, w, c) uint8."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm image")
    channels = 3 if blob[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace separated with
    # optional '#' comment lines, then ONE whitespace byte before pixels
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    return np.frombuffer(blob, np.uint8, h * w * channels, pos).reshape(h, w, channels)


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel


def encode_png(pixels: "np.ndarray", filter_type: int = 0) -> bytes:
    """(h, w, c) uint8 → 8-bit non-interlaced PNG (c ∈ {1,2,3,4}).

    ``filter_type`` applies that PNG scanline filter (0..4) to every
    row before deflate — the decoder's five reconstruction paths get
    real filtered bytes to chew on, not just filter-0 data.
    """
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    flat = px.reshape(h, w * c).astype(np.int16)
    prev = np.zeros(w * c, np.int16)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:  # Paeth
            left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
            ul = np.concatenate([np.zeros(c, np.int16), prev[:-c]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {filter_type}")
        raw.append(filter_type)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_ihdr(blob: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, bit_depth, color_type, interlace) from IHDR."""
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    if blob[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack_from(
        ">IIBBBBB", blob, 16
    )
    return w, h, depth, ctype, interlace


def _decode_png(blob: bytes) -> "np.ndarray":
    """8-bit non-interlaced PNG → (h, w, c) uint8 array. Pure stdlib:
    chunk walk, concatenated-IDAT ``zlib`` inflate, and per-scanline
    filter reconstruction (None/Sub/Up/Average/Paeth). Palette, 16-bit
    and interlaced files fall through to the PIL-gated path."""
    w, h, depth, ctype, interlace = _png_ihdr(blob)
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        return _decode_compressed(blob, "image/png")[0]
    c = _PNG_CHANNELS[ctype]
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + ln]
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data truncated")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — vectorized (no intra-row dependency)
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — sequential in x
            cur = line
            for x in range(c, stride):
                cur[x] = (cur[x] + cur[x - c]) & 0xFF
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)


def _decode_wav(blob: bytes) -> tuple["np.ndarray", int]:
    """PCM WAV → ((n_samples, channels) float64 in [-1, 1], sample_rate).

    stdlib ``wave`` handles the RIFF chunks; 8/16/32-bit PCM normalized
    to [-1, 1] doubles for feature math.
    """
    with wave_open(io.BytesIO(blob)) as wf:
        nch, sw, rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        raw = wf.readframes(nframes)
    if sw == 1:  # unsigned 8-bit
        samples = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        samples = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        samples = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"sample width {sw}")
    return samples.reshape(-1, nch), rate


def wave_open(fh):
    import wave

    return wave.open(fh, "rb")


def decode_image(blob: bytes) -> "np.ndarray":
    """Any supported image blob → (frames, h, w, c) uint8 array."""
    mime = sniff_mime(blob)
    if mime == "application/x-mmrw":
        w, h, c, fr = _decode_header(blob)
        return np.frombuffer(
            blob, np.uint8, fr * h * w * c, HEADER_SIZE
        ).reshape(fr, h, w, c)
    if mime == "image/bmp":
        return _decode_bmp(blob)[None]
    if mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
        return _decode_netpbm(blob)[None]
    if mime == "image/png":
        return _decode_png(blob)[None]
    if mime == "image/gif":
        from . import gif as _gif

        return _gif.decode_gif(blob)
    if mime == "video/x-msvideo":
        # MJPEG-in-AVI: the one fully-native video decode path — a RIFF
        # walk feeding each '00dc' payload to the native JPEG decoder
        # (operators/avi.py). Other AVI codecs raise from the JPEG gate.
        from . import avi as _avi

        return _avi.decode_avi(blob)
    return _decode_compressed(blob, mime)


def _decode_compressed(blob: bytes, mime: str):
    """Compressed codecs: JPEG baseline AND progressive decode natively
    (operators/jpeg.py — huffman + dequant + IDCT in numpy, multi-scan
    coefficient accumulation for progressive); MJPEG-in-AVI decodes
    natively upstream of this gate (operators/avi.py). Arithmetic-coded/
    lossless JPEG and real-codec video (MP4/H.264) remain PIL/ffmpeg
    import-gated, absent here."""
    if mime == "image/jpeg":
        from . import jpeg as _jpeg

        try:
            return _jpeg.decode_jpeg(blob)[None]
        except NotImplementedError:
            pass  # arithmetic/lossless/hierarchical profile → PIL gate
    if mime == "video/mp4":
        raise NotImplementedError(
            "MP4 frame decode requires ffmpeg, absent in this environment; "
            "header-only metadata (dims/duration/frames) parses natively "
            "via mp4_metadata/decode_media"
        )
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            f"decoding {mime} (beyond baseline+progressive JPEG) requires "
            "PIL/ffmpeg, absent in this environment; JPEG/BMP/PPM/PGM/PNG/"
            "GIF/WAV/MMRW decode natively"
        ) from exc
    arr = np.asarray(Image.open(io.BytesIO(blob)))  # pragma: no cover
    if arr.ndim == 2:  # pragma: no cover
        arr = arr[:, :, None]
    return arr[None]  # pragma: no cover


def _mp4_boxes(blob: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the ISO-BMFF boxes
    in blob[start:end] (ISO/IEC 14496-12, public spec): 32-bit
    big-endian size + fourcc, size==1 → 64-bit largesize follows,
    size==0 → box runs to the end of the enclosing scope."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack_from(">I", blob, off)
        btype = blob[off + 4 : off + 8]
        payload = off + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", blob, off + 8)
            payload = off + 16
        elif size == 0:
            size = end - off
        if size < payload - off or off + size > end:
            raise ValueError("malformed MP4 box tree")
        yield btype, payload, off + size
        off += size


def mp4_metadata(blob: bytes) -> dict:
    """Header-only MP4/ISO-BMFF metadata: dims, duration, frame count.

    The same contract the JPEG SOF peek honors — ANY profile's
    dimensions without a decoder. Walks ftyp/moov: ``mvhd`` gives
    timescale+duration (v0 and v1 layouts), each ``trak``'s ``tkhd``
    carries 16.16 fixed-point presentation dims (the first track with
    nonzero dims is the video track), and that track's ``stsz`` sample
    count is the frame count. Returns {width, height, n_frames,
    duration_sec, fps} with zeros where a box is absent — full frame
    DECODE stays ffmpeg-gated in :func:`decode_image`, exactly like
    arithmetic-JPEG stays PIL-gated.
    """
    def _find(start: int, end: int, *path: bytes):
        """Payload span of the first box at a nested fourcc path."""
        for bt, bp, be in _mp4_boxes(blob, start, end):
            if bt == path[0]:
                if len(path) == 1:
                    return bp, be
                return _find(bp, be, *path[1:])
        return None

    width = height = n_frames = 0
    duration_sec = 0.0
    moov = _find(0, len(blob), b"moov")
    if moov is not None:
        mvhd = _find(*moov, b"mvhd")
        if mvhd is not None:
            bp = mvhd[0]
            if blob[bp] == 1:
                ts, dur = struct.unpack_from(">IQ", blob, bp + 20)
            else:
                ts, dur = struct.unpack_from(">II", blob, bp + 12)
            if ts:
                duration_sec = dur / ts
        for bt, bp, be in _mp4_boxes(blob, *moov):
            if bt != b"trak" or width:
                continue
            tkhd = _find(bp, be, b"tkhd")
            if tkhd is None:
                continue
            woff = tkhd[0] + (88 if blob[tkhd[0]] == 1 else 76)
            w16, h16 = struct.unpack_from(">II", blob, woff)
            if not (w16 and h16):
                continue  # audio/hint track: zero presentation dims
            width, height = w16 >> 16, h16 >> 16
            stsz = _find(bp, be, b"mdia", b"minf", b"stbl", b"stsz")
            if stsz is not None:
                _sz, n_frames = struct.unpack_from(">II", blob, stsz[0] + 4)
    fps = n_frames / duration_sec if duration_sec and n_frames else 0.0
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "duration_sec": duration_sec,
        "fps": fps,
    }


def _blob_meta(blob: bytes) -> dict:
    """Decode just enough of any supported blob to fill MEDIA_META."""
    mime = sniff_mime(blob)
    meta = {
        "mime": mime,
        "width": 0,
        "height": 0,
        "channels": 0,
        "n_frames": 0,
        "n_bytes": len(blob),
        "sample_rate": None,
    }
    if mime == "application/x-mmrw":
        w, h, c, fr = _decode_header(blob)
        meta.update(width=w, height=h, channels=c, n_frames=fr)
    elif mime == "image/png":
        # header-only: dims come from IHDR, no inflate needed
        w, h, _depth, ctype, _il = _png_ihdr(blob)
        meta.update(
            width=w, height=h, channels=_PNG_CHANNELS.get(ctype, 0), n_frames=1
        )
    elif mime == "image/jpeg":
        # header-only: dims from the SOF marker, works for ANY profile
        # (progressive included) even though only baseline fully decodes
        from . import jpeg as _jpeg

        h, w, c = _jpeg.peek_dims(blob)
        meta.update(width=w, height=h, channels=c, n_frames=1)
    elif mime in ("image/bmp", "image/x-portable-pixmap", "image/x-portable-graymap"):
        frames = decode_image(blob)
        _, h, w, c = frames.shape
        meta.update(width=w, height=h, channels=c, n_frames=1)
    elif mime == "audio/wav":
        samples, rate = _decode_wav(blob)
        meta.update(
            channels=samples.shape[1], n_frames=samples.shape[0], sample_rate=rate
        )
    elif mime == "video/mp4":
        # header-only: dims/frames from the moov box tree, no decoder
        # (full frame decode stays ffmpeg-gated in decode_image)
        m = mp4_metadata(blob)
        meta.update(
            width=m["width"], height=m["height"], n_frames=m["n_frames"]
        )
    elif mime == "video/x-msvideo":
        # header-only: dims/frames from the avih chunk (frame decode is
        # native too — operators/avi.py — but metadata never pays it)
        from . import avi as _avi

        m = _avi.avi_metadata(blob)
        meta.update(
            width=m["width"], height=m["height"], n_frames=m["n_frames"]
        )
    else:
        _decode_compressed(blob, mime)
    return meta


# ------------------------------------------------------------------ decode


def decode_media(df: DataFrame, codec: str = "auto") -> DataFrame:
    """Attach the typed ``meta`` struct by decoding each blob.

    1 row → 1 row. ``codec='auto'`` sniffs the magic bytes and decodes
    natively (MMRW header-only; BMP/PPM/PGM/WAV real parse);
    ``codec='raw'`` forces the MMRW header path; compressed formats
    raise ``NotImplementedError`` naming the missing library.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "meta"]
        + [T.StructField("meta", MEDIA_META)]
    )
    cols = [f.name for f in out_schema.fields if f.name != "meta"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob in pdf["content"]:
                blob = bytes(blob)
                if codec == "raw":
                    w, h, c, fr = _decode_header(blob)
                    metas.append(
                        {
                            "mime": "application/x-mmrw",
                            "width": w,
                            "height": h,
                            "channels": c,
                            "n_frames": fr,
                            "n_bytes": len(blob),
                            "sample_rate": None,
                        }
                    )
                else:
                    metas.append(_blob_meta(blob))
            out = pdf[cols].copy()
            out["meta"] = metas
            yield out

    return df.mapInPandas(run, out_schema)


def resize_images(df: DataFrame, out_w: int, out_h: int, codec: str = "auto") -> DataFrame:
    """Nearest-neighbor resize of every frame; content is rewritten.

    1 row → 1 row. Input may be any supported image format (the decode
    canonicalizes); output is always an MMRW container with the new
    dims (w×h×c bytes per frame — byte-exact, tested). The resample is
    numpy integer-index gather per frame, vectorized over pixels.
    """
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_blobs = []
            for blob in pdf["content"]:
                frames = decode_image(bytes(blob))
                fr, h, w, c = frames.shape
                # same rounding as the classic loop: src = floor(dst*in/out)
                ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                resized = frames[:, ys[:, None], xs[None, :], :]
                out_blobs.append(
                    struct.pack(HEADER_FMT, MAGIC, out_w, out_h, c, fr)
                    + resized.tobytes()
                )
            out = pdf.copy()
            out["content"] = out_blobs
            if "meta" in out.columns:
                out["meta"] = [
                    {**(m or {}), "mime": "application/x-mmrw",
                     "width": out_w, "height": out_h, "n_bytes": len(b)}
                    for m, b in zip(out["meta"], out_blobs)
                ]
            yield out

    return df.mapInPandas(run, schema)


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("spectral_centroid", T.DoubleType()),
        T.StructField("duration_sec", T.DoubleType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """Real audio features from PCM WAV blobs (stdlib decode + numpy).

    1 row → 1 row, adds a struct: RMS level, zero-crossing rate,
    spectral centroid (rFFT magnitude-weighted mean frequency, Hz), and
    duration. Channels are mixed down by mean before analysis.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("audio", AUDIO_FEATURES)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["content"]:
                samples, rate = _decode_wav(bytes(blob))
                mono = samples.mean(axis=1)
                n = mono.size
                if n == 0:
                    feats.append(
                        {"rms": 0.0, "zcr": 0.0, "spectral_centroid": 0.0,
                         "duration_sec": 0.0}
                    )
                    continue
                rms = float(np.sqrt(np.mean(mono * mono)))
                zcr = (
                    float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    / max(n - 1, 1)
                )
                spec = np.abs(np.fft.rfft(mono))
                freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                power = float(spec.sum())
                centroid = float((freqs * spec).sum() / power) if power > 0 else 0.0
                feats.append(
                    {
                        "rms": rms,
                        "zcr": zcr,
                        "spectral_centroid": centroid,
                        "duration_sec": n / rate,
                    }
                )
            out = pdf.copy()
            out["audio"] = feats
            yield out

    return df.mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, every_n: int, codec: str = "raw") -> DataFrame:
    """Explode video containers into single-frame rows (every Nth frame).

    1 row → ceil(n_frames / every_n) rows: (media_id, frame_index,
    frame) — the shape a frame-level feature extractor consumes. Output
    frames are single-frame containers (headers preserved).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_index", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                arr = decode_image(bytes(blob))
                fr, h, w, c = arr.shape
                for f in range(0, fr, every_n):
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(
                        struct.pack(HEADER_FMT, MAGIC, w, h, c, 1)
                        + arr[f].tobytes()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return df.mapInPandas(run, out_schema)


def media_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature vector per blob (stands in for a model).

    1 row → 1 row, adds ``embedding array<float>``: unit-normalized
    floats derived from a blake2b digest of the content — stable, no
    model weights needed, and downstream ANN operators consume it
    unchanged (same array<float> contract as the embeddings table).
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("embedding", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for blob in pdf["content"]:
                dg = hashlib.blake2b(bytes(blob), digest_size=2 * dim).digest()
                vals = [
                    int.from_bytes(dg[2 * i : 2 * i + 2], "little") / 65535.0 - 0.5
                    for i in range(dim)
                ]
                nrm = math.sqrt(sum(v * v for v in vals)) or 1.0
                embs.append([v / nrm for v in vals])
            out = pdf.copy()
            out["embedding"] = embs
            yield out

    return df.mapInPandas(run, out_schema)


def synth_media_table(spark, n: int = 8, frames: int = 4) -> DataFrame:
    """Deterministic in-test media table (the container libs are absent,
    so tests synthesize blobs instead of reading real media files)."""
    rows = [
        (i, encode_raw(width=8 + i % 3, height=6 + i % 2, channels=3,
                       frames=1 + (i % frames), seed=i), None)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(4, "media_id")
