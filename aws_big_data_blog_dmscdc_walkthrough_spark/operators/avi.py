"""MJPEG-in-AVI: the one real in-repo video decode path.

MP4 frame decode needs a real codec (H.264 etc.) and stays
ffmpeg-gated; Motion-JPEG in an AVI container is the archival format
whose frames ARE JPEGs, so the existing native JPEG decoder
(operators/jpeg.py, baseline + progressive) extends to full video
decode with nothing but a RIFF container walk — encoder, header
metadata, and frame decode all stdlib+numpy.

Container layout (public Microsoft RIFF/AVI spec, 'AVI RIFF File
Reference'):

    RIFF('AVI '
      LIST('hdrl'
        avih(<MainAVIHeader: 14 u32>)
        LIST('strl' strh(<AVIStreamHeader>) strf(<BITMAPINFOHEADER>)))
      LIST('movi' {'00dc'(<jpeg bytes>)}*)
      idx1(<16-byte entries>))

Chunks are word-aligned (odd sizes pad one byte). The stream handler is
'MJPG' (fccType 'vids'); each '00dc' payload is a complete JFIF image.
"""

from __future__ import annotations

import struct

import numpy as np

AVIF_HASINDEX = 0x10
AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(subtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", subtype + payload)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap pre-encoded JPEG frames into a spec-shaped MJPEG AVI."""
    if not jpeg_frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    n = len(jpeg_frames)
    uspf = 1_000_000 // fps
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I",
        uspf,                 # dwMicroSecPerFrame
        max_bytes * fps,      # dwMaxBytesPerSec
        0,                    # dwPaddingGranularity
        AVIF_HASINDEX,        # dwFlags
        n,                    # dwTotalFrames
        0,                    # dwInitialFrames
        1,                    # dwStreams
        max_bytes,            # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,           # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,          # dwFlags
            0, 0,       # wPriority, wLanguage
            0,          # dwInitialFrames
            1,          # dwScale
            fps,        # dwRate (fps = rate/scale)
            0,          # dwStart
            n,          # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            0,          # dwQuality
            0,          # dwSampleSize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b""
    idx_entries = []
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_payload), len(f)))
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, off, sz)
            for off, sz in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(blob: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for sibling chunks."""
    pos = start
    while pos + 8 <= end:
        fourcc = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = pos + 8
        yield fourcc, body, min(body + size, end)
        pos = body + size + (size % 2)


def _find_list(blob: bytes, start: int, end: int, subtype: bytes):
    for fourcc, b0, b1 in _walk(blob, start, end):
        if fourcc == b"LIST" and blob[b0:b0 + 4] == subtype:
            return b0 + 4, b1
    return None


def avi_metadata(blob: bytes) -> dict:
    """Header-only AVI metadata from the avih chunk (no frame decode)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF container")
    hdrl = _find_list(blob, 12, len(blob), b"hdrl")
    if hdrl is None:
        raise ValueError("AVI missing hdrl list")
    for fourcc, b0, b1 in _walk(blob, *hdrl):
        if fourcc == b"avih" and b1 - b0 >= 56:
            v = struct.unpack_from("<14I", blob, b0)
            uspf, n, w, h = v[0], v[4], v[8], v[9]
            return {
                "width": w,
                "height": h,
                "n_frames": n,
                "fps": (1_000_000.0 / uspf) if uspf else 0.0,
                "duration_s": (n * uspf) / 1_000_000.0,
            }
    raise ValueError("AVI missing avih header")


def decode_avi(blob: bytes) -> "np.ndarray":
    """MJPEG AVI → (frames, h, w, 3) uint8 via the native JPEG decoder.

    Walks the movi list's '##dc'/'##db' chunks (stream-data fourccs) in
    file order — no idx1 needed — and decodes each payload with
    operators/jpeg.py. Non-MJPEG payloads raise NotImplementedError
    from the JPEG sniff, mirroring the module's honest format gates.
    """
    from . import jpeg as _jpeg

    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF container")
    movi = _find_list(blob, 12, len(blob), b"movi")
    if movi is None:
        raise ValueError("AVI missing movi list")
    frames = []
    for fourcc, b0, b1 in _walk(blob, *movi):
        if fourcc[2:4] in (b"dc", b"db"):
            payload = blob[b0:b1]
            if payload[:3] != b"\xff\xd8\xff":
                raise NotImplementedError(
                    "AVI stream chunk is not JPEG — only MJPEG AVIs "
                    "decode natively (other vids codecs need ffmpeg)"
                )
            frames.append(_jpeg.decode_jpeg(payload))
    if not frames:
        raise ValueError("AVI movi list has no video chunks")
    return np.stack(frames, axis=0)
