"""GIF codec in stdlib+numpy (#30 family): LZW decode, palette, frames.

Public format (GIF87a/89a specification, CompuServe 1987/1989; LZW per
Welch 1984). Scope mirrors the other native codecs: the common profile
decodes bit-exactly in-sandbox, the rare one gates honestly —

- decode: global/local color tables, variable-width LZW, multiple
  frames composited with the do-not-dispose rule at their (left, top)
  offsets, GCE transparency honored during compositing; INTERLACED
  images raise NotImplementedError (rare in the wild, PIL-gated
  upstream like progressive JPEG);
- encode (for round-trip tests): ≤256-color palette, real LZW with
  table resets at 4096, one full-canvas image block per frame.

LZW is inherently sequential per image — this stays a per-blob Python
path inside the Arrow-batched decode UDFs, like the JPEG huffman loop.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------- LZW core

def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            else:  # the KwKwK case
                entry = prev + [prev[0]]
                table.append(entry)
            out.extend(entry)
            prev = list(entry)
            if len(table) >= (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return {(i,): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    width = min_code_size + 1
    outbits: list[tuple[int, int]] = [(clear, width)]
    seq: tuple[int, ...] = ()
    for idx in indices:
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        outbits.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            outbits.append((clear, width))
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
        seq = (idx,)
    if seq:
        outbits.append((table[seq], width))
    outbits.append((end, width))
    acc = nbits = 0
    out = bytearray()
    for code, w in outbits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------- encode

def encode_gif(frames: "np.ndarray") -> bytes:
    """(h, w, 3) or (frames, h, w, 3) uint8 RGB → GIF89a bytes.

    All frames share one ≤256-color global palette (raises past 256 —
    this encoder exists for round-trip tests, not production quantizing).
    """
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        a = a[None]
    fr, h, w, c = a.shape
    if c != 3:
        raise ValueError("encode_gif takes RGB")
    colors, inverse = np.unique(a.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors > 256 — quantize first")
    gct_bits = max(1, int(len(colors) - 1).bit_length())
    n_entries = 1 << gct_bits
    palette = np.zeros((n_entries, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    out += palette.tobytes()
    idx_frames = inverse.reshape(fr, h, w)
    min_code = max(2, gct_bits)
    for f in range(fr):
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code)
        data = _lzw_encode(min_code, idx_frames[f].ravel().tolist())
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# --------------------------------------------------------------- decode

def decode_gif(blob: bytes) -> "np.ndarray":
    """GIF bytes → (frames, h, w, 3) uint8 RGB.

    Frames composite in order with the do-not-dispose rule (each starts
    from the previous frame's pixels); GCE-transparent indices leave the
    underlying pixel unchanged. Interlace raises NotImplementedError.
    """
    if blob[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[_bg if _bg < len(gct) else 0]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = blob[pos]
                flags = blob[pos + 1]
                tindex = blob[pos + 4]
                transparent = tindex if (flags & 1) else None
                pos += 1 + size
                if blob[pos] != 0:
                    raise ValueError("bad GCE terminator")
                pos += 1
            else:  # skip sub-blocks
                while True:
                    size = blob[pos]
                    pos += 1
                    if size == 0:
                        break
                    pos += size
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF")
        table = gct
        if ipacked & 0x80:
            n = 1 << ((ipacked & 0x07) + 1)
            table = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code = blob[pos]
        pos += 1
        data = bytearray()
        while True:
            size = blob[pos]
            pos += 1
            if size == 0:
                break
            data += blob[pos : pos + size]
            pos += size
        idx = np.array(_lzw_decode(min_code, bytes(data)), dtype=np.int32)
        if idx.size != iw * ih:
            raise ValueError(f"GIF LZW produced {idx.size} pixels, want {iw * ih}")
        idx = idx.reshape(ih, iw)
        patch = canvas[top : top + ih, left : left + iw]
        if transparent is not None:
            opaque = idx != transparent
            patch[opaque] = table[idx[opaque]]
        else:
            patch[:] = table[idx]
        frames.append(canvas.copy())
        transparent = None  # GCE applies to one image only
    if not frames:
        raise ValueError("GIF with no image data")
    return np.stack(frames)
