"""Pure-stdlib PNG codec: zlib inflate/deflate + spec (un)filtering.

The container ships no image libraries, but PNG needs none beyond zlib
(RFC 2083 / ISO 15948): chunk framing with CRC32, one DEFLATE stream of
filtered scanlines, five per-scanline filter types. This module implements
a REAL decoder for the common 8-bit cases — grayscale (color type 0),
truecolor (2), indexed (3), gray+alpha (4), RGBA (6), filters 0-4, single
or split IDAT — so the engine's multimodal pipeline decodes actual PNG
payloads end-to-end instead of the sha256 stand-in (which remains for
formats that genuinely need external codecs, e.g. JPEG's DCT).

Vectorization: unfiltering is NumPy per scanline. None/Up are whole-row
ops; Sub is an exact per-channel prefix sum (cumsum mod 256); Average and
Paeth have a true left-pixel data dependency, so they walk bytes within
the row (still one Python loop per *scanline pixel*, amortized across the
Arrow batch that calls this). A production cluster deployment would swap
in a JVM/C codec behind the same `decode_image` seam; the parsing,
unfiltering, and pipeline plumbing proven here are format-exact.

The encoder exists so tests (and the synthetic media generator) can
produce known-pixel payloads that round-trip byte-exactly through every
filter type — no external golden files needed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filter_type: int = 0,
               level: int = 6) -> bytes:
    """Encode a uint8 array as PNG: (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB, or (h, w, 4) RGBA. Every scanline uses ``filter_type``
    (0=None 1=Sub 2=Up 3=Average 4=Paeth) — uniform by design so tests can
    target each unfilter branch."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w, ch = img.shape[0], img.shape[1], 1
        color = 0
        flat = img
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        h, w, ch = img.shape
        color = {2: 4, 3: 2, 4: 6}[ch]
        flat = img.reshape(h, w * ch)
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")

    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = flat[y].astype(np.int32)
        if filter_type == 0:
            filt = line
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            filt = (line - left) & 0xFF
        elif filter_type == 2:  # Up
            filt = (line - prev) & 0xFF
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            filt = (line - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = (line - pred) & 0xFF
        raw.append(filter_type)
        raw += filt.astype(np.uint8).tobytes()
        prev = line

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to uint8 (h, w) for grayscale or
    (h, w, channels) otherwise; indexed-color is resolved through PLTE to
    (h, w, 3). Raises ValueError on framing/CRC/length corruption and
    NotImplementedError on 1/2/4/16-bit depth or Adam7 interlace."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    seen_iend = False
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        if pos + 12 + length > len(data):
            # covers both a short body and a body that fits exactly but
            # whose 4-byte CRC trailer is cut off — ValueError either way,
            # per the docstring contract (not struct.error)
            raise ValueError("truncated PNG chunk")
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype.decode('latin1')} "
                             "CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, gAMA, ...) are skipped
    if not seen_iend:
        # also catches a stream cut inside a trailing chunk's 12-byte
        # frame, which the loop guard would otherwise skip silently
        raise ValueError("truncated PNG (missing IEND)")
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
    if interlace:
        raise NotImplementedError("Adam7 interlace not supported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    if color not in _CHANNELS:
        raise ValueError(f"invalid color type {color}")
    if color == 3 and palette is None:
        raise ValueError("indexed PNG missing PLTE")

    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"IDAT decodes to {len(raw)} bytes, expected {(stride + 1) * h}")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    recon = np.zeros((h, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = int(arr[y, 0])
        line = arr[y, 1:]
        prev = recon[y - 1] if y else zero_row
        if ft == 0:
            recon[y] = line
        elif ft == 1:  # Sub: exact per-channel prefix sum mod 256
            recon[y] = (line.reshape(w, ch).astype(np.uint64)
                        .cumsum(axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif ft == 2:  # Up: whole-row vector add (uint8 wraps mod 256)
            recon[y] = line + prev
        elif ft == 3:  # Average: left-dependency -> walk the row
            out = recon[y]
            li = line.astype(np.int32)
            pi = prev.astype(np.int32)
            for x in range(stride):
                left = int(out[x - ch]) if x >= ch else 0
                out[x] = (li[x] + ((left + pi[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth: left-dependency -> walk the row
            out = recon[y]
            li = line.astype(np.int32)
            pi = prev.astype(np.int32)
            for x in range(stride):
                a = int(out[x - ch]) if x >= ch else 0
                b = int(pi[x])
                c = int(pi[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                out[x] = (li[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid scanline filter {ft}")
    if color == 3:
        return palette[recon.reshape(h, w)]
    if ch == 1:
        return recon.reshape(h, w)
    return recon.reshape(h, w, ch)


def luma(img: np.ndarray) -> np.ndarray:
    """Deterministic integer Rec.601 luma for multichannel images; identity
    for grayscale. (h, w[, c]) uint8 -> (h, w) uint8. Alpha is ignored;
    gray+alpha takes the gray channel."""
    if img.ndim == 2:
        return img
    if img.shape[2] == 2:  # gray + alpha
        return img[..., 0]
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
