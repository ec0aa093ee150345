"""Pure numpy+zlib image codecs: real PNG, raw, and a deterministic lossy
quantizer.

The container has no PIL/imageio, so the engine carries its own vectorized
codecs.  PNG here is the real file format (signature + IHDR/IDAT/IEND, zlib
DEFLATE, scanline filters) — files round-trip bit-exactly and are readable by
any external PNG reader.  Decoding supports filter types 0-4; encoding uses
per-row filter 0 (None) for determinism and speed.

`q6` is the deliberately lossy format (6 bits/channel uniform quantization):
quantization step 4 -> max error 2 -> PSNR >= 42.1 dB guaranteed, which is
what makes the north rule's "PSNR>=40dB for lossy formats" invariant a real
test rather than a vacuous one.

Role model: the reference's raster tile payload serialization
(`extensions/adapters/raster/.../util/SampleModelPersistenceUtils.java` and
`RasterDataAdapter.java:139` in /root/reference) — Java2D SampleModel/
DataBuffer there, numpy arrays + self-describing bytes here.

All pixel math is whole-array numpy (per-row Python ban applies inside UDF
bodies too — BASELINE.json input_hint).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color types we support (8-bit depth only)
_CHANNELS_TO_COLORTYPE = {1: 0, 3: 2, 4: 6}
_COLORTYPE_TO_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """uint8 array (h, w) | (h, w, {1,3,4}) -> PNG file bytes (filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _CHANNELS_TO_COLORTYPE:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_TO_COLORTYPE[ch], 0, 0, 0)
    # prepend filter byte 0 to every scanline — one hstack, no per-row loop
    raw = np.hstack(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * ch)]
    ).tobytes()
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4). Sequential in rows (PNG's
    data dependency), vectorized within each row where possible."""
    rows = data.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    if not ftypes.any():  # common fast path: all filter 0
        return rows[:, 1:].copy()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = rows[y, 1:].astype(np.int32)
        ft = int(ftypes[y])
        if ft == 0:
            line = cur
        elif ft == 1:  # Sub: sequential in x — cumulative per bpp lane
            line = cur.copy()
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ft == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = line.astype(np.uint8)
        prev = line
    return out


def png_decode(buf: bytes) -> np.ndarray:
    """PNG file bytes -> uint8 array (h, w, ch)."""
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = []
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or comp != 0 or filt != 0 or ilace != 0:
                raise ValueError("unsupported PNG variant")
            ch = _COLORTYPE_TO_CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    data = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch
    return _unfilter(data, h, stride, ch).reshape(h, w, ch)


# ---------------------------------------------------------------------------
# raw + lossy codecs (self-describing 12-byte header: magic, w, h, ch)

_RAW_MAGIC = b"GWR1"
_Q6_MAGIC = b"GWQ6"


def raw_encode(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    return _RAW_MAGIC + struct.pack(">IHH", w, h, ch)[:8] + img.tobytes()


def q6_encode(img: np.ndarray) -> bytes:
    """Lossy: quantize to 6 bits/channel (step 4, reconstruct at bin center).

    Max per-pixel error 2 -> PSNR >= 20*log10(255) - 10*log10(4) = 42.1 dB
    guaranteed for ANY content, keeping the >=40 dB invariant non-vacuous
    but always satisfiable."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    q = (img >> 2).astype(np.uint8)  # 0..63
    return _Q6_MAGIC + struct.pack(">IHH", w, h, ch)[:8] + zlib.compress(q.tobytes(), 6)


def _parse_header(buf: bytes) -> tuple[int, int, int]:
    w, h, ch = struct.unpack(">IHH", buf[4:12])
    return w, h, ch


def decode(buf: bytes, fmt: str) -> np.ndarray:
    """Decode by declared format tag -> uint8 (h, w, ch)."""
    if fmt == "png":
        return png_decode(bytes(buf))
    buf = bytes(buf)
    w, h, ch = _parse_header(buf)
    if fmt == "raw":
        return np.frombuffer(buf, dtype=np.uint8, offset=12).reshape(h, w, ch)
    if fmt == "q6":
        q = np.frombuffer(zlib.decompress(buf[12:]), dtype=np.uint8).reshape(h, w, ch)
        return ((q.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)
    raise ValueError(f"unknown fmt {fmt!r}")


def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "raw":
        return raw_encode(img)
    if fmt == "q6":
        return q6_encode(img)
    raise ValueError(f"unknown fmt {fmt!r}")


LOSSY_FMTS = frozenset({"q6"})


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images).

    The north rule's per-row invariant: decoded pixels allclose, PSNR>=40dB
    for lossy formats (reference analog: <1% pixel mismatch in
    `test/.../mapreduce/CustomCRSKDERasterResizeIT.java:443-452`).
    """
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
