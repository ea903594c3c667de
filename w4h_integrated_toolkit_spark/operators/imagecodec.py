"""Pure-stdlib image codec: binary PPM (P6) / PGM (P5) and non-interlaced
8-bit PNG decode, PNG / PPM encode — no Pillow, no C extensions, just
``zlib`` + ``struct`` + numpy.

The module exposes the slice of PIL's surface the ``codec="real"``
kernels in :mod:`.multimodal` consume — ``open(fp)`` returning an object
with ``.size``, ``.resize()``, ``.convert("L")``, ``.save(fp, format=)``
and ``__array__`` — so those kernels (``_real_resize_rows`` /
``_real_decode_rows``) run END TO END in environments without Pillow
(``codec="ppm"``). Where Pillow exists, ``codec="real"`` keeps using it:
this codec handles netpbm + PNG only and documents its choices (nearest-
neighbor resize, ITU-R 601-2 integer luma — PIL's "L" coefficients)
rather than claiming pixel parity with PIL resampling.

All formats implemented from their public specifications (netpbm formats;
PNG per RFC 2083 / the W3C PNG spec: IHDR/IDAT/IEND chunks, per-row
filter types 0-4).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

__all__ = ["PureImage", "open", "encode_ppm", "encode_png", "decode_png"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class PureImage:
    """Minimal image object over a uint8 array — (H, W) grayscale or
    (H, W, 3) RGB — mirroring the PIL methods the multimodal kernels
    call."""

    def __init__(self, arr: np.ndarray):
        arr = np.asarray(arr, dtype=np.uint8)
        if arr.ndim not in (2, 3) or (arr.ndim == 3 and arr.shape[2] != 3):
            raise ValueError(
                f"PureImage expects (H, W) or (H, W, 3) uint8, got {arr.shape}"
            )
        self._arr = arr

    @property
    def size(self) -> tuple[int, int]:
        h, w = self._arr.shape[:2]
        return (w, h)

    @property
    def mode(self) -> str:
        return "L" if self._arr.ndim == 2 else "RGB"

    def resize(self, size: tuple[int, int]) -> "PureImage":
        """Nearest-neighbor resample to (width, height) — index math
        only, deterministic on every platform."""
        w, h = int(size[0]), int(size[1])
        if w < 1 or h < 1:
            raise ValueError(f"resize target must be >= 1x1, got {size}")
        src_h, src_w = self._arr.shape[:2]
        rows = (np.arange(h) * src_h) // h
        cols = (np.arange(w) * src_w) // w
        return PureImage(self._arr[rows][:, cols])

    def convert(self, mode: str) -> "PureImage":
        if mode == self.mode:
            return self
        if mode == "L":
            a = self._arr.astype(np.uint32)
            # ITU-R 601-2 integer luma — the same coefficients PIL's "L"
            # documents (L = R*299/1000 + G*587/1000 + B*114/1000)
            luma = (a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114) // 1000
            return PureImage(luma.astype(np.uint8))
        if mode == "RGB":
            return PureImage(np.repeat(self._arr[..., None], 3, axis=2))
        raise ValueError(f"unsupported convert mode {mode!r}; use 'L' or 'RGB'")

    def __array__(self, dtype=None, copy=None):
        arr = self._arr
        return arr.astype(dtype) if dtype is not None else arr

    def save(self, fp, format: str = "PNG") -> None:
        fmt = format.upper()
        if fmt == "PNG":
            fp.write(encode_png(self._arr))
        elif fmt in ("PPM", "PGM"):
            fp.write(encode_ppm(self._arr))
        else:
            raise ValueError(
                f"pure codec cannot encode {format!r}; use PNG or PPM "
                "(install pillow for other formats)"
            )


def _read_token(data: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited netpbm header token, skipping '#'
    comments (which run to end of line)."""
    n = len(data)
    while pos < n:
        c = data[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            while pos < n and data[pos : pos + 1] not in b"\r\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and data[pos : pos + 1] not in b" \t\r\n":
        pos += 1
    if start == pos:
        raise ValueError("truncated netpbm header")
    return data[start:pos], pos


def _decode_netpbm(data: bytes) -> np.ndarray:
    magic = data[:2]
    channels = 3 if magic == b"P6" else 1
    pos = 2
    w_tok, pos = _read_token(data, pos)
    h_tok, pos = _read_token(data, pos)
    max_tok, pos = _read_token(data, pos)
    w, h, maxval = int(w_tok), int(h_tok), int(max_tok)
    if maxval != 255:
        raise ValueError(
            f"pure codec reads 8-bit netpbm only (maxval 255), got {maxval}"
        )
    # Exactly ONE whitespace byte separates header and raster (netpbm
    # spec). Verify it exists and IS whitespace — a CRLF-writing encoder
    # ('255\r\n') would otherwise shift every pixel by one byte,
    # detectable only when the payload length happens to mismatch. (A
    # non-whitespace byte here can only mean truncation: the greedy
    # tokenizer merges any other byte into the maxval token itself.)
    sep = data[pos : pos + 1]
    if len(sep) != 1 or sep not in b" \t\r\n":
        raise ValueError(
            f"netpbm header/raster separator is {sep!r}, not whitespace"
        )
    pos += 1
    need = w * h * channels
    if sep == b"\r" and data[pos : pos + 1] == b"\n":
        # CRLF tolerance: the LF after a '\r' separator is ASSUMED to be
        # encoder padding (whether or not trailing bytes follow the
        # raster), EXCEPT when the payload is exactly raster-sized
        # without it — then it must be the first pixel of a spec-valid
        # CR-separated image and consuming it would shift every pixel.
        # The one genuinely ambiguous layout (CR separator + 0x0A first
        # pixel + trailing bytes) resolves in favor of CRLF padding.
        if len(data) - pos != need:
            pos += 1
    raster = data[pos : pos + need]
    if len(raster) != need:
        raise ValueError(
            f"netpbm raster truncated: need {need} bytes, have {len(raster)}"
        )
    arr = np.frombuffer(raster, dtype=np.uint8)
    shape = (h, w, 3) if channels == 3 else (h, w)
    return arr.reshape(shape)


def _unfilter_png(raw: bytes, w: int, h: int, nch: int) -> np.ndarray:
    """Reverse the per-row PNG filters (types 0-4) over the inflated
    IDAT stream — byte-exact per the spec's Sub/Up/Average/Paeth
    definitions."""
    stride = w * nch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(raw[pos : pos + stride], dtype=np.uint8).astype(
            np.int32
        )
        pos += stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(nch, stride):
                cur[i] = (cur[i] + cur[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - nch] if i >= nch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit grayscale (color type 0) or RGB
    (color type 2) PNG to a uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    nch = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype not in (0, 2) or interlace != 0:
                raise ValueError(
                    "pure codec reads non-interlaced 8-bit gray/RGB PNG only "
                    f"(depth={depth}, color_type={ctype}, interlace={interlace})"
                )
            nch = 1 if ctype == 0 else 3
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    flat = _unfilter_png(zlib.decompress(idat), w, h, nch)
    return flat.reshape((h, w)) if nch == 1 else flat.reshape((h, w, 3))


def open(fp) -> PureImage:  # noqa: A001 - mirrors PIL.Image.open
    """Decode a binary PPM (P6), PGM (P5), or supported PNG from a
    file-like object (what ``_real_*_rows`` pass) or bytes."""
    data = fp if isinstance(fp, (bytes, bytearray)) else fp.read()
    magic = bytes(data[:2])
    if magic in (b"P6", b"P5"):
        return PureImage(_decode_netpbm(bytes(data)))
    if bytes(data[:8]) == _PNG_SIG:
        return PureImage(decode_png(bytes(data)))
    raise ValueError(
        "pure codec reads binary PPM (P6), PGM (P5) and 8-bit PNG only; "
        f"payload starts with {bytes(data[:8])!r} — install pillow for "
        "other formats"
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode uint8 (H, W) as P5 or (H, W, 3) as P6."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    magic = b"P6" if arr.ndim == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode uint8 (H, W) gray or (H, W, 3) RGB as a filter-0
    non-interlaced PNG."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    ctype = 2 if arr.ndim == 3 else 0
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
