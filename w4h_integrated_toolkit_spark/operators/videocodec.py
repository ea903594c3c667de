"""Pure-stdlib YUV4MPEG2 (Y4M) video codec: header parsing, planar
frame walking, C420/C444/Cmono decode and encode — no av, no cv2, no C
extensions, just bytes + numpy. The video twin of :mod:`.imagecodec`
and :mod:`.audiocodec`, built so the video kernels in
:mod:`.multimodal` run END TO END in environments with no media
libraries at all (this sandbox), with exact integer pixel values.

Implemented from the public YUV4MPEG2 specification (the mjpegtools
``yuv4mpeg(5)`` man page): an ASCII stream header
``YUV4MPEG2 W<width> H<height> F<num>:<den> [I<interlacing>]
[A<num>:<den>] [C<colorspace>]\\n`` with space-separated tagged
parameters in any order, followed by frames, each a ``FRAME`` line
(optionally with its own tagged parameters) terminated by ``\\n`` and
then the raw planar pixel data: the full-resolution Y (luma) plane,
then the Cb and Cr (chroma) planes at the colorspace's subsampling.
Supported colorspaces: ``C420``-family (chroma at (w/2, h/2) — the
siting variants 420jpeg/420mpeg2/420paldv carry identical payload
layout), ``C444`` (full-resolution chroma), and ``Cmono`` (luma only).
Unknown header tags (``X...`` extensions) are skipped, as the spec
requires of readers.

Pixel semantics: every plane is unsigned 8-bit; ``decode_y4m`` returns
exact uint8 arrays with no range conversion (no 16–235 studio-swing
rescale; callers own any level math), so every decoded value is
bit-exact against the encoder input and a SQL oracle can re-derive it
with plain integer arithmetic.

Reference parity: the reference has no video surface; this closes the
video arm of the multimodal binary-column story (BASELINE.json
"multimodal columns") the same way imagecodec.py closed the image arm
and audiocodec.py the audio arm.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_y4m", "encode_y4m", "y4m_info"]

_MAGIC = b"YUV4MPEG2"

# colorspace tag -> (chroma width divisor, chroma height divisor);
# None = no chroma planes. The 420 siting variants differ only in how a
# *display* should position chroma samples, not in payload layout.
_COLORSPACES = {
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "444": (1, 1),
    "mono": None,
}


def _parse_header(data: bytes) -> tuple[dict, int]:
    """Parse the stream header line; return (params, offset just past
    the terminating newline). Raises on a malformed or truncated
    header."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n", 0, 512)
    if nl < 0:
        raise ValueError("unterminated YUV4MPEG2 stream header")
    params: dict = {"colorspace": "420jpeg", "fps": (25, 1)}
    for tok in data[len(_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, body = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            params["width"] = int(body)
        elif tag == "H":
            params["height"] = int(body)
        elif tag == "F":
            num, den = body.split(":")
            params["fps"] = (int(num), int(den))
        elif tag == "C":
            if body not in _COLORSPACES:
                raise ValueError(f"unsupported Y4M colorspace C{body}")
            params["colorspace"] = body
        elif tag in ("I", "A", "X"):
            pass  # interlacing / aspect / extensions: legal, ignored
        else:
            raise ValueError(f"unknown Y4M header tag {tag!r}")
    if "width" not in params or "height" not in params:
        raise ValueError("Y4M header missing W or H")
    if params["width"] <= 0 or params["height"] <= 0:
        raise ValueError("Y4M frame dimensions must be positive")
    sub = _COLORSPACES[params["colorspace"]]
    if sub is not None and (
        params["width"] % sub[0] or params["height"] % sub[1]
    ):
        raise ValueError(
            f"C{params['colorspace']} needs dimensions divisible by "
            f"{sub[0]}x{sub[1]}, got {params['width']}x{params['height']}"
        )
    return params, nl + 1


def y4m_info(data: bytes) -> dict:
    """Stream metadata without decoding pixels: width, height, fps,
    colorspace, n_frames (counted by walking frame headers)."""
    params, pos = _parse_header(data)
    w, h = params["width"], params["height"]
    sub = _COLORSPACES[params["colorspace"]]
    frame_bytes = w * h
    if sub is not None:
        frame_bytes += 2 * (w // sub[0]) * (h // sub[1])
    n = 0
    while pos < len(data):
        nl = data.find(b"\n", pos)
        if nl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"malformed FRAME header at offset {pos}")
        body = nl + 1
        if body + frame_bytes > len(data):
            raise ValueError(
                f"frame {n} truncated: needs {frame_bytes} bytes at "
                f"offset {body}, have {len(data) - body}"
            )
        pos = body + frame_bytes
        n += 1
    return {
        "width": w,
        "height": h,
        "fps": params["fps"],
        "colorspace": params["colorspace"],
        "n_frames": n,
    }


def decode_y4m(data: bytes):
    """Decode a Y4M stream to exact uint8 planes.

    Returns ``(y, cb, cr, info)`` where ``y`` is ``(n, h, w)`` uint8;
    ``cb``/``cr`` are ``(n, ch, cw)`` uint8 at the colorspace's chroma
    resolution, or ``None`` for mono; ``info`` is :func:`y4m_info`'s
    dict. No range conversion is applied."""
    params, pos = _parse_header(data)
    w, h = params["width"], params["height"]
    sub = _COLORSPACES[params["colorspace"]]
    cw, ch = (w // sub[0], h // sub[1]) if sub is not None else (0, 0)
    y_sz, c_sz = w * h, cw * ch
    ys, cbs, crs = [], [], []
    n = 0
    while pos < len(data):
        nl = data.find(b"\n", pos)
        if nl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"malformed FRAME header at offset {pos}")
        body = nl + 1
        need = y_sz + 2 * c_sz
        if body + need > len(data):
            raise ValueError(
                f"frame {n} truncated: needs {need} bytes at offset "
                f"{body}, have {len(data) - body}"
            )
        ys.append(
            np.frombuffer(data, np.uint8, y_sz, body).reshape(h, w)
        )
        if c_sz:
            cbs.append(
                np.frombuffer(data, np.uint8, c_sz, body + y_sz).reshape(
                    ch, cw
                )
            )
            crs.append(
                np.frombuffer(
                    data, np.uint8, c_sz, body + y_sz + c_sz
                ).reshape(ch, cw)
            )
        pos = body + need
        n += 1
    y = np.stack(ys) if ys else np.empty((0, h, w), np.uint8)
    cb = cr = None
    if sub is not None:
        cb = np.stack(cbs) if cbs else np.empty((0, ch, cw), np.uint8)
        cr = np.stack(crs) if crs else np.empty((0, ch, cw), np.uint8)
    info = {
        "width": w,
        "height": h,
        "fps": params["fps"],
        "colorspace": params["colorspace"],
        "n_frames": n,
    }
    return y, cb, cr, info


def encode_y4m(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    fps: tuple[int, int] = (25, 1),
    colorspace: str | None = None,
) -> bytes:
    """Encode uint8 planes to a Y4M stream.

    ``y`` is ``(n, h, w)``; ``cb``/``cr`` both given means chroma (C420
    when their shape is ``(n, h//2, w//2)``, C444 when ``(n, h, w)``),
    both ``None`` means Cmono. ``colorspace`` overrides the inference
    (to pick a 420 siting variant). Round-trips bit-exactly through
    :func:`decode_y4m`."""
    y = np.ascontiguousarray(y, dtype=np.uint8)
    if y.ndim != 3:
        raise ValueError(f"y must be (n_frames, h, w), got shape {y.shape}")
    n, h, w = y.shape
    if (cb is None) != (cr is None):
        raise ValueError("cb and cr must be given together")
    if cb is None:
        cs = colorspace or "mono"
        if cs not in _COLORSPACES:
            raise ValueError(f"unsupported Y4M colorspace C{cs}")
        if _COLORSPACES[cs] is not None:
            raise ValueError(f"colorspace C{cs} requires chroma planes")
        planes = [y]
    else:
        cb = np.ascontiguousarray(cb, dtype=np.uint8)
        cr = np.ascontiguousarray(cr, dtype=np.uint8)
        if cb.shape != cr.shape:
            raise ValueError("cb and cr shapes differ")
        if cb.shape == (n, h // 2, w // 2) and h % 2 == 0 and w % 2 == 0:
            cs = colorspace or "420jpeg"
        elif cb.shape == (n, h, w):
            cs = colorspace or "444"
        else:
            raise ValueError(
                f"chroma shape {cb.shape} matches neither C420 "
                f"({(n, h // 2, w // 2)}) nor C444 ({(n, h, w)})"
            )
        sub = _COLORSPACES.get(cs)
        if sub is None or cb.shape != (n, h // sub[1], w // sub[0]):
            raise ValueError(f"colorspace C{cs} disagrees with chroma shape")
        planes = [y, cb, cr]
    head = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cs}\n".encode()
    )
    parts = [head]
    for f in range(n):
        parts.append(b"FRAME\n")
        for p in planes:
            parts.append(p[f].tobytes())
    return b"".join(parts)
