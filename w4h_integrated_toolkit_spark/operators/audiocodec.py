"""Pure-stdlib WAV/PCM audio codec: RIFF chunk walking, linear-PCM
decode (8/16/24/32-bit) and 8/16/24/32-bit PCM encode — no soundfile,
no librosa, no C extensions, just ``struct`` + numpy. The audio twin of
:mod:`.imagecodec`, built so the ``codec="wav"`` kernels in
:mod:`.multimodal` run END TO END in environments with no media
libraries at all (this sandbox), with exact integer sample values.

Implemented from the public RIFF/WAVE specification (the Microsoft/IBM
Multimedia Programming Interface spec): a ``RIFF`` container with
``WAVE`` form type; ``fmt `` chunk (format tag 1 = integer PCM,
channels, sample rate, block align, bits per sample); ``data`` chunk of
little-endian interleaved frames; chunks are word-aligned (odd-sized
chunk bodies are followed by one pad byte). Unknown chunks (``LIST``,
``fact``, ``cue ``, …) are skipped, as the spec requires of readers.

Sample semantics (per spec): 8-bit PCM is UNSIGNED with a 128 offset;
16/24/32-bit are signed little-endian two's complement. ``decode_wav``
normalizes all widths to signed int32 WITHOUT rescaling (a 16-bit
sample keeps its 16-bit magnitude; callers own any level scaling), so
every decoded value is bit-exact against the encoder input and a SQL
oracle can re-derive it with plain integer arithmetic.

Reference parity: the reference has no audio surface; this closes the
audio arm of the multimodal binary-column story (BASELINE.json
"multimodal columns") the same way imagecodec.py closed the image arm.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav", "wav_info"]


def _walk_chunks(data: bytes):
    """Yield (chunk_id, body_offset, body_size) for every top-level RIFF
    sub-chunk, honoring word alignment. Raises on a malformed header or
    a chunk that overruns the buffer."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)
    pos = 12
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > len(data):
            raise ValueError(
                f"chunk {cid!r} overruns the buffer "
                f"(needs {size} bytes at offset {body}, have {len(data)})"
            )
        yield cid, body, size
        pos = body + size + (size & 1)  # word alignment: odd body -> pad byte


def _parse_fmt(data: bytes, off: int, size: int) -> tuple[int, int, int, int]:
    """(channels, sample_rate, block_align, bits) from a fmt chunk;
    integer PCM only (format tag 1 — WAVE_FORMAT_PCM)."""
    if size < 16:
        raise ValueError(f"fmt chunk too short ({size} bytes, need 16)")
    tag, channels, rate, _byte_rate, block_align, bits = struct.unpack_from(
        "<HHIIHH", data, off
    )
    if tag != 1:
        raise ValueError(
            f"only integer PCM (format tag 1) is supported, got tag {tag} "
            "(float/extensible WAV needs a real audio library)"
        )
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM bit depth {bits}")
    if channels < 1:
        raise ValueError(f"invalid channel count {channels}")
    expect_align = channels * (bits // 8)
    if block_align != expect_align:
        raise ValueError(
            f"block align {block_align} != channels*bytes/sample {expect_align}"
        )
    return channels, rate, block_align, bits


def _decode_pcm(raw: bytes, channels: int, bits: int) -> np.ndarray:
    """(n_frames, channels) signed int32 from interleaved LE PCM bytes."""
    width = bits // 8
    if len(raw) % (width * channels):
        raise ValueError(
            f"data chunk size {len(raw)} is not a whole number of "
            f"{channels}-channel {bits}-bit frames"
        )
    if bits == 8:
        flat = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        flat = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif bits == 32:
        flat = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:  # 24-bit: widen each 3-byte sample to 4 bytes, then sign-fix
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        flat = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        flat = np.where(flat >= 1 << 23, flat - (1 << 24), flat)
    return flat.reshape(-1, channels)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV byte string → ``(samples, sample_rate)`` with
    ``samples`` a signed-int32 array of shape (n_frames, n_channels) in
    frame order (interleaving undone). Values are bit-exact: no
    rescaling, no float."""
    fmt = None
    body = None
    for cid, off, size in _walk_chunks(bytes(data)):
        if cid == b"fmt ":
            fmt = _parse_fmt(data, off, size)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            body = bytes(data[off : off + size])
            break  # spec: one data chunk; ignore any trailer
    if fmt is None or body is None:
        raise ValueError("missing fmt or data chunk")
    channels, rate, _align, bits = fmt
    return _decode_pcm(body, channels, bits), rate


def wav_info(data: bytes) -> dict:
    """Header-only probe: dict with sample_rate, n_channels, bits,
    n_frames — without touching the sample bytes (the metadata
    projection a catalog scan wants)."""
    fmt = None
    n_data = None
    for cid, off, size in _walk_chunks(bytes(data)):
        if cid == b"fmt ":
            fmt = _parse_fmt(data, off, size)
        elif cid == b"data":
            n_data = size
            break
    if fmt is None or n_data is None:
        raise ValueError("missing fmt or data chunk")
    channels, rate, align, bits = fmt
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "bits": bits,
        "n_frames": n_data // align,
    }


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode a (n_frames, n_channels) or (n_frames,) integer array as a
    PCM WAV byte string. Values must already fit the target width
    (raises on overflow rather than wrapping — a wrapped sample is a
    silent corruption)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got shape {arr.shape}")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported PCM bit depth {bits}")
    arr = arr.astype(np.int64)
    lo, hi = (-128, 127) if bits == 8 else (-(1 << bits - 1), (1 << bits - 1) - 1)
    if arr.size and (arr.min() < lo or arr.max() > hi):
        raise ValueError(
            f"sample values out of range for {bits}-bit PCM "
            f"[{lo}, {hi}]: min {arr.min()}, max {arr.max()}"
        )
    channels = arr.shape[1]
    width = bits // 8
    if bits == 8:
        raw = (arr + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = arr.astype("<i2").tobytes()
    elif bits == 32:
        raw = arr.astype("<i4").tobytes()
    else:  # 24-bit: emit the low three bytes of each little-endian int32
        le = arr.astype("<i4").view(np.uint8).reshape(-1, 4)
        raw = le[:, :3].tobytes()
    fmt_body = struct.pack(
        "<HHIIHH",
        1,
        channels,
        int(sample_rate),
        int(sample_rate) * channels * width,
        channels * width,
        bits,
    )
    data_pad = b"\x00" if len(raw) & 1 else b""
    riff_body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_body))
        + fmt_body
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
        + data_pad
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
