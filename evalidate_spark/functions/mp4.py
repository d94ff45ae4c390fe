"""Zero-dependency ISO-BMFF (MP4) container handling: a header-only
*probe* plus a minimal deterministic *encoder* for synthetic fixtures.

MP4 is the dominant real-world video container, but its codecs (H.264 /
H.265 / VP9 / AV1) cannot reasonably be decoded without external
libraries — so, mirroring :func:`evalidate_spark.functions.avi.probe_avi`,
this module implements the CHEAP metadata path over a 100 TB media
column: walk the ``moov`` box tree (a few KB at the front or back of the
file), extract dimensions / duration / codec fourcc / track layout, and
never touch a frame.  ``decoded`` stays false downstream — the probe is
a metadata promise, not a frame-decodability promise.

Box grammar implemented from the public ISO/IEC 14496-12 layout:
``size(u32) fourcc(4)`` headers, ``size==1`` → 64-bit largesize,
``size==0`` → box extends to end of file; ``moov/mvhd`` movie timescale
+ duration (version 0 and 1); ``trak/mdia/{mdhd,hdlr,minf/stbl/stsd}``
per-track timescale, handler type, and the first sample-entry fourcc;
VisualSampleEntry width/height at fixed offsets.  Reference parity:
the reference engine validates media refs as opaque values
(`/root/reference/src/evv.erl` type checks); container probing is part
of this repo's multimodal extension surface, not a port.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

__all__ = ["is_mp4", "probe_mp4", "encode_mp4", "Mp4Info"]

#: container boxes whose payload is itself a sequence of boxes
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def is_mp4(data: bytes) -> bool:
    """ISO-BMFF sniff: a top-level ``ftyp`` box in the first 8 bytes."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _walk(data: bytes, start: int, end: int) -> Iterator[Tuple[bytes, int, int]]:
    """Yield ``(fourcc, payload_start, payload_end)`` for each box in
    ``data[start:end]``; malformed sizes raise ``ValueError`` rather than
    looping or over-reading."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", data, body)[0]
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            raise ValueError("MP4 box overruns its parent")
        yield fourcc, body, box_end
        if box_end == pos:  # defensive: size-0 header at pos==end-8
            break
        pos = box_end


class Mp4Info:
    """Header-only parse result — dims, duration, codec, track layout."""

    __slots__ = (
        "brand", "width", "height", "duration_ms", "n_tracks",
        "has_video", "has_audio", "video_codec", "timescale",
    )

    def __repr__(self) -> str:  # debugging aid only
        return (
            f"Mp4Info(brand={self.brand!r}, {self.width}x{self.height}, "
            f"{self.duration_ms}ms, codec={self.video_codec!r}, "
            f"tracks={self.n_tracks})"
        )


def _parse_mvhd(data: bytes, s: int) -> Tuple[int, int]:
    """→ (timescale, duration) for mvhd version 0 or 1."""
    version = data[s]
    if version == 1:
        timescale = struct.unpack_from(">I", data, s + 20)[0]
        duration = struct.unpack_from(">Q", data, s + 24)[0]
    else:
        timescale, duration = struct.unpack_from(">II", data, s + 12)
    return timescale, duration


def probe_mp4(data: bytes) -> Mp4Info:
    """Parse ``ftyp`` + ``moov`` headers only (no frame access) — the
    cheap metadata path for MP4 payloads in a media column.  Raises
    ``ValueError`` on non-MP4 or malformed input; never returns garbage
    dimensions."""
    if not is_mp4(data):
        raise ValueError("not an ISO-BMFF payload")
    info = Mp4Info()
    info.brand = ""
    info.width = info.height = 0
    info.duration_ms = 0
    info.n_tracks = 0
    info.has_video = info.has_audio = False
    info.video_codec = ""
    info.timescale = 0
    saw_moov = False

    for fourcc, s, e in _walk(data, 0, len(data)):
        if fourcc == b"ftyp":
            info.brand = data[s : s + 4].decode("latin-1")
        elif fourcc == b"moov":
            saw_moov = True
            for mf, ms, me in _walk(data, s, e):
                if mf == b"mvhd":
                    ts, dur = _parse_mvhd(data, ms)
                    info.timescale = ts
                    if ts:
                        info.duration_ms = int(round(dur * 1000 / ts))
                elif mf == b"trak":
                    info.n_tracks += 1
                    _parse_trak(data, ms, me, info)
    if not saw_moov:
        raise ValueError("MP4 missing moov box (streaming-fragmented or truncated)")
    return info


def _parse_trak(data: bytes, start: int, end: int, info: Mp4Info) -> None:
    handler = b""
    stsd_entry: Optional[Tuple[bytes, int]] = None  # (fourcc, payload_start)
    for tf, ts_, te in _walk(data, start, end):
        if tf != b"mdia":
            continue
        for mf, ms, me in _walk(data, ts_, te):
            if mf == b"hdlr":
                handler = data[ms + 8 : ms + 12]
            elif mf == b"minf":
                for nf, ns, ne in _walk(data, ms, me):
                    if nf != b"stbl":
                        continue
                    for sf, ss, se in _walk(data, ns, ne):
                        if sf == b"stsd":
                            # fullbox header (4) + entry_count (4), then the
                            # first sample entry: size(4) fourcc(4) payload
                            entry_cc = data[ss + 12 : ss + 16]
                            stsd_entry = (entry_cc, ss + 16)
    if handler == b"vide":
        info.has_video = True
        if stsd_entry is not None:
            cc, ps = stsd_entry
            info.video_codec = cc.decode("latin-1")
            # VisualSampleEntry: 6 reserved + 2 data_ref_index +
            # 2+2+12 predefined/reserved, then width(u16) height(u16)
            w, h = struct.unpack_from(">HH", data, ps + 24)
            # first video track wins (multi-track files keep track 1's dims)
            if not info.width:
                info.width, info.height = w, h
    elif handler == b"soun":
        info.has_audio = True


# ---------------------------------------------------------------- encoder


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def encode_mp4(
    width: int,
    height: int,
    duration_ms: int,
    codec: bytes = b"avc1",
    timescale: int = 1000,
    with_audio: bool = False,
    mdat: bytes = b"",
) -> bytes:
    """Emit a minimal VALID ISO-BMFF file: ``ftyp`` + ``moov`` (mvhd +
    one video trak with a full tkhd/mdia/mdhd/hdlr/minf/stbl/stsd chain
    carrying *codec* and *width*×*height*, optionally a soun trak) +
    ``mdat``.  Deterministic bytes for a given argument tuple — the
    synthetic-fixture twin of :func:`probe_mp4` (the ``mdat`` payload is
    opaque: no real frames are encoded, which is exactly the contract
    the probe never looks past)."""
    duration = int(round(duration_ms * timescale / 1000))

    def fullbox(fourcc: bytes, payload: bytes, version: int = 0) -> bytes:
        return _box(fourcc, bytes([version, 0, 0, 0]) + payload)

    mvhd = fullbox(
        b"mvhd",
        struct.pack(">II", 0, 0)            # creation, modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10                       # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                       # predefined
        + struct.pack(">I", 3),              # next_track_id
    )

    def trak(handler: bytes, name: bytes, track_id: int) -> bytes:
        tkhd = fullbox(
            b"tkhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">II", track_id, 0)
            + struct.pack(">I", duration)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0x0100 if handler == b"soun" else 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        mdhd = fullbox(
            b"mdhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und', predefined
        )
        hdlr = fullbox(
            b"hdlr",
            struct.pack(">I", 0) + handler + b"\x00" * 12 + name + b"\x00",
        )
        if handler == b"vide":
            sample_entry = _box(
                codec,
                b"\x00" * 6                       # reserved
                + struct.pack(">H", 1)            # data_reference_index
                + struct.pack(">HH", 0, 0)        # predefined, reserved
                + b"\x00" * 12                    # predefined[3]
                + struct.pack(">HH", width, height)
                + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
                + struct.pack(">I", 0)            # reserved
                + struct.pack(">H", 1)            # frame_count
                + b"\x00" * 32                    # compressorname
                + struct.pack(">Hh", 24, -1),     # depth, predefined
            )
            mhd = fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), version=0)
        else:
            sample_entry = _box(
                b"mp4a",
                b"\x00" * 6
                + struct.pack(">H", 1)
                + b"\x00" * 8
                + struct.pack(">HHHH", 2, 16, 0, 0)
                + struct.pack(">I", 44100 << 16),
            )
            mhd = fullbox(b"smhd", struct.pack(">HH", 0, 0))
        stsd = fullbox(b"stsd", struct.pack(">I", 1) + sample_entry)
        stbl = _box(
            b"stbl",
            stsd
            + fullbox(b"stts", struct.pack(">I", 0))
            + fullbox(b"stsc", struct.pack(">I", 0))
            + fullbox(b"stsz", struct.pack(">II", 0, 0))
            + fullbox(b"stco", struct.pack(">I", 0)),
        )
        dinf = _box(
            b"dinf",
            fullbox(
                b"dref",
                struct.pack(">I", 1)
                + struct.pack(">I", 12) + b"url " + b"\x00\x00\x00\x01",
            ),
        )
        minf = _box(b"minf", mhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    traks = trak(b"vide", b"VideoHandler", 1)
    if with_audio:
        traks += trak(b"soun", b"SoundHandler", 2)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov + _box(b"mdat", mdat)
