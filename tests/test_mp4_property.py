"""Hypothesis property pins for the ISO-BMFF probe (VERDICT r4 #7):
`test_mp4.py` covers the fixed roundtrip + truncation matrix; these
properties drive the box GRAMMAR itself — random top-level box order,
injected unknown/free boxes, `size==1` largesize rewrites, `size==0`
terminal boxes, and version-1 mvhd — all of which real muxers emit and
none of which may change the probed metadata.  Mutations are built
bytes-up from the spec (ISO/IEC 14496-12 box layout), not by calling
the encoder with different arguments, so an encoder bug cannot mask a
probe bug."""

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from evalidate_spark.functions import mp4


def _toplevel(blob):
    """[(fourcc, whole_box_bytes)] for a well-formed blob."""
    out, pos = [], 0
    while pos < len(blob):
        size = struct.unpack_from(">I", blob, pos)[0]
        out.append((blob[pos + 4 : pos + 8], blob[pos : pos + size]))
        pos += size
    return out


def _probe_tuple(b):
    i = mp4.probe_mp4(b)
    return (
        i.brand, i.width, i.height, i.duration_ms, i.n_tracks,
        i.has_video, i.has_audio, i.video_codec, i.timescale,
    )


ENC = st.fixed_dictionaries(
    {
        "width": st.integers(1, 8192),
        "height": st.integers(1, 8192),
        "duration_ms": st.integers(0, 10**7),
        "timescale": st.integers(1, 90_000),
        "codec": st.sampled_from([b"avc1", b"hvc1", b"vp09", b"av01"]),
        "with_audio": st.booleans(),
    }
)


@settings(max_examples=60, deadline=None)
@given(args=ENC)
def test_encode_probe_roundtrip_property(args):
    blob = mp4.encode_mp4(**args)
    info = mp4.probe_mp4(blob)
    assert (info.width, info.height) == (args["width"], args["height"])
    assert info.video_codec == args["codec"].decode()
    assert info.has_video and info.has_audio == args["with_audio"]
    assert info.n_tracks == (2 if args["with_audio"] else 1)
    assert info.timescale == args["timescale"]
    # duration quantises to movie-timescale units at encode time; the
    # probe must reproduce exactly that quantisation, nothing looser
    units = int(round(args["duration_ms"] * args["timescale"] / 1000))
    assert info.duration_ms == int(round(units * 1000 / args["timescale"]))


@settings(max_examples=60, deadline=None)
@given(
    args=ENC,
    order_seed=st.randoms(use_true_random=False),
    n_free=st.integers(0, 3),
    free_payload=st.binary(max_size=64),
)
def test_box_order_and_free_boxes_are_metadata_neutral(
    args, order_seed, n_free, free_payload
):
    """ftyp stays first (the sniff contract); every permutation of the
    remaining top-level boxes, with free/skip boxes sprinkled anywhere,
    probes identically — muxers legitimately put moov after mdat
    (faststart off) and pad with free boxes."""
    blob = mp4.encode_mp4(**args)
    boxes = _toplevel(blob)
    assert boxes[0][0] == b"ftyp"
    rest = [b for _, b in boxes[1:]]
    for _ in range(n_free):
        kind = order_seed.choice([b"free", b"skip"])
        rest.append(struct.pack(">I", 8 + len(free_payload)) + kind + free_payload)
    order_seed.shuffle(rest)
    mutated = boxes[0][1] + b"".join(rest)
    assert _probe_tuple(mutated) == _probe_tuple(blob)


@settings(max_examples=40, deadline=None)
@given(args=ENC, which=st.integers(0, 2))
def test_largesize_rewrite_is_metadata_neutral(args, which):
    """Rewriting any top-level box to the size==1 / 64-bit largesize
    form (what muxers use for >4 GiB mdat) must not change the probe."""
    blob = mp4.encode_mp4(**args)
    boxes = _toplevel(blob)
    ix = which % len(boxes)
    four, body = boxes[ix][0], boxes[ix][1][8:]
    large = struct.pack(">I", 1) + four + struct.pack(">Q", 16 + len(body)) + body
    mutated = b"".join(
        large if i == ix else b for i, (_, b) in enumerate(boxes)
    )
    assert _probe_tuple(mutated) == _probe_tuple(blob)


@settings(max_examples=40, deadline=None)
@given(args=ENC)
def test_terminal_size_zero_box_is_metadata_neutral(args):
    """size==0 means 'extends to end of file' and is only legal on the
    last top-level box (mdat here)."""
    blob = mp4.encode_mp4(**args)
    boxes = _toplevel(blob)
    assert boxes[-1][0] == b"mdat"
    last = boxes[-1][1]
    mutated = (
        b"".join(b for _, b in boxes[:-1])
        + struct.pack(">I", 0) + b"mdat" + last[8:]
    )
    assert _probe_tuple(mutated) == _probe_tuple(blob)


@settings(max_examples=60, deadline=None)
@given(args=ENC)
def test_v1_mvhd_probes_identically(args):
    """mvhd version 1 widens creation/modification/duration to 64 bits;
    the probe must read the same timescale/duration through either
    layout.  The v1 payload is spliced in bytes-up and the moov size
    fixed manually — the encoder only emits v0."""
    blob = mp4.encode_mp4(**args)
    boxes = _toplevel(blob)
    moov = dict((f, b) for f, b in boxes)[b"moov"]
    kids = _toplevel(moov[8:])
    assert kids[0][0] == b"mvhd"
    v0 = kids[0][1]
    ts, dur = struct.unpack_from(">II", v0, 8 + 4 + 8)
    tail = v0[8 + 4 + 20:]  # rate/volume/reserved/matrix/predefined/next_id
    v1_payload = (
        bytes([1, 0, 0, 0])
        + struct.pack(">QQIQ", 0, 0, ts, dur)
        + tail
    )
    v1 = struct.pack(">I", 8 + len(v1_payload)) + b"mvhd" + v1_payload
    new_moov_body = v1 + b"".join(b for _, b in kids[1:])
    new_moov = struct.pack(">I", 8 + len(new_moov_body)) + b"moov" + new_moov_body
    mutated = b"".join(
        new_moov if f == b"moov" else b for f, b in boxes
    )
    assert _probe_tuple(mutated) == _probe_tuple(blob)


@settings(max_examples=60, deadline=None)
@given(args=ENC, frac=st.floats(0.0, 1.0))
def test_truncation_inside_moov_always_raises(args, frac):
    """Any cut that lands strictly inside the moov box must raise
    ValueError — never garbage dimensions (the decode_media fall-through
    contract depends on a clean raise)."""
    blob = mp4.encode_mp4(**args)
    pos = 0
    for four, b in _toplevel(blob):
        if four == b"moov":
            start = pos
            end = pos + len(b)
            break
        pos += len(b)
    cut = start + 1 + int(frac * (end - start - 2))
    try:
        mp4.probe_mp4(blob[:cut])
    except ValueError:
        pass
    else:
        raise AssertionError("truncated moov did not raise")


@settings(max_examples=40, deadline=None)
@given(args=ENC, payload=st.binary(max_size=48))
def test_unknown_moov_child_is_skipped(args, payload):
    """An unrecognised box inside moov (udta-style metadata, vendor
    boxes) is skipped, not parsed into garbage."""
    blob = mp4.encode_mp4(**args)
    boxes = _toplevel(blob)
    moov = dict((f, b) for f, b in boxes)[b"moov"]
    junk = struct.pack(">I", 8 + len(payload)) + b"xyz " + payload
    new_body = moov[8:] + junk
    new_moov = struct.pack(">I", 8 + len(new_body)) + b"moov" + new_body
    mutated = b"".join(new_moov if f == b"moov" else b for f, b in boxes)
    assert _probe_tuple(mutated) == _probe_tuple(blob)
