"""AVI container codec: round-trip, frame seek, strict malformed-input
behavior (raise, never hang/truncate — same contract as jpeg/mp4/warc/wav)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fusionspark.operators.avi import avi_encode, avi_frame, avi_parse
from fusionspark.operators.jpeg import jpeg_decode, jpeg_encode


def _mjpeg_frames(n: int, seed: int = 7) -> list[bytes]:
    frames = []
    for f in range(n):
        qb = np.zeros((6, 8, 8), dtype=np.int64)
        for b in range(6):
            qb[b, 0, 0] = ((seed * 11 + 29 * f + 17 * b) % 255) - 127
        frames.append(jpeg_encode(None, qblocks=qb, size=(24, 16)))
    return frames


def test_roundtrip_metadata_and_frames():
    frames = _mjpeg_frames(5)
    payload = avi_encode(frames, fps=4, width=24, height=16)
    meta = avi_parse(payload)
    assert meta["n_frames"] == 5
    assert meta["total_frames"] == 5
    assert meta["us_per_frame"] == 250_000
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["idx1_entries"] == 5
    assert meta["streams"][0]["handler"] == "MJPG"
    assert meta["streams"][0]["compression"] == "MJPG"
    assert meta["streams"][0]["length"] == 5
    for i, f in enumerate(frames):
        assert avi_frame(payload, meta, i) == f


def test_seeked_frame_decodes_to_block_law():
    frames = _mjpeg_frames(4, seed=13)
    payload = avi_encode(frames, fps=4, width=24, height=16)
    meta = avi_parse(payload)
    plane = jpeg_decode(avi_frame(payload, meta, 3))
    # block (0,0) of frame 3: pixel = ((13*11 + 29*3 + 17*0) % 255) + 1
    assert plane.shape == (16, 24)
    assert int(plane[0, 0]) == ((13 * 11 + 29 * 3) % 255) + 1
    assert int(plane[8, 8]) == ((13 * 11 + 29 * 3 + 17 * 4) % 255) + 1


def test_odd_sized_frames_are_padded():
    # odd payload length exercises the RIFF word-alignment pad byte
    frames = [b"\xff\xd8" + b"x" * 3, b"\xff\xd8" + b"y" * 4]
    payload = avi_encode(frames, fps=10, width=8, height=8)
    meta = avi_parse(payload)
    assert [avi_frame(payload, meta, i) for i in range(2)] == frames


def test_empty_video():
    payload = avi_encode([], fps=4, width=24, height=16)
    meta = avi_parse(payload)
    assert meta["n_frames"] == 0 and meta["total_frames"] == 0


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],                              # truncated header
        lambda b: b"JUNK" + b[4:],                     # not RIFF
        lambda b: b[:8] + b"WAVE" + b[12:],            # wrong form type
        lambda b: b[:4] + struct.pack("<I", 2**31) + b[8:],  # size overrun
    ],
)
def test_malformed_raises(mutate):
    payload = avi_encode(_mjpeg_frames(2), fps=4, width=24, height=16)
    with pytest.raises(ValueError):
        avi_parse(mutate(payload))


def test_inner_chunk_overrun_raises():
    payload = bytearray(avi_encode(_mjpeg_frames(2), fps=4, width=24, height=16))
    movi = payload.find(b"movi")
    dc = payload.find(b"00dc", movi)
    struct.pack_into("<I", payload, dc + 4, 2**30)  # frame chunk overruns movi
    with pytest.raises(ValueError):
        avi_parse(bytes(payload))


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_fuzz_never_hangs(blob):
    try:
        avi_parse(b"RIFF" + struct.pack("<I", len(blob) + 4) + b"AVI " + blob)
    except ValueError:
        pass
