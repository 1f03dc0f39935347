"""The LIVE multimodal codecs (BMP / PCM WAV, numpy+struct only) —
pure-Python edge cases the oracle queries can't reach, plus the
malformed-payload row-survival behavior of the Spark decode stage.
"""

import struct

import numpy as np
import pytest

from river_spark.operators.multimodal import (
    decode_bmp,
    decode_bmp_pixel_stats,
    decode_wav,
    decode_wav_stats,
    encode_bmp,
    encode_wav,
)


def _px(w, h, seed=0):
    j = np.arange(3 * w * h, dtype=np.int64)
    return ((seed * 31 + j) % 256).astype(np.uint8).reshape(h, w, 3)


class TestBmp:
    def test_roundtrip_padded_widths(self):
        # widths 1..5 hit every 4-byte row-padding remainder
        for w in range(1, 6):
            for h in (1, 3):
                px = _px(w, h, seed=w * 10 + h)
                ww, hh, back = decode_bmp(encode_bmp(w, h, px))
                assert (ww, hh) == (w, h)
                assert (back == px).all(), (w, h)

    def test_top_down_bmp(self):
        # negative height = top-down row order; decoder must NOT flip
        px = _px(3, 2, seed=7)
        payload = bytearray(encode_bmp(3, 2, px))
        # encode_bmp wrote bottom-up rows; flip stored order and negate
        # height -> decoded image must be identical
        row = ((3 * 3 + 3) // 4) * 4
        body = payload[54:]
        flipped = b"".join(
            bytes(body[i * row : (i + 1) * row]) for i in range(1, -1, -1)
        )
        payload[54:] = flipped
        struct.pack_into("<i", payload, 22, -2)
        _, _, back = decode_bmp(bytes(payload))
        assert (back == px).all()

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda p: p[:30],                     # truncated header
            lambda p: b"XX" + p[2:],              # bad magic
            lambda p: p[:28] + struct.pack("<H", 8) + p[30:],   # 8bpp
            lambda p: p[:30] + struct.pack("<I", 1) + p[34:],   # RLE
            lambda p: p[:-4],                     # truncated pixels
        ],
    )
    def test_malformed_raises(self, mutate):
        good = encode_bmp(3, 2, _px(3, 2))
        with pytest.raises(ValueError):
            decode_bmp(mutate(good))


class TestWav:
    def test_roundtrip_mono_stereo(self):
        for ch in (1, 2):
            s = (np.arange(10 * ch, dtype=np.int64) * 3001 % 65536 - 32768).astype(
                np.int16
            )
            r, c, back = decode_wav(encode_wav(44100, ch, s))
            assert (r, c) == (44100, ch)
            assert (back == s).all()

    def test_extra_chunks_and_word_alignment(self):
        # a LIST chunk with an ODD size before fmt/data: the walker must
        # skip its pad byte or every later offset is wrong
        s = np.array([5, -5, 32767, -32768], dtype=np.int16)
        base = encode_wav(8000, 1, s)
        odd_chunk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        payload = base[:12] + odd_chunk + base[12:]
        payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
        r, c, back = decode_wav(payload)
        assert (r, c) == (8000, 1)
        assert (back == s).all()

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda p: p[:10],                     # truncated
            lambda p: b"RIFX" + p[4:],            # bad magic
            lambda p: p.replace(b"data", b"xxxx"),  # no data chunk
            lambda p: p[:20] + struct.pack("<H", 3) + p[22:],  # float fmt
        ],
    )
    def test_malformed_raises(self, mutate):
        good = encode_wav(8000, 1, np.array([1, 2], dtype=np.int16))
        with pytest.raises(ValueError):
            decode_wav(mutate(good))


def test_spark_decode_survives_malformed_rows(spark):
    """One corrupt payload must mark ITS row ok=false, not fail the
    batch — the 100 TB robustness contract of the decode stage."""
    good_bmp = encode_bmp(3, 2, _px(3, 2, seed=1))
    good_wav = encode_wav(8000, 1, np.array([7, -7], dtype=np.int16))
    rows = [
        (1, bytearray(good_bmp)),
        (2, bytearray(b"garbage")),
        (3, None),
        (4, bytearray(good_wav)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    bmp = {r["doc_id"]: r for r in decode_bmp_pixel_stats(df, "doc_id", "payload").collect()}
    assert bmp[1]["ok"] and bmp[1]["width"] == 3 and bmp[1]["height"] == 2
    px = _px(3, 2, seed=1).astype(np.int64)
    assert bmp[1]["r_sum"] == int(px[:, :, 0].sum())
    assert not bmp[2]["ok"] and not bmp[3]["ok"] and not bmp[4]["ok"]

    wav = {r["doc_id"]: r for r in decode_wav_stats(df, "doc_id", "payload").collect()}
    assert wav[4]["ok"] and wav[4]["peak"] == 7 and wav[4]["sum_sq"] == 98
    assert wav[4]["n_samples"] == 2
    assert not wav[1]["ok"] and not wav[2]["ok"] and not wav[3]["ok"]


class TestPng:
    def test_roundtrip_all_filters_rgb_rgba(self):
        from river_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.default_rng(11)
        # h >= 5 puts all five filter types (y % 5) on the wire
        for w, h, c in [(1, 5, 3), (4, 5, 3), (7, 6, 4), (16, 11, 3), (3, 9, 4)]:
            px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            ww, hh, back = decode_png(encode_png(w, h, px))
            assert (ww, hh) == (w, h)
            assert back.shape == px.shape
            assert (back == px).all(), (w, h, c)

    def test_paeth_tiebreak_order(self):
        """Constant rows make pa == pb == pc at every Paeth pixel —
        exactly the tie the spec breaks left-first. A decoder that
        breaks ties up-first still round-trips random data often enough
        to slip through; this image forces the tie on every pixel of
        the Paeth row (y=4)."""
        from river_spark.operators.multimodal import decode_png, encode_png

        px = np.full((6, 4, 3), 200, dtype=np.uint8)
        _, _, back = decode_png(encode_png(4, 6, px))
        assert (back == px).all()

    def test_crc_verified(self):
        from river_spark.operators.multimodal import decode_png, encode_png

        good = bytearray(encode_png(3, 5, _px(3, 5, seed=3)))
        # flip one bit inside the IDAT body: CRC must catch it
        idat_at = bytes(good).find(b"IDAT")
        good[idat_at + 6] ^= 0x01
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(good))

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda p: p[:10],                       # truncated signature
            lambda p: b"\x89PNX" + p[4:],           # bad magic
            lambda p: p[: len(p) - 12],             # missing IEND
        ],
    )
    def test_malformed_raises(self, mutate):
        from river_spark.operators.multimodal import decode_png, encode_png

        good = encode_png(3, 5, _px(3, 5))
        with pytest.raises(ValueError):
            decode_png(mutate(good))

    def test_unsupported_variants_rejected(self):
        import struct as st
        import zlib

        from river_spark.operators.multimodal import decode_png

        def png_with_ihdr(ihdr_body):
            def chunk(ctype, body):
                return (
                    st.pack(">I", len(body)) + ctype + body
                    + st.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
                )
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr_body)
                + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00"))
                + chunk(b"IEND", b"")
            )

        # sub-byte truecolor, bad palette depth, 16-bit palette,
        # reserved color type, bad interlace code: all rejected
        # (palette, Adam7, gray at every spec depth, and 16-bit
        # truecolor are SUPPORTED since round 15 — see
        # test_png_palette_lossless / test_png_adam7_* /
        # test_png_gray_* / test_png_16bit_*)
        for depth, color, interlace in [(4, 2, 0), (3, 3, 0), (16, 3, 0),
                                        (8, 7, 0), (8, 2, 2)]:
            ihdr = st.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, interlace)
            with pytest.raises(ValueError, match="unsupported"):
                decode_png(png_with_ihdr(ihdr))
        # palette PNG without a PLTE chunk is malformed, not decodable
        ihdr = st.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(png_with_ihdr(ihdr))

    def test_spark_decode_survives_malformed_rows(self, spark):
        from river_spark.operators.multimodal import (
            decode_png_pixel_stats,
            encode_png,
        )

        px = _px(3, 5, seed=2)
        rows = [
            (1, bytearray(encode_png(3, 5, px))),
            (2, bytearray(b"not a png")),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in
               decode_png_pixel_stats(df, "doc_id", "payload").collect()}
        assert got[1]["ok"] and got[1]["width"] == 3 and got[1]["height"] == 5
        p64 = px.astype(np.int64)
        assert got[1]["r_sum"] == int(p64[:, :, 0].sum())
        flat = p64.reshape(-1)
        j = np.arange(flat.size, dtype=np.int64)
        assert got[1]["pos_weighted_sum"] == int(((j % 997 + 1) * flat).sum())
        assert not got[2]["ok"] and not got[3]["ok"]


class TestQoi:
    def test_roundtrip_rgb_rgba(self):
        from river_spark.operators.multimodal import decode_qoi, encode_qoi

        rng = np.random.default_rng(5)
        for w, h, c in [(1, 1, 3), (8, 8, 3), (16, 5, 4), (61, 2, 3)]:
            px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            ww, hh, back = decode_qoi(encode_qoi(w, h, px))
            assert (ww, hh) == (w, h) and (back == px).all(), (w, h, c)

    def test_all_ops_on_the_wire(self):
        """The oracle pixel rule must actually put RUN, LUMA/DIFF, RGB,
        and INDEX ops in the stream — inspect the encoded tags."""
        from river_spark.operators.multimodal import decode_qoi, encode_qoi

        # the mm_qoi_decode_stats rule, biggest shape, plus an A-B-A
        # revisit appended to force an INDEX hit
        d, w, h = 3, 9, 8
        p = np.arange(w * h, dtype=np.int64)
        q = p // 3
        img = np.stack(
            [
                (d * 29 + q + 97 * (q // 7)) % 256,
                (d * 31 + 2 * q + 53 * (q // 7)) % 256,
                (d * 37 + 3 * q + 31 * (q // 7)) % 256,
            ],
            axis=1,
        ).astype(np.uint8).reshape(h, w, 3)
        img[-1, -3] = img[-1, -5] = (1, 2, 3)   # A..A revisit
        img[-1, -4] = (200, 100, 50)
        payload = encode_qoi(w, h, img)
        body = payload[14:-8]
        tags = set()
        i = 0
        while i < len(body):
            b = body[i]
            if b == 0xFE:
                tags.add("RGB"); i += 4
            elif b == 0xFF:
                tags.add("RGBA"); i += 5
            else:
                t = b >> 6
                tags.add(["INDEX", "DIFF", "LUMA", "RUN"][t])
                i += 2 if t == 2 else 1
        assert {"RUN", "LUMA", "RGB", "INDEX"} <= tags, tags
        _, _, back = decode_qoi(payload)
        assert (back == img).all()

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda p: p[:10],                    # truncated header
            lambda p: b"qoix" + p[4:],           # bad magic
            lambda p: p[:-8],                    # missing end marker
            lambda p: p[:-8] + b"\x10" + p[-8:],  # op past the last pixel
        ],
    )
    def test_malformed_raises(self, mutate):
        from river_spark.operators.multimodal import decode_qoi, encode_qoi

        good = encode_qoi(3, 2, _px(3, 2))
        with pytest.raises(ValueError):
            decode_qoi(mutate(good))


class TestMulaw:
    def test_ccitt_reference_pairs(self):
        from river_spark.operators.multimodal import mulaw_to_linear

        u = np.array([0x00, 0x80, 0xFF, 0x7F], dtype=np.uint8)
        assert list(mulaw_to_linear(u)) == [-32124, 32124, 0, 0]

    def test_monotone_by_segment(self):
        """Within each exponent segment the expansion must be strictly
        monotone — a mantissa/exponent mask swap breaks this."""
        from river_spark.operators.multimodal import mulaw_to_linear

        all_u = np.arange(256, dtype=np.uint8)
        lin = mulaw_to_linear(all_u).astype(np.int64)
        neg = lin[:128]          # bytes 0x00..0x7F decode negative->0
        pos = lin[128:]          # bytes 0x80..0xFF decode positive->0
        assert (np.diff(neg) > 0).all(), "negative half must ascend"
        assert (np.diff(pos) < 0).all(), "positive half must descend"
        assert neg.min() == -32124 and pos.max() == 32124

    def test_container_roundtrip_and_pcm_still_works(self):
        from river_spark.operators.multimodal import (
            decode_wav_any, encode_wav, encode_wav_mulaw, mulaw_to_linear)

        raw = bytes((np.arange(501) * 7 % 256).astype(np.uint8))
        r, ch, s = decode_wav_any(encode_wav_mulaw(8000, 1, raw))
        assert (r, ch, len(s)) == (8000, 1, 501)
        assert (s == mulaw_to_linear(np.frombuffer(raw, np.uint8))).all()
        # PCM16 payloads still decode through the same walker
        pcm = np.array([5, -5, 32767, -32768], dtype=np.int16)
        r, ch, s = decode_wav_any(encode_wav(44100, 2, pcm))
        assert (r, ch) == (44100, 2) and (s == pcm).all()

    def test_spark_stage_survives_malformed(self, spark):
        from river_spark.operators.multimodal import (
            decode_mulaw_stats, encode_wav_mulaw)

        good = encode_wav_mulaw(8000, 1, b"\x00\xff\x80")
        rows = [(1, bytearray(good)), (2, bytearray(b"junk")), (3, None)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in
               decode_mulaw_stats(df, "doc_id", "payload").collect()}
        assert got[1]["ok"] and got[1]["peak"] == 32124
        assert got[1]["sum_val"] == -32124 + 0 + 32124
        assert not got[2]["ok"] and not got[3]["ok"]


class TestBoxDownscale:
    def test_exact_blocks_and_odd_crop(self):
        from river_spark.operators.multimodal import box_downscale_2x

        rng = np.random.default_rng(9)
        for h, w in [(2, 2), (5, 7), (6, 6), (1, 4), (3, 1)]:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            s = box_downscale_2x(px)
            assert s.shape == (h // 2, w // 2, 3)
            for R in range(h // 2):
                for C in range(w // 2):
                    for ch in range(3):
                        blk = px[2 * R : 2 * R + 2, 2 * C : 2 * C + 2, ch].astype(int)
                        assert s[R, C, ch] == blk.sum() // 4

    def test_spark_stage_survives_malformed(self, spark):
        from river_spark.operators.multimodal import decode_bmp_resize_stats

        good = encode_bmp(4, 4, _px(4, 4, seed=6))
        rows = [(1, bytearray(good)), (2, bytearray(b"nope")), (3, None)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in
               decode_bmp_resize_stats(df, "doc_id", "payload").collect()}
        assert got[1]["ok"] and got[1]["out_w"] == 2 and got[1]["out_h"] == 2
        from river_spark.operators.multimodal import box_downscale_2x
        small = box_downscale_2x(_px(4, 4, seed=6)).astype(np.int64)
        assert got[1]["r_sum"] == int(small[:, :, 0].sum())
        assert not got[2]["ok"] and not got[3]["ok"]


# ---------------------------------------------------------------------------
# GIF87a / LZW (round 11): the family's first LZW entropy layer
# ---------------------------------------------------------------------------
from river_spark.operators.multimodal import (  # noqa: E402
    _lzw_decode_gif,
    _lzw_encode_gif,
    decode_gif,
    encode_gif,
)


def _prand_bytes(n, state=12345):
    out = bytearray()
    for _ in range(n):
        state = (state * 1103515245 + 12345) % (1 << 31)
        out.append((state >> 16) & 0xFF)
    return bytes(out)


def _pal(d=0):
    i = np.arange(256, dtype=np.int64)
    return np.stack(
        [(i + d) % 256, (2 * i + 13 * d) % 256, (3 * i + 7 * d) % 256], axis=1
    ).astype(np.uint8)


class TestGifLzw:
    def test_roundtrip_across_width_boundaries(self):
        # 300 random bytes cross the 9->10-bit bump; 2000 cross 10->11;
        # 30000/80000 cross 12 bits AND the 4096-table CLEAR reset
        # (multiple times at 80k). The 300-byte case is ALSO the
        # decoder-lag pin: a decoder that bumps at next_code == 2^width
        # (symmetric with the encoder, one insertion late) desyncs
        # exactly at the first boundary and fails here.
        for n in (0, 1, 5, 300, 2000, 30000, 80000):
            d = _prand_bytes(n)
            assert _lzw_decode_gif(_lzw_encode_gif(d, 8), 8, n) == d

    def test_roundtrip_runs_and_kwkwk(self):
        # all-equal and short-period inputs drive the KwKwK path
        # (code == next free slot: entry = prev + prev[0])
        for d in (b"\x00" * 1000, bytes([7] * 4 + [8] * 4) * 50,
                  bytes(range(256)) * 60, b"ab" * 6000):
            assert _lzw_decode_gif(_lzw_encode_gif(d, 8), 8, len(d)) == d

    def test_underrun_and_overrun_rejected(self):
        enc = _lzw_encode_gif(b"abcabc", 8)
        with pytest.raises(ValueError):
            _lzw_decode_gif(enc, 8, 7)   # expects more pixels than encoded
        with pytest.raises(ValueError):
            _lzw_decode_gif(enc, 8, 5)   # overruns the declared count


class TestGif:
    def test_full_roundtrip(self):
        for d in range(12):
            w, h = 16 + d % 5, 12 + d % 4
            p = np.arange(w * h, dtype=np.int64)
            idx = ((d * 41 + 11 * (p // 5)) % 256).astype(np.uint8).reshape(h, w)
            payload = encode_gif(w, h, idx, _pal(d))
            w2, h2, idx2, pal2 = decode_gif(payload)
            assert (w2, h2) == (w, h)
            assert (idx2 == idx).all()
            assert (pal2 == _pal(d)).all()

    def test_malformed_rejected(self):
        good = encode_gif(4, 4, np.zeros((4, 4), np.uint8), _pal())
        for bad in (
            good[:10],                       # truncated header
            b"XIF87a" + good[6:],            # bad signature
            good[:-1],                       # missing trailer
            good[:13],                       # truncated color table
            good[: 13 + 768],                # missing image descriptor
        ):
            with pytest.raises(ValueError):
                decode_gif(bytes(bad))

    def test_palette_flip_changes_stats_not_validity(self):
        # a corrupt GCT byte still decodes (valid GIF) — the ORACLE
        # catches it through pal_g_sum; pin that contract here
        d = 3
        w, h = 16 + d % 5, 12 + d % 4
        p = np.arange(w * h, dtype=np.int64)
        idx = ((d * 41 + 11 * (p // 5)) % 256).astype(np.uint8).reshape(h, w)
        payload = bytearray(encode_gif(w, h, idx, _pal(d)))
        g_off = 13 + 3 * int(idx[0, 0]) + 1  # G byte of a used palette slot
        payload[g_off] ^= 0xFF
        w2, h2, idx2, pal2 = decode_gif(bytes(payload))
        assert (idx2 == idx).all()
        assert not (pal2 == _pal(d)).all()

    def test_sub_block_framing(self):
        # an image big enough that the LZW stream spans >1 sub-block
        d = 0
        w, h = 64, 64
        p = np.arange(w * h, dtype=np.int64)
        idx = ((17 * p) % 256).astype(np.uint8).reshape(h, w)
        payload = encode_gif(w, h, idx, _pal(d))
        # 6 sig + 7 LSD = 13; + 768 GCT; + 10 image descriptor; + 1 mcs
        body = payload[13 + 768 + 10 + 1 : -1]  # keep the 0x00 terminator
        blocks = 0
        pos = 0
        while body[pos] != 0:
            blocks += 1
            pos += 1 + body[pos]
        assert blocks >= 2, "LZW stream must span multiple sub-blocks"
        _, _, idx2, _ = decode_gif(payload)
        assert (idx2 == idx).all()
