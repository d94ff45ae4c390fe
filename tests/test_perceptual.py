"""Perceptual image hashing (dHash) + cross-container image near-dup
detection — the image analogue of the text MinHash/SimHash pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from evalidate_spark.functions import codecs, multimodal, perceptual


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _smooth(h=20, w=28):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 8) % 256, (y * 11) % 256, ((x + y) * 5) % 256], axis=-1
    ).astype(np.uint8)


class TestDhash:
    def test_container_invariance(self):
        px = _smooth()
        d = perceptual.dhash64(px)
        assert d == perceptual.dhash64(codecs.decode_png(codecs.encode_png(px)))
        assert d == perceptual.dhash64(codecs.decode_bmp(codecs.encode_bmp(px)))

    def test_jpeg_and_scale_proximity(self):
        px = _smooth()
        d = perceptual.dhash64(px)
        jpg = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=85))
        assert _ham(d, perceptual.dhash64(jpg)) <= 4
        up = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)
        assert _ham(d, perceptual.dhash64(up)) <= 2

    def test_distinct_separation(self):
        # synth-media-like seeded noise images: every distinct pair lands
        # far outside the near-dup radius
        hs = []
        for i in range(30):
            r = np.random.default_rng(42 + i * 3)
            im = r.integers(
                0, 256, size=(8 + i % 16, 8 + (i // 3) % 16, 3), dtype=np.uint8
            )
            hs.append(perceptual.dhash64(im))
        assert min(_ham(a, b) for i, a in enumerate(hs) for b in hs[i + 1 :]) > 12

    def test_signed_bigint_range(self):
        # a hash with bit 63 set must come back as a negative Python int
        # (Spark bigint), not overflow
        px = np.zeros((8, 9, 3), dtype=np.uint8)
        px[:, :1] = 255  # leftmost column brightest → every row bit 0 set
        d = perceptual.dhash64(px)
        assert -(1 << 63) <= d < (1 << 63)

    def test_decode_image_dispatch(self):
        px = _smooth(8, 8)
        assert np.array_equal(perceptual.decode_image(codecs.encode_bmp(px)), px)
        assert np.array_equal(perceptual.decode_image(codecs.encode_png(px)), px)
        assert perceptual.decode_image(codecs.encode_jpeg(px, 85)).shape == px.shape
        assert perceptual.decode_image(b"\x00junk") is None
        assert perceptual.decode_image(None) is None
        assert perceptual.decode_image(b"BM\x01trunc") is None  # corrupt → None


class TestImageDhashSpark:
    def test_matches_local_recompute(self, spark):
        media = multimodal.synth_media(spark, n=30)
        got = {r["media_ref"]: r for r in perceptual.image_dhash(media).collect()}
        raw = {
            r["media_ref"]: bytes(r["payload"])
            for r in media.collect()
            if r["media_kind"] == "image"
        }
        assert set(got) == set(raw)
        for ref, payload in raw.items():
            px = perceptual.decode_image(payload)
            assert got[ref]["decoded"] is True
            assert got[ref]["dhash"] == perceptual.dhash64(px)
            assert (got[ref]["width"], got[ref]["height"]) == (
                px.shape[1],
                px.shape[0],
            )

    def test_undecodable_flagged_null(self, spark):
        rows = [
            ("bad-0", "image", b"\x00not-an-image", {"src": "t"}),
            ("aud-0", "audio", b"\x00ignored", {"src": "t"}),
        ]
        media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = perceptual.image_dhash(media).collect()
        assert len(out) == 1  # audio rows don't emit
        assert out[0]["media_ref"] == "bad-0"
        assert out[0]["dhash"] is None and out[0]["decoded"] is False


class TestImageNearDups:
    def test_cross_container_recall_and_separation(self, spark):
        media = multimodal.synth_media(spark, n=90)  # 30 images
        images = media.filter(F.col("media_kind") == "image")
        copies = perceptual.transcode_images(images, "png").withColumn(
            "media_ref", F.concat(F.col("media_ref"), F.lit("::png"))
        )
        pairs = perceptual.image_near_dups(
            images.unionByName(copies), max_hamming=6
        ).collect()
        n_images = images.count()
        # recall 1.0: every image pairs with its PNG transcode at hamming 0 …
        assert len(pairs) == n_images
        for p in sorted(pairs, key=lambda r: r["id_a"]):
            a, b = sorted([p["id_a"], p["id_b"]])
            assert b == a + "::png"
            assert p["hamming"] == 0 and p["truncated"] is False
        # … and no cross-image pair sneaks under the radius

    def test_transcode_preserves_pixels_lossless(self, spark):
        media = multimodal.synth_media(spark, n=12)
        out = perceptual.transcode_images(media, "bmp").collect()
        raw = {r["media_ref"]: r for r in media.collect()}
        for r in out:
            if r["media_kind"] != "image":
                assert r["meta"]["transcode"] == "skipped"
                continue
            assert r["meta"]["transcode"] == "bmp"
            got = codecs.decode_bmp(bytes(r["payload"]))
            want = perceptual.decode_image(bytes(raw[r["media_ref"]]["payload"]))
            assert np.array_equal(got, want)

    def test_transcode_rejects_unknown_container(self, spark):
        media = multimodal.synth_media(spark, n=3)
        with pytest.raises(ValueError, match="unknown container"):
            perceptual.transcode_images(media, "webp")


class TestHammingCandidates:
    def test_pigeonhole_guarantee_at_radius_7(self, spark):
        from evalidate_spark.functions.dedup import hamming_candidates

        # base signature with bit 63 set (negative bigint) + a 7-bit-flipped
        # twin: with n_chunks=8 the pair MUST be found (distance < 8)
        base = -(1 << 63) | 0x0123456789ABCDE0
        twin = base
        for b in (0, 9, 18, 27, 36, 45, 54):  # 7 flips, one per low band
            twin ^= 1 << b
        far = 0x7FFFFFFFFFFFFFFF
        df = spark.createDataFrame(
            [("a", base), ("b", twin), ("c", far)], "id string, sig long"
        )
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in hamming_candidates(
                df, id_col="id", sig_col="sig", n_chunks=8
            ).collect()
        }
        assert got.get(("a", "b")) == 7

    def test_rejects_bad_chunks(self, spark):
        from evalidate_spark.functions.dedup import hamming_candidates

        df = spark.createDataFrame([("a", 1)], "id string, sig long")
        with pytest.raises(ValueError, match="divide 64"):
            hamming_candidates(df, id_col="id", sig_col="sig", n_chunks=7)


def _tone(freq, rate, dur, amp=8000):
    t = np.arange(int(rate * dur))
    return (np.sin(2 * np.pi * freq * t / rate) * amp).astype(np.int16)


_sham = _ham  # same 64-bit Hamming helper


class TestSpechash:
    def test_invariances(self):
        a = perceptual.spechash64(_tone(440, 4000, 1.5), 4000)
        # gain / volume (energy-normalised)
        assert _sham(a, perceptual.spechash64(_tone(440, 4000, 1.5, amp=1500), 4000)) == 0
        # resampling (bands in absolute Hz)
        assert _sham(a, perceptual.spechash64(_tone(440, 8000, 1.5), 8000)) == 0
        # duration of stationary content
        assert _sham(a, perceptual.spechash64(_tone(440, 4000, 2.5), 4000)) == 0

    def test_separation(self):
        # the synth_media tone ladder: every distinct-frequency pair stays
        # outside the tight tonal radius
        hs = [
            perceptual.spechash64(_tone(100 + i * 25, 4000, 1.0 + (i % 5) * 0.5), 4000)
            for i in range(20)
        ]
        assert min(
            _sham(a, b) for i, a in enumerate(hs) for b in hs[i + 1 :]
        ) >= 2
        # broadband content: distinct signals far, gain-scaled identical
        n1 = (np.random.default_rng(5).standard_normal(6000) * 3000).astype(np.int16)
        n2 = (np.random.default_rng(9).standard_normal(6000) * 3000).astype(np.int16)
        h1 = perceptual.spechash64(n1, 4000)
        assert _sham(h1, perceptual.spechash64(n2, 4000)) > 16
        scaled = np.clip(np.round(n1 * 0.3), -32768, 32767).astype(np.int16)
        assert _sham(h1, perceptual.spechash64(scaled.astype(np.int16), 4000)) == 0

    def test_silence_canonical_zero(self):
        assert perceptual.spechash64(np.zeros(100, dtype=np.int16), 4000) == 0
        assert perceptual.spechash64(np.zeros(0, dtype=np.int16), 4000) == 0


class TestAudioNearDups:
    def test_gain_copy_recall(self, spark):
        media = multimodal.synth_media(spark, n=60)  # 20 audio rows
        audio = media.filter(F.col("media_kind") == "audio")
        copies = perceptual.audio_gain(audio, gain=0.25).withColumn(
            "media_ref", F.concat(F.col("media_ref"), F.lit("::q"))
        )
        pairs = perceptual.audio_near_dups(
            audio.unionByName(copies), max_hamming=1
        ).collect()
        n_audio = audio.count()
        assert len(pairs) == n_audio
        for p in pairs:
            a, b = sorted([p["id_a"], p["id_b"]])
            assert b == a + "::q" and p["hamming"] == 0

    def test_spechash_spark_matches_local(self, spark):
        media = multimodal.synth_media(spark, n=30)
        got = {r["media_ref"]: r for r in perceptual.audio_spechash(media).collect()}
        raw = {
            r["media_ref"]: bytes(r["payload"])
            for r in media.collect()
            if r["media_kind"] == "audio"
        }
        assert set(got) == set(raw)
        from evalidate_spark.functions import codecs as cc

        for ref, payload in raw.items():
            s, r = cc.decode_wav(payload)
            assert got[ref]["decoded"] is True
            assert got[ref]["spechash"] == perceptual.spechash64(s, r)
            assert got[ref]["sample_rate"] == r

    def test_undecodable_flagged(self, spark):
        rows = [("x", "audio", b"\x00not-wav", {"s": "t"})]
        media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = perceptual.audio_spechash(media).collect()
        assert len(out) == 1 and out[0]["decoded"] is False
        assert out[0]["spechash"] is None


def test_hamming_candidates_null_sigs_excluded(spark):
    from evalidate_spark.functions.dedup import hamming_candidates

    df = spark.createDataFrame(
        [("a", 5), ("b", 5), ("n1", None), ("n2", None)], "id string, sig long"
    )
    got = hamming_candidates(df, id_col="id", sig_col="sig").collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {("a", "b")}
    assert all(r["hamming"] == 0 for r in got)


class TestVideoNearDups:
    def test_framehash_matches_local(self, spark):
        from evalidate_spark.functions import avi

        media = multimodal.synth_smooth_videos(spark, n=6)
        got = {}
        for r in perceptual.video_framehash(media).collect():
            got.setdefault(r["media_ref"], {})[r["frame_ix"]] = r
        raw = {r["media_ref"]: bytes(r["payload"]) for r in media.collect()}
        assert set(got) == set(raw)
        for ref, payload in raw.items():
            frames, _ = avi.decode_avi(payload)
            assert len(got[ref]) == len(frames)
            for ix, px in enumerate(frames):
                r = got[ref][ix]
                assert r["decoded"] is True
                assert r["dhash"] == perceptual.dhash64(px)
                assert r["n_frames"] == len(frames)

    def test_framehash_undecodable_flagged(self, spark):
        rows = [("bad", "video", b"\x00h264", {"s": "t"})]
        media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = perceptual.video_framehash(media).collect()
        assert len(out) == 1 and out[0]["decoded"] is False
        assert out[0]["dhash"] is None and out[0]["frame_ix"] is None

    def test_transcode_recall_and_separation(self, spark):
        media = multimodal.synth_smooth_videos(spark, n=12)
        copies = perceptual.transcode_video(media, "mjpeg", quality=88).withColumn(
            "media_ref", F.concat(F.col("media_ref"), F.lit("::mj"))
        )
        pairs = perceptual.video_near_dups(
            media.unionByName(copies), max_hamming=7, min_shared=0.99
        ).collect()
        # recall 1.0: every video pairs with exactly its MJPEG transcode
        assert len(pairs) == 12
        for p in pairs:
            a, b = sorted([p["id_a"], p["id_b"]])
            assert b == a + "::mj"
            assert p["score"] == 1.0
            assert p["shared_frames"] == 3 and p["n_a"] == 3 and p["n_b"] == 3

    def test_transcode_video_dib_bit_exact(self, spark):
        from evalidate_spark.functions import avi

        media = multimodal.synth_smooth_videos(spark, n=3)
        out = perceptual.transcode_video(media, "dib").collect()
        raw = {r["media_ref"]: bytes(r["payload"]) for r in media.collect()}
        for r in out:
            assert r["meta"]["transcode"] == "dib"
            a, fa = avi.decode_avi(bytes(r["payload"]))
            b, fb = avi.decode_avi(raw[r["media_ref"]])
            assert fa == fb and all(np.array_equal(x, y) for x, y in zip(a, b))

    def test_transcode_video_skips_non_video(self, spark):
        media = multimodal.synth_media(spark, n=6)  # image/audio rows too
        out = perceptual.transcode_video(media, "mjpeg").collect()
        for r in out:
            want = "mjpeg" if r["media_kind"] == "video" else "skipped"
            assert r["meta"]["transcode"] == want
