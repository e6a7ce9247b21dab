"""Native IO library tests: decode/resize/WAV parity against cv2/scipy."""

import os
import wave

import numpy as np
import pytest

from attention_based_tbn_tpu import native

if not native.ensure_built():
    pytest.skip("native library unavailable", allow_module_level=True)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("imgs") / "test.jpg"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    # smooth it so JPEG loss is small
    img = cv2.GaussianBlur(img, (15, 15), 5)
    cv2.imwrite(str(path), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    return str(path)


class TestJPEG:
    def test_decode_matches_cv2(self, jpeg_file):
        ours = native.decode_jpeg_file(jpeg_file)
        ref = cv2.imread(jpeg_file)  # BGR
        assert ours.shape == ref.shape
        # libjpeg IDCT variants differ by a few LSBs from cv2's
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert np.mean(diff) < 2.0
        assert np.percentile(diff, 99) <= 12

    def test_grayscale(self, jpeg_file):
        ours = native.decode_jpeg_file(jpeg_file, grayscale=True)
        ref = cv2.imread(jpeg_file, 0)
        assert ours.shape == ref.shape
        assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 2.5

    def test_invalid_data(self):
        with pytest.raises(IOError):
            native.decode_jpeg(b"not a jpeg")


class TestResize:
    def test_matches_cv2_inter_linear(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
        ours = native.resize_bilinear(img, 256, 342)
        ref = cv2.resize(img, (342, 256), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # same sampling convention; rounding may differ by 1
        assert np.percentile(diff, 99.9) <= 1

    def test_downscale(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (256, 342), dtype=np.uint8)
        ours = native.resize_bilinear(img, 64, 85)
        ref = cv2.resize(img, (85, 64), interpolation=cv2.INTER_LINEAR)
        assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.5


class TestWav:
    def test_read_and_resample(self, tmp_path):
        sr = 48000
        t = np.arange(sr) / sr
        signal = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        pcm = (signal * 32767).astype("<i2")
        path = tmp_path / "a.wav"
        with wave.open(str(path), "wb") as handle:
            handle.setnchannels(1)
            handle.setsampwidth(2)
            handle.setframerate(sr)
            handle.writeframes(pcm.tobytes())

        out = native.read_wav(str(path), target_sr=24000)
        assert abs(len(out) - 24000) <= 1
        assert out.dtype == np.float32
        # 440 Hz tone survives resampling
        spec = np.abs(np.fft.rfft(out))
        assert abs(np.argmax(spec) - 440) <= 2

    @staticmethod
    def _write_riff(path, chunks):
        """Assemble a RIFF/WAVE file from raw (id, payload) chunks."""
        body = b"WAVE"
        for cid, payload in chunks:
            body += cid + len(payload).to_bytes(4, "little") + payload
            if len(payload) & 1:  # RIFF word alignment pad byte
                body += b"\x00"
        with open(path, "wb") as handle:
            handle.write(b"RIFF" + len(body).to_bytes(4, "little") + body)

    def test_short_fmt_chunk_rejected(self, tmp_path):
        # fmt chunk declaring size 14 (< the 16 bytes of PCM fields) must be
        # rejected, not parsed past the buffer end
        path = tmp_path / "badfmt.wav"
        fmt14 = (
            (1).to_bytes(2, "little")      # PCM
            + (1).to_bytes(2, "little")    # mono
            + (24000).to_bytes(4, "little")
            + (48000).to_bytes(4, "little")
            + (2).to_bytes(2, "little")    # block align — bits field missing
        )
        pcm = (np.zeros(100, "<i2")).tobytes()
        self._write_riff(path, [(b"fmt ", fmt14), (b"data", pcm)])
        with pytest.raises(IOError):
            native.read_wav(str(path), target_sr=24000)

    def test_odd_sized_junk_chunk_skipped(self, tmp_path):
        # an odd-sized unknown chunk before fmt/data must not desync parsing
        path = tmp_path / "junk.wav"
        sr = 24000
        signal = np.full(sr, 0.25, np.float32)
        pcm = (signal * 32767).astype("<i2").tobytes()
        fmt = (
            (1).to_bytes(2, "little")
            + (1).to_bytes(2, "little")
            + sr.to_bytes(4, "little")
            + (2 * sr).to_bytes(4, "little")
            + (2).to_bytes(2, "little")
            + (16).to_bytes(2, "little")
        )
        self._write_riff(
            path, [(b"LIST", b"junk!"), (b"fmt ", fmt), (b"data", pcm)]
        )
        out = native.read_wav(str(path), target_sr=sr)
        assert len(out) == sr
        np.testing.assert_allclose(out, 0.25, atol=1e-3)

    def test_stereo_downmix(self, tmp_path):
        sr = 24000
        left = np.full(sr, 0.5, np.float32)
        right = np.full(sr, -0.5, np.float32)
        inter = np.empty(2 * sr, np.float32)
        inter[0::2], inter[1::2] = left, right
        pcm = (inter * 32767).astype("<i2")
        path = tmp_path / "st.wav"
        with wave.open(str(path), "wb") as handle:
            handle.setnchannels(2)
            handle.setsampwidth(2)
            handle.setframerate(sr)
            handle.writeframes(pcm.tobytes())
        out = native.read_wav(str(path), target_sr=sr)
        np.testing.assert_allclose(out, 0.0, atol=1e-4)


class TestBatchDecode:
    def test_batch_pipeline(self, tmp_path):
        rng = np.random.default_rng(3)
        paths = []
        for i in range(6):
            img = cv2.GaussianBlur(
                rng.integers(0, 255, (300, 400, 3), dtype=np.uint8), (15, 15), 5
            )
            p = tmp_path / f"f{i}.jpg"
            cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
            paths.append(str(p))

        out = native.decode_batch(paths, scale_size=256, crop_size=224,
                                  num_threads=3)
        assert out.shape == (6, 224, 224, 3)

        # reference: cv2 decode -> shorter-side rescale -> center crop
        ref_img = cv2.imread(paths[0])
        h, w = ref_img.shape[:2]
        nh, nw = 256, int(256 * w / h)
        ref = cv2.resize(ref_img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        y0, x0 = (nh - 224) // 2, (nw - 224) // 2
        ref = ref[y0 : y0 + 224, x0 : x0 + 224]
        diff = np.abs(out[0].astype(int) - ref.astype(int))
        assert np.mean(diff) < 3.0

    def test_missing_file(self, tmp_path):
        with pytest.raises(IOError):
            native.decode_batch([str(tmp_path / "missing.jpg")], 256, 224)

    def test_crop_larger_than_scale_fails(self, tmp_path):
        # rescaled short side (64) < crop (224): must be a counted failure,
        # not an out-of-bounds read
        img = np.full((300, 400, 3), 127, np.uint8)
        p = tmp_path / "small.jpg"
        cv2.imwrite(str(p), img)
        with pytest.raises(IOError):
            native.decode_batch([str(p)], scale_size=64, crop_size=224)


class TestWavTruncation:
    def test_truncated_data_chunk_returns_short_not_silence(self, tmp_path):
        """A data chunk whose declared size exceeds the file (interrupted
        copy) must yield only the real samples — resize() zero-fills the
        buffer, and the old code returned the full declared length with a
        fabricated silent tail."""
        sr = 24000
        signal = np.full(sr, 0.5, np.float32)  # constant, no zero samples
        pcm = (signal * 32767).astype("<i2").tobytes()

        path = tmp_path / "trunc.wav"
        with wave.open(str(path), "wb") as handle:
            handle.setnchannels(1)
            handle.setsampwidth(2)
            handle.setframerate(sr)
            handle.writeframes(pcm)
        full_size = path.stat().st_size
        with open(path, "r+b") as handle:
            handle.truncate(full_size - len(pcm) // 2)  # cut half the data

        out = native.read_wav(str(path), target_sr=sr)
        assert len(out) == sr // 2  # the real half, not the declared length
        assert np.all(np.abs(out) > 0.4)  # no zero-filled tail


class TestNativeGate:
    def test_read_audio_sample_honors_native_gate(self, tmp_path, monkeypatch):
        """use_native=False (the tpu.native_io config gate) must route
        around the native reader even when the library is available."""
        from attention_based_tbn_tpu.data import audio as audio_mod

        sr = 24000
        pcm = (np.zeros(sr) * 32767).astype("<i2")
        wav_dir = tmp_path / "audio"
        wav_dir.mkdir()
        with wave.open(str(wav_dir / "P01_01.wav"), "wb") as handle:
            handle.setnchannels(1)
            handle.setsampwidth(2)
            handle.setframerate(sr)
            handle.writeframes(pcm.tobytes())

        def boom(*a, **k):
            raise AssertionError("native reader used despite the gate")

        monkeypatch.setattr(native, "read_wav", boom)
        out = audio_mod.read_audio_sample(
            str(tmp_path), "audio", "P01_01", sampling_rate=sr,
            use_native=False,
        )
        assert out.shape == (sr,)
