"""Native C++ runtime tests: store reader parity with the Python mmap
path, WAV codec round trips."""

import numpy as np
import pytest

from interactive_spectrogram_inpainting_tpu.data.codemap_store import (
    CodemapDataset, CodemapStoreWriter)
from interactive_spectrogram_inpainting_tpu.data.label_encoders import (
    LabelEncoder)
from interactive_spectrogram_inpainting_tpu.data import native


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    directory = tmp_path_factory.mktemp("store")
    rng = np.random.default_rng(0)
    with CodemapStoreWriter(
            directory, top_shape=(4, 2), bottom_shape=(8, 4),
            attribute_fields=["pitch", "instrument_family_str"],
            label_encoders={"pitch": LabelEncoder([60, 61])}) as w:
        for i in range(10):
            w.append(rng.integers(0, 512, (4, 2)),
                     rng.integers(0, 512, (8, 4)),
                     {"pitch": i % 2, "instrument_family_str": i % 3},
                     f"note_{i}")
    return directory


def test_native_library_builds():
    assert native.load_library() is not None, "g++ build failed"


def test_native_reader_matches_python(store):
    ds_native = CodemapDataset(store, use_native=True)
    ds_python = CodemapDataset(store, use_native=False)
    assert ds_native._native is not None, "native reader not engaged"
    idx = [0, 3, 7, 9, 1]
    t_n, b_n, a_n = ds_native.read_batch(idx)
    t_p, b_p, a_p = ds_python.read_batch(idx)
    np.testing.assert_array_equal(t_n, t_p)
    np.testing.assert_array_equal(b_n, b_p)
    for k in a_p:
        np.testing.assert_array_equal(a_n[k], a_p[k])


def test_native_reader_bounds(store):
    ds = CodemapDataset(store, use_native=True)
    if ds._native is None:
        pytest.skip("native unavailable")
    with pytest.raises(IndexError):
        ds._native.read_batch([99])


def test_native_wav_round_trip():
    if native.load_library() is None:
        pytest.skip("native unavailable")
    rng = np.random.default_rng(1)
    audio = np.clip(rng.standard_normal(8000) * 0.3, -0.99,
                    0.99).astype(np.float32)
    blob = native.wav_encode_pcm16(audio, 16000)
    assert blob is not None
    decoded, sr = native.wav_decode(blob)
    assert sr == 16000
    np.testing.assert_allclose(decoded[0], audio, atol=2.0 / 32768)


def test_native_wav_rejects_malformed(tmp_path):
    """Crafted WAVs must fail cleanly (rc<0), never SIGFPE/overread."""
    if native.load_library() is None:
        pytest.skip("native unavailable")
    import struct

    def wav(fmt_payload, data_payload=b"\x00" * 8):
        fmt = b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
        data = b"data" + struct.pack("<I", len(data_payload)) + data_payload
        body = b"WAVE" + fmt + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # bits=0 -> frame_bytes==0 must not divide-by-zero
    zero_bits = wav(struct.pack("<HHIIHH", 1, 1, 16000, 0, 0, 0))
    # truncated fmt chunk (chunk_size says 16 but only 4 bytes present)
    short_fmt = (b"RIFF" + struct.pack("<I", 20) + b"WAVE" +
                 b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00")
    # undersized fmt chunk_size (<16)
    tiny_fmt = wav(struct.pack("<HH", 1, 1))
    # extensible fmt claiming 40 bytes it doesn't have
    ext_fmt = wav(struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16))
    for blob in (zero_bits, short_fmt, tiny_fmt, ext_fmt):
        with pytest.raises(ValueError):
            native.wav_decode(blob)


def test_native_wav_interops_with_python_reader(tmp_path):
    if native.load_library() is None:
        pytest.skip("native unavailable")
    from interactive_spectrogram_inpainting_tpu.data import read_wav, write_wav
    audio = np.sin(np.linspace(0, 100, 4000)).astype(np.float32)
    blob = native.wav_encode_pcm16(audio, 16000)
    (tmp_path / "n.wav").write_bytes(blob)
    loaded, sr = read_wav(str(tmp_path / "n.wav"))
    np.testing.assert_allclose(loaded[0], audio, atol=2.0 / 32768)
    # and the native decoder reads python-written files
    write_wav(tmp_path / "p.wav", audio, 16000)
    decoded, sr = native.wav_decode((tmp_path / "p.wav").read_bytes())
    np.testing.assert_allclose(decoded[0], audio, atol=2.0 / 32768)


def test_python_wav_writer_nan_safe(tmp_path):
    """NaN/inf audio (untrained models) must quantize to silence/clipping,
    not garbage int16 values via an invalid-cast RuntimeWarning."""
    import warnings
    from interactive_spectrogram_inpainting_tpu.data import read_wav, write_wav
    audio = np.array([0.5, np.nan, -np.inf, np.inf, -0.5], np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        write_wav(tmp_path / "nan.wav", audio, 16000)
    loaded, _ = read_wav(str(tmp_path / "nan.wav"))
    np.testing.assert_allclose(
        loaded[0], [0.5, 0.0, -1.0, 1.0, -0.5], atol=2.0 / 32768)
