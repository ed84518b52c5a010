"""Vendored WAV codec + real audio-decode multimodal stages.

Pins the RIFF/PCM round trip (mono/stereo, all supported widths),
cross-checks both directions against the stdlib ``wave`` module,
exercises proper chunk walking (extra chunks, odd-size padding), and
pins the end-to-end Ray encode->decode pipeline against direct numpy
on the same deterministic samples.
"""

import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.functions.wav import WAV_MAGIC, decode_wav, encode_wav
from search_engine_ray.ops.multimodal import (
    AudioFeatureExtractor, WavEncoder, audio_stats,
)


@pytest.mark.parametrize("shape,rate", [((11,), 8000), ((1,), 44100),
                                        ((64, 2), 16000), ((7, 3), 22050)])
def test_roundtrip(shape, rate):
    rng = np.random.default_rng(sum(shape))
    s = rng.integers(-32768, 32768, shape, dtype=np.int16)
    out, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate
    assert np.array_equal(out.reshape(shape), s)


def test_stdlib_wave_reads_ours():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, (50, 2), dtype=np.int16)
    with wave.open(io.BytesIO(encode_wav(s, 12000)), "rb") as w:
        assert (w.getnchannels(), w.getframerate(), w.getsampwidth()) == (2, 12000, 2)
        frames = np.frombuffer(w.readframes(w.getnframes()), "<i2").reshape(-1, 2)
    assert np.array_equal(frames, s)


def test_we_read_stdlib_wave():
    rng = np.random.default_rng(8)
    s = rng.integers(-32768, 32768, 33, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(s.astype("<i2").tobytes())
    out, rate = decode_wav(buf.getvalue())
    assert rate == 8000 and np.array_equal(out, s)


def test_chunk_walking_skips_unknown_and_pads_odd():
    s = np.array([1, -2, 3], dtype=np.int16)
    base = encode_wav(s, 8000)
    # splice a LIST chunk with an ODD body size between WAVE and fmt
    odd_body = b"INFOx"  # 5 bytes -> needs a pad byte
    extra = b"LIST" + struct.pack("<I", len(odd_body)) + odd_body + b"\x00"
    spliced = base[:12] + extra + base[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out, s)


def test_8bit_and_32bit_pcm():
    raw8 = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVEfmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 3) + raw8 + b"\x00")
    out, _ = decode_wav(WAV_MAGIC + struct.pack("<I", len(body)) + body)
    assert out.tolist() == [-128, 0, 127]  # unsigned recentered

    s32 = np.array([-(2**31), 2**31 - 1, 12345], dtype="<i4")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 32000, 4, 32)
    body = (b"WAVEfmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 12) + s32.tobytes())
    out, _ = decode_wav(WAV_MAGIC + struct.pack("<I", len(body)) + body)
    assert np.array_equal(out, s32)


def test_unsupported_fails_loudly():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"OggS" + b"\x00" * 40)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float PCM
    body = (b"WAVEfmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(WAV_MAGIC + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError, match="16-bit"):
        encode_wav(np.zeros(4, dtype=np.float32))


def _expected_features(text: str) -> dict:
    b = np.frombuffer(text.encode(), np.uint8)
    v = (b.astype(np.int64) - 128) * 256
    return {
        "n_samples": len(b),
        "sample_rate": 8000,
        "channels": 1,
        "duration_ms": len(b) * 1000 // 8000,
        "energy": int((v * v).sum()),
        "zero_crossings": int(np.count_nonzero(v[1:] * v[:-1] < 0)),
    }


def test_extractor_matches_numpy_direct():
    texts = ["hello world", "", "a", "mixed ABC xyz 0189 ~~", "\x01\x7f" * 9]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    enc = WavEncoder()(t)
    got = AudioFeatureExtractor()(enc).to_pydict()
    for i, s in enumerate(texts):
        exp = _expected_features(s)
        for k, want in exp.items():
            assert got[k][i] == want, (k, s)


def test_audio_stats_ray_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq

    texts = ["the quick brown fox", "", "zz top", "x" * 300]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet",
    )
    df = audio_stats(str(tmp_path)).to_pandas().sort_values("doc_id")
    for i, s in enumerate(texts):
        exp = _expected_features(s)
        row = df[df.doc_id == i].iloc[0]
        for k, want in exp.items():
            assert int(row[k]) == want, (k, s)
