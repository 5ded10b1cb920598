"""Unit semantics for multimodal plumbing (operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from portfolio_data_pipelines_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    decode_image,
    extract_features,
    media_from_documents,
    sample_frames,
)


def _media(spark, payloads):
    rows = [(i, bytearray(p), "image/fake") for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "media_id bigint, content binary, media_type string")


def test_extract_features_byte_semantics(spark):
    payload = bytes(range(10))  # 0..9
    row = extract_features(_media(spark, [payload])).first()
    assert row["n_bytes"] == 10
    assert row["first_byte"] == 0
    assert row["byte_sum"] == sum(range(10))
    assert row["n_frames"] == 1
    assert row["n_sampled_frames"] == 1


def test_extract_features_empty_payload(spark):
    row = extract_features(_media(spark, [b""])).first()
    assert (row["n_bytes"], row["first_byte"], row["byte_sum"], row["n_frames"]) == (0, -1, 0, 0)


def test_frame_sampling_counts_and_content(spark):
    # 5 frames of FRAME_BYTES → sampled indices 0 and 4 at stride 4.
    payload = bytes(FRAME_BYTES * 5)
    rows = sample_frames(_media(spark, [payload])).orderBy("frame_index").collect()
    assert [r["frame_index"] for r in rows] == [0, FRAME_STRIDE]
    assert all(len(r["frame_bytes"]) == FRAME_BYTES for r in rows)


def test_frame_sampling_partial_tail_frame(spark):
    payload = bytes(FRAME_BYTES + 10)  # 2 frames, second is partial
    rows = sample_frames(_media(spark, [payload])).collect()
    assert len(rows) == 1  # stride 4 samples only frame 0 of 2


def test_media_from_documents_binary_roundtrip(spark):
    docs = spark.createDataFrame(
        [(7, "abc", "en", "s0", 3)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    row = media_from_documents(docs).first()
    assert bytes(row["content"]) == b"abc"
    assert row["media_id"] == 7


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_extract_adds_no_shuffle(spark):
    media = _media(spark, [b"xy"])
    plan = extract_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_resize_media_decimates_payload(spark):
    from portfolio_data_pipelines_spark.operators.multimodal import (
        media_from_documents,
        resize_media,
    )
    from portfolio_data_pipelines_spark.sources.parquet import scan_table

    docs = scan_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    media = media_from_documents(docs)
    out = resize_media(media, scale=4).collect()
    assert len(out) == 20
    for r in out:
        # ceil(orig/4) bytes survive byte-decimation by 4
        assert r["resized_bytes"] == -(-r["orig_bytes"] // 4)
        assert len(r["content"]) == r["resized_bytes"]


def test_decode_stubs_raise_cleanly():
    import pytest

    from portfolio_data_pipelines_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )

    for fn in (decode_image, decode_audio):
        with pytest.raises(NotImplementedError):
            fn(b"\x00\x01")


# ---------------------------------------------------------------------------
# Real decode path: pure-Python PPM / BMP fallback decoders
# ---------------------------------------------------------------------------


def _ppm_bytes(arr) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n# synthetic fixture\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _bmp_bytes(arr) -> bytes:
    """Minimal bottom-up 24-bit BMP encoder (BGR, 4-byte row padding)."""
    import struct

    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = b"".join(
        arr[y, :, ::-1].tobytes() + b"\x00" * (stride - w * 3)
        for y in range(h - 1, -1, -1)
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(rows), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + rows


def _rand_img(seed, h=5, w=7):
    import numpy as np

    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)


def test_ppm_decode_roundtrip():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    img = _rand_img(1)
    assert np.array_equal(decode_image(_ppm_bytes(img)), img)


def test_bmp_decode_roundtrip():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    img = _rand_img(2, h=3, w=5)  # odd width exercises row padding
    assert np.array_equal(decode_image(_bmp_bytes(img)), img)


def test_decode_image_features_real_decode(spark):
    """The decode path runs inside mapInPandas over Arrow batches: decoded
    dims and channel means must equal numpy ground truth, and a corrupt
    payload must yield a decode_error row, not a task failure."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import (
        decode_image_features,
    )

    imgs = {i: _rand_img(i, h=4 + i, w=6) for i in range(3)}
    rows = [(i, _ppm_bytes(img), "image/x-ppm") for i, img in imgs.items()]
    rows.append((3, _bmp_bytes(imgs[0]), "image/bmp"))
    rows.append((4, b"\x89PNG not really", "image/png"))  # undecodable
    media = spark.createDataFrame(
        rows, "media_id bigint, content binary, media_type string"
    )
    got = {r["media_id"]: r for r in decode_image_features(media).collect()}
    for i, img in imgs.items():
        r = got[i]
        assert (r["height"], r["width"]) == img.shape[:2]
        means = img.reshape(-1, 3).mean(axis=0)
        assert np.allclose([r["mean_r"], r["mean_g"], r["mean_b"]], means)
        assert r["decode_error"] is None
    assert got[3]["height"] == imgs[0].shape[0] and got[3]["decode_error"] is None
    assert got[4]["decode_error"] is not None and got[4]["width"] == -1


def _wav_bytes(freq_hz=440.0, rate=8000, n=800, channels=1, width=2):
    """Synthesize a PCM WAV in-memory via stdlib wave."""
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n):
            v = math.sin(2 * math.pi * freq_hz * i / rate)
            for _ in range(channels):
                frames += struct.pack("<h", int(v * 32000))
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_decode_wav_roundtrip():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    samples, rate = decode_audio(_wav_bytes(rate=8000, n=800, channels=2))
    assert rate == 8000
    assert samples.shape == (800, 2)
    assert samples.dtype == np.float32
    assert np.all(np.abs(samples) <= 1.0)
    # A sine at full-ish scale has RMS near 1/sqrt(2).
    assert abs(float(np.sqrt(np.mean(samples**2))) - 0.707) < 0.05


def _wav_container(fmt_tag, n_ch, rate, block_align, bits, data, extra=b""):
    """Raw RIFF/WAVE container for non-PCM format tags."""
    import struct

    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_ch, rate, rate * block_align, block_align, bits
    ) + extra
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) & 1:
        chunks += b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_g711_matches_audioop():
    """Every companded byte value decodes exactly as CPython's G.711
    reference (audioop), for both mu-law and A-law."""
    import numpy as np
    import pytest

    audioop = pytest.importorskip("audioop")

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    all_bytes = bytes(range(256))
    for fmt_tag, conv in [(7, audioop.ulaw2lin), (6, audioop.alaw2lin)]:
        wav = _wav_container(fmt_tag, 1, 8000, 1, 8, all_bytes)
        got, rate = decode_audio(wav)
        assert rate == 8000 and got.shape == (256, 1)
        exp = np.frombuffer(conv(all_bytes, 2), "<i2").astype(np.float32) / 32768.0
        assert np.array_equal(got[:, 0], exp), fmt_tag


def test_decode_wav_g711_known_values():
    """Spot-pins that hold even without audioop: mu-law 0xFF/0x7F are
    +0/-0, 0x00 is -32124; A-law 0xD5/0x55 are +8/-8."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    got, _ = decode_audio(_wav_container(7, 1, 8000, 1, 8, bytes([0xFF, 0x7F, 0x00])))
    assert np.array_equal(got[:, 0] * 32768.0, np.float32([0, 0, -32124]))
    got, _ = decode_audio(_wav_container(6, 1, 8000, 1, 8, bytes([0xD5, 0x55])))
    assert np.array_equal(got[:, 0] * 32768.0, np.float32([8, -8]))


def _ima_encode(samples, n_ch, samples_per_block):
    """Reference IMA ADPCM encoder: simulates the decoder, so its
    internal reconstruction is the decode ground truth."""
    import struct

    from portfolio_data_pipelines_spark.operators.multimodal import (
        _IMA_INDEX_ADJ,
        _IMA_STEPS,
    )

    frames = len(samples) // n_ch
    block_align = 4 * n_ch + (samples_per_block - 1) * n_ch // 2
    out, recon = bytearray(), []
    preds = [0] * n_ch
    idxs = [0] * n_ch
    for b0 in range(0, frames - samples_per_block + 1, samples_per_block):
        for c in range(n_ch):
            preds[c] = samples[b0 * n_ch + c]
            out += struct.pack("<hBB", preds[c], idxs[c], 0)
        recon.extend(samples[b0 * n_ch : b0 * n_ch + n_ch])
        nibbles = {c: [] for c in range(n_ch)}
        for s in range(1, samples_per_block):
            for c in range(n_ch):
                val = samples[(b0 + s) * n_ch + c]
                step = _IMA_STEPS[idxs[c]]
                delta = val - preds[c]
                nib = 8 if delta < 0 else 0
                if delta < 0:
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                # decoder mirror
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                preds[c] = max(-32768, min(32767, preds[c] + (-diff if nib & 8 else diff)))
                idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX_ADJ[nib & 7]))
                nibbles[c].append(nib)
                recon.append(preds[c])
        # serialize: 4-byte chunks per channel, round-robin, low nibble first
        per_chunk = 8
        n_groups = (samples_per_block - 1) // per_chunk
        for g in range(n_groups):
            for c in range(n_ch):
                chunk = nibbles[c][g * per_chunk : (g + 1) * per_chunk]
                for i in range(0, per_chunk, 2):
                    out.append(chunk[i] | (chunk[i + 1] << 4))
    return bytes(out), block_align, recon


def test_decode_wav_ima_adpcm_exact_reconstruction():
    """The IMA encoder simulates the decoder, so decode must equal the
    encoder's internal reconstruction EXACTLY — mono and stereo, with
    multiple blocks and step-index carry between blocks."""
    import math

    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    spb = 17  # 1 header sample + 16 nibbles = two 4-byte chunks/channel
    for n_ch in (1, 2):
        n_frames = spb * 3
        samples = [
            int(20000 * math.sin(2 * math.pi * 440 * (i // n_ch) / 8000))
            + (137 if i % n_ch else 0)
            for i in range(n_frames * n_ch)
        ]
        data, block_align, recon = _ima_encode(samples, n_ch, spb)
        wav = _wav_container(0x11, n_ch, 8000, block_align, 4, data,
                             extra=b"\x02\x00" + spb.to_bytes(2, "little"))
        got, rate = decode_audio(wav)
        assert rate == 8000 and got.shape == (n_frames, n_ch)
        exp = np.array(recon, np.float32).reshape(-1, n_ch) / 32768.0
        assert np.array_equal(got, exp), n_ch
        # and once the step size has adapted (after the first block's
        # slope-overload transient), the lossy reconstruction tracks
        # the source signal
        src = np.array(samples, np.float32).reshape(-1, n_ch) / 32768.0
        assert float(np.abs(got[spb:] - src[spb:]).max()) < 0.15


def test_decode_wav_float_and_24bit():
    import struct

    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    vals = np.float32([0.0, 0.5, -0.25, 1.0, -1.0, 0.125])
    wav = _wav_container(3, 2, 16000, 8, 32, vals.tobytes())
    got, rate = decode_audio(wav)
    assert rate == 16000
    assert np.array_equal(got, vals.reshape(-1, 2))

    ints = [0, 1, -1, 8388607, -8388608, 4242424]
    raw = b"".join(struct.pack("<i", v)[:3] for v in ints)
    got, rate = decode_audio(_wav_container(1, 1, 44100, 3, 24, raw))
    assert np.array_equal(got[:, 0], np.float32(ints) / 8388608.0)


def test_decode_wav_rejects_unknown_format_and_corrupt():
    import pytest

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    with pytest.raises(NotImplementedError, match="format tag"):
        decode_audio(_wav_container(0x55, 1, 8000, 1, 8, b"\x00\x01"))  # MP3-in-WAV
    with pytest.raises(ValueError):
        decode_audio(_wav_container(7, 1, 8000, 1, 8, b"")[:20])  # truncated
    with pytest.raises(ValueError):  # fmt chunk missing
        import struct
        body = b"data" + struct.pack("<I", 2) + b"\x00\x00"
        decode_audio(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def test_decode_audio_rejects_non_wav_without_soundfile():
    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile installed: fallback path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01\x02not-audio")


def test_decode_audio_features_batch(spark):
    from portfolio_data_pipelines_spark.operators.multimodal import (
        decode_audio_features,
    )

    rows = [
        (1, _wav_bytes(rate=8000, n=800, channels=1)),
        (2, _wav_bytes(rate=16000, n=3200, channels=2)),
        (3, b"corrupt-payload"),
    ]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    got = {r.media_id: r for r in decode_audio_features(media).collect()}
    assert got[1].n_frames == 800 and got[1].sample_rate == 8000
    assert abs(got[1].duration_s - 0.1) < 1e-9
    assert got[2].n_channels == 2 and abs(got[2].duration_s - 0.2) < 1e-9
    assert abs(got[1].rms - 0.707) < 0.05
    assert got[3].decode_error is not None and got[3].n_frames == -1


# ---------------------------------------------------------------------------
# Real decode path: pure-stdlib PNG fallback decoder
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


#: Adam7 pass grid (mirrors the decoder's table).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_filter_rows(data, bpp, filters):
    """Forward-filter a byte image (rows of pw*bpp bytes) with explicit
    per-row filter types (0-4) — the exact inverse of the decoder's
    unfilter, so a roundtrip proves every type reconstructs."""
    import numpy as np

    lines, prev = [], np.zeros(data.shape[1], np.int32)
    for y in range(data.shape[0]):
        f, cur = filters[y], data[y].astype(np.int32)
        left = (
            np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            if len(cur) > bpp else np.zeros_like(cur)
        )
        if f == 0:
            filt = cur.copy()
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth
            filt = np.zeros_like(cur)
            for x in range(len(cur)):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b, c = int(prev[x]), (int(prev[x - bpp]) if x >= bpp else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = cur[x] - pr
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return lines


def _png_pack_subbyte(sub, depth):
    """Pack a (ph, pw) sample array into MSB-first scanline bytes
    (ph, ceil(pw*depth/8)) — the spec's only sub-byte layout."""
    import numpy as np

    ph, pw = sub.shape
    per = 8 // depth
    pad = (-pw) % per
    padded = np.pad(sub.astype(np.uint16), ((0, 0), (0, pad)))
    shifts = np.arange(per)[::-1] * depth
    grouped = padded.reshape(ph, -1, per)
    return ((grouped << shifts).sum(axis=2) & 0xFF).astype(np.uint8)


def _png_bytes(arr, color_type=2, filters=None, depth=8, interlace=0, palette=None):
    """Minimal PNG encoder: explicit per-row filter types, sub-byte
    (1/2/4, MSB-first packed), 8- or 16-bit (big-endian) samples,
    optional Adam7 interlacing (each pass filtered independently,
    filters cycling across all sub-image rows)."""
    import itertools
    import struct
    import zlib

    import numpy as np

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    h, w = arr.shape[:2]
    if depth in (1, 2, 4):
        samp = arr.reshape(h, w).astype(np.uint8)
        byte_img, bpp = None, 1
    elif depth == 8:
        byte_img = arr.reshape(h, w, channels).astype(np.uint8)
        bpp = channels
    else:  # 16-bit: big-endian sample pairs
        a16 = arr.reshape(h, w, channels).astype(np.uint16)
        byte_img = np.zeros((h, w, channels * 2), np.uint8)
        byte_img[..., 0::2] = (a16 >> 8).astype(np.uint8)
        byte_img[..., 1::2] = (a16 & 0xFF).astype(np.uint8)
        bpp = channels * 2
    fcycle = itertools.cycle(filters or [0])
    lines = []
    if interlace == 0:
        rows = (
            _png_pack_subbyte(samp, depth)
            if byte_img is None else byte_img.reshape(h, w * bpp)
        )
        lines += _png_filter_rows(rows, bpp, [next(fcycle) for _ in range(h)])
    else:
        for x0, y0, dx, dy in _ADAM7:
            if byte_img is None:
                sub = samp[y0::dy, x0::dx]
                ph, pw = sub.shape
                if ph == 0 or pw == 0:
                    continue
                rows = _png_pack_subbyte(sub, depth)
            else:
                sub = byte_img[y0::dy, x0::dx, :]
                ph, pw = sub.shape[:2]
                if ph == 0 or pw == 0:
                    continue
                rows = sub.reshape(ph, pw * bpp)
            lines += _png_filter_rows(rows, bpp, [next(fcycle) for _ in range(ph)])
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
    return out + _png_chunk(b"IEND", b"")


def test_png_decode_roundtrip_all_filter_types():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    img = _rand_img(7, h=10, w=7)  # 10 rows: every filter type twice
    png = _png_bytes(img, color_type=2, filters=[0, 1, 2, 3, 4] * 2)
    assert np.array_equal(decode_image(png), img)


def test_png_decode_gray_alpha_palette_variants():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rs = np.random.RandomState(11)
    gray = rs.randint(0, 256, (4, 6, 1), dtype=np.uint8)
    got = decode_image(_png_bytes(gray, color_type=0, filters=[0, 1, 2, 3]))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))

    ga = rs.randint(0, 256, (4, 6, 2), dtype=np.uint8)
    got = decode_image(_png_bytes(ga, color_type=4, filters=[4, 3, 2, 1]))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))

    rgba = rs.randint(0, 256, (5, 3, 4), dtype=np.uint8)
    got = decode_image(_png_bytes(rgba, color_type=6, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, rgba[:, :, :3])

    palette = rs.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rs.randint(0, 16, (6, 5, 1), dtype=np.uint8)
    got = decode_image(_png_bytes(idx, color_type=3, palette=palette, filters=[0, 1, 2, 3, 4, 1]))
    assert np.array_equal(got, palette[idx[:, :, 0]])


def test_png_16bit_roundtrip_all_filter_types():
    """16-bit samples are big-endian pairs filtered byte-wise with
    bpp = channels*2; the decoder keeps the MSB (8-bit RGB contract)."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(11)
    rgb16 = rng.randint(0, 65536, (6, 5, 3), dtype=np.uint16)
    got = decode_image(_png_bytes(rgb16, color_type=2, depth=16,
                                  filters=[0, 1, 2, 3, 4, 2]))
    assert np.array_equal(got, (rgb16 >> 8).astype(np.uint8))

    gray16 = rng.randint(0, 65536, (4, 3, 1), dtype=np.uint16)
    got = decode_image(_png_bytes(gray16, color_type=0, depth=16,
                                  filters=[4, 3, 2, 1]))
    exp = np.repeat((gray16 >> 8).astype(np.uint8), 3, axis=2)
    assert np.array_equal(got, exp)

    rgba16 = rng.randint(0, 65536, (3, 4, 4), dtype=np.uint16)
    got = decode_image(_png_bytes(rgba16, color_type=6, depth=16,
                                  filters=[1, 4, 3]))
    assert np.array_equal(got, (rgba16[:, :, :3] >> 8).astype(np.uint8))


def test_png_adam7_interlace_roundtrip():
    """Adam7: 7 independently-filtered sub-images reassembled on the
    pass grid — exercised at sizes that hit every pass shape, including
    images small enough that whole passes are empty."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    for seed, (h, w) in enumerate([(8, 8), (9, 10), (3, 3), (1, 1), (2, 16)]):
        img = _rand_img(20 + seed, h=h, w=w)
        png = _png_bytes(img, color_type=2, interlace=1,
                         filters=[0, 1, 2, 3, 4])
        assert np.array_equal(decode_image(png), img), (h, w)

    # interlace + alpha and interlace + palette
    rng = np.random.RandomState(31)
    rgba = rng.randint(0, 256, (7, 6, 4), dtype=np.uint8)
    got = decode_image(_png_bytes(rgba, color_type=6, interlace=1,
                                  filters=[2, 4]))
    assert np.array_equal(got, rgba[:, :, :3])
    palette = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (9, 9, 1), dtype=np.uint8)
    got = decode_image(_png_bytes(idx, color_type=3, palette=palette,
                                  interlace=1, filters=[3, 1, 0]))
    assert np.array_equal(got, palette[idx[:, :, 0]])


def test_png_adam7_16bit_combined_roundtrip():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(41)
    img16 = rng.randint(0, 65536, (10, 9, 3), dtype=np.uint16)
    png = _png_bytes(img16, color_type=2, depth=16, interlace=1,
                     filters=[4, 2, 1, 3, 0])
    assert np.array_equal(decode_image(png), (img16 >> 8).astype(np.uint8))


def test_png_subbyte_gray_roundtrip_all_depths():
    """Depths 1/2/4 gray: MSB-first packed samples, filters at byte
    granularity (bpp=1), exact 8-bit rescale (2^d - 1 divides 255).
    Widths chosen to leave partial trailing bytes in every depth."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(51)
    for depth, w in [(1, 13), (2, 9), (4, 5)]:
        maxval = (1 << depth) - 1
        samp = rng.randint(0, maxval + 1, (6, w, 1), dtype=np.uint8)
        png = _png_bytes(samp, color_type=0, depth=depth,
                         filters=[0, 1, 2, 3, 4, 2])
        exp = np.repeat(samp * (255 // maxval), 3, axis=2)
        assert np.array_equal(decode_image(png), exp), depth


def test_png_subbyte_palette_roundtrip():
    """Depths 1/2/4 palette: packed indexes map through PLTE unscaled."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(52)
    for depth, w in [(1, 11), (2, 7), (4, 6)]:
        ncolors = 1 << depth
        palette = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
        idx = rng.randint(0, ncolors, (5, w, 1), dtype=np.uint8)
        png = _png_bytes(idx, color_type=3, depth=depth, palette=palette,
                         filters=[0, 1, 2, 3, 4])
        assert np.array_equal(decode_image(png), palette[idx[:, :, 0]]), depth


def test_png_subbyte_adam7_interlace_roundtrip():
    """Sub-byte + Adam7: each pass packs its own scanlines, so byte
    boundaries reset per pass — sizes hit ragged pass widths."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(53)
    for depth, (h, w) in [(1, (9, 17)), (2, (10, 9)), (4, (3, 3))]:
        maxval = (1 << depth) - 1
        samp = rng.randint(0, maxval + 1, (h, w, 1), dtype=np.uint8)
        png = _png_bytes(samp, color_type=0, depth=depth, interlace=1,
                         filters=[0, 1, 2, 3, 4])
        exp = np.repeat(samp * (255 // maxval), 3, axis=2)
        assert np.array_equal(decode_image(png), exp), depth


def test_png_decode_rejects_unsupported_and_corrupt():
    import numpy as np
    import pytest

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    import struct
    import zlib

    img = _rand_img(8, h=3, w=3)
    # sub-byte depths are only legal for gray/palette color types
    ihdr_rgb4 = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    bad_rgb4 = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr_rgb4)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="sub-byte"):
        decode_image(bad_rgb4)
    # ...and palette tops out at depth 8 (16 is illegal per spec)
    pal = np.zeros((2, 3), np.uint8)
    with pytest.raises(ValueError, match="palette"):
        decode_image(_png_bytes(
            np.zeros((2, 2, 1), np.uint16), color_type=3, palette=pal, depth=16
        ))
    # depth-4 scanline with too few packed bytes for the declared dims
    ihdr4 = struct.pack(">IIBBBBB", 4, 2, 4, 0, 0, 0, 0)
    short4 = (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr4)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_image(short4)
    good = _png_bytes(img)
    with pytest.raises(ValueError):  # truncated mid-IDAT: payload shorter than length
        decode_image(good[: good.index(b"IDAT") + 6])
    # corrupt IDAT: flip a byte inside the zlib stream
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_image(bytes(bad))
    palette = np.zeros((2, 3), np.uint8)
    idx = np.full((2, 2, 1), 9, np.uint8)  # index beyond palette
    with pytest.raises(ValueError):
        decode_image(_png_bytes(idx, color_type=3, palette=palette))


def test_decode_image_features_png_in_spark(spark):
    """PNG payloads through the Arrow-batched mapInPandas path: decoded
    dims/means match numpy ground truth; a corrupt PNG yields a
    decode_error row, never a task failure."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import (
        decode_image_features,
    )

    imgs = {i: _rand_img(20 + i, h=5 + i, w=4) for i in range(3)}
    rows = [
        (i, _png_bytes(img, filters=[i % 5] * (5 + i)), "image/png")
        for i, img in imgs.items()
    ]
    good = _png_bytes(imgs[0])
    rows.append((9, good[: good.index(b"IDAT") + 6], "image/png"))  # truncated
    media = spark.createDataFrame(
        rows, "media_id bigint, content binary, media_type string"
    )
    got = {r["media_id"]: r for r in decode_image_features(media).collect()}
    for i, img in imgs.items():
        r = got[i]
        assert (r["height"], r["width"]) == img.shape[:2]
        assert np.allclose(
            [r["mean_r"], r["mean_g"], r["mean_b"]], img.reshape(-1, 3).mean(axis=0)
        )
        assert r["decode_error"] is None
    assert got[9]["decode_error"] is not None and got[9]["width"] == -1


# ---------------------------------------------------------------------------
# Real decode path: pure-stdlib GIF fallback decoder
# ---------------------------------------------------------------------------


def _gif_lzw_literals(indices, m):
    """Valid GIF LZW stream of pure literal codes at fixed width m+1,
    with a CLEAR before the decoder's table would force a width bump —
    the classic 'uncompressed GIF' encoding."""
    clear, end = 1 << m, (1 << m) + 1
    width, safe = m + 1, (1 << m) - 2
    codes = []
    for i, k in enumerate(indices):
        if i % safe == 0:
            codes.append(clear)
        codes.append(int(k))
    codes.append(end)
    out, acc, nacc = bytearray(), 0, 0
    for c in codes:
        acc |= c << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_bytes(idx, palette, interlaced=False, with_extension=False):
    """Minimal GIF89a encoder: global color table, optional interlace
    (rows stored in 4-pass order), optional graphic-control extension."""
    import struct

    import numpy as np

    h, w = idx.shape
    bits = max(1, (len(palette) - 1).bit_length())
    m = max(2, bits)
    table = np.zeros((1 << bits, 3), np.uint8)
    table[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    if with_extension:  # graphic control ext: must be skipped by decoder
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    rows = idx
    ipacked = 0
    if interlaced:
        order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
        rows = idx[order]
        ipacked |= 0x40
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    out += bytes([m])
    stream = _gif_lzw_literals(rows.flatten(), m)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _pal_img(seed, h=6, w=5, ncolors=16):
    import numpy as np

    rs = np.random.RandomState(seed)
    palette = rs.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rs.randint(0, ncolors, (h, w), dtype=np.uint8)
    return idx, palette


def test_gif_decode_roundtrip():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    idx, palette = _pal_img(31)
    assert np.array_equal(decode_image(_gif_bytes(idx, palette)), palette[idx])
    # with a skipped extension block in front of the image descriptor
    assert np.array_equal(
        decode_image(_gif_bytes(idx, palette, with_extension=True)), palette[idx]
    )
    # small palette (4 colors → 2-bit codes, the GIF minimum)
    idx4, pal4 = _pal_img(32, ncolors=4)
    assert np.array_equal(decode_image(_gif_bytes(idx4, pal4)), pal4[idx4])
    # wide image: literal stream spans several 255-byte sub-blocks and
    # several CLEAR-separated chunks
    idxw, palw = _pal_img(33, h=20, w=40, ncolors=256)
    assert np.array_equal(decode_image(_gif_bytes(idxw, palw)), palw[idxw])


def test_gif_decode_interlaced():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    idx, palette = _pal_img(34, h=13, w=4)  # odd height exercises pass bounds
    got = decode_image(_gif_bytes(idx, palette, interlaced=True))
    assert np.array_equal(got, palette[idx])


def test_gif_decode_rejects_corrupt():
    import pytest

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    idx, palette = _pal_img(35)
    good = _gif_bytes(idx, palette)
    with pytest.raises(ValueError):  # truncated mid-stream
        decode_image(good[: len(good) // 2])
    bad = bytearray(good)
    bad[-10] ^= 0x55  # corrupt LZW bits → code beyond table / wrong count
    with pytest.raises(ValueError):
        decode_image(bytes(bad))


def test_real_lzw_compression_decodes():
    """Not just the literal encoding: a hand-built stream that exercises
    table references and the KwKwK case. m=2, sequence built from the
    worked example semantics: literals then a table-entry reference."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import _gif_lzw_decode

    # codes: CLEAR, 1, 2, 6 (= entry [1,2] added by the 2nd code), END
    m = 2
    clear, end = 4, 5
    width = 3
    codes = [clear, 1, 2, 6, end]
    acc = nacc = 0
    data = bytearray()
    for c in codes:
        acc |= c << nacc
        nacc += width
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    assert _gif_lzw_decode(bytes(data), m, 4) == [1, 2, 1, 2]
    # KwKwK: CLEAR, 1, 6 → 6 == next table slot → prev+prev[0] = [1,1]
    codes = [clear, 1, 6, end]
    acc = nacc = 0
    data = bytearray()
    for c in codes:
        acc |= c << nacc
        nacc += width
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    assert _gif_lzw_decode(bytes(data), m, 3) == [1, 1, 1]


# ---------------------------------------------------------------------------
# JPEG: minimal baseline encoder (forward transform of the decoder) and
# roundtrip / rejection tests.
# ---------------------------------------------------------------------------

#: Single-length canonical tables: 12 DC symbols at 4 bits, 162 AC
#: symbols at 8 bits — valid Kraft, exercises real DHT parsing without
#: embedding Annex K.
_JPEG_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_SYMBOLS = list(range(12))
#: 12-bit variants: DC diff categories reach 15 and AC sizes reach 14
#: (T.81 F.1.2.1 extended ranges); Kraft-valid without the all-ones code.
_JPEG_DC12_SYMBOLS = list(range(16))
_JPEG_DC12_COUNTS = [0, 0, 0, 14, 2] + [0] * 11
_JPEG_AC12_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | sz for r in range(16) for sz in range(1, 15)
]
_JPEG_AC12_COUNTS = [0] * 7 + [len(_JPEG_AC12_SYMBOLS)] + [0] * 8
_JPEG_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_JPEG_AC_COUNTS = [0] * 7 + [len(_JPEG_AC_SYMBOLS)] + [0] * 8


def _jpeg_codes(counts, symbols):
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _JpegWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nacc = 0, 0

    def flush(self):
        while self.nacc:
            self.put(1, 1)  # pad with 1-bits
        return bytes(self.out)


def _jpeg_encode_block(w, block, q, pred, dc_codes, ac_codes, zigzag, dctm,
                       half=128.0):
    import numpy as np

    coef = dctm @ (block.astype(np.float64) - half) @ dctm.T
    czz = np.round(coef.reshape(64)[list(zigzag)] / np.array(q, np.float64))
    czz = czz.astype(int)
    diff = czz[0] - pred

    def magnitude(v):
        t = int(abs(v)).bit_length()
        bits = v if v >= 0 else v + (1 << t) - 1
        return t, bits

    t, bits = magnitude(diff)
    ln, code = dc_codes[t]
    w.put(code, ln)
    if t:
        w.put(bits, t)
    run = 0
    for k in range(1, 64):
        v = czz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = ac_codes[0xF0]
            w.put(code, ln)
            run -= 16
        t, bits = magnitude(int(v))
        ln, code = ac_codes[(run << 4) | t]
        w.put(code, ln)
        w.put(bits, t)
        run = 0
    if run:
        ln, code = ac_codes[0x00]
        w.put(code, ln)
    return czz[0]


def _jpeg_bytes(planes, sampling, qval=1, restart=0, scan_mode="interleaved",
                precision=8):
    """Baseline JPEG from component planes (gray: [Y]; color:
    [Y, Cb, Cr] at full resolution — chroma is box-subsampled by the
    sampling factors). ``sampling`` is (h, v) for Y; chroma is (1, 1).
    ``precision=12`` writes an extended-sequential (SOF1) stream with
    0..4095 samples, 2048 level shift, and the extended-range Huffman
    tables."""
    import struct

    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_dct_matrix,
    )

    dctm = _jpeg_dct_matrix()
    q = [qval] * 64
    if precision == 12:
        dc_counts, dc_syms = _JPEG_DC12_COUNTS, _JPEG_DC12_SYMBOLS
        ac_counts, ac_syms = _JPEG_AC12_COUNTS, _JPEG_AC12_SYMBOLS
    else:
        dc_counts, dc_syms = _JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS
        ac_counts, ac_syms = _JPEG_AC_COUNTS, _JPEG_AC_SYMBOLS
    half = float(1 << (precision - 1))
    dc_codes = _jpeg_codes(dc_counts, dc_syms)
    ac_codes = _jpeg_codes(ac_counts, ac_syms)
    h, w_ = planes[0].shape
    ncomp = len(planes)
    hy, vy = sampling if ncomp == 3 else (1, 1)
    hmax, vmax = (hy, vy) if ncomp == 3 else (1, 1)
    mcux = -(-w_ // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def pad(p, ph, pw):
        out = np.zeros((ph, pw), p.dtype)
        out[: p.shape[0], : p.shape[1]] = p
        # edge-replicate padding keeps block DC stable
        out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    comp_planes = []
    factors = []
    for i, p in enumerate(planes):
        if ncomp == 3 and i > 0:
            p = p[::vy, ::hy]  # box subsample (top-left)
            factors.append((1, 1))
        else:
            factors.append((hy, vy) if ncomp == 3 else (1, 1))
        fh, fv = factors[-1]
        comp_planes.append(pad(p, mcuy * 8 * fv, mcux * 8 * fh))

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes(q)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", precision, h, w_, ncomp)
    for i in range(ncomp):
        fh, fv = factors[i]
        sof += bytes([i + 1, (fh << 4) | fv, 0])
    sof_marker = b"\xff\xc1" if precision == 12 else b"\xff\xc0"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms)
    dht += bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    if scan_mode == "separate":
        # one non-interleaved scan per component, over the component's
        # own (unpadded) block grid
        for i in range(ncomp):
            sos = bytes([1, i + 1, 0x00, 0, 63, 0])
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            fh, fv = factors[i]
            comp_w = -(-w_ * fh // hmax)
            comp_h = -(-h * fv // vmax)
            bw, bh = -(-comp_w // 8), -(-comp_h // 8)
            writer = _JpegWriter()
            pred = 0
            for m in range(bw * bh):
                my, mx = divmod(m, bw)
                block = comp_planes[i][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                pred = _jpeg_encode_block(
                    writer, block, q, pred, dc_codes, ac_codes,
                    _JPEG_ZIGZAG, dctm, half=half,
                )
            out += writer.flush()
        out += b"\xff\xd9"
        return bytes(out)

    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _JpegWriter()
    preds = [0] * ncomp
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            out += writer.flush()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            writer = _JpegWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for i in range(ncomp):
            fh, fv = factors[i]
            for by in range(fv):
                for bx in range(fh):
                    y0 = (my * fv + by) * 8
                    x0 = (mx * fh + bx) * 8
                    block = comp_planes[i][y0 : y0 + 8, x0 : x0 + 8]
                    preds[i] = _jpeg_encode_block(
                        writer, block, q, preds[i], dc_codes, ac_codes,
                        _JPEG_ZIGZAG, dctm, half=half,
                    )
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


#: Progressive AC table: the sequential symbols plus EOBn (r<<4 | 0 for
#: r = 1..14) — 176 symbols at 8 bits, Kraft-valid.
_JPEG_ACP_SYMBOLS = _JPEG_AC_SYMBOLS + [(r << 4) for r in range(1, 15)]
_JPEG_ACP_COUNTS = [0] * 7 + [len(_JPEG_ACP_SYMBOLS)] + [0] * 8


def _jpeg_magnitude(v):
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _jpeg_progressive_bytes(planes, sampling, qval=1, dc_al=1, ac_al=2,
                            bands=((1, 5), (6, 63)), restart=0):
    """Progressive JPEG (SOF2) from component planes — the forward
    transform of the decoder's progressive path. Scan script: DC first
    (interleaved, Al=dc_al) + DC refinements to 0; per component and
    spectral band, AC first (Al=ac_al) + AC refinements to 0 with
    EOB-run and libjpeg correction-bit buffering. ``restart`` applies
    to the DC scans (resets predictors and emits RSTn)."""
    import struct

    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_dct_matrix,
    )

    dctm = _jpeg_dct_matrix()
    q = np.array([qval] * 64, np.float64)
    dc_codes = _jpeg_codes(_JPEG_DC_COUNTS, _JPEG_DC_SYMBOLS)
    ac_codes = _jpeg_codes(_JPEG_ACP_COUNTS, _JPEG_ACP_SYMBOLS)
    h, w_ = planes[0].shape
    ncomp = len(planes)
    hy, vy = sampling if ncomp == 3 else (1, 1)
    hmax, vmax = (hy, vy) if ncomp == 3 else (1, 1)
    mcux, mcuy = -(-w_ // (8 * hmax)), -(-h // (8 * vmax))

    def pad(p, ph, pw):
        out = np.zeros((ph, pw), p.dtype)
        out[: p.shape[0], : p.shape[1]] = p
        out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    factors, czz = [], []  # per comp: (nby, nbx, 64) quantized zig-zag ints
    for i, p in enumerate(planes):
        if ncomp == 3 and i > 0:
            p = p[::vy, ::hy]
            factors.append((1, 1))
        else:
            factors.append((hy, vy) if ncomp == 3 else (1, 1))
        fh, fv = factors[-1]
        pp = pad(p, mcuy * 8 * fv, mcux * 8 * fh)
        nby, nbx = mcuy * fv, mcux * fh
        arr = np.zeros((nby, nbx, 64), np.int64)
        for by in range(nby):
            for bx in range(nbx):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = dctm @ (blk.astype(np.float64) - 128.0) @ dctm.T
                arr[by, bx] = np.round(
                    coef.reshape(64)[list(_JPEG_ZIGZAG)] / q
                ).astype(np.int64)
        czz.append(arr)

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0]) + bytes([qval] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, h, w_, ncomp)
    for i in range(ncomp):
        fh, fv = factors[i]
        sof += bytes([i + 1, (fh << 4) | fv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + bytes(_JPEG_DC_SYMBOLS)
    dht += bytes([0x10]) + bytes(_JPEG_ACP_COUNTS) + bytes(_JPEG_ACP_SYMBOLS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    def sos_header(comp_ids, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # --- DC first scan (interleaved over all comps, Al = dc_al) ---
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 0, dc_al)
    w = _JpegWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            w = _JpegWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for i in range(ncomp):
            fh, fv = factors[i]
            for by in range(fv):
                for bx in range(fh):
                    v = int(czz[i][my * fv + by, mx * fh + bx, 0]) >> dc_al
                    t, b = _jpeg_magnitude(v - preds[i])
                    preds[i] = v
                    ln, code = dc_codes[t]
                    w.put(code, ln)
                    if t:
                        w.put(b, t)
    out += w.flush()

    # --- DC refinement scans (one bit per block, Al descending) ---
    for al in range(dc_al - 1, -1, -1):
        out += sos_header(list(range(1, ncomp + 1)), 0, 0, al + 1, al)
        w = _JpegWriter()
        rst = 0
        for m in range(mcux * mcuy):
            if restart and m and m % restart == 0:
                out += w.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                w = _JpegWriter()
            my, mx = divmod(m, mcux)
            for i in range(ncomp):
                fh, fv = factors[i]
                for by in range(fv):
                    for bx in range(fh):
                        w.put((int(czz[i][my * fv + by, mx * fh + bx, 0]) >> al) & 1, 1)
        out += w.flush()

    # --- AC scans: per component, per band; first pass then refinements ---
    for i in range(ncomp):
        fh, fv = factors[i]
        comp_w, comp_h = -(-w_ * fh // hmax), -(-h * fv // vmax)
        nbx, nby = -(-comp_w // 8), -(-comp_h // 8)
        blocks = [czz[i][m // nbx, m % nbx] for m in range(nbx * nby)]
        for ss, se in bands:
            # first pass at Al = ac_al
            out += sos_header([i + 1], ss, se, 0, ac_al)
            w = _JpegWriter()
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    rr = eobrun.bit_length() - 1
                    ln, code = ac_codes[rr << 4]
                    w.put(code, ln)
                    if rr:
                        w.put(eobrun - (1 << rr), rr)
                    eobrun = 0

            rst = 0
            for m, blk in enumerate(blocks):
                if restart and m and m % restart == 0:
                    flush_eob()
                    out += w.flush()
                    out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    w = _JpegWriter()
                vals = {
                    k: (abs(int(blk[k])) >> ac_al)
                    * (1 if blk[k] >= 0 else -1)
                    for k in range(ss, se + 1)
                }
                nz = [k for k in range(ss, se + 1) if vals[k]]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for k in range(ss, nz[-1] + 1):
                    v = vals[k]
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        ln, code = ac_codes[0xF0]
                        w.put(code, ln)
                        run -= 16
                    t, b = _jpeg_magnitude(v)
                    ln, code = ac_codes[(run << 4) | t]
                    w.put(code, ln)
                    w.put(b, t)
                    run = 0
                if nz[-1] < se:
                    eobrun += 1
            flush_eob()
            out += w.flush()

            # refinement passes Al = ac_al-1 .. 0
            for al in range(ac_al - 1, -1, -1):
                out += sos_header([i + 1], ss, se, al + 1, al)
                w = _JpegWriter()
                eobrun, bebuf = 0, []

                def flush_eob_r():
                    nonlocal eobrun, bebuf
                    if eobrun:
                        rr = eobrun.bit_length() - 1
                        ln, code = ac_codes[rr << 4]
                        w.put(code, ln)
                        if rr:
                            w.put(eobrun - (1 << rr), rr)
                        for bit in bebuf:
                            w.put(bit, 1)
                        bebuf = []
                        eobrun = 0

                rst = 0
                for m, blk in enumerate(blocks):
                    if restart and m and m % restart == 0:
                        flush_eob_r()
                        out += w.flush()
                        out += bytes([0xFF, 0xD0 + (rst & 7)])
                        rst += 1
                        w = _JpegWriter()
                    absv = {k: abs(int(blk[k])) >> al for k in range(ss, se + 1)}
                    eobpos = max(
                        (k for k in range(ss, se + 1) if absv[k] == 1),
                        default=ss - 1,
                    )
                    run, br = 0, []
                    for k in range(ss, se + 1):
                        t = absv[k]
                        if t == 0:
                            run += 1
                            continue
                        if t > 1:
                            br.append(t & 1)
                            continue
                        # newly nonzero
                        while run > 15 and k <= eobpos:
                            flush_eob_r()
                            ln, code = ac_codes[0xF0]
                            w.put(code, ln)
                            run -= 16
                            for bit in br:
                                w.put(bit, 1)
                            br = []
                        flush_eob_r()
                        ln, code = ac_codes[(run << 4) | 1]
                        w.put(code, ln)
                        w.put(1 if blk[k] > 0 else 0, 1)
                        for bit in br:
                            w.put(bit, 1)
                        br = []
                        run = 0
                    if run > 0 or br:
                        eobrun += 1
                        bebuf += br
                        if eobrun == 0x7FFF or len(bebuf) > 900:
                            flush_eob_r()
                flush_eob_r()
                out += w.flush()

    out += b"\xff\xd9"
    return bytes(out)


def _ycbcr_to_rgb_ref(y, cb, cr):
    import numpy as np

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def test_jpeg_gray_roundtrip_near_exact():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 24), dtype=np.uint8)
    got = decode_image(_jpeg_bytes([img.astype(np.float64)], (1, 1)))
    assert got.shape == (16, 24, 3)
    # quant table of 1s → only DCT rounding noise survives
    err = np.abs(got[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2, err.max()
    assert np.array_equal(got[:, :, 0], got[:, :, 1])


def test_jpeg_gray_non_multiple_of_8_dims():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (11, 13), dtype=np.uint8)
    got = decode_image(_jpeg_bytes([img.astype(np.float64)], (1, 1)))
    assert got.shape == (11, 13, 3)
    err = np.abs(got[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2


def test_jpeg_color_420_roundtrip():
    """4:2:0: chroma constant per 2×2 so box-subsample+replicate is
    lossless; only DCT rounding noise remains."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(7)
    h, w = 18, 22
    y = rng.randint(0, 256, (h, w)).astype(np.float64)
    cb = np.repeat(np.repeat(rng.randint(0, 256, (h // 2 + 1, w // 2 + 1)), 2, 0), 2, 1)[:h, :w].astype(np.float64)
    cr = np.repeat(np.repeat(rng.randint(0, 256, (h // 2 + 1, w // 2 + 1)), 2, 0), 2, 1)[:h, :w].astype(np.float64)
    got = decode_image(_jpeg_bytes([y, cb, cr], (2, 2)))
    exp = _ycbcr_to_rgb_ref(y, cb, cr)
    err = np.abs(got.astype(int) - exp.astype(int))
    assert got.shape == exp.shape
    assert err.max() <= 6, err.max()  # Y and chroma rounding compound


def test_jpeg_color_444_roundtrip():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(8)
    h, w = 8, 16
    y, cb, cr = (rng.randint(0, 256, (h, w)).astype(np.float64) for _ in range(3))
    got = decode_image(_jpeg_bytes([y, cb, cr], (1, 1)))
    exp = _ycbcr_to_rgb_ref(y, cb, cr)
    assert np.abs(got.astype(int) - exp.astype(int)).max() <= 6


def test_jpeg_restart_markers():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (16, 32), dtype=np.uint8).astype(np.float64)
    plain = decode_image(_jpeg_bytes([img], (1, 1)))
    with_rst = decode_image(_jpeg_bytes([img], (1, 1), restart=2))
    assert np.array_equal(plain, with_rst)


def test_jpeg_quantization_path():
    """A non-trivial quant table: reconstruction is lossy but close for
    a smooth image, and the dequant multiply is actually exercised."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    xx, yy = np.meshgrid(np.arange(24), np.arange(16))
    img = (128 + 60 * np.sin(xx / 5.0) * np.cos(yy / 4.0)).astype(np.float64)
    got = decode_image(_jpeg_bytes([img], (1, 1), qval=16))
    err = np.abs(got[:, :, 0].astype(np.float64) - img)
    assert err.mean() <= 8.0, err.mean()


def test_jpeg_progressive_gray_matches_baseline_exactly():
    """Progressive and baseline streams carry identical quantized
    coefficients, and both decode through the same IDCT — so the
    outputs must be bit-identical, at every successive-approximation
    depth."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(61)
    img = rng.randint(0, 256, (21, 18)).astype(np.float64)
    base = decode_image(_jpeg_bytes([img], (1, 1)))
    for dc_al, ac_al in [(0, 0), (1, 2), (2, 3)]:
        prog = _jpeg_progressive_bytes([img], (1, 1), dc_al=dc_al, ac_al=ac_al)
        assert np.array_equal(decode_image(prog), base), (dc_al, ac_al)


def test_jpeg_progressive_color_420_matches_baseline():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(62)
    y = rng.randint(0, 256, (19, 22)).astype(np.float64)
    cb = rng.randint(0, 256, (19, 22)).astype(np.float64)
    cr = rng.randint(0, 256, (19, 22)).astype(np.float64)
    base = decode_image(_jpeg_bytes([y, cb, cr], (2, 2)))
    prog = _jpeg_progressive_bytes([y, cb, cr], (2, 2), dc_al=1, ac_al=2,
                                   bands=((1, 9), (10, 35), (36, 63)))
    assert np.array_equal(decode_image(prog), base)


def test_jpeg_progressive_eob_runs_and_flat_blocks():
    """Mostly-flat image: whole bands are zero across many consecutive
    blocks, so EOBn codes with n > 1 and the refinement correction-bit
    buffer both genuinely fire."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    img = np.full((40, 40), 128.0)
    img[3, 5] = 200.0  # one busy block among many flat ones
    img[25, 30] = 60.0
    base = decode_image(_jpeg_bytes([img], (1, 1)))
    prog = _jpeg_progressive_bytes([img], (1, 1), dc_al=1, ac_al=1)
    assert np.array_equal(decode_image(prog), base)


def test_jpeg_progressive_dc_restart_markers():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(63)
    img = rng.randint(0, 256, (24, 32)).astype(np.float64)
    base = decode_image(_jpeg_bytes([img], (1, 1)))
    prog = _jpeg_progressive_bytes([img], (1, 1), dc_al=1, ac_al=1, restart=3)
    assert np.array_equal(decode_image(prog), base)


def test_jpeg_progressive_rejects_out_of_range_spectral_band():
    """A fuzzed SOS with Se > 63 must raise ValueError (caught by the
    Spark decode_error path), never IndexError."""
    import numpy as np
    import pytest

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    img = np.random.RandomState(3).randint(0, 256, (8, 8)).astype(np.float64)
    prog = bytearray(_jpeg_progressive_bytes([img], (1, 1), dc_al=0, ac_al=0,
                                             bands=((1, 63),)))
    # the AC scan's SOS: find its header (Ss=1, Se=63) and corrupt Se
    i = prog.find(bytes([0xFF, 0xDA]))          # DC scan SOS
    i = prog.find(bytes([0xFF, 0xDA]), i + 2)   # AC scan SOS
    assert i > 0
    # SOS layout: FFDA len(2) ns [cs tables] Ss Se AhAl
    se_pos = i + 4 + 1 + 2 + 1
    assert prog[se_pos] == 63
    prog[se_pos] = 100
    with pytest.raises(ValueError, match="spectral"):
        decode_image(bytes(prog))


def test_ima_adpcm_truncated_final_block_and_fact_trim():
    """A data chunk whose last block is cut mid-way decodes every
    complete nibble group and drops the fragment; a fact chunk trims
    padded trailing samples to the true frame count."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    spb = 17
    samples = [(i * 37) % 1000 - 500 for i in range(spb * 2)]
    data, block_align, recon = _ima_encode(samples, 1, spb)
    # cut the final block after its header + one 4-byte nibble group:
    # 9 samples of its 17 survive (1 header + 8 nibbles)
    cut = block_align + 4 + 4
    wav = _wav_container(0x11, 1, 8000, block_align, 4, data[:cut])
    got, _ = decode_audio(wav)
    exp = np.array(recon[: spb + 9], np.float32).reshape(-1, 1) / 32768.0
    assert np.array_equal(got, exp)
    # fact chunk: claim only 20 true frames of the 34 decoded
    import struct
    fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", 20)
    full = _wav_container(0x11, 1, 8000, block_align, 4, data)
    # splice the fact chunk before the data chunk
    di = full.index(b"data")
    wav2 = full[:di] + fact + full[di:]
    wav2 = wav2[:4] + struct.pack("<I", len(wav2) - 8) + wav2[8:]
    got2, _ = decode_audio(wav2)
    assert got2.shape == (20, 1)
    assert np.array_equal(got2, np.array(recon[:20], np.float32).reshape(-1, 1) / 32768.0)


def test_jpeg_rejects_progressive_and_corrupt():
    import struct

    import numpy as np
    import pytest

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    img = np.zeros((8, 8), np.float64)
    good = _jpeg_bytes([img], (1, 1))
    # a baseline stream mislabeled SOF2: its sequential scan header
    # (Ss=0, Se=63) is illegal for a progressive DC scan
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="spectral"):
        decode_image(prog)
    # arithmetic-coded frames stay honestly stubbed
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError):
        decode_image(arith)
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_image(good[: len(good) // 2])
    # garbage after SOI
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8garbage not a jpeg")
    # missing SOS/SOF
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xd9")
    # 12-bit baseline is ILLEGAL per the spec (12-bit lives in
    # extended/progressive frames, which this decoder now handles)
    sof12 = bytearray(good)
    i = sof12.index(b"\xff\xc0")
    sof12[i + 4] = 12
    with pytest.raises(ValueError, match="baseline"):
        decode_image(bytes(sof12))
    # unsupported precision on an extended frame stays an honest stub
    sof16 = bytearray(good)
    sof16[i + 1] = 0xC1
    sof16[i + 4] = 16
    with pytest.raises(NotImplementedError):
        decode_image(bytes(sof16))


def test_jpeg_decode_error_rows_in_spark(spark):
    """Corrupt JPEG payloads become decode_error rows, never task
    failures — same contract as the PNG/GIF paths."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import (
        decode_image_features,
    )

    img = (np.ones((8, 8)) * 100.0)
    good = _jpeg_bytes([img], (1, 1))
    rows = [(1, good, "image/jpeg"), (2, b"\xff\xd8broken", "image/jpeg")]
    media = spark.createDataFrame(rows, "media_id long, content binary, mime string")
    got = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert got[1]["decode_error"] is None
    assert got[1]["width"] == 8 and got[1]["height"] == 8
    assert got[2]["decode_error"] is not None


# ---------------------------------------------------------------------------
# FLAC: minimal encoder (forward transform of the decoder) + roundtrips.
# FLAC is lossless, so every roundtrip asserts exact sample equality.
# ---------------------------------------------------------------------------


class _FlacWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc, self.n = 0, 0

    def put_signed(self, v, nbits):
        self.put(v & ((1 << nbits) - 1), nbits)

    def align(self):
        while self.n:
            self.put(0, 1)


def _flac_rice(w, residuals, blocksize, order, porder=0, param=None,
               escape_bits=None):
    """Rice-coded residual section, method 0 (4-bit params). Partition
    sizes follow the spec: first partition is short by the predictor
    order; blocksize must be divisible by 2^porder."""
    w.put(0, 2)
    w.put(porder, 4)
    nparts = 1 << porder
    assert blocksize % nparts == 0, "blocksize must divide by 2^porder"
    per = blocksize >> porder
    sizes = [per - order] + [per] * (nparts - 1)
    assert sum(sizes) == len(residuals)
    idx = 0
    for p in range(nparts):
        chunk = residuals[idx : idx + sizes[p]]
        idx += sizes[p]
        if escape_bits is not None:
            w.put(0xF, 4)
            w.put(escape_bits, 5)
            for v in chunk:
                w.put_signed(v, escape_bits)
            continue
        zz = [2 * v if v >= 0 else -2 * v - 1 for v in chunk]
        pp = param
        if pp is None:
            pp = 0
            while pp < 14 and sum(z >> pp for z in zz) > 2 * len(zz):
                pp += 1
        w.put(pp, 4)
        for z in zz:
            q = z >> pp
            assert q < 2**16, "rice quotient blowup; pick a larger param"
            w.put(0, q) if q else None
            w.put(1, 1)
            if pp:
                w.put(z & ((1 << pp) - 1), pp)


def _flac_subframe_bits(w, samples, bps, kind, porder=0, escape_bits=None,
                        wasted=0):
    w.put(0, 1)
    if wasted:
        samples = [s >> wasted for s in samples]
        bps = bps - wasted
    if kind == "constant":
        w.put(0, 6)
        w.put(1 if wasted else 0, 1)
        if wasted:
            w.put(1, wasted)  # unary wasted-1: (wasted-1) zeros then 1
        w.put_signed(samples[0], bps)
        return
    if kind == "verbatim":
        w.put(1, 6)
    elif kind == "fixed2":
        w.put(10, 6)
    elif kind == "lpc2":
        w.put(33, 6)  # 32 + order - 1
    else:
        raise AssertionError(kind)
    if wasted:
        w.put(0, 1)
        w.put(1, 1)
        # re-emit properly: flag bit then unary(wasted-1)
        raise AssertionError("wasted bits only supported for constant here")
    w.put(0, 1)
    if kind == "verbatim":
        for s in samples:
            w.put_signed(s, bps)
        return
    if kind == "fixed2":
        res = [
            samples[i] - (2 * samples[i - 1] - samples[i - 2])
            for i in range(2, len(samples))
        ]
        w.put_signed(samples[0], bps)
        w.put_signed(samples[1], bps)
        _flac_rice(w, res, len(samples), 2, porder=porder, escape_bits=escape_bits)
        return
    # lpc2: coefficients [2, -1], precision 15, shift 0 — same predictor
    # as fixed2 but through the generic LPC path
    w.put_signed(samples[0], bps)
    w.put_signed(samples[1], bps)
    w.put(15 - 1, 4)
    w.put_signed(0, 5)
    w.put_signed(2, 15)
    w.put_signed(-1, 15)
    res = [
        samples[i] - ((2 * samples[i - 1] + (-1) * samples[i - 2]) >> 0)
        for i in range(2, len(samples))
    ]
    _flac_rice(w, res, len(samples), 2, porder=porder, escape_bits=escape_bits)


def _flac_bytes(samples, rate, blocksize=None, kind="verbatim", channel_mode=None,
                porder=0, escape_bits=None, wasted=0):
    """Baseline FLAC from an int array (n, ch): STREAMINFO + fixed-size
    frames. ``channel_mode`` None → independent; 'ls'/'rs'/'ms' → the
    stereo decorrelation modes."""
    import struct

    import numpy as np

    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    bs = blocksize or n
    bps = 16
    out = bytearray(b"fLaC")
    w = _FlacWriter()
    w.put(bs, 16)
    w.put(bs, 16)
    w.put(0, 24)
    w.put(0, 24)
    w.put(rate, 20)
    w.put(ch - 1, 3)
    w.put(bps - 1, 5)
    w.put(n, 36)
    info = bytes(w.out) + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info

    for f0 in range(0, n, bs):
        block = samples[f0 : f0 + bs]
        nb = block.shape[0]
        w = _FlacWriter()
        w.put(0b11111111111110, 14)
        w.put(0, 1)
        w.put(0, 1)  # fixed blocking
        w.put(7, 4)  # 16-bit blocksize-1 follows
        w.put(0, 4)  # rate from STREAMINFO
        modes = {None: ch - 1, "ls": 8, "rs": 9, "ms": 10}
        w.put(modes[channel_mode], 4)
        w.put(4, 3)  # 16-bit samples
        w.put(0, 1)
        w.put(f0 // bs, 8)  # frame number (UTF-8 single byte; <128 frames)
        w.put(nb - 1, 16)
        w.put(0, 8)  # header CRC-8 (decoder does not verify)
        cols = [list(map(int, block[:, c])) for c in range(ch)]
        if channel_mode is None:
            for c in cols:
                _flac_subframe_bits(w, c, bps, kind, porder, escape_bits, wasted)
        else:
            left, right = cols
            side = [a - b for a, b in zip(left, right)]
            if channel_mode == "ls":
                _flac_subframe_bits(w, left, bps, kind, porder, escape_bits)
                _flac_subframe_bits(w, side, bps + 1, kind, porder, escape_bits)
            elif channel_mode == "rs":
                _flac_subframe_bits(w, side, bps + 1, kind, porder, escape_bits)
                _flac_subframe_bits(w, right, bps, kind, porder, escape_bits)
            else:
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                _flac_subframe_bits(w, mid, bps, kind, porder, escape_bits)
                _flac_subframe_bits(w, side, bps + 1, kind, porder, escape_bits)
        w.align()
        w.put(0, 16)  # frame CRC-16 (decoder does not verify)
        out += bytes(w.out)
    return bytes(out)


def _flac_expect(samples):
    import numpy as np

    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    return (s / 32768.0).astype(np.float32)


def test_flac_verbatim_mono_roundtrip():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32768, 300)
    got, rate = decode_audio(_flac_bytes(s, 8000))
    assert rate == 8000
    assert np.array_equal(got, _flac_expect(s))


def test_flac_multi_frame_and_partial_tail():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    rng = np.random.RandomState(4)
    s = rng.randint(-32768, 32768, 1000)  # 4 frames of 300 + tail 100
    got, rate = decode_audio(_flac_bytes(s, 44100, blocksize=300))
    assert np.array_equal(got, _flac_expect(s))


def test_flac_fixed_and_lpc_predictors_lossless():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    t = np.arange(600)
    smooth = (8000 * np.sin(t / 20.0)).astype(np.int64)
    for kind in ("fixed2", "lpc2"):
        got, _ = decode_audio(_flac_bytes(smooth, 16000, kind=kind))
        assert np.array_equal(got, _flac_expect(smooth)), kind


def test_flac_rice_partitions_and_escape():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    t = np.arange(512)  # partitions of 128; first is short by the order
    smooth = (5000 * np.cos(t / 15.0)).astype(np.int64)
    got, _ = decode_audio(_flac_bytes(smooth, 8000, kind="fixed2", porder=2))
    assert np.array_equal(got, _flac_expect(smooth))
    got, _ = decode_audio(
        _flac_bytes(smooth, 8000, kind="fixed2", escape_bits=17)
    )
    assert np.array_equal(got, _flac_expect(smooth))


def test_flac_stereo_decorrelation_modes():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    rng = np.random.RandomState(5)
    st = rng.randint(-30000, 30000, (400, 2))
    for mode in (None, "ls", "rs", "ms"):
        got, _ = decode_audio(_flac_bytes(st, 22050, channel_mode=mode))
        assert np.array_equal(got, _flac_expect(st)), mode


def test_flac_constant_subframe_and_wasted_bits():
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    s = np.full(256, 1200, np.int64)
    got, _ = decode_audio(_flac_bytes(s, 8000, kind="constant"))
    assert np.array_equal(got, _flac_expect(s))
    s4 = np.full(256, 4096, np.int64)  # 1 wasted bit: all values even
    got, _ = decode_audio(_flac_bytes(s4, 8000, kind="constant", wasted=1))
    assert np.array_equal(got, _flac_expect(s4))


def test_flac_rejects_corrupt():
    import numpy as np
    import pytest

    from portfolio_data_pipelines_spark.operators.multimodal import decode_audio

    good = _flac_bytes(np.arange(100), 8000)
    with pytest.raises(ValueError):
        decode_audio(good[: len(good) - 30])  # truncated frame
    with pytest.raises(ValueError):
        decode_audio(b"fLaC\x00\x00")  # truncated metadata
    bad_sync = bytearray(good)
    # flip the first frame sync byte (right after the 4+4+34 metadata)
    bad_sync[42] = 0x00
    with pytest.raises(ValueError):
        decode_audio(bytes(bad_sync))


def test_flac_decode_features_in_spark(spark):
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import (
        decode_audio_features,
    )

    rng = np.random.RandomState(6)
    s = rng.randint(-32768, 32768, 400)
    rows = [
        (1, _flac_bytes(s, 8000), "audio/flac"),
        (2, b"fLaC broken payload", "audio/flac"),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary, mime string")
    got = {r["media_id"]: r for r in decode_audio_features(media).collect()}
    assert got[1]["decode_error"] is None
    assert got[1]["n_frames"] == 400 and got[1]["sample_rate"] == 8000
    assert got[2]["decode_error"] is not None


def test_jpeg_multi_scan_sequential_roundtrip():
    """Multi-scan sequential: one non-interleaved scan per component
    (DHT-shared) must reconstruct identically to the interleaved single
    scan — including a subsampled chroma grid, whose non-interleaved
    block grid is the component's own ceil(comp_dim/8), not the padded
    MCU grid."""
    import numpy as np

    from portfolio_data_pipelines_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(12)
    h, w = 18, 22
    y = rng.randint(0, 256, (h, w)).astype(np.float64)
    cb = np.repeat(np.repeat(rng.randint(0, 256, (h // 2 + 1, w // 2 + 1)), 2, 0), 2, 1)[:h, :w].astype(np.float64)
    cr = np.repeat(np.repeat(rng.randint(0, 256, (h // 2 + 1, w // 2 + 1)), 2, 0), 2, 1)[:h, :w].astype(np.float64)
    inter = decode_image(_jpeg_bytes([y, cb, cr], (2, 2)))
    multi = decode_image(_jpeg_bytes([y, cb, cr], (2, 2), scan_mode="separate"))
    assert np.array_equal(inter, multi)

    g = rng.randint(0, 256, (11, 13)).astype(np.float64)
    a = decode_image(_jpeg_bytes([g], (1, 1)))
    b = decode_image(_jpeg_bytes([g], (1, 1), scan_mode="separate"))
    assert np.array_equal(a, b)


class TestJpeg12Bit:
    """12-bit JPEG (extended sequential SOF1): 2048 level shift,
    extended-range Huffman categories, full-range map to the 8-bit
    output contract."""

    def test_gray_12bit_q1_near_exact(self):
        import numpy as np

        from portfolio_data_pipelines_spark.operators.multimodal import (
            decode_image,
        )

        rs = np.random.RandomState(5)
        img8 = rs.randint(0, 256, (16, 24))
        img12 = (img8 * 4095.0 / 255.0).round()  # full-range 12-bit
        got = decode_image(
            _jpeg_bytes([img12.astype(np.float64)], (1, 1), precision=12)
        )
        # q=1 quantization on 12-bit samples keeps the 8-bit projection
        # within ±1 after the exact 4095→255 map
        assert got.shape == (16, 24, 3)
        assert np.abs(got[:, :, 0].astype(int) - img8).max() <= 1

    def test_color_420_12bit_decodes(self):
        import numpy as np

        from portfolio_data_pipelines_spark.operators.multimodal import (
            decode_image,
        )

        rs = np.random.RandomState(9)
        y = rs.randint(0, 4096, (16, 16)).astype(np.float64)
        flat_cb = np.full((16, 16), 2048.0)
        flat_cr = np.full((16, 16), 2048.0)
        got = decode_image(
            _jpeg_bytes([y, flat_cb, flat_cr], (2, 2), precision=12)
        )
        # neutral chroma → decoded RGB is gray: channels equal ±1
        assert got.shape == (16, 16, 3)
        assert np.abs(got[:, :, 0].astype(int) - got[:, :, 1].astype(int)).max() <= 1
        exp = np.clip(np.round(y * 255.0 / 4095.0), 0, 255)
        assert np.abs(got[:, :, 0].astype(int) - exp.astype(int)).max() <= 1

    def test_large_dc_swings_use_extended_categories(self):
        """Alternating 0/4095 blocks force DC diff magnitudes beyond
        the 8-bit category range — the extended DC table must carry
        them."""
        import numpy as np

        from portfolio_data_pipelines_spark.operators.multimodal import (
            decode_image,
        )

        img12 = np.zeros((8, 32), dtype=np.float64)
        img12[:, 8:16] = 4095.0
        img12[:, 24:32] = 4095.0
        got = decode_image(_jpeg_bytes([img12], (1, 1), precision=12))
        assert int(got[0, 0, 0]) <= 1 and int(got[0, 12, 0]) >= 254

    def test_baseline_sof0_rejects_12bit(self):
        import numpy as np
        import pytest as _pytest

        from portfolio_data_pipelines_spark.operators.multimodal import (
            decode_image,
        )

        img12 = np.full((8, 8), 2048.0)
        payload = bytearray(_jpeg_bytes([img12], (1, 1), precision=12))
        # rewrite the SOF1 marker to SOF0: now an ILLEGAL 12-bit baseline
        i = payload.find(b"\xff\xc1")
        payload[i + 1] = 0xC0
        with _pytest.raises(ValueError, match="baseline"):
            decode_image(bytes(payload))
