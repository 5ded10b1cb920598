"""Multimodal column operators (SURVEY §2.10 — training-data extensions).

Image/audio/video payloads are modeled the way a 100 TB lake stores them:
an opaque ``binary`` content column plus typed metadata columns, processed
by **Arrow-batched ``mapInPandas``** — the payload bytes never pass through
row-at-a-time Python, and each task streams batches so one huge partition
never has to fit in executor Python memory at once.

Decoding: :func:`decode_image` prefers PIL when installed and otherwise
falls back to built-in pure-Python decoders for baseline JPEG (Huffman +
IDCT + YCbCr), PNG (stdlib ``zlib`` + scanline unfilter, all filter
types, Adam7, 8/16-bit), GIF (LZW), binary PPM (P6) and uncompressed
24-bit BMP;
:func:`decode_audio` prefers soundfile and
falls back to a stdlib ``wave`` PCM decoder — so BOTH modalities have a
REAL, tested decode path in this container
(:func:`decode_image_features` / :func:`decode_audio_features` drive
them through Arrow batches); formats beyond those raise
``NotImplementedError`` until the full codec libraries are present. The
byte-level fake feature extractor remains the oracle-checked plumbing
path.

Scale notes:
- ``mapInPandas`` keeps partition boundaries: no shuffle is introduced;
  the operator cost is scan + decode, embarrassingly parallel.
- Feature rows are tiny relative to payloads — project the binary column
  away immediately after extraction so downstream stages shuffle features,
  never bytes.
- Frame sampling is a 1→N expansion inside one task (no explode shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Deterministic fake "video" framing: fixed frame size, sample every k-th.
FRAME_BYTES = 256
FRAME_STRIDE = 4

FEATURE_SCHEMA = (
    "media_id bigint, media_type string, n_bytes int, first_byte int, "
    "byte_sum bigint, n_frames int, n_sampled_frames int"
)

FRAME_SCHEMA = "media_id bigint, frame_index int, frame_bytes binary"


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fabricate a media table from the documents fixture: UTF-8 bytes of
    the text stand in for an encoded payload. Real pipelines read the
    bytes from parquet/object storage directly — the downstream plumbing
    is identical."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_ppm(content: bytes):
    """Minimal binary-PPM (P6) decoder → uint8 ndarray (H, W, 3).

    Header grammar: ``P6 <w> <h> <maxval>`` with arbitrary whitespace and
    ``#`` comments between tokens, one whitespace byte, then w·h·3 raw
    RGB bytes. maxval must fit one byte (the common case; 16-bit PPM is
    rejected)."""
    import numpy as np

    if content[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported by the fallback decoder")
    pixels = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pixels.reshape(h, w, 3)


def _decode_bmp(content: bytes):
    """Minimal 24-bit uncompressed BMP decoder → uint8 ndarray (H, W, 3).

    BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER: pixel rows are
    4-byte-aligned, stored bottom-up (positive height) in BGR order —
    output is flipped to top-down RGB."""
    import struct

    import numpy as np

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("fallback decoder supports only uncompressed 24-bit BMP")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_unfilter_row(f: int, line, prev, bpp: int):
    """Reverse one PNG scanline filter (types 0-4) in place on int32
    ``line`` given the reconstructed previous row ``prev`` (int32).

    Sub/Average/Paeth are inherently sequential along the row (each byte
    depends on the reconstructed byte ``bpp`` back), so those loop in
    Python; None and Up vectorize. Fine at test scale; a real deploy
    swaps :func:`decode_image` to PIL which does this in C.
    """
    stride = len(line)
    if f == 0:
        return line
    if f == 2:  # Up
        line += prev
        line &= 0xFF
        return line
    if f == 1:  # Sub
        for x in range(bpp, stride):
            line[x] = (line[x] + line[x - bpp]) & 0xFF
        return line
    if f == 3:  # Average
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        return line
    if f == 4:  # Paeth
        for x in range(stride):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (line[x] + pr) & 0xFF
        return line
    raise ValueError(f"invalid PNG filter type {f}")


#: Adam7 pass grid: (x offset, y offset, x stride, y stride) per pass.
_ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _decode_png(content: bytes):
    """Pure-stdlib PNG decoder → uint8 RGB ndarray (H, W, 3).

    Chunk walk (IHDR/PLTE/IDAT/IEND), ``zlib`` inflate of the
    concatenated IDAT stream, then scanline unfiltering for all 5 filter
    types (None/Sub/Up/Average/Paeth). Supports every legal bit depth:
    8; 16 (big-endian pairs; the MSB is kept — the 8-bit RGB output
    contract); and sub-byte 1/2/4 (samples packed MSB-first within
    scanline bytes, as the spec's only sub-byte layout, valid for gray
    and palette color types; gray values rescale exactly to 8-bit since
    2^d - 1 divides 255). Color types: 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha) and 6 (RGBA) — alpha is dropped, gray is broadcast
    to RGB — plus Adam7 interlacing (7 independently-filtered
    sub-images placed at the pass offsets/strides; each pass packs its
    own scanlines, so sub-byte passes have independent byte
    boundaries)."""
    import struct
    import zlib

    import numpy as np

    if content[:8] != _PNG_SIGNATURE:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(content):
        length, ctype = struct.unpack_from(">I4s", content, pos)
        data = content[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # chunk header + payload + CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"invalid PNG color type {color_type}")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"PNG sub-byte depth {depth} invalid for color type {color_type}"
        )
    if color_type == 3 and depth == 16:
        raise ValueError("PNG palette color type is limited to bit depths 1-8")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    # PNG filters operate on BYTES with the left-neighbor offset equal to
    # the bytes-per-pixel (floored to 1 for sub-byte depths), so depth 16
    # reuses the same unfilter with bpp = channels * 2 and depths 1/2/4
    # with bpp = 1.
    bpp = max(1, channels * depth // 8)

    def unfilter(buf: bytes, pw: int, ph: int):
        """Unfilter a (sub-)image of pw×ph pixels from the head of
        ``buf``; returns (uint8 array (ph, stride), bytes consumed)
        where stride is the packed scanline byte width."""
        stride = (pw * channels * depth + 7) // 8
        need = ph * (stride + 1)
        if len(buf) < need:
            raise ValueError("PNG pixel data size mismatch")
        a = np.frombuffer(buf[:need], np.uint8).reshape(ph, stride + 1)
        out = np.zeros((ph, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(ph):
            prev = _png_unfilter_row(
                int(a[y, 0]), a[y, 1:].astype(np.int32), prev, bpp
            )
            out[y] = prev
        return out, need

    def to_samples(data, pw: int, ph: int):
        """Packed scanline bytes (ph, stride) → per-pixel samples
        (ph, pw, bpp). Sub-byte samples unpack MSB-first and keep their
        raw 0..2^depth-1 values (rescaling happens once at the end)."""
        if depth == 1:
            return np.unpackbits(data, axis=1)[:, :pw, None]
        if depth == 2:
            quads = (data[:, :, None] >> np.array([6, 4, 2, 0])) & 3
            return quads.reshape(ph, -1)[:, :pw, None].astype(np.uint8)
        if depth == 4:
            pairs = (data[:, :, None] >> np.array([4, 0])) & 15
            return pairs.reshape(ph, -1)[:, :pw, None].astype(np.uint8)
        return data.reshape(ph, pw, bpp)

    if interlace == 0:
        data, consumed = unfilter(raw, w, h)
        if consumed != len(raw):
            raise ValueError("PNG pixel data size mismatch")
        full = to_samples(data, w, h)
    elif interlace == 1:
        # Adam7: 7 passes, each an independently-filtered sub-image
        # placed on the (x0 + i*dx, y0 + j*dy) grid. Empty passes (small
        # images) contribute zero bytes, including their filter bytes.
        full = np.zeros((h, w, bpp), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, consumed = unfilter(raw[offset:], pw, ph)
            offset += consumed
            full[y0::dy, x0::dx, :] = to_samples(sub, pw, ph)
        if offset != len(raw):
            raise ValueError("PNG pixel data size mismatch")
    else:
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if depth == 16:
        # big-endian sample pairs; keep the MSB — the uint8 RGB contract
        px = np.ascontiguousarray(full.reshape(h, w, channels, 2)[:, :, :, 0])
    else:
        px = full.reshape(h, w, channels)
    if color_type == 0:
        if depth < 8:
            # exact: 2^d - 1 divides 255 for d in (1, 2, 4)
            px = px * np.uint8(255 // ((1 << depth) - 1))
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        if int(px.max()) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return np.ascontiguousarray(plte[px[:, :, 0]])
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])  # RGBA → RGB


def _gif_lzw_decode(data: bytes, min_code_size: int, expected: int) -> list[int]:
    """GIF-variant LZW: LSB-first bit packing, variable code width from
    ``min_code_size + 1`` up to 12 bits, CLEAR resets the table. Returns
    exactly ``expected`` pixel indices or raises ValueError."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int):
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        v = 0
        for i in range(width):
            v |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    def fresh_table():
        return [(i,) for i in range(clear)] + [(), ()]

    table = fresh_table()
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None
    while True:
        code = read(width)
        if code is None:
            break
        if code == clear:
            table, width, prev = fresh_table(), min_code_size + 1, None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # the KwKwK case
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table size {len(table)}")
        out.extend(entry)
        if len(out) > expected:
            raise ValueError("GIF LZW: more pixels than the image descriptor declares")
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(out) != expected:
        raise ValueError(f"GIF LZW: {len(out)} pixels decoded, expected {expected}")
    return out


#: GIF interlace passes: (start row, step).
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(content: bytes):
    """Pure-stdlib GIF decoder → uint8 RGB ndarray (H, W, 3), first frame.

    GIF87a/89a: logical screen descriptor, global/local color tables,
    extension blocks skipped, first image descriptor's LZW stream
    decoded (:func:`_gif_lzw_decode`), optional 4-pass interlace
    unwoven, palette applied. Animated GIFs yield frame 1 — the corpus
    convention for thumbnailing."""
    import struct

    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = content[10]
    pos, gct = 13, None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    try:
        while pos < len(content):
            block = content[pos]
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension: label byte then sub-blocks
                pos += 2
                while content[pos] != 0:
                    pos += 1 + content[pos]
                pos += 1
                continue
            if block != 0x2C:
                raise ValueError(f"bad GIF block 0x{block:02x}")
            _ix, _iy, iw, ih, ipacked = struct.unpack_from("<HHHHB", content, pos + 1)
            pos += 10
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                table = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("GIF image with no color table")
            min_code = content[pos]
            pos += 1
            data = bytearray()
            while content[pos] != 0:
                ln = content[pos]
                data += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = np.array(
                _gif_lzw_decode(bytes(data), min_code, iw * ih), np.uint16
            ).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                rows = [r for start, step in _GIF_INTERLACE_PASSES for r in range(start, ih, step)]
                deinterlaced = np.empty_like(idx)
                deinterlaced[rows] = idx
                idx = deinterlaced
            if int(idx.max(initial=0)) >= len(table):
                raise ValueError("GIF palette index out of range")
            return np.ascontiguousarray(table[idx])
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated GIF stream: {exc}") from exc
    raise ValueError("GIF contains no image data")


#: JPEG zig-zag scan order: index k in the entropy stream → position in
#: the natural (row-major) 8×8 block.
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _jpeg_dct_matrix():
    """8×8 DCT-II basis C with C[u,x] = c(u)/2 · cos((2x+1)uπ/16);
    IDCT(S) = Cᵀ·S·C, FDCT(b) = C·b·Cᵀ — the separable form."""
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for u in range(8):
        alpha = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = alpha / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16)
    return c


def _jpeg_huff_lut(counts, symbols):
    """Canonical Huffman (length, code) → symbol map from a DHT's
    BITS/HUFFVAL lists (ITU-T T.81 Annex C code construction)."""
    lut, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lut[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _JpegBits:
    """MSB-first bit reader over one entropy-coded segment (already
    byte-unstuffed). Exhaustion raises ValueError (truncated stream)."""

    def __init__(self, data: bytes):
        self.data, self.pos, self.nbits = data, 0, len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("truncated JPEG entropy stream")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, lut) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _jpeg_split_ecs(content: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start``, split on restart markers, with
    FF00 byte stuffing removed. Stops at the first real marker; returns
    (segments, index of that marker's 0xFF)."""
    segs, cur, i, n = [], bytearray(), start, len(content)
    while i < n:
        b = content[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = content[i + 1]
        if m == 0x00:  # stuffed literal FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: new segment, fresh DC predictors
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker (EOI or next scan) ends the scan
            break
    segs.append(bytes(cur))
    return segs, i


def _decode_jpeg(content: bytes):
    """Pure-stdlib baseline JPEG decoder → uint8 RGB ndarray (H, W, 3).

    Baseline/extended sequential Huffman JPEG (SOF0/SOF1): marker walk
    (DQT/DHT/SOF/DRI/SOS), canonical Huffman entropy decode with byte
    unstuffing and restart-marker support, dequantization in zig-zag
    order, separable float IDCT, level shift, per-component planes at
    their sampling factors, nearest-neighbor chroma upsampling, and
    BT.601 YCbCr→RGB. Grayscale (1 component) and 3-component frames of
    any sampling grid (4:4:4, 4:2:2, 4:2:0, ...) are supported, as both
    a single interleaved scan and multiple scans (each scan interleaved
    over its components, or non-interleaved over one component's own
    block grid; DHT/DRI may be redefined between scans).

    Progressive JPEG (SOF2) is fully supported: coefficients accumulate
    in zig-zag order across scans — DC first (diff-coded, shifted left
    by the successive-approximation low bit Al), DC refinement (one
    appended bit per block), AC first (spectral band Ss..Se with EOB-run
    codes EOBn), and AC refinement (libjpeg's correction-bit algorithm:
    ±1<<Al for newly-nonzero coefficients, one buffered correction bit
    per already-nonzero coefficient, ZRL runs counting only zero-history
    positions) — then one dequantize + IDCT pass at the end. Restart
    markers reset DC predictors AND the EOB run.

    12-bit samples (extended sequential SOF1 / progressive SOF2, the
    precision medical and scientific JPEGs use) decode with a 2048
    level shift and full-range map to the 8-bit output contract
    (4095 → 255 exactly); baseline SOF0 rejects any precision but 8,
    per the spec. Hierarchical and arithmetic-coded variants raise
    ``NotImplementedError`` — PIL covers them when installed."""
    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → lut
    frame = None
    restart = 0
    pos = 2
    planes: dict[int, "np.ndarray"] = {}
    coefs: dict[int, "np.ndarray"] = {}  # progressive: (by, bx, 64) zig-zag
    decoded: set[int] = set()
    dctm = _jpeg_dct_matrix()

    def decode_block(bits, c, pred):
        czz = np.zeros(64, dtype=np.float64)
        q = qt[c["tq"]]
        t = bits.huff(huff[(0, c["dc"])])
        diff = _jpeg_extend(bits.bits(t), t) if t else 0
        pred += diff
        czz[0] = pred * q[0]
        k = 1
        while k < 64:
            rs = bits.huff(huff[(1, c["ac"])])
            r, size = rs >> 4, rs & 15
            if size == 0:
                if r == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC run past end of block")
            czz[k] = _jpeg_extend(bits.bits(size), size) * q[k]
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        coef[list(_JPEG_ZIGZAG)] = czz
        block = dctm.T @ coef.reshape(8, 8) @ dctm
        return (
            np.clip(np.round(block + frame["half"]), 0, frame["maxv"]),
            pred,
        )

    def decode_scan(scan, segs):
        by_id = {c["id"]: c for c in frame["comps"]}
        scomps = []
        for s in scan:
            c = by_id.get(s["cs"])
            if c is None:
                raise ValueError("JPEG scan references unknown component")
            scomps.append({**c, **s})
        for c in scomps:
            if c["tq"] not in qt:
                raise ValueError("JPEG scan references missing quant table")
            if (0, c["dc"]) not in huff or (1, c["ac"]) not in huff:
                raise ValueError("JPEG scan references missing Huffman table")
        hmax, vmax = frame["hmax"], frame["vmax"]
        if len(scomps) > 1:
            # interleaved: MCU = the sampling-factor block grid
            mcux, mcuy = frame["mcux"], frame["mcuy"]
            units = [
                (c, c["h"], c["v"]) for c in scomps
            ]
        else:
            # non-interleaved: MCU = ONE block on the component's own
            # (unpadded) grid — ceil(comp_w/8) × ceil(comp_h/8), where the
            # component dims scale by its sampling factors
            c = scomps[0]
            comp_w = -(-frame["w"] * c["h"] // hmax)
            comp_h = -(-frame["h"] * c["v"] // vmax)
            mcux, mcuy = -(-comp_w // 8), -(-comp_h // 8)
            units = [(c, 1, 1)]
        n_mcu = mcux * mcuy
        seg_i = 0
        bits = _JpegBits(segs[0])
        preds = {c["cs"]: 0 for c in scomps}
        for m in range(n_mcu):
            if restart and m and m % restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                bits = _JpegBits(segs[seg_i])
                preds = {c["cs"]: 0 for c in scomps}
            my, mx = divmod(m, mcux)
            for c, ch, cv in units:
                for by in range(cv):
                    for bx in range(ch):
                        block, preds[c["cs"]] = decode_block(
                            bits, c, preds[c["cs"]]
                        )
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[c["cs"]][y0 : y0 + 8, x0 : x0 + 8] = block
                decoded.add(c["cs"])

    def decode_scan_prog(scan, segs, ss, se, ah, al):
        """One progressive scan into the zig-zag coefficient stores.

        DC scans (ss == 0) may interleave all frame components; AC scans
        carry exactly one component on its own unpadded block grid (the
        spec's rule). First passes (ah == 0) create coefficients shifted
        left by al; refinement passes (ah == al + 1) append one bit."""
        if not (0 <= ss <= 63 and 0 <= se <= 63 and ss <= se):
            raise ValueError("JPEG scan spectral selection out of range")
        by_id = {c["id"]: c for c in frame["comps"]}
        scomps = []
        for s in scan:
            c = by_id.get(s["cs"])
            if c is None:
                raise ValueError("JPEG scan references unknown component")
            scomps.append({**c, **s})
        hmax, vmax = frame["hmax"], frame["vmax"]
        p1, m1 = 1 << al, -1 << al
        if ss == 0:
            if se != 0:
                raise ValueError("JPEG DC scan with nonzero spectral end")
            if ah == 0:
                for c in scomps:
                    if (0, c["dc"]) not in huff:
                        raise ValueError("JPEG scan references missing Huffman table")
            if len(scomps) > 1:
                mcux, mcuy = frame["mcux"], frame["mcuy"]
                units = [(c, c["h"], c["v"]) for c in scomps]
            else:
                c = scomps[0]
                comp_w = -(-frame["w"] * c["h"] // hmax)
                comp_h = -(-frame["h"] * c["v"] // vmax)
                mcux, mcuy = -(-comp_w // 8), -(-comp_h // 8)
                units = [(c, 1, 1)]
            seg_i = 0
            bits = _JpegBits(segs[0])
            preds = {c["cs"]: 0 for c in scomps}
            for m in range(mcux * mcuy):
                if restart and m and m % restart == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise ValueError("JPEG missing restart segment")
                    bits = _JpegBits(segs[seg_i])
                    preds = {c["cs"]: 0 for c in scomps}
                my, mx = divmod(m, mcux)
                for c, ch, cv in units:
                    for by in range(cv):
                        for bx in range(ch):
                            blk = coefs[c["cs"]][my * cv + by, mx * ch + bx]
                            if ah == 0:
                                t = bits.huff(huff[(0, c["dc"])])
                                diff = _jpeg_extend(bits.bits(t), t) if t else 0
                                preds[c["cs"]] += diff
                                blk[0] = preds[c["cs"]] << al
                            elif bits.bits(1):
                                blk[0] = int(blk[0]) | p1
                    decoded.add(c["cs"])
            return
        # AC scan: single component, its own (unpadded) block grid
        if len(scomps) != 1:
            raise ValueError("JPEG progressive AC scan must be non-interleaved")
        c = scomps[0]
        if (1, c["ac"]) not in huff:
            raise ValueError("JPEG scan references missing Huffman table")
        aclut = huff[(1, c["ac"])]
        comp_w = -(-frame["w"] * c["h"] // hmax)
        comp_h = -(-frame["h"] * c["v"] // vmax)
        nbx, nby = -(-comp_w // 8), -(-comp_h // 8)
        store = coefs[c["cs"]]
        seg_i = 0
        bits = _JpegBits(segs[0])
        eobrun = 0
        for m in range(nbx * nby):
            if restart and m and m % restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                bits = _JpegBits(segs[seg_i])
                eobrun = 0
            my, mx = divmod(m, nbx)
            blk = store[my, mx]
            if ah == 0:
                # AC first pass: band values shifted left by al; EOBn
                # codes (r<15, size 0) carry a run of all-zero bands
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = bits.huff(aclut)
                    r, size = rs >> 4, rs & 15
                    if size == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += bits.bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run past spectral band")
                    blk[k] = _jpeg_extend(bits.bits(size), size) << al
                    k += 1
            else:
                # AC refinement: libjpeg's correction-bit algorithm
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = bits.huff(aclut)
                        r, size = rs >> 4, rs & 15
                        if size:
                            if size != 1:
                                raise ValueError(
                                    "JPEG AC refinement size must be 1"
                                )
                            sval = p1 if bits.bits(1) else m1
                        else:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += bits.bits(r)
                                break
                            sval = 0  # ZRL: skip 16 zero-history coefs
                        while k <= se:
                            cur = int(blk[k])
                            if cur != 0:
                                if bits.bits(1) and (cur & p1) == 0:
                                    blk[k] = cur + (p1 if cur >= 0 else m1)
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if sval and k <= se:
                            blk[k] = sval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        cur = int(blk[k])
                        if cur != 0:
                            if bits.bits(1) and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        k += 1
                    eobrun -= 1
        decoded.add(c["cs"])

    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = content[pos + 1]
        if marker in (0xD8, 0xD9):  # SOI/EOI
            break
        if pos + 4 > len(content):
            raise ValueError("truncated JPEG segment")
        seglen = int.from_bytes(content[pos + 2 : pos + 4], "big")
        data = content[pos + 4 : pos + 2 + seglen]
        if len(data) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(data):
                prec, tid = data[i] >> 4, data[i] & 15
                i += 1
                if prec:
                    vals = [
                        int.from_bytes(data[i + 2 * k : i + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                    i += 128
                else:
                    vals = list(data[i : i + 64])
                    i += 64
                qt[tid] = vals
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(data):
                cls, tid = data[i] >> 4, data[i] & 15
                counts = list(data[i + 1 : i + 17])
                nsym = sum(counts)
                symbols = list(data[i + 17 : i + 17 + nsym])
                huff[(cls, tid)] = _jpeg_huff_lut(counts, symbols)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            precision = data[0]
            if marker == 0xC0 and precision != 8:
                raise ValueError("baseline JPEG requires 8-bit samples")
            if precision not in (8, 12):
                raise NotImplementedError(
                    f"unsupported JPEG sample precision {precision}"
                )
            h = int.from_bytes(data[1:3], "big")
            w = int.from_bytes(data[3:5], "big")
            ncomp = data[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = data[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            if w == 0 or h == 0:
                raise ValueError("empty JPEG frame")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame = {
                "w": w, "h": h, "comps": comps, "hmax": hmax, "vmax": vmax,
                "mcux": -(-w // (8 * hmax)), "mcuy": -(-h // (8 * vmax)),
                "prog": marker == 0xC2,
                # 12-bit (extended/progressive) shifts by 2048 and
                # clamps to 4095; samples scale to 8 bits at the end
                "half": float(1 << (precision - 1)),
                "maxv": float((1 << precision) - 1),
            }
            planes = {
                c["id"]: np.zeros(
                    (frame["mcuy"] * 8 * c["v"], frame["mcux"] * 8 * c["h"]),
                    dtype=np.float64,
                )
                for c in comps
            }
            if frame["prog"]:
                # coefficients accumulate across scans on the padded
                # (interleaved-MCU) block grid, zig-zag order per block
                coefs = {
                    c["id"]: np.zeros(
                        (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64),
                        dtype=np.int32,
                    )
                    for c in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical/arithmetic JPEG not supported without PIL"
            )
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(data[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = data[0]
            scan = []
            for s in range(ns):
                cs, tables = data[1 + 2 * s], data[2 + 2 * s]
                scan.append({"cs": cs, "dc": tables >> 4, "ac": tables & 15})
            segs, pos = _jpeg_split_ecs(content, pos + 2 + seglen)
            if frame["prog"]:
                ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
                ahal = data[3 + 2 * ns]
                decode_scan_prog(scan, segs, ss, se, ahal >> 4, ahal & 15)
            else:
                decode_scan(scan, segs)
            continue  # more scans / tables may follow
        # APPn/COM/unknown: skip
        pos += 2 + seglen
    if frame is None or not decoded:
        raise ValueError("JPEG missing SOF or SOS")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    missing = {c["id"] for c in comps} - decoded
    if missing:
        raise ValueError(f"JPEG scans never covered components {sorted(missing)}")
    if frame["prog"]:
        # single dequantize + IDCT pass over the accumulated coefficients
        for c in comps:
            if c["tq"] not in qt:
                raise ValueError("JPEG frame references missing quant table")
            q = np.array(qt[c["tq"]], dtype=np.float64)
            store = coefs[c["id"]]
            plane = planes[c["id"]]
            for by in range(store.shape[0]):
                for bx in range(store.shape[1]):
                    coef = np.zeros(64, dtype=np.float64)
                    coef[list(_JPEG_ZIGZAG)] = store[by, bx] * q
                    block = dctm.T @ coef.reshape(8, 8) @ dctm
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                        np.round(block + frame["half"]), 0, frame["maxv"]
                    )
    hmax, vmax = frame["hmax"], frame["vmax"]
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    # color math runs in the NATIVE sample domain (chroma centered on
    # half, 2048 for 12-bit), then one exact full-range map to the
    # 8-bit output contract (4095 → 255).
    scale = 255.0 / frame["maxv"]
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0] * scale), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = out_planes
    half = frame["half"]
    r = y + 1.402 * (cr - half)
    g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
    b = y + 1.772 * (cb - half)
    rgb = np.stack([r, g, b], axis=2) * scale
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_image(content: bytes):
    """Decode an image payload to a uint8 RGB ndarray (H, W, 3).

    Prefers PIL when installed (full format coverage); otherwise falls
    back to the built-in pure-Python decoders for baseline JPEG (marker
    walk + Huffman + IDCT, :func:`_decode_jpeg`), PNG (stdlib zlib +
    scanline unfilter, :func:`_decode_png`), GIF (LZW + palette,
    :func:`_decode_gif`), binary PPM (P6) and uncompressed 24-bit BMP —
    so the decode path is REAL and tested in this container. Progressive
    JPEG and formats beyond those raise ``NotImplementedError`` until
    PIL is present."""
    try:
        import io

        import numpy as np
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
    except ImportError:
        pass
    if content[:2] == b"\xff\xd8":
        return _decode_jpeg(content)
    if content[:8] == _PNG_SIGNATURE:
        return _decode_png(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(content)
    if content[:2] == b"P6":
        return _decode_ppm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    raise NotImplementedError(
        "only baseline JPEG, PNG, GIF, PPM (P6) and 24-bit BMP decode "
        "without PIL, which is not installed in this environment"
    )


class _FlacBits:
    """MSB-first bit reader for FLAC frames. Exhaustion raises
    ValueError (truncated stream)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data, self.pos = data, pos_bits
        self.nbits = len(data) * 8

    def bits(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("truncated FLAC stream")
        v = 0
        for _ in range(n):
            v = (v << 1) | (
                (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
            )
            self.pos += 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway FLAC unary code")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _flac_utf8_number(bits: _FlacBits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    first = bits.bits(8)
    if first < 0x80:
        return first
    n = 0
    while (first << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise ValueError("invalid FLAC frame number coding")
    v = first & (0x7F >> n)
    for _ in range(n - 1):
        c = bits.bits(8)
        if c >> 6 != 0b10:
            raise ValueError("invalid FLAC frame number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _flac_residuals(bits: _FlacBits, blocksize: int, order: int) -> list[int]:
    """Rice-coded residual section (both 4- and 5-bit parameter
    methods, escape partitions included)."""
    method = bits.bits(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    plen, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    porder = bits.bits(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC blocksize not divisible by 2^partition_order")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("invalid FLAC partition order")
        param = bits.bits(plen)
        if param == escape:
            raw = bits.bits(5)
            out.extend(bits.signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = bits.unary()
                r = bits.bits(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))  # zigzag → signed
    return out


def _flac_subframe(bits: _FlacBits, blocksize: int, bps: int) -> list[int]:
    if bits.bits(1):
        raise ValueError("invalid FLAC subframe padding bit")
    stype = bits.bits(6)
    wasted = 0
    if bits.bits(1):  # wasted-bits flag: unary count - 1
        wasted = bits.unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        out = [bits.signed(eff)] * blocksize
    elif stype == 1:  # VERBATIM
        out = [bits.signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        out = [bits.signed(eff) for _ in range(order)]
        res = _flac_residuals(bits, blocksize, order)
        coefs = {
            0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1],
        }[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(pred + r)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        out = [bits.signed(eff) for _ in range(order)]
        precision = bits.bits(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = bits.signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.signed(precision) for _ in range(order)]
        res = _flac_residuals(bits, blocksize, order)
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs)) >> shift
            out.append(pred + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


_FLAC_BLOCKSIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}


def _decode_flac(content: bytes):
    """Pure-stdlib FLAC decoder → (float32 (frames, channels) in [-1,1],
    rate). STREAMINFO metadata walk, then frame-by-frame: frame header
    (blocksize/rate/channel-assignment codes, UTF-8 frame number),
    subframes (CONSTANT, VERBATIM, FIXED 0-4, LPC to order 32) with
    Rice-coded residuals (4/5-bit params, escape partitions, wasted
    bits), and inter-channel decorrelation (left/side, right/side,
    mid/side). Reference: the FLAC format spec (RFC 9639)."""
    import numpy as np

    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(content):
        header = content[pos]
        last, btype = header >> 7, header & 0x7F
        length = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = content[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if length < 34:
                raise ValueError("short FLAC STREAMINFO")
            b = _FlacBits(body)
            b.bits(16), b.bits(16), b.bits(24), b.bits(24)
            rate = b.bits(20)
            channels = b.bits(3) + 1
            bps = b.bits(5) + 1
            total = b.bits(36)
            streaminfo = (rate, channels, bps, total)
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total = streaminfo
    if rate == 0:
        raise ValueError("FLAC sample rate 0")
    bits = _FlacBits(content, pos * 8)
    out: list[list[int]] = []
    while bits.pos + 32 <= bits.nbits and (not total or len(out) < total):
        if bits.bits(14) != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        bits.bits(1)  # reserved
        bits.bits(1)  # blocking strategy
        bs_code = bits.bits(4)
        sr_code = bits.bits(4)
        ch_code = bits.bits(4)
        ss_code = bits.bits(3)
        bits.bits(1)  # reserved
        _flac_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code")
        elif bs_code == 6:
            blocksize = bits.bits(8) + 1
        elif bs_code == 7:
            blocksize = bits.bits(16) + 1
        else:
            blocksize = _FLAC_BLOCKSIZES[bs_code]
        if sr_code == 12:
            bits.bits(8)
        elif sr_code in (13, 14):
            bits.bits(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample rate code")
        ss_map = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
        if ss_code not in ss_map:
            raise ValueError("reserved FLAC sample size code")
        fbps = ss_map[ss_code]
        bits.bits(8)  # header CRC-8 (not verified — PIL-less parity tool)
        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("FLAC frame channel count mismatch")
            subs = [_flac_subframe(bits, blocksize, fbps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            # side channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _flac_subframe(bits, blocksize, fbps)
                side = _flac_subframe(bits, blocksize, fbps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _flac_subframe(bits, blocksize, fbps + 1)
                right = _flac_subframe(bits, blocksize, fbps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _flac_subframe(bits, blocksize, fbps)
                side = _flac_subframe(bits, blocksize, fbps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    subs[0].append((m + s) >> 1)
                    subs[1].append((m - s) >> 1)
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        bits.align()
        bits.bits(16)  # frame CRC-16 (not verified)
        out.extend(zip(*subs))
    if total and len(out) > total:
        out = out[:total]
    arr = np.asarray(out, dtype=np.float64)
    if arr.size == 0:
        arr = arr.reshape(0, channels)
    scale = float(1 << (bps - 1))
    return (arr / scale).astype(np.float32), rate


def decode_audio(content: bytes):
    """Decode an audio payload to (float32 samples in [-1, 1], rate).

    Prefers soundfile when installed (full format coverage); otherwise
    falls back to stdlib decoders for WAV (PCM 8/16/24/32-bit, IEEE
    float 32/64, G.711 mu-law and A-law, IMA ADPCM — any channel count,
    interleaved into shape (frames, channels)) and FLAC
    (:func:`_decode_flac`: STREAMINFO + frames, all subframe types,
    Rice residuals, stereo decorrelation) — so, like images, the decode
    path is REAL and tested in this container, and formats beyond those
    (MP3/AAC/OGG, which have no dependency-free decode) raise
    ``NotImplementedError`` until soundfile is present."""
    import io

    try:
        import soundfile  # noqa: F401

        return soundfile.read(io.BytesIO(content))
    except ImportError:
        pass
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return _decode_wav(content)
    if content[:4] == b"fLaC":
        return _decode_flac(content)
    raise NotImplementedError(
        "only PCM WAV and FLAC decode without soundfile, which is not "
        "installed in this environment"
    )


#: IMA ADPCM quantizer tables (IMA 1992 reference, public domain).
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_adpcm_decode(raw: bytes, n_ch: int, block_align: int):
    """IMA ADPCM (WAV format 0x11): block-structured nibble stream.

    Each block opens with a 4-byte header per channel (int16 predictor =
    the block's first output sample, uint8 step index); the payload
    interleaves 4-byte (8-nibble) chunks per channel, low nibble first.
    The decoder is the IMA reference: diff = step>>3 plus step scaled by
    the nibble's magnitude bits, sign bit 8, predictor clamped to int16,
    index stepped by the adjust table and clamped to [0, 88]."""
    import numpy as np

    if block_align < 4 * n_ch + 4 * n_ch or (block_align - 4 * n_ch) % (4 * n_ch):
        raise ValueError("invalid IMA ADPCM block alignment")
    out = []
    for b0 in range(0, len(raw), block_align):
        block = raw[b0 : b0 + block_align]
        if len(block) < 4 * n_ch:  # trailing fragment too short for headers
            break
        preds, idxs = [], []
        for c in range(n_ch):
            p = int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
            i = block[4 * c + 2]
            if i > 88:
                raise ValueError("IMA ADPCM step index out of range")
            preds.append(p)
            idxs.append(i)
        chans = [[preds[c]] for c in range(n_ch)]
        data = block[4 * n_ch :]
        # a truncated final block keeps only its complete nibble groups
        data = data[: len(data) - len(data) % (4 * n_ch)]
        spb = 1 + len(data) * 2 // n_ch  # samples/channel in THIS block
        # nibble groups: 4 bytes per channel, channels round-robin
        for g in range(0, len(data), 4 * n_ch):
            for c in range(n_ch):
                for byte in data[g + 4 * c : g + 4 * c + 4]:
                    for nib in (byte & 15, byte >> 4):
                        step = _IMA_STEPS[idxs[c]]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        p = preds[c] + (-diff if nib & 8 else diff)
                        p = max(-32768, min(32767, p))
                        preds[c] = p
                        chans[c].append(p)
                        idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX_ADJ[nib & 7]))
        for c in range(n_ch):
            chans[c] = chans[c][:spb]
        out.append(np.stack([np.array(ch, np.float32) for ch in chans], axis=1))
    if not out:
        raise ValueError("IMA ADPCM stream shorter than one block")
    return np.concatenate(out, axis=0) / 32768.0


def _g711_tables():
    """Expansion LUTs for G.711 companded bytes → int16 (ITU-T G.711)."""
    import numpy as np

    ulaw = np.zeros(256, np.int16)
    for b in range(256):
        u = ~b & 0xFF
        sign, exp, mant = u & 0x80, (u >> 4) & 7, u & 15
        mag = ((mant << 3) + 0x84 << exp) - 0x84
        ulaw[b] = -mag if sign else mag
    alaw = np.zeros(256, np.int16)
    for b in range(256):
        a = b ^ 0x55
        sign, exp, mant = a & 0x80, (a >> 4) & 7, a & 15
        if exp == 0:
            mag = (mant << 4) + 8
        else:
            mag = ((mant << 4) + 0x108) << (exp - 1)
        # A-law sign bit SET means positive (opposite of mu-law)
        alaw[b] = mag if sign else -mag
    return ulaw, alaw


def _decode_wav(content: bytes):
    """RIFF/WAVE decode: (float32 (frames, channels) in [-1,1], rate).

    Walks the chunk list directly (the stdlib ``wave`` module reads
    only PCM), dispatching on the fmt tag: 1 = PCM (8-bit unsigned,
    16/24/32-bit signed little-endian), 3 = IEEE float (32/64),
    6 = A-law, 7 = mu-law (G.711 expansion LUTs), 0x11 = IMA ADPCM
    (:func:`_ima_adpcm_decode`). WAVE_FORMAT_EXTENSIBLE resolves
    through its SubFormat GUID."""
    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data, fact_frames = 12, None, None, None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        size = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        elif tag == b"fact" and size >= 4:
            # true per-channel frame count — authoritative for
            # compressed formats whose last block may be padded
            fact_frames = int.from_bytes(body[0:4], "little")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 0xFFFE:  # EXTENSIBLE: first 2 GUID bytes = format
        if len(fmt) < 26:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        audio_format = int.from_bytes(fmt[24:26], "little")
    if n_ch == 0:
        raise ValueError("WAV with zero channels")
    if audio_format == 1:  # PCM
        if bits == 8:
            samples = (
                np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0
            ) / 128.0
        elif bits == 16:
            samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            trimmed = data[: len(data) - len(data) % 3]
            b = np.frombuffer(trimmed, np.uint8).reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v -= (v & 0x800000) << 1  # sign-extend
            samples = v.astype(np.float32) / 8388608.0
        elif bits == 32:
            samples = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise NotImplementedError(f"unsupported PCM sample width {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif bits == 64:
            samples = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"invalid IEEE-float WAV bit width {bits}")
    elif audio_format in (6, 7):  # G.711 A-law / mu-law
        ulaw, alaw = _g711_tables()
        lut = ulaw if audio_format == 7 else alaw
        samples = lut[np.frombuffer(data, np.uint8)].astype(np.float32) / 32768.0
    elif audio_format == 0x11:  # IMA ADPCM
        decoded = _ima_adpcm_decode(data, n_ch, block_align)
        if fact_frames is not None:
            decoded = decoded[:fact_frames]
        return decoded, rate
    else:
        raise NotImplementedError(f"unsupported WAV format tag {audio_format:#x}")
    frames = len(samples) // n_ch
    return samples[: frames * n_ch].reshape(-1, n_ch), rate


def resize_media(media: DataFrame, scale: int = 4) -> DataFrame:
    """Deterministic "resize": decimate the payload by ``scale`` (every
    scale-th byte), the stand-in for a thumbnail/downsample pass. Real
    pipelines swap the decimation line for PIL ``Image.resize`` /
    ``librosa.resample`` — the Arrow plumbing (binary in, binary out,
    partition-preserving mapInPandas, no shuffle) is identical. Output
    keeps original and resized sizes so downstream can verify the
    reduction ratio without touching bytes."""
    import pandas as pd  # noqa: F811

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            resized = [bytes(b[::scale]) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "orig_bytes": [len(b) for b in pdf["content"]],
                    "resized_bytes": [len(b) for b in resized],
                    "content": resized,
                }
            )

    return media.mapInPandas(
        batches,
        schema="media_id bigint, orig_bytes int, resized_bytes int, content binary",
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary content column.

    Deterministic fake decode: byte length, first byte, byte sum, and the
    frame counts the sampler would produce. Numpy operates on the raw
    buffer per row — no per-byte Python loop — and the binary column is
    dropped on output so only small feature rows flow downstream.
    """
    import numpy as np
    import pandas as pd  # noqa: F811

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            buf = [np.frombuffer(b, dtype=np.uint8) for b in pdf["content"]]
            n_bytes = np.array([len(a) for a in buf], dtype=np.int32)
            n_frames = -(-n_bytes // FRAME_BYTES)  # ceil-div
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": n_bytes,
                    "first_byte": np.array(
                        [int(a[0]) if len(a) else -1 for a in buf], dtype=np.int32
                    ),
                    "byte_sum": np.array(
                        [int(a.sum(dtype=np.int64)) for a in buf], dtype=np.int64
                    ),
                    "n_frames": n_frames,
                    "n_sampled_frames": -(-n_frames // FRAME_STRIDE),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "media_id bigint, width int, height int, "
    "mean_r double, mean_g double, mean_b double, decode_error string"
)


def decode_image_features(media: DataFrame) -> DataFrame:
    """REAL image decode → per-image features, Arrow-batched.

    Runs :func:`decode_image` (PIL when present, else the built-in
    PPM/BMP decoders) on each payload inside ``mapInPandas`` and emits
    (width, height, per-channel means). Undecodable payloads yield a
    ``decode_error`` row instead of failing the task — at 100 TB a
    corrupt image must never kill a 10⁶-row partition. Same scale shape
    as :func:`extract_features`: partition-preserving, binary projected
    away at the boundary."""
    import numpy as np
    import pandas as pd  # noqa: F811

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"].to_numpy(),
                "width": np.full(len(pdf), -1, dtype=np.int32),
                "height": np.full(len(pdf), -1, dtype=np.int32),
                "mean_r": np.full(len(pdf), np.nan),
                "mean_g": np.full(len(pdf), np.nan),
                "mean_b": np.full(len(pdf), np.nan),
                "decode_error": np.array([None] * len(pdf), dtype=object),
            }
            for i, content in enumerate(pdf["content"]):
                try:
                    img = decode_image(bytes(content))
                    out["height"][i], out["width"][i] = img.shape[:2]
                    means = img.reshape(-1, 3).mean(axis=0)
                    out["mean_r"][i], out["mean_g"][i], out["mean_b"][i] = means
                except (ValueError, NotImplementedError) as exc:
                    out["decode_error"][i] = f"{type(exc).__name__}: {exc}"
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "media_id bigint, n_frames int, n_channels int, sample_rate int, "
    "duration_s double, rms double, decode_error string"
)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode → per-clip features, Arrow-batched.

    Runs :func:`decode_audio` (soundfile when present, else the stdlib
    PCM-WAV decoder) inside ``mapInPandas`` and emits (frames, channels,
    rate, duration, RMS). Mirrors :func:`decode_image_features`:
    per-row decode errors are captured, never task-fatal; binary is
    projected away at the operator boundary; partition-preserving (no
    shuffle)."""
    import numpy as np
    import pandas as pd  # noqa: F811

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            n = len(pdf)
            out = {
                "media_id": pdf["media_id"].to_numpy(),
                "n_frames": np.full(n, -1, dtype=np.int32),
                "n_channels": np.full(n, -1, dtype=np.int32),
                "sample_rate": np.full(n, -1, dtype=np.int32),
                "duration_s": np.full(n, np.nan),
                "rms": np.full(n, np.nan),
                "decode_error": np.array([None] * n, dtype=object),
            }
            for i, content in enumerate(pdf["content"]):
                try:
                    samples, rate = decode_audio(bytes(content))
                    out["n_frames"][i] = samples.shape[0]
                    out["n_channels"][i] = samples.shape[1] if samples.ndim > 1 else 1
                    out["sample_rate"][i] = rate
                    out["duration_s"][i] = samples.shape[0] / rate
                    out["rms"][i] = float(np.sqrt(np.mean(np.square(samples))))
                # wave.Error / struct.error / ValueError / NotImplementedError:
                # any per-row decode failure is data, not a task fatality.
                except Exception as exc:  # noqa: BLE001
                    out["decode_error"][i] = f"{type(exc).__name__}: {exc}"
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """1→N frame sampling inside one task: split the payload into
    FRAME_BYTES chunks and emit every FRAME_STRIDE-th chunk as its own
    row. No shuffle — the expansion happens within partitions."""
    import pandas as pd  # noqa: F811

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, chunks = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for i in range(0, -(-len(content) // FRAME_BYTES), FRAME_STRIDE):
                    ids.append(mid)
                    idxs.append(i)
                    chunks.append(content[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_bytes": chunks}
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
