"""Multimodal (image/audio/video) operators over opaque binary columns.

Convention: media travels as ``payload: binary`` plus a typed ``metadata``
struct (MEDIA_SCHEMA) — the engine never guesses formats from bytes. Decode
/ feature-extract / resize / frame-sample run as Arrow-batched Pandas UDFs
via ``mapInPandas``: Python is unavoidable for codec work, so the boundary
is one vectorized crossing per batch, never per row.

**Decode stubs.** The image/audio codec libraries are not available in this
container, so the byte-level decode step is STUBBED: when PIL/soundfile are
importable the real decode runs; otherwise a clearly-marked deterministic
fake derives stable pseudo-features from the payload bytes (sha256-seeded).
The Spark-side plumbing — schemas, batch shapes, partitioning, UDF
signatures — is real and tested; swapping the stub for a real codec changes
no plan shape.

Scale shape: ``repartition`` before ``mapInPandas`` spreads CPU-bound decode
across executors independent of file layout; Arrow batch size bounds the
per-batch memory (spark.sql.execution.arrow.maxRecordsPerBatch). Frame
sampling is a ``posexplode`` over a metadata-driven sequence — pure JVM, no
Python, no decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("metadata", MEDIA_METADATA),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("decoder", T.StringType()),  # 'pil' | 'fake'
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic MEDIA_SCHEMA table derived from the ``documents`` table.

    The driver ships no binary fixture, so the media corpus is synthesized
    in-plan: payload = UTF-8 bytes of the text, kind round-robins by
    ``doc_id % 3``, and metadata dims come from arithmetic on ``doc_id`` /
    text length. Pure Column exprs → reproducible across runs AND
    re-computable by the DuckDB oracle (sha256 of the same bytes).
    """
    did = F.col("doc_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (did % 3).cast("int") + 1,
    )
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
        (did % 3).cast("int") + 1,
    )
    meta = F.struct(
        fmt.alias("format"),
        (F.lit(64) + (did % 16) * 32).cast("int").alias("width"),
        (F.lit(64) + (did % 9) * 32).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        (F.length("text").cast("double") / F.lit(100.0)).alias("duration_s"),
        ((did % 240) + 1).cast("int").alias("n_frames"),
    )
    return docs.select(
        did.alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("metadata"),
    )


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except Exception:  # noqa: BLE001
        return None


def _fake_stats(payload: bytes) -> tuple[str, float]:
    """Deterministic FAKE decode: sha256 + a stable pseudo-luma in [0, 255).

    Stands in for pixel statistics until a real codec is installed; derived
    only from the bytes so it is reproducible across runs and engines.
    """
    digest = hashlib.sha256(payload).hexdigest()
    return digest, float(int(digest[:8], 16) % 256000) / 1000.0


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _try_png_decode(payload: bytes):
    """Minimal stdlib PNG decoder → (width, height, mean_luma) or None.

    Pure ``zlib`` + chunk walking: supports the common 8-bit
    non-interlaced color types (grey, grey+alpha, RGB, RGBA) with all
    five scanline filters. Anything else (16-bit, palette, interlaced,
    malformed) returns None and the caller falls back to the stub —
    honest partial-codec behavior, not silent wrong answers. Luma is
    the Rec.601 weighting PIL's 'L' convert uses."""
    import struct
    import zlib

    if not payload.startswith(_PNG_MAGIC):
        return None
    try:
        pos, idat, meta = len(_PNG_MAGIC), [], None
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos:pos + 4])
            ctype = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            if ctype == b"IHDR":
                w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                meta = (w, h, depth, color, interlace)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if meta is None or not idat:
            return None
        w, h, depth, color, interlace = meta
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
        if depth != 8 or channels is None or interlace != 0 or w == 0 or h == 0:
            return None
        raw = zlib.decompress(b"".join(idat))
        stride = w * channels
        if len(raw) != h * (stride + 1):
            return None
        prev = bytearray(stride)
        total = 0.0
        for y in range(h):
            off = y * (stride + 1)
            f = raw[off]
            line = bytearray(raw[off + 1:off + 1 + stride])
            if f == 1:  # Sub
                for i in range(channels, stride):
                    line[i] = (line[i] + line[i - channels]) & 0xFF
            elif f == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif f == 3:  # Average
                for i in range(stride):
                    left = line[i - channels] if i >= channels else 0
                    line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for i in range(stride):
                    left = line[i - channels] if i >= channels else 0
                    ul = prev[i - channels] if i >= channels else 0
                    line[i] = (line[i] + _png_paeth(left, prev[i], ul)) & 0xFF
            elif f != 0:
                return None
            for px in range(w):
                base = px * channels
                if channels >= 3:
                    total += (
                        0.299 * line[base] + 0.587 * line[base + 1] + 0.114 * line[base + 2]
                    )
                else:
                    total += line[base]
            prev = line
        return w, h, total / (w * h)
    except Exception:  # noqa: BLE001 — malformed PNG falls back to the stub
        return None


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-flavor LZW: LSB-first variable-width codes, dictionary resets
    on CLEAR, stops at END. Returns the palette-index stream."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1, None

    table, width, prev = reset()
    out = bytearray()
    acc = nbits = 0
    next_code = end + 1
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width, prev = reset()
                next_code = end + 1
                continue
            if code == end:
                return out
            if code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("bad LZW code")
            out += entry
            if prev is not None and next_code < 4096:
                # dictionary caps at 4096 (12-bit codes); real encoders
                # then either emit CLEAR or defer it and keep emitting
                # 12-bit codes without inserting — mirror by not inserting
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _try_gif_decode(payload: bytes):
    """Minimal stdlib GIF decoder → (width, height, mean_luma) or None.

    First image frame only; global or local color table; no interlace.
    Same honest-fallback contract as the PNG path."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 ** ((flags & 0x07) + 1)
            gct = payload[pos:pos + 3 * n]
            pos += 3 * n
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x21:  # extension: label + sub-blocks
                pos += 1
                while payload[pos]:
                    pos += payload[pos] + 1
                pos += 1
            elif block == 0x2C:  # image descriptor
                ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos:pos + 9])
                pos += 9
                if iflags & 0x40:  # interlaced — out of scope
                    return None
                table = gct
                if iflags & 0x80:
                    n = 2 ** ((iflags & 0x07) + 1)
                    table = payload[pos:pos + 3 * n]
                    pos += 3 * n
                if table is None:
                    return None
                mcs = payload[pos]
                pos += 1
                data = bytearray()
                while payload[pos]:
                    size = payload[pos]
                    data += payload[pos + 1:pos + 1 + size]
                    pos += size + 1
                pos += 1
                idx = _gif_lzw_decode(bytes(data), mcs)
                if len(idx) < iw * ih or iw == 0 or ih == 0:
                    return None
                total = 0.0
                for i in idx[: iw * ih]:
                    base = 3 * i
                    total += (
                        0.299 * table[base]
                        + 0.587 * table[base + 1]
                        + 0.114 * table[base + 2]
                    )
                return iw, ih, total / (iw * ih)
            elif block == 0x3B:  # trailer before any image
                return None
            else:
                return None
        return None
    except Exception:  # noqa: BLE001 — malformed GIF falls back to the stub
        return None


# JPEG baseline decoder (stdlib-only). Scope: sequential DCT (SOF0/SOF1),
# 8-bit samples, grayscale or YCbCr with any Hi/Vi sampling (4:4:4, 4:2:0,
# 4:2:2, ...), restart intervals, 16-bit quant tables. Progressive (SOF2),
# arithmetic coding, and hierarchical modes return None → stub fallback,
# the same honest-partial-codec contract as the PNG/GIF paths.

_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)


def _huffman_lut(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: (code_length, code) → symbol."""
    lut: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _idct_matrix() -> list[list[float]]:
    import math

    return [
        [
            (math.sqrt(0.5) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            / 2.0
            for u in range(8)
        ]
        for x in range(8)
    ]


_IDCT_C: list[list[float]] | None = None


def _idct_8x8(coef: list[float]) -> list[float]:
    """2-D separable inverse DCT of a natural-order 8×8 block."""
    global _IDCT_C
    if _IDCT_C is None:
        _IDCT_C = _idct_matrix()
    c = _IDCT_C
    # rows: tmp[y][u] = sum_v C[y][v] * coef[v*8+u]
    tmp = [[sum(c[y][v] * coef[v * 8 + u] for v in range(8)) for u in range(8)]
           for y in range(8)]
    return [
        sum(c[x][u] * tmp[y][u] for u in range(8))
        for y in range(8)
        for x in range(8)
    ]


class _JpegBits:
    """MSB-first bit reader over entropy-coded data with FF00 destuffing.

    Restart markers are consumed by :meth:`restart` (byte-align + RSTn);
    hitting any other marker mid-read raises, which the caller turns into
    a stub fallback."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.acc, self.n = data, pos, 0, 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("unexpected restart marker")
            else:
                raise ValueError("marker in entropy data")
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def decode(self, lut: dict[tuple[int, int], int]) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")

    def restart(self) -> None:
        self.acc = self.n = 0  # byte-align
        if not (self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("missing restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _jpeg_decode_planes(payload: bytes):
    """Parse + entropy-decode a baseline JPEG → (w, h, planes) or None,
    where ``planes`` is one full-resolution (box-upsampled, cropped)
    row-major list of floats per component, in scan order."""
    import struct

    if payload[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> lut
        frame = None  # (w, h, comps) comps: (cid, hi, vi, tq)
        restart_interval = 0
        pos = 2
        while True:
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            pos += 2
            if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no segment
                continue
            (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
            seg = payload[pos + 2:pos + seglen]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    p += 1
                    if pq:
                        qt[tq] = list(struct.unpack(f">{64}H", seg[p:p + 128]))
                        p += 128
                    else:
                        qt[tq] = list(seg[p:p + 64])
                        p += 64
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    bits = list(seg[p + 1:p + 17])
                    nv = sum(bits)
                    huff[(tc, th)] = _huffman_lut(bits, seg[p + 17:p + 17 + nv])
                    p += 17 + nv
            elif marker in (0xC0, 0xC1):  # SOF0/1: baseline/extended sequential
                prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                if prec != 8 or not w or not h:
                    return None
                comps = [
                    (seg[6 + 3 * i], seg[7 + 3 * i] >> 4, seg[7 + 3 * i] & 15,
                     seg[8 + 3 * i])
                    for i in range(nc)
                ]
                frame = (w, h, comps)
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                return None  # progressive / arithmetic / hierarchical
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif marker == 0xDA:  # SOS
                break
            pos += seglen
        if frame is None:
            return None
        w, h, comps = frame
        ns = seg[0]
        scan = []  # (comp_index, dc_lut, ac_lut)
        for i in range(ns):
            cid, tables = seg[1 + 2 * i], seg[2 + 2 * i]
            ci = next(i for i, c in enumerate(comps) if c[0] == cid)
            scan.append((ci, huff[(0, tables >> 4)], huff[(1, tables & 15)]))
        bits = _JpegBits(payload, pos + seglen)

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if ns == 1:
            # non-interleaved: MCU is a single data unit of that component
            ci = scan[0][0]
            hi, vi = comps[ci][1], comps[ci][2]
            cw, ch = -(-w * hi // hmax), -(-h * vi // vmax)
            mcux, mcuy = -(-cw // 8), -(-ch // 8)
            layout = [(scan[0], 1, 1)]
        else:
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            layout = [(s, comps[s[0]][1], comps[s[0]][2]) for s in scan]

        planes: dict[int, tuple[int, list[float]]] = {}
        for (ci, _, _), bh, bv in layout:
            planes[ci] = (mcux * 8 * bh, [0.0] * (mcux * 8 * bh) * (mcuy * 8 * bv))
        pred = {ci: 0 for (ci, _, _), _, _ in layout}

        for my in range(mcuy):
            for mx in range(mcux):
                n_mcu = my * mcux + mx
                if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                    bits.restart()
                    pred = {ci: 0 for ci in pred}
                for (ci, dc_lut, ac_lut), bh, bv in layout:
                    q = qt[comps[ci][3]]
                    stride = planes[ci][0]
                    for by in range(bv):
                        for bx in range(bh):
                            coef = [0.0] * 64
                            t = bits.decode(dc_lut)
                            pred[ci] += _extend(bits.receive(t), t)
                            coef[0] = pred[ci] * q[0]
                            k = 0
                            while k < 63:
                                sym = bits.decode(ac_lut)
                                run, size = sym >> 4, sym & 15
                                if size == 0:
                                    if run == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += run + 1
                                if k > 63:
                                    raise ValueError("AC overflow")
                                coef[_ZIGZAG[k]] = _extend(bits.receive(size), size) * q[k]
                            px = _idct_8x8(coef)
                            x0 = (mx * bh + bx) * 8
                            y0 = (my * bv + by) * 8
                            plane = planes[ci][1]
                            for yy in range(8):
                                row = (y0 + yy) * stride + x0
                                for xx in range(8):
                                    v = px[yy * 8 + xx] + 128.0
                                    plane[row + xx] = (
                                        0.0 if v < 0.0 else 255.0 if v > 255.0 else v
                                    )

        # box-upsample each plane to full resolution and crop to (w, h)
        out = []
        for ci, _, _ in (s for s, _, _ in layout):
            hi, vi = comps[ci][1], comps[ci][2]
            sx, sy = hmax // hi, vmax // vi
            stride, plane = planes[ci]
            full = [
                plane[(y // sy) * stride + (x // sx)]
                for y in range(h)
                for x in range(w)
            ]
            out.append(full)
        return w, h, out
    except Exception:  # noqa: BLE001 — malformed/unsupported JPEG → stub
        return None


def _try_jpeg_decode(payload: bytes):
    """Minimal stdlib baseline-JPEG decoder → (width, height, mean_luma) or
    None. Grayscale mean is the Y plane; 3-component frames are treated as
    JFIF YCbCr → RGB (clamped) → Rec.601 weighting, matching the PNG path's
    float luma convention."""
    decoded = _jpeg_decode_planes(payload)
    if decoded is None:
        return None
    w, h, planes = decoded
    if len(planes) == 1:
        return w, h, sum(planes[0]) / (w * h)
    if len(planes) != 3:
        return None
    y, cb, cr = planes
    total = 0.0
    for i in range(w * h):
        r = y[i] + 1.402 * (cr[i] - 128.0)
        g = y[i] - 0.344136 * (cb[i] - 128.0) - 0.714136 * (cr[i] - 128.0)
        b = y[i] + 1.772 * (cb[i] - 128.0)
        r = 0.0 if r < 0.0 else 255.0 if r > 255.0 else r
        g = 0.0 if g < 0.0 else 255.0 if g > 255.0 else g
        b = 0.0 if b < 0.0 else 255.0 if b > 255.0 else b
        total += 0.299 * r + 0.587 * g + 0.114 * b
    return w, h, total / (w * h)


def image_features(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Decode images and emit per-image features via Arrow-batched mapInPandas.

    Real paths: PIL when importable (any format); otherwise minimal
    stdlib decoders — PNG (zlib inflate + unfilter), GIF (LZW), and
    baseline JPEG (huffman + dequant + IDCT + chroma upsample) — give
    true width/height/mean-luma with ``decoder`` naming the codec. Stub
    path for everything else: deterministic fake stats; width/height
    pass through from metadata. ``parallelism`` repartitions ahead of
    the Python stage so decode CPU spreads across executors.
    """
    src = df.where(F.col("kind") == "image").select("media_id", "payload", "metadata")
    if parallelism:
        src = src.repartition(parallelism, "media_id")

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        pil = _try_pil()
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["metadata"]
            ):
                payload = bytes(payload) if payload is not None else b""
                if pil is not None:
                    import io

                    try:
                        img = pil.open(io.BytesIO(payload)).convert("L")
                        import numpy as np

                        arr = np.asarray(img, dtype="float64")
                        out.append(
                            (mid, len(payload), hashlib.sha256(payload).hexdigest(),
                             img.width, img.height, float(arr.mean()), "pil")
                        )
                        continue
                    except Exception:  # noqa: BLE001 — fall through to stub
                        pass
                name, decoded = "png", _try_png_decode(payload)
                if decoded is None:
                    name, decoded = "gif", _try_gif_decode(payload)
                if decoded is None:
                    name, decoded = "jpeg", _try_jpeg_decode(payload)
                if decoded is not None:
                    w, h, luma = decoded
                    out.append(
                        (mid, len(payload), hashlib.sha256(payload).hexdigest(),
                         w, h, luma, name)
                    )
                    continue
                digest, luma = _fake_stats(payload)
                meta = meta or {}
                out.append(
                    (mid, len(payload), digest,
                     meta.get("width"), meta.get("height"), luma, "fake")
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return src.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("metadata", MEDIA_METADATA),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads (PIL when present; STUB passes bytes through and
    rewrites metadata dims — plumbing-faithful, marked by metadata.format
    suffix '+fake-resize')."""
    src = df.where(F.col("kind") == "image").select("media_id", "payload", "metadata")

    def do_resize(batches: Iterator) -> Iterator:
        import pandas as pd

        pil = _try_pil()
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["metadata"]):
                payload = bytes(payload) if payload is not None else b""
                meta = dict(meta or {})
                if pil is not None:
                    import io

                    try:
                        img = pil.open(io.BytesIO(payload)).resize((width, height))
                        buf = io.BytesIO()
                        img.save(buf, format=meta.get("format") or "PNG")
                        payload = buf.getvalue()
                        meta.update(width=width, height=height)
                        rows.append((mid, payload, meta))
                        continue
                    except Exception:  # noqa: BLE001
                        pass
                meta.update(
                    width=width,
                    height=height,
                    format=(meta.get("format") or "bin") + "+fake-resize",
                )
                rows.append((mid, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "metadata"])

    return src.mapInPandas(do_resize, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index.

    Pure JVM — ``posexplode(sequence(0, n_frames-1, every_n))`` from
    metadata; the per-frame decode (which would fill ``frame_payload``) is
    the stubbed Python stage downstream. At scale this is the right split:
    the cheap index fan-out stays in codegen, Python only touches frames
    that survive downstream filters.
    """
    vids = df.where((F.col("kind") == "video") & (F.col("metadata")["n_frames"] > 0))
    return vids.select(
        "media_id",
        F.col("metadata")["n_frames"].alias("n_frames"),
        F.posexplode(
            F.sequence(
                F.lit(0), F.col("metadata")["n_frames"] - 1, F.lit(every_n)
            )
        ).alias("sample_idx", "frame_idx"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms_pseudo", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _try_wave_decode(payload: bytes):
    """Decode a RIFF/WAVE payload with the stdlib ``wave`` module →
    (duration_s, rms_normalized) or None if the bytes aren't a WAV.

    The one REAL codec available without external libraries: PCM WAV
    parsing is pure stdlib, so the audio path decodes genuine payloads
    end-to-end while PIL/soundfile-class formats stay stubbed."""
    import io
    import wave

    if not payload.startswith(b"RIFF"):
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate, n, width = w.getframerate(), w.getnframes(), w.getsampwidth()
            frames = w.readframes(n)
    except Exception:  # noqa: BLE001 — malformed RIFF falls back to the stub
        return None
    if rate <= 0 or width not in (1, 2, 4):
        return None
    import numpy as np

    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
    samples = np.frombuffer(frames, dtype=dtype).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned, centered at 128
        samples -= 128.0
    full_scale = float(2 ** (8 * width - 1))
    rms = float(np.sqrt(np.mean(samples**2)) / full_scale) if len(samples) else 0.0
    return n / rate, rms


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature extraction. RIFF/WAVE payloads decode for REAL via
    the stdlib ``wave`` module (true duration from the frame count,
    true normalized RMS from the PCM samples — ``decoder='wave'``);
    anything else keeps the deterministic stub (pseudo-RMS from the
    sha256, duration from metadata — ``decoder='fake'``), which is what
    the synthetic bench payloads exercise and the oracle recomputes."""
    src = df.where(F.col("kind") == "audio").select("media_id", "payload", "metadata")

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["metadata"]):
                payload = bytes(payload) if payload is not None else b""
                meta = meta or {}
                digest, pseudo = _fake_stats(payload)
                decoded = _try_wave_decode(payload)
                if decoded is not None:
                    duration, rms, dec = decoded[0], decoded[1], "wave"
                else:
                    duration, rms, dec = meta.get("duration_s"), pseudo / 256.0, "fake"
                rows.append((mid, len(payload), digest, duration, rms, dec))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return src.mapInPandas(decode, AUDIO_FEATURES_SCHEMA)
