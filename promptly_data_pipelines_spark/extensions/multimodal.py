"""Multimodal column plumbing (SURVEY.md §2j X7 / north-star).

Media (image/audio/video) travels as an opaque ``binary`` column plus
typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python invocation processes a whole record
batch, never a row.

The codec boundary ``decode_media`` has three tiers:

- REAL stdlib codecs: ``bmp`` (BITMAPFILEHEADER + BITMAPINFOHEADER →
  true width/height/bpp) and ``wav`` (RIFF chunk walk → true
  sample_rate/n_channels) parsed with ``struct.unpack``; since r10
  ``png`` — a full COMPRESSED codec (DEFLATE via stdlib zlib + the
  five scanline filters + r11 palette lookup, extensions/png.py);
  and since r11 ``jpeg`` — a full baseline-sequential LOSSY codec
  (vectorized 8×8 DCT + Annex K quant/Huffman tables, grayscale /
  4:4:4 / 4:2:2 / 4:2:0, restart markers — extensions/jpeg.py).
  ``encode_bmp``/``encode_wav``/``encode_png``/``encode_jpeg`` build
  valid payloads for synthesis and round-trip tests.
- a deterministic fake ("bytestats") exercising the Arrow round-trip.
- the remaining entropy-coded codecs (MP3/H.264 ...) raise
  NotImplementedError — audio/video transform stacks (MDCT + psycho-
  acoustic bit allocation, inter-frame motion compensation) genuinely
  need the absent codec libraries; plugging one in changes only this
  function. Progressive/arithmetic JPEG variants raise ValueError
  from the jpeg module itself (loud refusal with the reason).

The harness has no binary fixture, so media bytes are synthesized
deterministically from ``documents.text`` (utf-8 encode, or packed
into valid BMP/WAV containers by ``media_table_mixed``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import query
from .jpeg import decode_jpeg, decode_jpeg_header, encode_jpeg, resize_jpeg
from .png import decode_png, decode_png_header, encode_png, encode_png_palette, resize_png

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
        T.StructField("byte_sum_mod", T.IntegerType()),
        # per-codec typed features: null where the type has no notion
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)

_FEATURE_KEYS = ("byte_sum_mod", "width", "height", "sample_rate", "n_channels")


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """A valid uncompressed 24-bpp BMP: BITMAPFILEHEADER (14 B) +
    BITMAPINFOHEADER (40 B) + 4-byte-aligned pixel rows filled by
    cycling ``pixels``. Pure stdlib struct — used to synthesize image
    payloads and to round-trip-test the decoder."""
    row_size = ((width * 3 + 3) // 4) * 4
    img_size = row_size * height
    body = (pixels * (img_size // max(1, len(pixels)) + 1))[:img_size] if pixels else bytes(img_size)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + body


def encode_wav(sample_rate: int, n_channels: int, pcm: bytes) -> bytes:
    """A valid 16-bit PCM RIFF/WAVE container around ``pcm`` bytes."""
    block_align = n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    return struct.pack("<4sI4s", b"RIFF", 36 + len(pcm), b"WAVE") + fmt + data


def _decode_bmp(payload: bytes) -> dict:
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic or truncated header)")
    width, height = struct.unpack_from("<ii", payload, 18)
    return {"width": width, "height": abs(height)}  # negative height = top-down rows


def _decode_wav(payload: bytes) -> dict:
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    off = 12  # chunk walk: fmt need not be the first chunk
    while off + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, off)
        if cid == b"fmt ":
            # the fmt unpack needs 8 more bytes past the chunk header —
            # bounds-check so a truncated chunk raises the documented
            # ValueError, not struct.error
            if off + 16 > len(payload) or size < 8:
                raise ValueError("WAV payload has a truncated fmt chunk")
            _fmt, n_channels, sample_rate = struct.unpack_from("<HHI", payload, off + 8)
            return {"sample_rate": sample_rate, "n_channels": n_channels}
        off += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    raise ValueError("WAV payload has no fmt chunk")


def decode_media(payload: bytes, media_type: str) -> dict:
    """The codec boundary. Returns one uniform feature dict (keys =
    FEATURE_SCHEMA minus ids; None where the codec has no notion).
    'bmp'/'wav' are REAL stdlib-struct header parsers; 'bytestats' is
    the deterministic fake; compressed codecs raise — their bodies
    need the absent image/audio libraries."""
    feats = dict.fromkeys(_FEATURE_KEYS)
    feats.update(
        n_bytes=len(payload),
        first_byte=payload[0] if payload else -1,
        last_byte=payload[-1] if payload else -1,
    )
    if media_type == "bytestats":
        feats["byte_sum_mod"] = sum(payload) % 256
    elif media_type == "bmp":
        feats.update(_decode_bmp(payload))
    elif media_type == "wav":
        feats.update(_decode_wav(payload))
    elif media_type == "png":
        # real compressed codec (extensions/png.py): signature + IHDR
        # CRC-verified header decode — width/height/channels without
        # inflating the pixel stream (the cheap metadata path)
        feats.update(decode_png_header(payload))
    elif media_type == "jpeg":
        # real lossy codec (extensions/jpeg.py): marker walk through
        # SOF0 — width/height/channels without entropy decoding
        feats.update(decode_jpeg_header(payload))
    elif media_type == "avi":
        # real video container (extensions/video.py): RIFF walk to
        # avih — dims without touching frame data; frame-level decode
        # lives in extract_video_frames (row-exploding, separate op)
        from .video import decode_avi_header

        hdr = decode_avi_header(payload)
        feats.update(width=hdr["width"], height=hdr["height"])
    else:
        raise NotImplementedError(
            f"codec for media_type={media_type!r} not available in this environment "
            "(image/audio libraries not installed); plug a real decoder in here"
        )
    return feats


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → synthetic binary payload column (the opaque
    media bytes + typed metadata shape)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lit("bytestats").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Python call per Arrow batch;
    partitioning of the input is preserved (no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_media(p, mt) for p, mt in zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame(feats)
            for c in out.columns:  # nullable Int32: per-codec fields are None elsewhere
                out[c] = pd.array(out[c], dtype="Int32")
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def _resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of an uncompressed 24-bpp BMP,
    re-encoded as a valid bottom-up BMP of the target dims.

    Validates first (via _decode_bmp + the 24-bpp/BI_RGB header fields
    + pixel-array length) so every malformed or unsupported payload —
    short header, 32-bpp, RLE-compressed, truncated body — raises the
    documented ValueError, never struct.error or silent garbage.
    Top-down sources (negative biHeight: rows stored top-to-bottom)
    are re-ordered during the gather so the output image keeps its
    orientation instead of flipping.

    The gather itself is a vectorized numpy fancy-index over the whole
    pixel array (row index × column index tables), not per-pixel
    Python — the Arrow batch hands us contiguous bytes, numpy maps
    them zero-copy, and one advanced-indexing op does the resize."""
    _decode_bmp(payload)  # magic + minimum-length validation
    src_w, src_h_signed = struct.unpack_from("<ii", payload, 18)
    (bitcount,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (biBitCount={bitcount}, "
            f"biCompression={compression}); only uncompressed 24-bpp is supported"
        )
    if src_w <= 0 or src_h_signed == 0:
        raise ValueError(f"invalid BMP dimensions {src_w}x{src_h_signed}")
    src_h = abs(src_h_signed)
    (off,) = struct.unpack_from("<I", payload, 10)
    src_row = ((src_w * 3 + 3) // 4) * 4
    if off + src_row * src_h > len(payload):
        raise ValueError("truncated BMP pixel array")
    pixels = (
        np.frombuffer(payload, dtype=np.uint8, count=src_row * src_h, offset=off)
        .reshape(src_h, src_row)[:, : src_w * 3]
        .reshape(src_h, src_w, 3)
    )
    # output is bottom-up: stored row y is image row (height-1-y). Map it
    # to the source's STORED row index, honoring source orientation.
    img_rows = np.minimum(np.arange(height) * src_h // height, src_h - 1)
    sy = img_rows if src_h_signed > 0 else src_h - 1 - img_rows
    sx = np.minimum(np.arange(width) * src_w // width, src_w - 1)
    gathered = pixels[sy][:, sx, :]  # (height, width, 3) in one gather
    out_row_size = ((width * 3 + 3) // 4) * 4
    body = np.zeros((height, out_row_size), dtype=np.uint8)
    body[:, : width * 3] = gathered.reshape(height, width * 3)
    return encode_bmp(width, height, body.tobytes())


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize over mapInPandas (typed dims + new payload). 'bmp' gets
    a REAL nearest-neighbor downscale (valid BMP out, _resize_bmp);
    'bytestats' payloads are deterministically re-sampled to
    EXACTLY width*height bytes (nearest-neighbor index resample
    across the whole payload — the BMP formula in one dimension);
    other types raise via decode_media (compressed codecs absent) or
    ValueError (resize undefined for audio). Partitioning preserved,
    one Python call per Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            out_payloads = []
            for p, mt in zip(pdf["payload"], pdf["media_type"]):
                if mt == "bmp":
                    out_payloads.append(_resize_bmp(p, width, height))
                elif mt == "png":
                    # full decode → NN gather → re-encode (valid PNG out)
                    out_payloads.append(resize_png(p, width, height))
                elif mt == "jpeg":
                    # full lossy decode → NN gather → re-encode
                    out_payloads.append(resize_jpeg(p, width, height))
                elif mt == "bytestats":
                    # TRUE nearest-neighbor resample across the whole
                    # payload to exactly width*height bytes (same index
                    # formula as the BMP path) — the old stride-prefix
                    # form returned a plain prefix for payloads between
                    # 1× and 2× the target and a SHORT payload (schema
                    # said 8×8, bytes said less) below it.
                    if len(p):
                        out_payloads.append(
                            bytes(p[i * len(p) // target] for i in range(target))
                        )
                    else:
                        out_payloads.append(b"\x00" * target)
                else:
                    decode_media(p, mt)  # raises for absent codecs
                    raise ValueError(f"resize undefined for media_type={mt!r}")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "width": width,
                    "height": height,
                    "payload": out_payloads,
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 16, frame_size: int = 32) -> DataFrame:
    """Frame-sampling plumbing (video → every Nth frame): one input
    row explodes to multiple typed frame rows. The stub treats the
    payload as a concatenation of fixed-size 'frames' and emits every
    Nth — the row-expansion shape (and batch-size behavior) of real
    video sampling, with the decoder swappable at decode_media."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p, mt in zip(pdf["doc_id"], pdf["payload"], pdf["media_type"]):
                if mt != "bytestats":
                    decode_media(p, mt)
                n_frames = max(1, len(p) // frame_size)
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_bytes": bytes(p[idx * frame_size : (idx + 1) * frame_size]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return media.mapInPandas(batches, FRAME_SCHEMA)


def media_table_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-codec media table: each document's bytes packed into a
    VALID container by doc_id % 3 — a 24-bpp BMP with dims derived
    from doc_id, a 16-bit PCM WAV with doc_id-derived sample rate and
    channels, or the raw bytestats payload. Deterministic, so the
    decoded features are assertable; synthesis itself runs as an
    Arrow-batched mapInPandas (the encode is Python-side by nature)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b, k = text.encode("utf-8"), int(doc_id) % 3
                if k == 0:
                    w, h = 4 + int(doc_id) % 29, 3 + int(doc_id) % 17
                    rows.append((doc_id, "bmp", encode_bmp(w, h, b)))
                elif k == 1:
                    sr = 8000 + (int(doc_id) % 5) * 4000
                    rows.append((doc_id, "wav", encode_wav(sr, 1 + int(doc_id) % 2, b)))
                else:
                    rows.append((doc_id, "bytestats", b))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return d.mapInPandas(synth, MEDIA_SCHEMA)


def media_table_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose every payload is a REAL compressed image:
    each document's bytes become the pixel data of a valid PNG with
    doc_id-derived dims and channel count (doc_id%4 → gray / RGB /
    gray+alpha / RGBA), encoded with the production filter heuristic —
    so the table exercises every filter type and both the deflate and
    chunk-CRC paths. Dims are pure functions of doc_id, which is what
    lets a SQL oracle value-check a compressed codec's decode."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        channels = (1, 3, 2, 4)
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w, h = 4 + int(doc_id) % 29, 3 + int(doc_id) % 17
                c = channels[int(doc_id) % 4]
                b = text.encode("utf-8") or b"\x00"
                need = h * w * c
                px = np.frombuffer(
                    (b * (need // len(b) + 1))[:need], dtype=np.uint8
                ).reshape(h, w, c)
                rows.append((doc_id, "png", encode_png(px)))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return d.mapInPandas(synth, MEDIA_SCHEMA)


_PNG_DIMS_SQL = """
           CAST(4 + doc_id % 29 AS INT) AS width,
           CAST(3 + doc_id % 17 AS INT) AS height,
           CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
                                WHEN 2 THEN 2 ELSE 4 END AS INT) AS n_channels
    FROM documents
"""


@query(
    "multimodal_png_features",
    registered=False,
    oracle="SELECT doc_id, 'png' AS media_type," + _PNG_DIMS_SQL,
)
def multimodal_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 with a real COMPRESSED codec value-checked end to end:
    documents → PNG encode (deflate + filter heuristic, mapInPandas)
    → Arrow batch → CRC-verified header decode → typed dims. The
    DuckDB oracle recomputes width/height/channels from doc_id, so a
    wrong filter, a broken CRC, or a mis-framed chunk flips the value
    hash — the strongest check an opaque binary codec admits."""
    feats = extract_features(media_table_png(spark, sf_dir))
    return feats.select("doc_id", "media_type", "width", "height", "n_channels")


@query(
    "multimodal_png_roundtrip",
    registered=False,
    oracle="""
    SELECT doc_id,
           CAST(8 AS INT) AS width,
           CAST(6 AS INT) AS height,
           CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
                                WHEN 2 THEN 2 ELSE 4 END AS INT) AS n_channels
    FROM documents
    """,
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full compressed-raster loop: encode → resize_media (decode,
    all five unfilters reachable, vectorized NN gather, re-encode) →
    SECOND decode of the re-encoded bytes. Getting (8, 6, channels)
    back out requires every stage to produce a spec-valid PNG — a
    corrupt re-encode fails the second decode loudly rather than
    hashing wrong."""
    resized = resize_media(media_table_png(spark, sf_dir), 8, 6)
    feats = extract_features(resized.select("doc_id", "media_type", "payload"))
    return feats.select("doc_id", "width", "height", "n_channels")


_PAL_N = 8  # palette entries in the synthetic type-3 fixtures


def media_table_png_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table of REAL color-type-3 (palette) PNGs — the most
    common PNG color type on the web. Index plane cycles 0.._PAL_N-1
    in raster order; palette entry i is ((doc_id·31+i·7)%256,
    (doc_id·17+i·11)%256, (doc_id·13+i·5)%256); dims are the same
    doc_id functions as media_table_png. Everything about the decoded
    image is therefore closed-form in doc_id — which is what lets a
    SQL oracle value-check the PLTE lookup itself, not just the
    header."""
    d = table(spark, sf_dir, "documents").select("doc_id")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 29, 3 + i % 17
                idx = (np.arange(h * w, dtype=np.int64) % _PAL_N).astype(
                    np.uint8
                ).reshape(h, w)
                k = np.arange(_PAL_N, dtype=np.int64)
                pal = np.stack(
                    [(i * 31 + k * 7) % 256, (i * 17 + k * 11) % 256,
                     (i * 13 + k * 5) % 256],
                    axis=1,
                ).astype(np.uint8)
                rows.append((doc_id, "png", encode_png_palette(idx, pal)))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return d.mapInPandas(synth, MEDIA_SCHEMA)


_PALETTE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("r_sum", T.LongType()),
        T.StructField("g_sum", T.LongType()),
        T.StructField("b_sum", T.LongType()),
    ]
)


@query(
    "multimodal_png_palette",
    registered=False,  # r13 rotation: demoted (multimodal keeps pipeline/jpeg/video/audio rows); pytest oracle parity unchanged
    oracle=f"""
    SELECT doc_id,
           CAST(4 + doc_id % 29 AS INT) AS width,
           CAST(3 + doc_id % 17 AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           CAST((SELECT SUM((((4 + doc_id % 29) * (3 + doc_id % 17)
                              + {_PAL_N} - 1 - i) // {_PAL_N})
                            * ((doc_id * 31 + i * 7) % 256))
                 FROM generate_series(0, {_PAL_N - 1}) AS t(i)) AS BIGINT) AS r_sum,
           CAST((SELECT SUM((((4 + doc_id % 29) * (3 + doc_id % 17)
                              + {_PAL_N} - 1 - i) // {_PAL_N})
                            * ((doc_id * 17 + i * 11) % 256))
                 FROM generate_series(0, {_PAL_N - 1}) AS t(i)) AS BIGINT) AS g_sum,
           CAST((SELECT SUM((((4 + doc_id % 29) * (3 + doc_id % 17)
                              + {_PAL_N} - 1 - i) // {_PAL_N})
                            * ((doc_id * 13 + i * 5) % 256))
                 FROM generate_series(0, {_PAL_N - 1}) AS t(i)) AS BIGINT) AS b_sum
    FROM documents
    """,
)
def multimodal_png_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palette-PNG decode value-checked end to end: type-3 encode
    (bpp=1 filtered index plane + PLTE) → full decode (chunk CRCs,
    inflate, unfilter, PLTE table lookup → RGB) → per-channel pixel
    sums. The DuckDB oracle recomputes each channel sum in closed form
    from doc_id alone: index i appears count_i = (h·w+N-1-i)//N times
    in the cycling raster, so channel_sum = Σ count_i · pal[i][ch]. A
    wrong lookup, a swapped channel, an unfilter slip on the index
    plane, or a mis-parsed PLTE flips the hash."""
    media = media_table_png_palette(spark, sf_dir)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_png(p).astype(np.int64)
                rows.append(
                    (doc_id, px.shape[1], px.shape[0], px.shape[2],
                     int(px[:, :, 0].sum()), int(px[:, :, 1].sum()),
                     int(px[:, :, 2].sum()))
                )
            out = pd.DataFrame(
                rows, columns=[f.name for f in _PALETTE_DECODE_SCHEMA]
            )
            for c in ("width", "height", "n_channels"):
                out[c] = out[c].astype("int32")
            yield out

    return media.mapInPandas(batches, _PALETTE_DECODE_SCHEMA)


def media_table_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table of REAL baseline JPEGs with a closed-form decode:
    every image is (1+doc_id%3)×(1+doc_id%4) FLAT 8×8 blocks, block k
    (raster order) holding value 128 + 2·((doc_id·7 + k·5) % 61 − 30).
    A flat block is DC-only under the DCT, and with quality 50's
    Q₀₀ = 16 an even offset quantizes exactly (S₀₀ = 8·(v−128), step
    16) — so the LOSSY codec round-trips these pixels bit-exactly,
    which is what lets a SQL oracle value-check the full decode."""
    d = table(spark, sf_dir, "documents").select("doc_id")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                bw, bh = 1 + i % 4, 1 + i % 3
                k = np.arange(bh * bw, dtype=np.int64)
                v = (128 + 2 * ((i * 7 + k * 5) % 61 - 30)).astype(np.uint8)
                img = np.repeat(np.repeat(v.reshape(bh, bw), 8, axis=0), 8, axis=1)
                rows.append((doc_id, "jpeg", encode_jpeg(img, quality=50)))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return d.mapInPandas(synth, MEDIA_SCHEMA)


_JPEG_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
    ]
)


@query(
    "multimodal_jpeg_decode",
    registered=False,
    oracle="""
    SELECT doc_id,
           CAST(8 * (1 + doc_id % 4) AS INT) AS width,
           CAST(8 * (1 + doc_id % 3) AS INT) AS height,
           CAST(1 AS INT) AS n_channels,
           CAST(64 * (SELECT SUM(128 + 2 * ((doc_id * 7 + k * 5) % 61 - 30))
                      FROM generate_series(0, 11) AS t(k)
                      WHERE k < (1 + doc_id % 4) * (1 + doc_id % 3))
                AS BIGINT) AS px_sum
    FROM documents
    """,
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LOSSY codec value-checked end to end: flat-block synthesis
    → baseline JPEG encode (DCT, quantize, zigzag, DPCM+RLE Huffman,
    byte stuffing) → full decode (marker walk, Huffman, dequantize,
    IDCT) → pixel sum, against a DuckDB oracle that recomputes the sum
    in closed form from doc_id (the DC-only construction makes the
    round trip exact — see media_table_jpeg). A wrong quant table, a
    Huffman slip, a zigzag transposition, or an IDCT scaling error
    flips the hash."""
    media = media_table_jpeg(spark, sf_dir)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_jpeg(p).astype(np.int64)
                rows.append(
                    (doc_id, px.shape[1], px.shape[0], 1, int(px.sum()))
                )
            out = pd.DataFrame(rows, columns=[f.name for f in _JPEG_DECODE_SCHEMA])
            out["doc_id"] = out["doc_id"].astype("int64")
            out["px_sum"] = out["px_sum"].astype("int64")
            for c in ("width", "height", "n_channels"):
                out[c] = out[c].astype("int32")
            yield out

    return media.mapInPandas(batches, _JPEG_DECODE_SCHEMA)


@query(
    "multimodal_jpeg_roundtrip",
    oracle="""
    SELECT doc_id,
           CAST(16 AS INT) AS width,
           CAST(8 AS INT) AS height,
           CAST(1 AS INT) AS n_channels
    FROM documents
    """,
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full lossy-raster loop: encode → resize_media (decode, NN
    gather, re-encode) → SECOND decode of the re-encoded bytes.
    Getting (16, 8, 1) back requires every stage to emit a spec-valid
    baseline JPEG — a corrupt re-encode fails the second decode
    loudly rather than hashing wrong."""
    resized = resize_media(media_table_jpeg(spark, sf_dir), 16, 8)
    feats = extract_features(resized.select("doc_id", "media_type", "payload"))
    return feats.select("doc_id", "width", "height", "n_channels")


@query("multimodal_features_mixed", registered=False)  # binary features: rows-only check
def multimodal_features_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 with REAL codecs in the loop: mixed BMP/WAV/bytestats
    payloads → decode_media parses true width/height (BMP header) and
    sample_rate/n_channels (RIFF fmt chunk) with stdlib struct — the
    non-stub path of the codec boundary, end-to-end through the same
    Arrow-batched extract_features plumbing."""
    return extract_features(media_table_mixed(spark, sf_dir))


@query("multimodal_resize", registered=False)  # stub codec: rows-only check
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star: media resize over mapInPandas (stubbed codec,
    real Spark plumbing — schema, Arrow batching, partitioning)."""
    return resize_media(media_table(spark, sf_dir), 8, 8)


@query("multimodal_frame_sample", registered=False)  # stub codec: rows-only check
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star: frame sampling over mapInPandas — 1→N row expansion
    with typed frame rows (stubbed decoder)."""
    return sample_frames(media_table(spark, sf_dir), every_n=4)


@query("multimodal_features", registered=False)  # byte-level UDF pipeline: rows-only check
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7/north-star: binary media column → Arrow-batched feature
    extraction → typed feature frame. The stub codec keeps it
    deterministic; swapping in a real decoder changes only
    ``decode_media``."""
    return extract_features(media_table(spark, sf_dir))


@query(
    "json_props_struct",
    registered=False,  # r10 rotation: demoted to local tier (family keeps a driver row); pytest oracle-parity still covers it
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER) AS k,
           CASE WHEN CAST(props->>'$.k' AS INTEGER) >= 50 THEN 'high' ELSE 'low' END AS k_band
    FROM events
    WHERE props IS NOT NULL
    """,
)
def json_props_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: typed access into a semi-structured props column via
    from_json with a declared schema (multimodal metadata travels the
    same way: typed struct next to the opaque payload)."""
    ev = table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    parsed = ev.withColumn("p", F.from_json("props", "k int"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_band"),
    )


# r6: the driver row IS oracle-checkable — every media_table row is the
# deterministic 'bytestats' codec, so the three mapInPandas stages
# reduce to pure byte arithmetic DuckDB can mirror: the 8×8 resample is
# out[i] = payload[i·n/64] (nearest-neighbor index formula from
# resize_media), features are first/last/sum%256 over those 64 bytes,
# and frame sampling of a 64-byte payload at frame_size=32/every_n=4
# always yields exactly frame 0. Bytes come out of the blob via its hex
# string (2 hex chars per byte) — DuckDB has no blob substring.
_PIPELINE_ORACLE = """
    WITH m AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n,
             hex(encode(text)) AS hx
      FROM documents
    ),
    rs AS (
      SELECT doc_id, i,
             CASE WHEN n = 0 THEN 0
                  ELSE ('0x' || substr(hx, CAST(2 * (i * n // 64) AS INT) + 1, 2))::INT
             END AS v
      FROM m, (SELECT unnest(range(0, 64)) AS i) u
    ),
    feat AS (
      SELECT doc_id,
             CAST(max(CASE WHEN i = 0 THEN v END) AS INT) AS first_byte,
             CAST(max(CASE WHEN i = 63 THEN v END) AS INT) AS last_byte,
             CAST(sum(v) % 256 AS INT) AS byte_sum_mod
      FROM rs GROUP BY doc_id
    )
    SELECT doc_id, 'bytestats' AS media_type, CAST(64 AS INT) AS n_bytes,
           first_byte, last_byte, byte_sum_mod,
           CAST(1 AS BIGINT) AS n_frames, CAST(0 AS INT) AS max_frame_idx
    FROM feat
"""


@query("multimodal_pipeline", oracle=_PIPELINE_ORACLE)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 composite (driver row for the multimodal family; the three
    single-stage queries above are local-only): the full media pipeline
    chained — binary payload → resize (mapInPandas, typed dims) →
    feature extraction (Arrow-batched decode) joined with frame
    sampling (1→N row expansion) aggregated back per doc. All three
    Pandas-UDF stages execute in one plan; the codec is the documented
    deterministic stub, the Spark plumbing (schemas, Arrow batching,
    partition preservation, row expansion) is real. At 100 TB each
    stage is embarrassingly parallel over media partitions; the only
    shuffle is the per-doc frame-count aggregation."""
    media = media_table(spark, sf_dir)
    # the resize stage feeds TWO consumers (features + frame sampling):
    # persist it, or each branch of the join re-executes the whole
    # media scan + resize mapInPandas — at 100 TB the duplicated
    # decode/resize pass would be the dominant wasted cost.
    resized = resize_media(media, 8, 8).persist()
    feats = extract_features(resized.select("doc_id", "media_type", "payload"))
    frames = sample_frames(resized.select("doc_id", "media_type", "payload"), every_n=4)
    frame_stats = frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_idx").alias("max_frame_idx"),
    )
    return feats.join(frame_stats, "doc_id").select(
        "doc_id",
        "media_type",
        "n_bytes",
        "first_byte",
        "last_byte",
        "byte_sum_mod",
        "n_frames",
        "max_frame_idx",
    )
