"""Multimodal (binary) column operations for training-data pipelines.

Media (image/audio/video) is carried as an opaque ``BINARY`` column plus a
typed metadata struct — exactly how the reference separates ``image_data:
bytes`` from its serialized entities (page_models.py:62-65,190-193; the
design doc stores bytes in a keyed side-table, 設計.md:43-67). All
operations here are Spark-side plumbing that is real and tested at scale
semantics (schema, partitioning, Arrow batch shape). The pixel decode is
REAL for PNG (functions/png.py — the engine's own S5 region crops
round-trip container → pixels → features with zero raster libraries,
see decode_features); only foreign codecs (JPEG/audio/video) remain a
deployment seam — swap `_decode_real` for PIL/ffmpeg there, and
byte-level `fake_features` stands in deterministically meanwhile.

Scale notes:

* metadata extraction (mime sniff, byte length, checksum) is pure JVM
  column arithmetic over the binary column — runs at scan speed, never
  copies payload bytes into Python;
* frame sampling is expressed with ``sequence`` + ``transform`` +
  ``substring`` (JVM, codegen'd): the payload is sliced columnar-side, so
  a 100 TB video table never round-trips whole payloads through Python;
* feature extraction (the genuinely-Python step) is an Arrow-batched
  ``mapInPandas`` whose output schema is fixed — one row per input row,
  ``array<double>`` features — so it pipelines inside the scan stage with
  zero shuffles, like pipeline.extract.

The testdata has no binary column, so the driver-facing queries synthesize
the payload deterministically as ``cast(text as binary)`` — identical bytes
in DuckDB via ``encode(text)`` — keeping every step oracle-checkable.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRAME_BYTES = 64          # fake fixed-size "frame" for the sampling demo
FRAME_STRIDE = 4          # sample every 4th frame
N_FEATURES = 8

MEDIA_META_SCHEMA = (
    "n_bytes INT, checksum STRING, mime STRING"
)


def _docs_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a synthesized opaque binary payload column."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.withColumn("payload", F.col("text").cast("binary"))


# ---------------------------------------------------------------------------
# metadata: JVM-side, no Python
# ---------------------------------------------------------------------------

def media_metadata_cols(payload: str = "payload"):
    """Typed metadata columns from an opaque binary payload (magic-byte
    sniff + size + checksum) — the 'decode header' step, JVM-side."""
    p = F.col(payload)
    head = p.cast("string").substr(1, 4)
    mime = (
        F.when(head.startswith("<htm") | head.startswith("<!do"), "text/html")
        .when(head.startswith("%PDF"), "application/pdf")
        .when(head.startswith("{"), "application/json")
        .otherwise("application/octet-stream")
    )
    return [
        F.length(p).alias("n_bytes"),
        F.md5(p).alias("checksum"),
        mime.alias("mime"),
    ]


RESIZE_TARGET = 96          # target "pixels" (bytes) after resample


def resized_checksum_col(col: str = "text"):
    """Nearest-neighbor 1-D resample of the payload to RESIZE_TARGET
    samples, digested: sample i comes from source position
    floor(i*n/target) — the exact index arithmetic of an image
    nearest-neighbor resize, applied to the byte stream since no raster
    codec exists in this sandbox (a real deployment decodes in
    ``_decode_real`` and resizes pixels; the indexing and columnar shape
    are what this pins). All JVM-side — the payload never enters
    Python; works for both down- and up-sampling (n < target duplicates
    samples); NULL for empty payloads.

    KEEP THIS IN A CODEGEN'D STAGE: any projection adjacent to an
    Arrow/Python runner (input OR output side) runs interpreted, where
    this transform costs ~300µs/row instead of ~10 (measured 1.5–1.7 s
    vs 0.05 s at sf0.1) — the reason q_mm_features computes its resize
    digest in Python inside its Arrow stage instead."""
    resized = F.expr(
        f"array_join(transform(sequence(0, {RESIZE_TARGET - 1}), "
        f"i -> substring({col}, cast((i * length({col})) div {RESIZE_TARGET} "
        "as int) + 1, 1)), '')")
    return F.when(F.length(F.expr(col)) > 0, F.md5(resized.cast("binary")))


def q_mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction (size/checksum/mime sniff)."""
    d = _docs_media(spark, sf_dir)
    return d.select("doc_id", *media_metadata_cols())


SQL_MM_METADATA = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum,
       CASE WHEN substr(text, 1, 4) IN ('<htm', '<!do') THEN 'text/html'
            WHEN substr(text, 1, 4) = '%PDF' THEN 'application/pdf'
            WHEN substr(text, 1, 1) = '{' THEN 'application/json'
            ELSE 'application/octet-stream' END AS mime
FROM documents
"""


# ---------------------------------------------------------------------------
# frame sampling: JVM-side slicing (no payload bytes through Python)
# ---------------------------------------------------------------------------

def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary 'video': fixed FRAME_BYTES frames,
    every FRAME_STRIDE-th sampled; emits one row per sampled frame with
    its byte slice's checksum (the slice itself stays binary/columnar).

    The oracle slices the VARCHAR (char offsets) while Spark slices the
    payload bytes, so both engines filter to ascii-only docs (byte length
    == char length) — the assumption is enforced, not assumed; a future
    multi-byte fixture row is excluded on both sides instead of producing
    a confusing checksum mismatch. Covers the whole corpus: the output is
    bounded by the sampling stride, not an id cap."""
    d = (_docs_media(spark, sf_dir)
         .where(F.octet_length("text") == F.length("text")))
    n_frames = F.floor(F.length("payload") / FRAME_BYTES).cast("int")
    d = d.withColumn("n_frames", n_frames).where(F.col("n_frames") > 0)
    idx = F.explode(F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(FRAME_STRIDE)))
    d = d.select("doc_id", "payload", "n_frames", idx.alias("frame_no"))
    frame = F.col("payload").substr(
        F.col("frame_no") * FRAME_BYTES + 1, F.lit(FRAME_BYTES))
    return d.select(
        "doc_id", "frame_no", "n_frames",
        F.md5(frame).alias("frame_checksum"))


SQL_MM_FRAME_SAMPLE = f"""
-- payload bytes == text chars (ASCII corpus), so the oracle slices the
-- VARCHAR; md5(string) == md5(its ascii bytes)
WITH v AS (
  SELECT doc_id, text,
         CAST(floor(length(text) / {FRAME_BYTES}) AS INTEGER) AS n_frames
  FROM documents WHERE strlen(text) = length(text)
), f AS (
  SELECT doc_id, text, n_frames,
         unnest(range(0, n_frames, {FRAME_STRIDE})) AS frame_no
  FROM v WHERE n_frames > 0
)
SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no, n_frames,
       md5(substr(text, CAST(frame_no * {FRAME_BYTES} + 1 AS INTEGER),
                  {FRAME_BYTES})) AS frame_checksum
FROM f
"""


# ---------------------------------------------------------------------------
# feature extraction: Arrow-batched Python (the stubbed decode seam)
# ---------------------------------------------------------------------------

from .png import SIGNATURE as REGION_MAGIC  # regions are real PNG bytes

REGION_DPI = 4              # synthetic raster resolution (px per inch)
REGION_MAX_PX = 24          # dimension clamp keeps goldens compact


def region_dims(bbox) -> tuple[int, int]:
    """Pixel dims of the synthetic crop raster: REGION_DPI px per inch
    of bbox extent, clamped to [1, REGION_MAX_PX] — the deterministic
    stand-in for the reference's x2 matrix / 300 dpi render scale
    (pymupdf_image_extractor.py:40-41)."""
    import math
    w = max(1, min(REGION_MAX_PX, math.ceil((bbox[2] - bbox[0]) * REGION_DPI)))
    h = max(1, min(REGION_MAX_PX, math.ceil((bbox[3] - bbox[1]) * REGION_DPI)))
    return w, h


def extract_image_region(payload: bytes, page_number: int,
                         bbox) -> bytes | None:
    """S5: the reference's pixmap crop emits real PNG bytes
    (pymupdf_image_extractor.py:15-50 — inch bbox ×72 → pt clip (P7),
    ×2 matrix / 300 dpi → PNG). No raster codec exists in this sandbox,
    so the PIXELS are a deterministic synthetic raster (the md5 digest
    stream of payload + page + pt bbox, tiled to fill) — but the
    CONTAINER is a valid, decodable 8-bit RGB PNG from the stdlib-only
    encoder (functions/png.py), with the pt-space bbox carried in a
    tEXt chunk. Downstream consumers get real image bytes; tests decode
    them back and verify the pixel stream (round-trip gate). A real
    deployment swaps only the pixel source (``_decode_real``), never
    the container or the Spark plumbing.

    The Spark-side design is the real point: the crop runs INSIDE the
    parse stage where the payload is already in hand. The reference
    re-opens the PDF once per crop (pymupdf_image_extractor.py:33);
    at 10^12 documents that is a second full scan plus a join — here it
    is zero extra I/O and zero shuffles.
    """
    import hashlib

    from .png import encode_png
    if payload is None or bbox is None:
        return None
    pts = [x * 72.0 for x in bbox]  # P7: inch -> pt
    bbox_txt = ",".join(f"{p:.4f}" for p in pts)
    key = f"{page_number}|{bbox_txt}"
    digest = hashlib.md5(payload + key.encode("utf-8")).digest()
    w, h = region_dims(bbox)
    n = w * h * 3
    rgb = (digest * (n // len(digest) + 1))[:n]
    return encode_png(w, h, rgb, text={"bbox_pt": bbox_txt,
                                       "page": str(page_number)})


def _decode_real(payload: bytes):  # pragma: no cover - deployment seam
    """Real media decode (PIL/ffmpeg/soundfile). Not available in this
    sandbox — swap in on a real deployment."""
    raise NotImplementedError(
        "media codecs are not installed; use fake_features (deterministic) "
        "or provide a decoder at deployment")


def fake_features(payload: bytes) -> list[float]:
    """Deterministic fake 'decoded' feature vector: byte-histogram moments.

    Stands in for image-embedding / mel-spectrogram extraction; pure
    function of the bytes so tests and both engines agree. Vectorized
    with numpy (one pass + bincount instead of N_FEATURES Python loops
    over the payload — this runs per doc inside the Arrow stage); the
    arithmetic is integer-exact, so the values are bit-identical to the
    scalar formula (mean x10000 floor-divided, bucket = count of bytes
    with x % (N_FEATURES-2) == b, ratios rounded to 4dp).
    """
    if not payload:
        return [0.0] * N_FEATURES
    import numpy as np
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = arr.size
    # scaled integer mean (x10000): exact on both engines, no FP rounding
    # ties (banker's vs half-up) in the oracle comparison
    feats = [float(n % 997),
             float(int(arr.sum(dtype=np.int64)) * 10000 // n)]
    buckets = np.bincount(arr % (N_FEATURES - 2),
                          minlength=N_FEATURES - 2)
    feats.extend(round(int(b) / n, 4) for b in buckets[:N_FEATURES - 2])
    return feats


def decode_features(payload: bytes) -> list[float]:
    """Feature vector from DECODED PIXELS when the payload is a PNG the
    engine can read (functions/png.py — the S5 region crops and anything
    else 8-bit-RGB/filter-0), falling back to the byte-level
    :func:`fake_features` for opaque formats. The decode seam is thereby
    REAL for the engine's own media outputs: region bytes round-trip
    container → pixels → features with no raster library; only foreign
    codecs (JPEG, video) still go through ``_decode_real``.

    Feature slots (fixed N_FEATURES=8, integer-exact like
    fake_features): width, height, n_pixels, page (from the crop's tEXt
    metadata, -1 if absent), mean R/G/B ×10000 floor-divided, mean over
    all channels ×10000.
    """
    if payload and payload[:8] == REGION_MAGIC:
        from .png import decode_png
        try:
            w, h, rgb, text = decode_png(payload)
        except ValueError:
            # valid signature, foreign flavor (interlaced, 16-bit, ...)
            return fake_features(payload)
        import numpy as np
        arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
        n_px = arr.shape[0]
        chan = arr.sum(axis=0, dtype=np.int64) * 10000 // n_px
        page = text.get("page", "")
        return [float(w), float(h), float(n_px),
                float(int(page)) if page.isdigit() else -1.0,
                float(chan[0]), float(chan[1]), float(chan[2]),
                float(int(arr.sum(dtype=np.int64)) * 10000 // (n_px * 3))]
    return fake_features(payload)


def media_features(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id",
                   passthrough: tuple = ()) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    One ``mapInPandas`` stage, fixed output schema ``(id, features,
    *passthrough)``; batch shape = Arrow record batches of
    (id, payload, *passthrough). At 100 TB this pipelines inside the
    scan stage — no shuffle, no driver collection.

    ``passthrough``: (name, ddl_type) pairs of columns computed upstream
    (JVM-side) that ride through the Arrow batch untouched — the
    single-scan alternative to computing them in a second scan and
    joining back (at 10^12 rows that join would shuffle both sides;
    here the extra columns cost only their Arrow transfer).
    """
    from ..deploy import ensure_pyfiles
    ensure_pyfiles(df.sparkSession)

    import pandas as pd

    names = [n for n, _t in passthrough]

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            cols = {
                id_col: pdf[id_col],
                # decode_features: real pixel decode for PNG payloads,
                # byte-identical to fake_features for everything else
                # (the oracle-checked text payloads take that branch)
                "features": [
                    decode_features(bytes(p) if p is not None else b"")
                    for p in pdf[payload_col]
                ],
            }
            for n in names:
                cols[n] = pdf[n]
            yield pd.DataFrame(cols)

    schema = f"{id_col} long, features array<double>"
    for n, t in passthrough:
        schema += f", {n} {t}"
    # the payload itself may be a passthrough (ride through and let a
    # codegen'd projection on top consume it) — select it once
    sel = [id_col, payload_col] + [n for n in names
                                   if n not in (id_col, payload_col)]
    return df.select(*sel).mapInPandas(batches, schema=schema)


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The combined media pipeline row (one driver entry pinning three
    ops over the same payload — the registry must fit the driver's
    50-row check window, and these share grain + ascii filter):

    * metadata (size/checksum/mime sniff) — JVM columns at scan speed;
    * Arrow-batched feature extraction — first two fake features are
      SQL-mirrorable (length mod 997, mean byte), oracle-checking the
      mapInPandas plumbing;
    * nearest-neighbor resample (see resized_checksum_col) — JVM index
      arithmetic, the payload never enters Python.

    Both engines filter to ascii-only docs (byte == char semantics
    pinned, see q_mm_frame_sample). ONE scan, ONE Arrow stage, no join:
    the payload is already in Python for the feature extraction, so the
    per-row scalars (md5, mime sniff, resize digest) compute there too —
    hashlib/C, ~µs/row. The JVM alternative is NOT cheaper here: any
    projection adjacent to a Python runner (its input projection OR the
    project above it) runs INTERPRETED, outside whole-stage codegen —
    measured 1.5–1.7 s at sf0.1 for the 96-element resize transform in
    either position vs 0.05 s in a codegen'd aggregate and ~0.03 s as
    Python bytes sampling. The standalone JVM builders
    (media_metadata_cols, resized_checksum_col) remain the right shape
    for plans with no Python stage."""
    import hashlib

    import pandas as pd

    from ..deploy import ensure_pyfiles
    ensure_pyfiles(spark)
    d = _docs_media(spark, sf_dir).where(
        F.octet_length("text") == F.length("text"))

    def batches(it):
        cols = ["doc_id", "f_len", "f_mean_byte", "n_bytes", "checksum",
                "mime", "resized_checksum"]
        for pdf in it:
            recs = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                f = decode_features(p)
                head = p[:4]
                if head.startswith(b"<htm") or head.startswith(b"<!do"):
                    mime = "text/html"
                elif head.startswith(b"%PDF"):
                    mime = "application/pdf"
                elif head.startswith(b"{"):
                    mime = "application/json"
                else:
                    mime = "application/octet-stream"
                n = len(p)
                # nearest-neighbor resample digest — same index
                # arithmetic as resized_checksum_col, over the bytes
                # (== chars on this ascii-filtered corpus)
                rc = hashlib.md5(bytes(
                    p[(i * n) // RESIZE_TARGET]
                    for i in range(RESIZE_TARGET))).hexdigest() \
                    if n > 0 else None
                recs.append((doc_id, f[0], f[1], n,
                             hashlib.md5(p).hexdigest(), mime, rc))
            yield pd.DataFrame.from_records(recs, columns=cols)

    return d.select("doc_id", "payload").mapInPandas(
        batches,
        schema="doc_id long, f_len double, f_mean_byte double, "
               "n_bytes int, checksum string, mime string, "
               "resized_checksum string")


SQL_MM_FEATURES = f"""
-- the synthesized payload is ASCII text, so byte value == ascii(char)
WITH a AS (
  SELECT doc_id, text FROM documents WHERE strlen(text) = length(text)
), u AS (
  SELECT doc_id, length(text) AS n,
         unnest(range(1, length(text) + 1)) AS i, text
  FROM a WHERE length(text) > 0
), m AS (
  SELECT doc_id, max(n) AS n,
         (sum(ascii(substr(text, CAST(i AS INTEGER), 1)))::BIGINT * 10000)
           // max(n) AS mean_byte
  FROM u GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(m.n, 0) % 997 AS DOUBLE) AS f_len,
       CAST(coalesce(m.mean_byte, 0.0) AS DOUBLE) AS f_mean_byte,
       octet_length(encode(d.text)) AS n_bytes,
       md5(d.text) AS checksum,
       CASE WHEN substr(d.text, 1, 4) IN ('<htm', '<!do') THEN 'text/html'
            WHEN substr(d.text, 1, 4) = '%PDF' THEN 'application/pdf'
            WHEN substr(d.text, 1, 1) = '{{' THEN 'application/json'
            ELSE 'application/octet-stream' END AS mime,
       CASE WHEN length(d.text) > 0 THEN
         md5(list_aggregate(list_transform(range(0, {RESIZE_TARGET}),
               i -> substr(d.text,
                           CAST((i * length(d.text)) // {RESIZE_TARGET}
                                AS INTEGER) + 1, 1)),
             'string_agg', '')) END AS resized_checksum
FROM a d LEFT JOIN m ON d.doc_id = m.doc_id
"""


# mm_metadata and mm_resize are folded into the q_mm_features driver row
# (same per-doc grain and ascii filter; the registry must fit the
# driver's 50-row check window) — their operator functions remain the
# tested building blocks.
REGISTRY = {
    "mm_frame_sample": (q_mm_frame_sample, SQL_MM_FRAME_SAMPLE),
    "mm_features": (q_mm_features, SQL_MM_FEATURES),
}
