"""Pixel-decode feature path: decode_features reads engine-emitted PNGs
back to pixels (no raster library) and q_region_pixel_features proves the
media seam end-to-end — crop → PNG container → decode → pixel features in
one Arrow stage. Non-PNG payloads must fall back byte-identically to
fake_features (the branch every oracle-checked query takes)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_module_spark.functions.multimodal import (decode_features,
                                                   extract_image_region,
                                                   fake_features,
                                                   region_dims)
from ocr_module_spark.functions.png import decode_png, encode_png


def _manual_features(payload: bytes) -> list[float]:
    w, h, rgb, text = decode_png(payload)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    n = arr.shape[0]
    chan = arr.sum(axis=0, dtype=np.int64) * 10000 // n
    page = text.get("page", "")
    return [float(w), float(h), float(n),
            float(int(page)) if page.isdigit() else -1.0,
            float(chan[0]), float(chan[1]), float(chan[2]),
            float(int(arr.sum(dtype=np.int64)) * 10000 // (n * 3))]


def test_png_payload_features_come_from_decoded_pixels():
    rgb = bytes(range(2 * 3 * 3))  # 2x3 image, distinct channel values
    payload = encode_png(2, 3, rgb, text={"page": "4"})
    got = decode_features(payload)
    assert got == _manual_features(payload)
    assert got[0] == 2.0 and got[1] == 3.0 and got[2] == 6.0
    assert got[3] == 4.0                       # page from tEXt metadata
    # channel means are over the PIXELS, not the container bytes
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    assert got[4] == float(arr[:, 0].sum() * 10000 // 6)
    # and differ from the byte-level fallback on the same payload
    assert got != fake_features(payload)


def test_region_crop_round_trips_to_features():
    payload = b"%PDF-1.4 synthetic page payload for the crop seam"
    bbox = (1.0, 1.0, 3.5, 2.0)
    rb = extract_image_region(payload, 2, bbox)
    got = decode_features(rb)
    w, h = region_dims(bbox)
    assert (got[0], got[1]) == (float(w), float(h))
    assert got[3] == 2.0
    assert got == _manual_features(rb)


def test_non_png_falls_back_to_byte_features():
    for payload in (b"", b"plain text payload", b"\x89PNGnot really",
                    b"%PDF-1.4 whatever"):
        assert decode_features(payload) == fake_features(payload)


def test_zero_dimension_png_falls_back_not_crashes():
    """ADVICE r3: a crafted width=0 PNG with VALID CRCs passes the
    signature/flavor checks but has no pixels — decode must reject it
    (ValueError) so features degrade to byte features instead of a
    ZeroDivisionError killing the whole Arrow stage."""
    import struct
    import zlib
    from zlib import crc32

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", crc32(ctype + body) & 0xFFFFFFFF))

    for w, h in ((0, 3), (3, 0), (0, 0)):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(b""))
                   + chunk(b"IEND", b""))
        with pytest.raises(ValueError):
            decode_png(payload)
        assert decode_features(payload) == fake_features(payload)


def test_foreign_png_flavor_falls_back_not_crashes():
    # valid signature + IHDR claiming 16-bit depth: decode refuses,
    # feature extraction must degrade to byte features, never raise
    good = encode_png(2, 2, bytes(12))
    bad = bytearray(good)
    bad[24] = 16  # IHDR bit-depth byte
    assert decode_features(bytes(bad)) == fake_features(bytes(bad))


@pytest.mark.usefixtures("spark")
def test_region_pixel_features_query_matches_reference(spark, sf_dir):
    """Every Spark-emitted row recomputes identically through the
    pure-Python path (parse → crop → decode → features)."""
    from ocr_module_spark import corpus, oracle
    from ocr_module_spark.operators.extraction import (
        _n_docs, q_region_pixel_features)

    rows = q_region_pixel_features(spark, sf_dir).collect()
    assert rows, "fixture corpus must contain figure blocks"

    pages = {r["url"]: bytes(r["html"])
             for r in corpus.pages_df(spark, _n_docs(sf_dir))
             .select("url", "html").collect()}
    expected = {}
    for url, raw in pages.items():
        for b in oracle.parse_payload(raw).blocks:
            if b.kind == "figure" and b.bbox is not None:
                rb = extract_image_region(raw, b.page_number, b.bbox)
                expected[(url, b.page_number, b.block_no)] = \
                    _manual_features(rb)
    got = {(r["url"], r["page_number"], r["block_no"]): list(r["features"])
           for r in rows}
    assert got == expected
    for r in rows:
        assert (float(r["width"]), float(r["height"])) == \
            (r["features"][0], r["features"][1])
