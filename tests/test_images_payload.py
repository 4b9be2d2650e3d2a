"""Image codecs, fidelity metrics, and the Spark payload-verify op."""

import numpy as np
import pytest

from tzengine import images
from tzengine.fixtures import geo_images_df, row_point, row_record


@pytest.mark.parametrize("w,h", [(16, 16), (32, 16), (64, 32)])
def test_raw_png_roundtrip_exact(w, h):
    img = images.synth_image(7, w, h)
    assert np.array_equal(images.decode_raw(images.encode_raw(img), w, h), img)
    assert np.array_equal(images.decode_png(images.encode_png(img)), img)


def test_png_is_standards_shaped():
    img = images.synth_image(1, 16, 16)
    data = images.encode_png(img)
    assert data[:8] == images.PNG_SIG
    assert b"IHDR" in data[:30]
    assert data[-8:-4] == b"IEND"  # zero-length IEND chunk + its CRC last
    # corrupt a byte inside IDAT → CRC check must catch it
    bad = bytearray(data)
    bad[40] ^= 0xFF
    with pytest.raises((ValueError, Exception)):
        images.decode_png(bytes(bad))


def test_q6_lossy_psnr_gate():
    img = images.synth_image(3, 64, 64)
    got = images.decode_q6(images.encode_q6(img), 64, 64)
    p = images.psnr(img, got)
    assert 40.0 <= p < 60.0  # lossy but above the 40 dB gate
    assert not np.array_equal(img, got)


def test_psnr_identical_inf():
    img = images.synth_image(5, 16, 16)
    assert images.psnr(img, img) == float("inf")


def test_phash_stability_and_sensitivity():
    img = images.synth_image(11, 64, 64)
    h1 = images.phash64(img)
    assert h1 == images.phash64(img.copy())  # deterministic
    # q6 quantization moves the hash at most a couple of bits
    q = images.decode_q6(images.encode_q6(img), 64, 64)
    assert images.hamming64(h1, images.phash64(q)) <= 2
    # a very different image should be far away
    other = images.synth_image(999999, 64, 64)[:, ::-1]
    assert images.hamming64(h1, images.phash64(other)) > 4


def test_decode_external_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        images.decode_external(b"", "jpeg", 8, 8)


def test_row_record_deterministic():
    assert row_record(123) == row_record(123)
    assert row_point(123) == row_point(123)
    # placement mix: boundary rows land exactly on zone edges
    lat, lon = row_point(4)  # bucket 4 → boundary segment
    assert lat in (4.0, 5.0, 1.0, 8.0, float(np.float32(8.2))) or lon in (
        3.0, 6.0, float(np.float32(6.2)),
    )


def test_geo_images_spark_generation_and_verify(spark):
    from tzengine.payload import verify_payload

    df = geo_images_df(spark, 120, partitions=4)
    rows = verify_payload(df).collect()
    assert len(rows) == 120
    bad = [r for r in rows if not (r.pixels_ok and r.caption_ok and r.phash_ok)]
    assert bad == []
    # lossy rows exist and still pass the gate
    lossy = [r for r in rows if r.fmt == "q6"]
    assert lossy and all(40.0 <= r.psnr_db < 999.0 for r in lossy)
    # deterministic across partitioning (north_star)
    again = geo_images_df(spark, 120, partitions=2).orderBy("image_id").collect()
    first = df.orderBy("image_id").collect()
    assert [r.phash for r in first] == [r.phash for r in again]
    assert [bytes(r.bytes) for r in first[:10]] == [bytes(r.bytes) for r in again[:10]]
