"""Reference tar-archive format: version gate against the reference's OWN
test fixtures, FlatBuffers codec round-trip, envelope pruning, IO-error
contract, and engine build-from-archive parity."""

import io
import os

import numpy as np
import pytest

from tzengine import tararchive
from tzengine.engine import TzEngine
from tzengine.zones import synthetic_world

REF_FIXTURES = "/root/reference/timezonemap/src/test/resources"


# --- the reference's own error-contract fixtures ---------------------------


@pytest.mark.skipif(
    not os.path.isdir(REF_FIXTURES), reason="reference fixtures not present"
)
def test_reference_fixture_no_version_marker():
    # TimeZoneMapTest.java:163-168: first entry "test.txt" is not a
    # version marker -> incompatible, message names the bogus entry
    with pytest.raises(ValueError, match="Incompatible map archive") as ei:
        tararchive.read_tar_archive(
            os.path.join(REF_FIXTURES, "no_version_marker.tar"), 1, 2, 3, 4
        )
    assert "test.txt" in str(ei.value)


@pytest.mark.skipif(
    not os.path.isdir(REF_FIXTURES), reason="reference fixtures not present"
)
def test_reference_fixture_incompatible_version():
    # TimeZoneMapTest.java:170-176
    with pytest.raises(ValueError, match="Incompatible map archive") as ei:
        tararchive.read_tar_archive(
            os.path.join(REF_FIXTURES, "incompatible_version.tar"), 1, 2, 3, 4
        )
    assert "1.0-SNAPSHOT:2017a" in str(ei.value)


def test_engine_from_tar_reference_fixture_messages(spark):
    for fix, expect in [
        ("no_version_marker.tar", "test.txt"),
        ("incompatible_version.tar", "1.0-SNAPSHOT:2017a"),
    ]:
        path = os.path.join(REF_FIXTURES, fix)
        if not os.path.exists(path):
            pytest.skip("reference fixtures not present")
        with pytest.raises(ValueError, match="Incompatible map archive") as ei:
            TzEngine.from_tar_archive(spark, path, 1, 2, 3, 4)
        assert expect in str(ei.value)


# --- FlatBuffers codec -----------------------------------------------------


def test_flatbuffers_roundtrip_multipolygon_with_holes():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    hole = np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0]])
    other = np.array([[10.0, 10.0], [11.5, 10.25], [10.5, 11.0]])
    buf = tararchive.encode_timezone("Europe/Test", [[outer, hole], [other]])
    tzid, regions = tararchive.decode_timezone(buf)
    assert tzid == "Europe/Test"
    assert len(regions) == 2
    assert len(regions[0]) == 2 and len(regions[1]) == 1
    np.testing.assert_array_equal(regions[0][0], outer)
    np.testing.assert_array_equal(regions[0][1], hole)
    np.testing.assert_array_equal(regions[1][0], other)


def test_flatbuffers_float32_projection():
    # coordinates pass through float32 (timezones.fbs Point is float)
    ring = np.array([[0.1, 0.2], [1.123456789, 0.0], [0.5, 1.7]])
    _, regions = tararchive.decode_timezone(
        tararchive.encode_timezone("Z", [[ring]])
    )
    np.testing.assert_array_equal(
        regions[0][0], ring.astype(np.float32).astype(np.float64)
    )


def test_envelope_string_roundtrip():
    s = tararchive.serialize_envelope(-12.5, 0.25, 33.75, 179.9)
    assert tararchive.deserialize_envelope(s) == (
        float(np.float32(-12.5)),
        float(np.float32(0.25)),
        float(np.float32(33.75)),
        float(np.float32(179.9)),
    )


# --- tar round-trip + engine parity ---------------------------------------


def test_tar_roundtrip_engine_parity(spark, tmp_path):
    path = str(tmp_path / "world.tar")
    tararchive.write_tar_archive(synthetic_world(), path, "1:synthtar")
    version, pieces = tararchive.read_tar_archive(path)
    assert version == "1:synthtar"
    assert len(pieces) == len(synthetic_world())

    eng_tar = TzEngine.from_tar_archive(spark, path)
    assert eng_tar.map_version == "1:synthtar"
    eng_direct = TzEngine.for_everywhere(
        spark, synthetic_world(), world_version="synthtar"
    )
    pts = spark.createDataFrame(
        [(float(la), float(lo)) for la in np.arange(0.25, 10, 0.5)
         for lo in np.arange(0.25, 10, 0.5)],
        "lat double, lon double",
    )
    a = eng_tar.assign_timezones(pts, mode="strict").orderBy("lat", "lon").collect()
    b = eng_direct.assign_timezones(pts, mode="strict").orderBy("lat", "lon").collect()
    assert [(r.tzid, list(r.tzids)) for r in a] == [
        (r.tzid, list(r.tzids)) for r in b
    ]


def test_tar_save_and_reload(spark, tmp_path):
    path = str(tmp_path / "saved.tar")
    eng = TzEngine.for_everywhere(
        spark, synthetic_world(), world_version="synthtar"
    )
    eng.save_tar_archive(path)
    eng2 = TzEngine.from_tar_archive(spark, path)
    assert eng2.map_version == eng.map_version
    assert eng2.idx.n_pieces == eng.idx.n_pieces
    assert eng2.idx.zone_ids == eng.idx.zone_ids


def test_tar_envelope_prune_before_decode(tmp_path, monkeypatch):
    path = str(tmp_path / "prune.tar")
    tararchive.write_tar_archive(synthetic_world(), path, "1:synthtar")
    decoded = []
    real = tararchive.decode_timezone

    def counting(buf):
        decoded.append(1)
        return real(buf)

    monkeypatch.setattr(tararchive, "decode_timezone", counting)
    # region overlapping only the (4..5)^2 rectangle: the prune must skip
    # non-overlapping entries from the NAME, before any FlatBuffers decode
    _, pieces = tararchive.read_tar_archive(path, 4.2, 4.2, 4.8, 4.8)
    zone_ids = {p.zone_id for p in pieces}
    assert zone_ids == {"Zone/Small", "Zone/Big", "Zone/Filler"}
    assert len(decoded) == len(pieces)  # pruned entries never decoded


def test_tar_stream_input_and_io_error(tmp_path):
    path = str(tmp_path / "s.tar")
    tararchive.write_tar_archive(synthetic_world(), path, "1:synthtar")
    with open(path, "rb") as f:
        version, pieces = tararchive.read_tar_archive(f)
    assert version == "1:synthtar" and len(pieces) == len(synthetic_world())

    # corrupt stream -> reference I2 message (TimeZoneMap.kt:254-259)
    with pytest.raises(RuntimeError, match="Unable to read time zone data"):
        tararchive.read_tar_archive(io.BytesIO(b"this is not a tar file!!"))


def test_tar_empty_archive_rejected(tmp_path):
    import tarfile

    path = str(tmp_path / "empty.tar")
    tarfile.open(path, "w").close()
    with pytest.raises(ValueError, match="Incompatible map archive"):
        tararchive.read_tar_archive(path)


def test_malformed_entries_hit_io_error_contract(tmp_path):
    # stray entry names / corrupt payloads must map to the reference I2
    # RuntimeError, not leak raw ValueError/IndexError
    import tarfile as tmod

    path = str(tmp_path / "stray.tar")
    with tmod.open(path, "w") as tf:
        marker = tmod.TarInfo(name="Version: 1:x")
        marker.size = 0
        tf.addfile(marker)
        bad = tmod.TarInfo(name="README")  # no envelope in the name
        payload = b"not a flatbuffer"
        bad.size = len(payload)
        tf.addfile(bad, io.BytesIO(payload))
    with pytest.raises(RuntimeError, match="Unable to read time zone data"):
        tararchive.read_tar_archive(path)

    path2 = str(tmp_path / "corrupt.tar")
    with tmod.open(path2, "w") as tf:
        marker = tmod.TarInfo(name="Version: 1:x")
        marker.size = 0
        tf.addfile(marker)
        bad = tmod.TarInfo(name="Zone/0,0,1,1")
        payload = b"\xff\xff\xff\xff garbage"
        bad.size = len(payload)
        tf.addfile(bad, io.BytesIO(payload))
    with pytest.raises(RuntimeError, match="Unable to read time zone data"):
        tararchive.read_tar_archive(path2)


def test_zstd_magic_detected_with_specific_message(tmp_path):
    """COVERAGE gap B9: the reference's DEFAULT artifact is .tar.zstd
    (DataLocator.kt:10-14). With no zstd codec importable the engine
    must fail fast with the specific actionable message, not a generic
    tar error — both for path and stream sources. (When a codec IS
    importable the archive opens transparently; not testable here.)"""
    if tararchive._zstd_reader_factory() is not None:
        pytest.skip("zstd codec available: transparent path applies")
    blob = tararchive.ZSTD_MAGIC + b"\x00" * 64
    path = str(tmp_path / "world.tar.zstd")
    with open(path, "wb") as f:
        f.write(blob)
    with pytest.raises(RuntimeError, match="zstd-compressed archive"):
        tararchive.read_tar_archive(path)
    with pytest.raises(RuntimeError, match="decompress externally"):
        tararchive.read_tar_archive(io.BytesIO(blob))


def test_zstd_write_requested_without_codec(tmp_path):
    """Write-side symmetry for the reference's .tar.zstd variant: with no
    codec importable, a zstd-suffixed path (or compress='zstd') fails
    fast with a specific message; with a codec, the compressed write ->
    transparent read round-trip must hold. compress=False writes plain
    tar regardless of suffix; unrecognized compress values are rejected
    (compress=True would otherwise silently write UNcompressed)."""
    zpath = str(tmp_path / "w.tar.zstd")
    with pytest.raises(ValueError, match="unsupported compress value"):
        tararchive.write_tar_archive(
            synthetic_world(), zpath, "1:w", compress=True
        )
    if tararchive._zstd_writer_factory() is not None:
        tararchive.write_tar_archive(synthetic_world(), zpath, "1:w")
        with open(zpath, "rb") as f:
            assert f.read(4) == tararchive.ZSTD_MAGIC
        version, pieces = tararchive.read_tar_archive(zpath)
        assert version == "1:w" and len(pieces) == len(synthetic_world())
    else:
        with pytest.raises(RuntimeError, match="zstd-compressed archive"):
            tararchive.write_tar_archive(synthetic_world(), zpath, "1:w")
        with pytest.raises(RuntimeError, match="compress externally"):
            tararchive.write_tar_archive(
                synthetic_world(), str(tmp_path / "x.tar"), "1:w",
                compress="zstd",
            )
    tararchive.write_tar_archive(synthetic_world(), zpath, "1:w", compress=False)
    version, pieces = tararchive.read_tar_archive(zpath)
    assert version == "1:w" and len(pieces) == len(synthetic_world())
