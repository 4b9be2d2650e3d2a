"""Reference map-archive format: tar stream of FlatBuffers time zones.

Reproduces the reference's REAL on-disk archive contract so a user can
point this engine at an archive produced by the reference builder (and
vice versa for the subset of the format we emit):

  layout (builder/.../Main.kt:100-141):
    entry 0: name "Version: <fmt>:<world>", size 0  — version marker
    entry i: name "<tzid>/<minLat>,<minLon>,<maxLat>,<maxLon>"
             content = FlatBuffers TimeZone (serialization/.../timezones.fbs)

  read contract (TimeZoneMap.kt:156-243):
    - the FIRST entry's name carries the version: split on " ", take the
      2nd token if there are exactly two, else the whole name; its
      ":"-prefix must equal the engine format version or
      "Incompatible map archive. Detected version is '<v>' required
      version '<fmt>:*'" (TimeZoneMap.kt:171-178)
    - zero-size entries are skipped as data (the marker itself)
    - the envelope in the entry NAME prunes non-overlapping zones BEFORE
      any deserialization (TimeZoneMap.kt:184-196)
    - any IO error while streaming → "Unable to read time zone data
      resource file" (TimeZoneMap.kt:254-259)

The FlatBuffers schema (timezones.fbs) is tiny and fixed:
    table TimeZone { timeZoneName:string; regions:[Polygon]; }
    table Polygon  { rings:[Ring]; }   // ring 0 = outer, rest = holes
    table Ring     { points:[Point]; }
    struct Point   { latitude:float; longitude:float; }
so it is encoded/decoded here directly against the public FlatBuffers
wire format (little-endian; root uoffset32; tables = soffset32 to vtable
+ inline fields; vtable = u16 size, u16 table size, u16 per-field
offsets; vectors/strings = u32 length + payload; structs inline) — no
codegen, no third-party dependency.
"""

from __future__ import annotations

import io
import struct
import tarfile

import numpy as np

from . import INDEX_FORMAT_VERSION, geom
from .zones import ZonePiece

INCOMPATIBLE_MSG = (
    "Incompatible map archive. Detected version is '{found}' "
    f"required version '{INDEX_FORMAT_VERSION}:*'"
)
IO_ERROR_MSG = "Unable to read time zone data resource file"

# The reference's DEFAULT distribution artifact is zstd-compressed tar
# (timezonemap-<v>.tar.zstd, DataLocator.kt:10-14, written by
# builder Main.kt:152-157). This sandbox's Python has no zstd codec and
# pip is unavailable, so when no codec imports the engine fails FAST
# with a specific, actionable message instead of a generic tar error;
# when a codec IS importable (zstandard, or stdlib compression.zstd on
# Python >= 3.14) the archive is decompressed transparently.
ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
ZSTD_NO_CODEC_MSG = (
    "zstd-compressed archive detected (magic 0x28B52FFD) but no zstd "
    "codec is importable in this environment; decompress externally "
    "(e.g. `zstd -d <archive>`) and pass the plain tar"
)


def _zstd_reader_factory():
    """A callable wrapping a binary stream in a zstd decompressor, or
    None when no codec is importable."""
    try:
        import zstandard as _zstd  # type: ignore

        return lambda f: _zstd.ZstdDecompressor().stream_reader(f)
    except ImportError:
        pass
    try:
        from compression import zstd as _czstd  # type: ignore  # py3.14+

        return lambda f: _czstd.ZstdFile(f)
    except ImportError:
        return None


class _ChainedReader:
    """Replays already-peeked head bytes before the underlying stream —
    a plain read()-only object (all tarfile's streaming mode and the
    zstd stream decompressors need)."""

    def __init__(self, head: bytes, rest):
        self._head = head
        self._rest = rest

    def readable(self) -> bool:
        return True

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n is None or n < 0 or n >= len(self._head):
                out, self._head = self._head, b""
                if n is not None and n >= 0:
                    n -= len(out)
                    if n == 0:
                        return out
                rest = self._rest.read(n if n is not None and n >= 0 else -1)
                return out + (rest or b"")
            out, self._head = self._head[:n], self._head[n:]
            return out
        return self._rest.read(n)


def _open_archive(source) -> tuple[tarfile.TarFile, list]:
    """Open a reference archive as a tarfile, transparently handling the
    zstd-compressed variant (see ZSTD_NO_CODEC_MSG). Returns (tarfile,
    extra streams to close after it) — tarfile never closes a caller-
    provided fileobj, so the zstd reader / raw file handle would leak
    otherwise."""
    if isinstance(source, (str, bytes)):
        with open(source, "rb") as probe_f:
            head = probe_f.read(4)
        if head == ZSTD_MAGIC:
            factory = _zstd_reader_factory()
            if factory is None:
                raise RuntimeError(ZSTD_NO_CODEC_MSG)
            raw = open(source, "rb")
            try:
                z = factory(raw)
                return tarfile.open(fileobj=z, mode="r|"), [z, raw]
            except Exception:
                raw.close()
                raise
        return tarfile.open(source, "r"), []
    head = source.read(4)
    if head == ZSTD_MAGIC:
        factory = _zstd_reader_factory()
        if factory is None:
            raise RuntimeError(ZSTD_NO_CODEC_MSG)
        z = factory(_ChainedReader(head, source))
        return tarfile.open(fileobj=z, mode="r|"), [z]
    return tarfile.open(fileobj=_ChainedReader(head, source), mode="r|*"), []


# --------------------------------------------------------------------------
# FlatBuffers (fixed schema) — reader
# --------------------------------------------------------------------------


def _u16(buf: bytes, pos: int) -> int:
    return struct.unpack_from("<H", buf, pos)[0]


def _i32(buf: bytes, pos: int) -> int:
    return struct.unpack_from("<i", buf, pos)[0]


def _u32(buf: bytes, pos: int) -> int:
    return struct.unpack_from("<I", buf, pos)[0]


def _table_field(buf: bytes, table_pos: int, field_slot: int) -> int | None:
    """Absolute position of field ``field_slot`` (0-based) of the table at
    ``table_pos``, or None if absent (vtable default)."""
    vtable_pos = table_pos - _i32(buf, table_pos)
    vt_size = _u16(buf, vtable_pos)
    slot_off = 4 + 2 * field_slot
    if slot_off >= vt_size:
        return None
    rel = _u16(buf, vtable_pos + slot_off)
    if rel == 0:
        return None
    return table_pos + rel


def _indirect(buf: bytes, pos: int) -> int:
    """Follow a uoffset reference field."""
    return pos + _u32(buf, pos)


def _read_string(buf: bytes, pos: int) -> str:
    spos = _indirect(buf, pos)
    n = _u32(buf, spos)
    return buf[spos + 4 : spos + 4 + n].decode("utf-8")


def _vector(buf: bytes, pos: int) -> tuple[int, int]:
    """(element start, length) of the vector referenced at ``pos``."""
    vpos = _indirect(buf, pos)
    return vpos + 4, _u32(buf, vpos)


def decode_timezone(buf: bytes) -> tuple[str, list[list[np.ndarray]]]:
    """FlatBuffers TimeZone → (tzid, regions) where regions is a list of
    polygons, each a list of (V,2) float32->float64 (lon,lat) rings
    (ring 0 outer, rest holes) — Serialization.kt:43-48 semantics."""
    root = _u32(buf, 0)
    name_pos = _table_field(buf, root, 0)
    regions_pos = _table_field(buf, root, 1)
    tzid = _read_string(buf, name_pos) if name_pos is not None else ""
    regions: list[list[np.ndarray]] = []
    if regions_pos is not None:
        rstart, rlen = _vector(buf, regions_pos)
        for i in range(rlen):
            poly_pos = _indirect(buf, rstart + 4 * i)
            rings_pos = _table_field(buf, poly_pos, 0)
            rings: list[np.ndarray] = []
            if rings_pos is not None:
                gstart, glen = _vector(buf, rings_pos)
                for j in range(glen):
                    ring_pos = _indirect(buf, gstart + 4 * j)
                    pts_pos = _table_field(buf, ring_pos, 0)
                    if pts_pos is None:
                        rings.append(np.zeros((0, 2)))
                        continue
                    pstart, plen = _vector(buf, pts_pos)
                    flat = np.frombuffer(
                        buf, dtype="<f4", count=2 * plen, offset=pstart
                    ).astype(np.float64).reshape(-1, 2)
                    # Point struct is (latitude, longitude); engine rings
                    # are (lon, lat)
                    rings.append(flat[:, ::-1].copy())
            regions.append(rings)
    return tzid, regions


# --------------------------------------------------------------------------
# FlatBuffers (fixed schema) — writer
# --------------------------------------------------------------------------


class _FbWriter:
    """Append-only builder: parents are written first with placeholder
    uoffsets, children appended after (uoffsets always point forward)."""

    def __init__(self) -> None:
        self.buf = bytearray()

    def _align(self, n: int) -> None:
        while len(self.buf) % n:
            self.buf.append(0)

    def u32(self, v: int) -> int:
        pos = len(self.buf)
        self.buf += struct.pack("<I", v)
        return pos

    def patch_uoffset(self, field_pos: int, target_pos: int) -> None:
        struct.pack_into("<I", self.buf, field_pos, target_pos - field_pos)

    def table(self, n_fields: int) -> tuple[int, list[int]]:
        """Emit a table with ``n_fields`` present reference fields + its
        vtable; returns (table_pos, [field positions to patch])."""
        self._align(4)
        table_pos = len(self.buf)
        self.buf += b"\x00" * 4  # soffset placeholder
        fields = []
        for _ in range(n_fields):
            fields.append(self.u32(0))
        self._align(2)
        vtable_pos = len(self.buf)
        vt_size = 4 + 2 * n_fields
        table_size = 4 + 4 * n_fields
        self.buf += struct.pack("<HH", vt_size, table_size)
        for i in range(n_fields):
            self.buf += struct.pack("<H", 4 + 4 * i)
        # soffset: vtable_pos = table_pos - soffset → negative here
        struct.pack_into("<i", self.buf, table_pos, table_pos - vtable_pos)
        return table_pos, fields

    def string(self, s: str) -> int:
        self._align(4)
        pos = len(self.buf)
        raw = s.encode("utf-8")
        self.buf += struct.pack("<I", len(raw)) + raw + b"\x00"
        return pos

    def vector_stub(self, length: int) -> tuple[int, list[int]]:
        """uoffset-element vector with ``length`` placeholder slots."""
        self._align(4)
        pos = len(self.buf)
        self.buf += struct.pack("<I", length)
        slots = [self.u32(0) for _ in range(length)]
        return pos, slots

    def point_vector(self, pts_latlon: np.ndarray) -> int:
        """Inline struct vector of (lat, lon) float32 points."""
        self._align(4)
        pos = len(self.buf)
        flat = np.ascontiguousarray(pts_latlon, dtype="<f4").reshape(-1)
        self.buf += struct.pack("<I", len(pts_latlon)) + flat.tobytes()
        return pos


def encode_timezone(tzid: str, regions: list[list[np.ndarray]]) -> bytes:
    """(tzid, regions of (lon,lat) rings) → FlatBuffers TimeZone bytes."""
    w = _FbWriter()
    w.u32(0)  # root uoffset placeholder
    root_pos, root_fields = w.table(2)
    w.patch_uoffset(0, root_pos)
    name_pos = w.string(tzid)
    w.patch_uoffset(root_fields[0], name_pos)
    rv_pos, rv_slots = w.vector_stub(len(regions))
    w.patch_uoffset(root_fields[1], rv_pos)
    for slot, rings in zip(rv_slots, regions):
        poly_pos, poly_fields = w.table(1)
        w.patch_uoffset(slot, poly_pos)
        gv_pos, gv_slots = w.vector_stub(len(rings))
        w.patch_uoffset(poly_fields[0], gv_pos)
        for gslot, ring in zip(gv_slots, rings):
            ring_pos, ring_fields = w.table(1)
            w.patch_uoffset(gslot, ring_pos)
            # engine rings are (lon, lat); Point struct is (lat, lon)
            pts = np.asarray(ring, dtype=np.float64)[:, ::-1]
            pv_pos = w.point_vector(pts)
            w.patch_uoffset(ring_fields[0], pv_pos)
    return bytes(w.buf)


# --------------------------------------------------------------------------
# envelope strings (Serialization.kt:20-24)
# --------------------------------------------------------------------------


def _fmt_f32(v: float) -> str:
    """Shortest round-trip decimal of a float32 (Java Float.toString
    analogue)."""
    return np.format_float_positional(
        np.float32(v), unique=True, trim="0"
    )


def serialize_envelope(min_lat, min_lon, max_lat, max_lon) -> str:
    return (
        f"{_fmt_f32(min_lat)},{_fmt_f32(min_lon)},"
        f"{_fmt_f32(max_lat)},{_fmt_f32(max_lon)}"
    )


def deserialize_envelope(s: str) -> tuple[float, float, float, float]:
    parts = s.split(",")
    return (
        float(np.float32(parts[0])),
        float(np.float32(parts[1])),
        float(np.float32(parts[2])),
        float(np.float32(parts[3])),
    )


# --------------------------------------------------------------------------
# tar archive read/write
# --------------------------------------------------------------------------


def _zstd_writer_factory():
    """A callable wrapping a binary stream in a zstd compressor (level
    matching the reference's intent; it ships level 22, Main.kt:152-157),
    or None when no codec is importable."""
    try:
        import zstandard as _zstd  # type: ignore

        # level 22 = the reference builder's setting (Main.kt:152-157)
        return lambda f: _zstd.ZstdCompressor(level=22).stream_writer(f)
    except ImportError:
        pass
    try:
        from compression import zstd as _czstd  # type: ignore  # py3.14+

        return lambda f: _czstd.ZstdFile(f, "wb")
    except ImportError:
        return None


def _write_entries(tf: tarfile.TarFile, pieces, map_version: str) -> None:
    marker = tarfile.TarInfo(name=f"Version: {map_version}")
    marker.size = 0
    tf.addfile(marker)
    for p in pieces:
        lo_lon, lo_lat, hi_lon, hi_lat = p.bbox
        name = f"{p.zone_id}/{serialize_envelope(lo_lat, lo_lon, hi_lat, hi_lon)}"
        payload = encode_timezone(p.zone_id, [p.rings])
        ti = tarfile.TarInfo(name=name)
        ti.size = len(payload)
        tf.addfile(ti, io.BytesIO(payload))


def write_tar_archive(
    pieces: list[ZonePiece], path: str, map_version: str,
    compress: str | bool | None = None,
) -> None:
    """Builder B7+B9 analogue over the REAL reference layout: version
    marker first, then one entry per zone piece, name = tzid/envelope,
    content = FlatBuffers. ``map_version`` is the "<fmt>:<world>" string
    (the marker entry is named "Version: <map_version>" with size 0,
    Main.kt:115,141).

    ``compress``: None = auto (a ``.zst``/``.zstd`` suffix selects the
    reference's zstd-compressed variant, Main.kt:152-157); ``"zstd"`` =
    force; False = plain tar regardless of suffix. The zstd path needs
    an importable codec (zstandard, or stdlib compression.zstd on
    Python >= 3.14) and fails fast with a specific message otherwise —
    mirroring the read side."""
    if compress not in (None, False, "zstd"):
        raise ValueError(
            f"unsupported compress value {compress!r}: use None (auto by "
            "suffix), False (plain tar), or 'zstd'"
        )
    want_zstd = compress == "zstd" or (
        compress is None and str(path).endswith((".zst", ".zstd"))
    )
    if not want_zstd:
        with tarfile.open(path, "w") as tf:
            _write_entries(tf, pieces, map_version)
        return
    factory = _zstd_writer_factory()
    if factory is None:
        raise RuntimeError(
            "zstd-compressed archive requested (.zst/.zstd) but no zstd "
            "codec is importable in this environment; write a plain tar "
            "and compress externally (e.g. `zstd <archive>`)"
        )
    with open(path, "wb") as raw:
        z = factory(raw)
        try:
            with tarfile.open(fileobj=z, mode="w|") as tf:
                _write_entries(tf, pieces, map_version)
        finally:
            z.close()


def read_tar_archive(
    source,
    min_lat: float = -90.0,
    min_lon: float = -180.0,
    max_lat: float = 90.0,
    max_lon: float = 180.0,
) -> tuple[str, list[ZonePiece]]:
    """Stream-read a reference-format archive scoped to a region.

    Returns (map_version, pieces in archive order with envelope-pruned
    entries skipped BEFORE deserialization). Raises ValueError with the
    reference's exact message on a bad/missing version marker
    (TimeZoneMap.kt:171-178) and RuntimeError on IO failure
    (TimeZoneMap.kt:254-259). ``source`` is a path or a binary stream
    (the reference API takes an InputStream)."""
    try:
        tf, extra_streams = _open_archive(source)
    except RuntimeError:
        raise  # the specific zstd-no-codec message
    except Exception as ex:
        # OSError/TarError, and codec-specific errors (e.g. a corrupt
        # zstd frame raising zstandard.ZstdError on the transparent
        # path) all map to the reference I2 contract
        raise RuntimeError(IO_ERROR_MSG) from ex

    map_version: str | None = None
    pieces: list[ZonePiece] = []
    ordinal = 0
    try:
        it = iter(tf)
        while True:
            try:
                entry = next(it)
            except StopIteration:
                break
            except Exception as ex:  # incl. codec errors mid-stream
                raise RuntimeError(IO_ERROR_MSG) from ex
            if map_version is None:
                split = entry.name.split(" ")
                version = split[1] if len(split) == 2 else entry.name
                if version.split(":")[0] != INDEX_FORMAT_VERSION:
                    # the ONLY ValueError this function lets escape —
                    # the reference's IllegalArgumentException analogue
                    raise ValueError(INCOMPATIBLE_MSG.format(found=version))
                map_version = version
            if entry.size <= 0:
                continue
            try:
                # envelope prune from the NAME, before reading any bytes
                env = deserialize_envelope(entry.name.split("/")[-1])
                e_min_lat, e_min_lon, e_max_lat, e_max_lon = env
                if (
                    e_max_lat < min_lat
                    or e_min_lat > max_lat
                    or e_max_lon < min_lon
                    or e_min_lon > max_lon
                ):
                    continue
                buf = tf.extractfile(entry).read()
                tzid, regions = decode_timezone(buf)
            except Exception as ex:
                # malformed entry names, truncated streams, corrupt
                # FlatBuffers payloads — all map to the reference I2
                # contract (TimeZoneMap.kt:254-259), not raw
                # ValueError/IndexError/struct.error leaks
                raise RuntimeError(IO_ERROR_MSG) from ex
            for poly_id, rings in enumerate(regions):
                rings = [geom.f32(r) for r in rings if len(r) >= 3]
                if not rings:
                    continue
                pieces.append(ZonePiece(tzid, poly_id, ordinal, rings))
                ordinal += 1
    finally:
        # tarfile never closes caller-provided fileobjs: close the tar,
        # then the zstd reader / raw file handle behind it (fd-leak fix)
        for s in [tf, *extra_streams]:
            try:
                s.close()
            except Exception:
                pass
    if map_version is None:
        # empty archive: no marker at all
        raise ValueError(INCOMPATIBLE_MSG.format(found="<missing>"))
    return map_version, pieces
