"""Vectorized ESRI shapefile source (+ writer for round-trip fixtures).

Re-expresses the reference's reader (S1-S14 in SURVEY.md §2.1):

* ``ShapefileReader::open`` / header parses — driver-side, ~100 bytes
  (shapefile_reader.cpp:26-96 for .shp, 98-153 for .dbf);
* record addressing via the ``.shx`` offset table
  (shapefile_reader.cpp:161-163: 100 + i*8, big-endian 16-bit words x2);
* geometry decode for Point(1)/PolyLine(3)/Polygon(5), all other shape
  types skipped to null geometry (shapefile_reader.cpp:222-306);
* DBF decode with the reference's exact coercions
  (shapefile_reader.cpp:308-363): Character trimmed, Numeric/Float
  ``stod`` with 0.0 fallback on empty/parse error, Logical true iff in
  {T,t,Y,y}, Date/Unknown kept as trimmed string; deletion flag '*'
  empties the attributes but the record is still emitted (320-323).

Unlike the reference's 3-seeks-per-record loop (155-185), decode here is
columnar: whole-file bytes + numpy ``frombuffer`` views; per-record work
is only the part/ring offset splitting. The distributed path splits the
record space into contiguous batches from the ``.shx`` table (driver-side,
tiny) and decodes each batch in an executor via ``mapInPandas`` — the
shape a 1000-executor ingest of sharded shapefiles needs (each task reads
only its byte range).

The writer exists because the reference repo's ``.shp`` payloads were
stripped from the snapshot — synthesized files exercise the reader
end-to-end (endianness, ring splitting, deleted rows, numeric fallback).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

SHP_MAGIC = 9994
SHP_VERSION = 1000

# DBF field definition: (name, type_char, length, decimals)
FieldDef = tuple[str, str, int, int]


# ---------------------------------------------------------------------------
# writer (fixture generation / sink)
# ---------------------------------------------------------------------------

def _geom_payload(row: pd.Series) -> bytes:
    st = int(row["shape_type"])
    if st == 0:
        return struct.pack("<i", 0)
    if st == 1:
        return struct.pack("<idd", 1, float(row["xs"][0]), float(row["ys"][0]))
    if st in (3, 5):
        xs = np.asarray(row["xs"], dtype="<f8")
        ys = np.asarray(row["ys"], dtype="<f8")
        sizes = [int(s) for s in row["ring_sizes"]]
        parts = np.cumsum([0] + sizes[:-1]).astype("<i4")
        head = struct.pack(
            "<idddd ii".replace(" ", ""),
            st,
            float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()),
            len(sizes), len(xs),
        )
        pts = np.empty(2 * len(xs), dtype="<f8")
        pts[0::2] = xs
        pts[1::2] = ys
        return head + parts.tobytes() + pts.tobytes()
    raise ValueError(f"unsupported shape_type {st}")


def write_shapefile(
    pdf: pd.DataFrame,
    base: str,
    fields: list[FieldDef],
    attr_fn=None,
) -> None:
    """Write ``base``.shp/.shx/.dbf from a features frame.

    ``fields`` declares the DBF schema; ``attr_fn(row, name)`` returns the
    raw string stored for a field (defaults to ``str(row[name])``).
    Binary layout mirrors what the reference parses: big-endian .shp/.shx
    headers + record headers, little-endian payloads
    (shapefile_reader.cpp:69-96,155-185), 32-byte DBF descriptors with
    11-byte NUL-padded names (98-153).
    """
    attr_fn = attr_fn or (lambda row, name: "" if name not in row else str(row[name]))

    shp_records = []
    shx_entries = []
    offset_words = 50  # header = 100 bytes = 50 words
    for _, row in pdf.iterrows():
        payload = _geom_payload(row)
        content_words = len(payload) // 2
        rec = struct.pack(">ii", int(row["record_number"]), content_words) + payload
        shp_records.append(rec)
        shx_entries.append(struct.pack(">ii", offset_words, content_words))
        offset_words += len(rec) // 2

    polys = pdf[pdf["shape_type"] > 0]
    if len(polys):
        bminx = min(min(r) for r in polys["xs"])
        bminy = min(min(r) for r in polys["ys"])
        bmaxx = max(max(r) for r in polys["xs"])
        bmaxy = max(max(r) for r in polys["ys"])
    else:
        bminx = bminy = bmaxx = bmaxy = 0.0
    main_type = int(polys["shape_type"].iloc[0]) if len(polys) else 0

    def header(total_words: int) -> bytes:
        return (
            struct.pack(">i", SHP_MAGIC)
            + b"\x00" * 20
            + struct.pack(">i", total_words)
            + struct.pack("<ii", SHP_VERSION, main_type)
            + struct.pack("<dddd", bminx, bminy, bmaxx, bmaxy)
            + struct.pack("<dddd", 0.0, 0.0, 0.0, 0.0)  # Z/M ranges (skipped)
        )

    shp_body = b"".join(shp_records)
    with open(base + ".shp", "wb") as f:
        f.write(header(50 + len(shp_body) // 2))
        f.write(shp_body)
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + len(shx_entries) * 4))
        f.write(b"".join(shx_entries))

    # --- DBF ---
    n = len(pdf)
    record_len = 1 + sum(f[2] for f in fields)
    header_len = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack(
        "<BBBBIHH", 0x03, 24, 1, 1, n, header_len, record_len
    )
    out += b"\x00" * 20
    for name, tchar, length, dec in fields:
        out += name.encode()[:11].ljust(11, b"\x00")
        out += tchar.encode()
        out += b"\x00" * 4
        out += struct.pack("<BB", length, dec)
        out += b"\x00" * 14
    out += b"\x0d"
    for _, row in pdf.iterrows():
        out += b"*" if bool(row.get("deleted", False)) else b" "
        for name, tchar, length, dec in fields:
            raw = attr_fn(row, name)
            enc = raw.encode()[:length]
            if tchar in ("N", "F"):
                out += enc.rjust(length)
            else:
                out += enc.ljust(length)
    with open(base + ".dbf", "wb") as f:
        f.write(bytes(out))


# ---------------------------------------------------------------------------
# reader (driver-side header parse + columnar batch decode)
# ---------------------------------------------------------------------------

class ShapefileDataset:
    """Parsed headers + record tables for one .shp/.shx/.dbf triple.

    Construction reads only the headers and the (tiny) .shx offset table —
    the planning-time work; geometry/attribute bytes are decoded per batch.
    """

    def __init__(self, base: str):
        try:
            self._parse_headers(base)
        except (struct.error, IndexError) as e:
            raise ValueError(f"malformed or truncated shapefile set at "
                             f"{base!r}: {e}") from e

    def _parse_headers(self, base: str) -> None:
        self.base = base
        with open(base + ".shx", "rb") as f:
            shx = f.read()
        if len(shx) < 100:
            raise ValueError(f"truncated .shx ({len(shx)} bytes < 100)")
        magic, = struct.unpack(">i", shx[:4])
        if magic != SHP_MAGIC:
            raise ValueError(f"bad .shx magic {magic} (want {SHP_MAGIC})")
        self.shape_type, = struct.unpack("<i", shx[32:36])
        self.bbox = struct.unpack("<dddd", shx[36:68])
        entries = np.frombuffer(shx[100:], dtype=">i4").reshape(-1, 2)
        self.offsets = entries[:, 0].astype(np.int64) * 2  # words -> bytes
        self.lengths = entries[:, 1].astype(np.int64) * 2
        self.n_records = len(entries)

        self.fields: list[FieldDef] = []
        self.dbf_header_len = 0
        self.dbf_record_len = 0
        self.has_dbf = os.path.exists(base + ".dbf")
        if self.has_dbf:
            with open(base + ".dbf", "rb") as f:
                head = f.read(32)
                _, self.dbf_header_len, self.dbf_record_len = struct.unpack(
                    "<IHH", head[4:12]
                )
                n_fields = (self.dbf_header_len - 33) // 32
                for _ in range(n_fields):
                    d = f.read(32)
                    name = d[:11].split(b"\x00")[0].decode("ascii", "replace")
                    self.fields.append((name, chr(d[11]), d[16], d[17]))

    def info(self) -> dict:
        """S13 dataset-info sink (shapefile_reader.cpp:384-402)."""
        return {
            "shape_type": self.shape_type,
            "n_records": self.n_records,
            "bbox": self.bbox,
            "fields": self.fields,
        }

    # -- batch decode ------------------------------------------------------

    def decode_batch(self, start: int, stop: int) -> pd.DataFrame:
        """Decode records [start, stop) to a columnar frame.

        Geometry columns: shape_type, xs, ys, ring_sizes, minx..maxy.
        Attribute columns follow the DBF schema with reference coercions;
        deleted rows keep geometry but get empty/default attributes
        (shapefile_reader.cpp:320-323 returns an empty attr map).
        """
        with open(self.base + ".shp", "rb") as f:
            f.seek(self.offsets[start])
            end = self.offsets[stop - 1] + 8 + self.lengths[stop - 1]
            blob = f.read(int(end - self.offsets[start]))
        base_off = self.offsets[start]

        recs = []
        for i in range(start, stop):
            o = int(self.offsets[i] - base_off)
            rec_num, = struct.unpack(">i", blob[o: o + 4])
            st, = struct.unpack("<i", blob[o + 8: o + 12])
            xs: list = []
            ys: list = []
            sizes: list = []
            if st == 1:
                x, y = struct.unpack("<dd", blob[o + 12: o + 28])
                xs, ys, sizes = [x], [y], [1]
            elif st in (3, 5):
                n_parts, n_pts = struct.unpack("<ii", blob[o + 44: o + 52])
                parts = np.frombuffer(
                    blob, dtype="<i4", count=n_parts, offset=o + 52
                ).astype(np.int64)
                flat = np.frombuffer(
                    blob, dtype="<f8", count=2 * n_pts, offset=o + 52 + 4 * n_parts
                )
                xs = flat[0::2]
                ys = flat[1::2]
                bounds = np.append(parts, n_pts)
                sizes = np.diff(bounds).tolist()
                xs, ys = xs.tolist(), ys.tolist()
            # other shape types: skipped -> null geometry
            # (shapefile_reader.cpp:222-234; NullShape at 155-177)
            if xs:
                minx, maxx = min(xs), max(xs)
                miny, maxy = min(ys), max(ys)
            else:
                minx = miny = maxx = maxy = 0.0
            recs.append(
                dict(
                    record_number=rec_num, shape_type=st, xs=xs, ys=ys,
                    ring_sizes=sizes, minx=minx, miny=miny, maxx=maxx, maxy=maxy,
                )
            )
        out = pd.DataFrame(recs)

        if self.has_dbf:
            attrs = self.decode_dbf_batch(start, stop)
            for name in attrs.columns:
                out[name] = attrs[name].values
        else:
            out["deleted"] = False
        return out

    def decode_dbf_batch(self, start: int, stop: int) -> pd.DataFrame:
        """Decode DBF records [start, stop) only — no .shp required.

        The attribute half of ``decode_batch`` (same reference coercions:
        shapefile_reader.cpp:320-358), callable standalone so real-world
        shapefile sets whose .shp payload is absent or stripped (e.g. the
        reference's gadm41_USA_* fixtures) still yield their attribute
        table. Column order: ``deleted`` then the DBF schema order.
        """
        with open(self.base + ".dbf", "rb") as f:
            f.seek(self.dbf_header_len + start * self.dbf_record_len)
            raw = f.read((stop - start) * self.dbf_record_len)
        mat = np.frombuffer(raw, dtype="S1").reshape(
            stop - start, self.dbf_record_len
        )
        deleted = mat[:, 0] == b"*"
        out = pd.DataFrame({"deleted": deleted})
        pos = 1
        for name, tchar, length, _dec in self.fields:
            col_bytes = mat[:, pos: pos + length]
            pos += length
            svals = (
                np.ascontiguousarray(col_bytes)
                .view(f"S{length}")
                .ravel()
                .astype(str)
            )
            trimmed = pd.Series(svals).str.strip(" \t")
            if tchar in ("N", "F"):
                # stod with 0.0 fallback (shapefile_reader.cpp:341-351)
                vals = pd.to_numeric(trimmed, errors="coerce").fillna(0.0)
                vals[deleted] = 0.0
                out[name] = vals.astype(float).values
            elif tchar == "L":
                # true iff in {T,t,Y,y} (shapefile_reader.cpp:353-354)
                vals = trimmed.isin(["T", "t", "Y", "y"])
                vals[deleted] = False
                out[name] = vals.values
            else:  # C, D, unknown -> trimmed string (332-334, 356-358)
                trimmed[deleted] = ""
                out[name] = trimmed.values
        return out

    def read_all(self) -> pd.DataFrame:
        try:
            return self.decode_batch(0, self.n_records)
        except (struct.error, IndexError) as e:
            raise ValueError(
                f"malformed shapefile records at {self.base!r}: {e}"
            ) from e


def read_shapefile_df(spark, base: str, batch_records: int = 4096):
    """Distributed scan: .shx-driven batch tasks decoded in executors.

    The driver reads headers only; each task decodes a contiguous record
    range (one .shp byte-range read + one .dbf byte-range read). With
    files on shared storage this is the 1000-executor ingest path; the
    output schema is computed up front so Catalyst sees a static StructType
    (SURVEY.md §1.2).
    """
    from pyspark.sql import functions as F  # noqa: F401

    ds = ShapefileDataset(base)
    starts = list(range(0, ds.n_records, batch_records))
    tasks = pd.DataFrame(
        {
            "start": starts,
            "stop": [min(s + batch_records, ds.n_records) for s in starts],
        }
    )
    schema_parts = [
        "record_number int", "shape_type int", "xs array<double>",
        "ys array<double>", "ring_sizes array<int>",
        "minx double", "miny double", "maxx double", "maxy double",
        "deleted boolean",
    ]
    for name, tchar, _l, _d in ds.fields:
        t = {"N": "double", "F": "double", "L": "boolean"}.get(tchar, "string")
        schema_parts.append(f"`{name}` {t}")
    schema = ", ".join(schema_parts)
    cols = [c.split(" ")[0].strip("`") for c in schema_parts]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = ShapefileDataset(base)
        for pdf in batches:
            for s, e in zip(pdf["start"], pdf["stop"]):
                yield local.decode_batch(int(s), int(e))[cols]

    tasks_df = spark.createDataFrame(tasks).repartition(max(len(starts), 1))
    return tasks_df.mapInPandas(fn, schema)
