#!/usr/bin/env python3
"""Generate the checked-in ESRI shapefile test fixture (stdlib only).

Emits src/test/resources/shapefile/fixture.{shp,shx,dbf,zip} — a
3-record polygon shapefile exercising the decoder's full surface:
  rec 1: simple square          (one clockwise outer ring)
  rec 2: square with hole       (clockwise outer + counter-clockwise inner)
  rec 3: two disjoint squares   (two clockwise outers -> MultiPolygon)
The .dbf carries C/N(int)/N(dec) fields including an empty (NULL) cell.
The .zip wraps all three for the download->extract->decode e2e test.

Layout per the public "ESRI Shapefile Technical Description" (1998)
and the dBASE III header layout.
"""
import struct
import zipfile
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/shapefile"

# (rings per record; ESRI: outer rings clockwise, holes counter-clockwise)
RECORDS = [
    [[(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]],
    [[(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)],
     [(2, 2), (6, 2), (6, 6), (2, 6), (2, 2)]],
    [[(20, 0), (20, 4), (24, 4), (24, 0), (20, 0)],
     [(30, 0), (30, 4), (34, 4), (34, 0), (30, 0)]],
]
DBF_ROWS = [("alpha", "100", "1.25"), ("beta", "200", "3.50"), ("gamma", "", "9.99")]


def bbox(points):
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    return min(xs), min(ys), max(xs), max(ys)


def polygon_content(rings):
    points = [p for r in rings for p in r]
    parts, n = [], 0
    for r in rings:
        parts.append(n)
        n += len(r)
    c = struct.pack("<i", 5)                      # shape type: Polygon
    c += struct.pack("<4d", *bbox(points))
    c += struct.pack("<ii", len(rings), len(points))
    c += struct.pack(f"<{len(parts)}i", *parts)
    for x, y in points:
        c += struct.pack("<2d", x, y)
    return c


def shp_header(file_len_bytes, shape_type, box):
    h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", file_len_bytes // 2)
    h += struct.pack("<ii", 1000, shape_type)
    h += struct.pack("<4d", *box)
    h += struct.pack("<4d", 0, 0, 0, 0)           # Z/M ranges
    return h


def make_shp_shx():
    contents = [polygon_content(r) for r in RECORDS]
    all_pts = [p for rec in RECORDS for r in rec for p in r]
    box = bbox(all_pts)

    records, index = b"", b""
    offset = 100
    for i, c in enumerate(contents):
        records += struct.pack(">ii", i + 1, len(c) // 2) + c
        index += struct.pack(">ii", offset // 2, len(c) // 2)
        offset += 8 + len(c)

    shp = shp_header(100 + len(records), 5, box) + records
    shx = shp_header(100 + 8 * len(contents), 5, box) + index
    return shp, shx


def make_dbf():
    fields = [("NAME", "C", 8, 0), ("POP", "N", 8, 0), ("RATE", "N", 6, 2)]
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = struct.pack("<B3BiHH", 0x03, 26, 8, 12, len(DBF_ROWS), hdr_size, rec_size)
    out += b"\x00" * 20
    for name, ftype, length, dec in fields:
        out += name.encode().ljust(11, b"\x00") + ftype.encode()
        out += b"\x00" * 4 + struct.pack("BB", length, dec) + b"\x00" * 14
    out += b"\x0d"
    for name, pop, rate in DBF_ROWS:
        out += b" " + name.encode().ljust(8)      # C: left-justified
        out += pop.encode().rjust(8)              # N: right-justified
        out += rate.encode().rjust(6)
    out += b"\x1a"
    return out


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    shp, shx = make_shp_shx()
    dbf = make_dbf()
    (OUT / "fixture.shp").write_bytes(shp)
    (OUT / "fixture.shx").write_bytes(shx)
    (OUT / "fixture.dbf").write_bytes(dbf)
    with zipfile.ZipFile(OUT / "fixture.zip", "w") as z:
        for ext in ("shp", "shx", "dbf"):
            z.write(OUT / f"fixture.{ext}", f"fixture.{ext}")
    print(f"wrote fixture.(shp|shx|dbf|zip) under {OUT}")
    print(f"  shp={len(shp)}B shx={len(shx)}B dbf={len(dbf)}B")


if __name__ == "__main__":
    main()
