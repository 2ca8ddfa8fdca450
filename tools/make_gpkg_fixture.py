#!/usr/bin/env python3
"""Generate src/test/resources/fixtures/demo.gpkg — a tiny but
spec-conformant GeoPackage raster (OGC 12-128r17): gpkg_contents /
gpkg_spatial_ref_sys / gpkg_tile_matrix_set / gpkg_tile_matrix + one
tile-pyramid table holding 2x2 RGBA PNG tiles of 64x64 at zoom 0.

Pixel contract (mirrored by GpkgSpec and the q106 oracle): global
pixel (px, py) of the 128x128 mosaic carries value
    v = (px * 3 + py * 5) % 251
in the R channel; G = px % 256, B = py % 256, A = 255.

Stdlib only (sqlite3, zlib, struct). Deterministic output bytes are
NOT guaranteed across sqlite versions — the READER contract is what
the tests pin, so regenerating with a different sqlite is fine.
"""
import os
import sqlite3
import struct
import zlib

W = H = 128
TS = 64
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures", "demo.gpkg")


def png_rgba(w, h, rgba_rows):
    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # 8-bit RGBA
    raw = b"".join(b"\x00" + row for row in rgba_rows)   # filter 0 per row
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))


def tile_png(tx, ty):
    rows = []
    for y in range(TS):
        row = bytearray()
        for x in range(TS):
            px, py = tx * TS + x, ty * TS + y
            row += bytes(((px * 3 + py * 5) % 251, px % 256, py % 256, 255))
        rows.append(bytes(row))
    return png_rgba(TS, TS, rows)


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    if os.path.exists(OUT):
        os.remove(OUT)
    db = sqlite3.connect(OUT)
    db.execute("PRAGMA page_size = 4096")
    # OGC 12-128r17 Req 2: application_id 'GPKG' (0x47504B47); Req 2
    # (since 1.2) also pins user_version to the spec version number.
    db.execute("PRAGMA application_id = 1196444487")
    db.execute("PRAGMA user_version = 10300")
    db.executescript("""
CREATE TABLE gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
  organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
  definition TEXT NOT NULL, description TEXT);
CREATE TABLE gpkg_contents (
  table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT UNIQUE, description TEXT DEFAULT '',
  last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
  max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
CREATE TABLE gpkg_tile_matrix_set (
  table_name TEXT PRIMARY KEY, srs_id INTEGER NOT NULL,
  min_x DOUBLE NOT NULL, min_y DOUBLE NOT NULL,
  max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL);
CREATE TABLE gpkg_tile_matrix (
  table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL,
  matrix_width INTEGER NOT NULL, matrix_height INTEGER NOT NULL,
  tile_width INTEGER NOT NULL, tile_height INTEGER NOT NULL,
  pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE NOT NULL,
  PRIMARY KEY (table_name, zoom_level));
CREATE TABLE demo_tiles (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  zoom_level INTEGER NOT NULL, tile_column INTEGER NOT NULL,
  tile_row INTEGER NOT NULL, tile_data BLOB NOT NULL,
  UNIQUE (zoom_level, tile_column, tile_row));
""")
    db.execute(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        ("WGS 84", 4326, "EPSG", 4326, "GEOGCS[...]", None))
    db.execute(
        "INSERT INTO gpkg_contents VALUES (?,?,?,?,?,?,?,?,?,?)",
        ("demo_tiles", "tiles", "demo", "fixture",
         "2026-08-13T00:00:00.000Z", 35.0, 30.0, 35.128, 30.128, 4326))
    db.execute(
        "INSERT INTO gpkg_tile_matrix_set VALUES (?,?,?,?,?,?)",
        ("demo_tiles", 4326, 35.0, 30.0, 35.128, 30.128))
    db.execute(
        "INSERT INTO gpkg_tile_matrix VALUES (?,?,?,?,?,?,?,?)",
        ("demo_tiles", 0, 2, 2, TS, TS, 0.001, 0.001))
    for ty in range(2):
        for tx in range(2):
            db.execute(
                "INSERT INTO demo_tiles (zoom_level, tile_column, tile_row, tile_data)"
                " VALUES (?,?,?,?)", (0, tx, ty, tile_png(tx, ty)))
    db.commit()
    db.close()
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
