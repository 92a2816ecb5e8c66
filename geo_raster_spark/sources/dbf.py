"""DBF (dBase III) attribute tables — SURVEY.md §2.1 S10.

The reference reads shapefile sidecar .dbf attribute tables through OGR
[ref: mod/geo_base_c.pyx:1047-1091 uses the shapefile driver, whose
attributes live in the .dbf].  This is a self-contained reader/writer for
the dBase III subset shapefiles actually use (C character, N numeric,
F float, L logical, D date), so catalogs shipped as shapefiles can have
their attribute tables loaded without OGR.

Scale note: .dbf files are small sidecars (zone/catalog attributes), read
driver-side into a pandas frame and turned into a (broadcastable) Spark
DataFrame — the same role zones_pdf plays everywhere else.
"""

from __future__ import annotations

import struct
from datetime import date

import numpy as np
import pandas as pd


def read_dbf_pandas(path: str) -> pd.DataFrame:
    """.dbf -> pandas DataFrame (deleted records skipped)."""
    with open(path, "rb") as f:
        data = f.read()
    version = data[0]
    if version & 0x07 not in (0x03, 0x04):
        raise ValueError(f"unsupported dbf version byte 0x{version:02x}")
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", data, 4)

    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[pos + 11])
        length = data[pos + 16]
        dec = data[pos + 17]
        fields.append((name, ftype, length, dec))
        pos += 32

    rows = []
    for i in range(n_rec):
        off = hdr_size + i * rec_size
        rec = data[off:off + rec_size]
        if not rec or rec[0:1] == b"*":  # deleted
            continue
        vals = []
        p = 1
        for name, ftype, length, dec in fields:
            raw = rec[p:p + length]
            p += length
            txt = raw.decode("ascii", errors="replace").strip()
            if ftype == "C":
                vals.append(txt)
            elif ftype in ("N", "F"):
                if txt in ("", "*" * len(txt)):
                    vals.append(None)
                elif ftype == "N" and dec == 0 and "." not in txt:
                    vals.append(int(txt))
                else:
                    vals.append(float(txt))
            elif ftype == "L":
                vals.append(None if txt in ("", "?") else txt.upper() in ("T", "Y"))
            elif ftype == "D":
                vals.append(None if not txt else date(
                    int(txt[:4]), int(txt[4:6]), int(txt[6:8])))
            else:
                vals.append(txt)
        rows.append(vals)
    return pd.DataFrame(rows, columns=[f[0] for f in fields])


def read_dbf(spark, path: str):
    """S10: .dbf -> Spark DataFrame (driver-side parse of the small sidecar)."""
    return spark.createDataFrame(read_dbf_pandas(path))


def _field_spec(s: pd.Series):
    if pd.api.types.is_integer_dtype(s):
        return "N", 20, 0  # full int64 range incl. sign
    if pd.api.types.is_float_dtype(s):
        return "N", 19, 8
    if pd.api.types.is_bool_dtype(s):
        return "L", 1, 0
    if pd.api.types.is_datetime64_any_dtype(s):
        return "D", 8, 0
    width = max(1, min(254, int(s.astype(str).str.len().max() or 1)))
    return "C", width, 0


def write_dbf(pdf: pd.DataFrame, path: str) -> None:
    """pandas DataFrame -> dBase III .dbf (C/N/L/D field types)."""
    specs = {c: _field_spec(pdf[c]) for c in pdf.columns}
    rec_size = 1 + sum(w for _, w, _ in specs.values())
    hdr_size = 32 + 32 * len(pdf.columns) + 1
    today = date.today()
    out = bytearray()
    out += struct.pack("<BBBBIHH", 0x03, today.year - 1900, today.month,
                       today.day, len(pdf), hdr_size, rec_size)
    out += b"\x00" * 20
    for c in pdf.columns:
        ftype, width, dec = specs[c]
        name = c.encode("ascii")[:10]
        out += name + b"\x00" * (11 - len(name))
        out += ftype.encode("ascii") + b"\x00" * 4
        out += bytes([width, dec]) + b"\x00" * 14
    out += b"\x0D"
    for _, r in pdf.iterrows():
        out += b" "
        for c in pdf.columns:
            ftype, width, dec = specs[c]
            v = r[c]
            if ftype == "C":
                txt = ("" if v is None else str(v))[:width].ljust(width)
            elif ftype == "N":
                if v is None or (isinstance(v, float) and np.isnan(v)):
                    txt = " " * width
                elif dec == 0:
                    txt = str(int(v))
                    if len(txt) > width:
                        raise ValueError(
                            f"dbf field {c!r}: integer {v} exceeds declared "
                            f"width {width} — record would misalign the file")
                    txt = txt.rjust(width)
                else:
                    # shrink decimals (libdbf-style) until the text fits the
                    # declared width; a value too wide even at 0 decimals
                    # would silently misalign every following field, so raise
                    txt = f"{float(v):.{dec}f}"
                    d = dec
                    while len(txt) > width and d > 0:
                        d -= 1
                        txt = f"{float(v):.{d}f}"
                    if len(txt) > width:
                        raise ValueError(
                            f"dbf field {c!r}: value {v} exceeds declared "
                            f"width {width} even at 0 decimals")
                    txt = txt.rjust(width)
            elif ftype == "L":
                txt = "?" if v is None else ("T" if v else "F")
            else:  # D
                txt = "" .rjust(8) if v is None else pd.Timestamp(v).strftime("%Y%m%d")
            out += txt.encode("ascii")
    out += b"\x1A"
    with open(path, "wb") as f:
        f.write(bytes(out))
