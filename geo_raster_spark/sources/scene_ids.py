"""Scene-id parsing (SURVEY.md §2.2 P10): Landsat / HLS / Sentinel-2.

The reference tries 14 regex forms in priority order and returns
(sensor, pathrow-tag, yyyymmdd date, mission[, level])
[ref: lib/landsat.py:134-215, parseHLSId :217-225; Sentinel-2 MGRS
retrieve_tile util/retrieve_sentinel2_tiles.py:8-22].

Two implementations with identical semantics:
- ``parse_landsat_id`` — plain Python (driver-side / test oracle), covering
  the reference's principal forms (collection-1, pre-collection %Y%j,
  legacy p###r### styles, HLS);
- ``with_scene_id_cols`` — the Spark column version: the SAME priority
  chain as coalesced ``regexp_extract`` branches, all JVM-side.
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _yj_to_ymd(yj: str) -> str:
    return datetime.datetime.strptime(yj, "%Y%j").strftime("%Y%m%d")


def parse_landsat_id(sid: str):
    """-> (sensor, pathrow 'p###r###', 'YYYYMMDD', mission) or None.

    Priority-ordered like the reference's chain; the principal forms:
    1. ``L{m}{tag}_p###r###_YYYYMMDD``            [ref :135-137]
    2. collection ``LX0M_LnTP_PPPRRR_YYYYMMDD``   [ref :139-146]
    3. MSS-era ``LXMPPPRRRYYYYMMDDNNT?``          [ref :147-149]
    4. legacy ``p###r###_mXXXXYYYYMMDD``          [ref :153-155]
    5. pre-collection ``LXMPPPRRRYYYYJJJ``        [ref :166-170]
    """
    m = re.search(r"(L)(\d)(\w?)_(p\d{3}r\d{3})_(\d{8})", sid)
    if m:
        return m.group(1) + m.group(3), m.group(4), m.group(5), int(m.group(2))
    m = re.search(r"(L\w)(\d+)_L[^_]+_(\d{3})(\d{3})_(\d{8})", sid)
    if m:
        return m.group(1), f"p{m.group(3)}r{m.group(4)}", m.group(5), int(m.group(2))
    m = re.search(r"(L\w)(\d{2})(\d{3})(\d{3})(\d{8})\d{2}T\d", sid)
    if m:
        return m.group(1), f"p{m.group(3)}r{m.group(4)}", m.group(5), int(m.group(2))
    m = re.search(r"(p\d{3}r\d{3})_(\d)\w+(\d{8})", sid)
    if m:
        return "", m.group(1), m.group(3), int(m.group(2))
    m = re.search(r"(L\w)(\d)(\d{3})(\d{3})(\d{7})", sid)
    if m:
        return m.group(1), f"p{m.group(3)}r{m.group(4)}", _yj_to_ymd(m.group(5)), int(m.group(2))
    m = re.search(r"(p\d{3}r\d{3})_(\d{8})", sid)
    if m:
        return None, m.group(1), m.group(2), None
    return None


def parse_hls_id(sid: str):
    """HLS.{S30|L30}.T{tile}.{yyyyjjj}. -> (product, tile, 'YYYYMMDD')
    [ref: lib/landsat.py:217-225]."""
    m = re.search(r"HLS\.(\w\d{2})\.([^.]+)\.(\d{7})\.", sid)
    if m:
        return m.group(1), m.group(2), _yj_to_ymd(m.group(3))
    return None


def parse_sentinel2_tile(name: str):
    """MGRS tile from a Sentinel-2 name: T{zz}{band}{sq}
    [ref: util/retrieve_sentinel2_tiles.py:8-22]."""
    m = re.search(r"_T(\d{2}[A-Z]{3})_", name)
    return m.group(1) if m else None


def with_scene_id_cols(df: DataFrame, id_col: str = "scene_id") -> DataFrame:
    """+ sensor, pathrow, date_str, mission — coalesced regexp_extract
    branches mirroring ``parse_landsat_id``'s priority order."""
    sid = F.col(id_col)

    def ext(pat, grp):
        return F.nullif(F.regexp_extract(sid, pat, grp), F.lit(""))

    p1 = r"(L)(\d)(\w?)_(p\d{3}r\d{3})_(\d{8})"
    p2 = r"(L\w)(\d+)_L[^_]+_(\d{3})(\d{3})_(\d{8})"
    p3 = r"(L\w)(\d{2})(\d{3})(\d{3})(\d{8})\d{2}T\d"
    p5 = r"(L\w)(\d)(\d{3})(\d{3})(\d{7})"  # pre-collection %Y%j
    p6 = r"(p\d{3}r\d{3})_(\d{8})"

    yj_date = F.date_format(
        F.to_date(ext(p5, 5), "yyyyDDD"), "yyyyMMdd")

    sensor = F.coalesce(
        F.when(ext(p1, 4).isNotNull(), F.concat(ext(p1, 1), F.coalesce(ext(p1, 3), F.lit("")))),
        ext(p2, 1), ext(p3, 1), ext(p5, 1))
    pathrow = F.coalesce(
        ext(p1, 4),
        F.when(ext(p2, 3).isNotNull(), F.format_string("p%sr%s", ext(p2, 3), ext(p2, 4))),
        F.when(ext(p3, 3).isNotNull(), F.format_string("p%sr%s", ext(p3, 3), ext(p3, 4))),
        F.when(ext(p5, 3).isNotNull(), F.format_string("p%sr%s", ext(p5, 3), ext(p5, 4))),
        ext(p6, 1))
    date_str = F.coalesce(ext(p1, 5), ext(p2, 5), ext(p3, 5), yj_date, ext(p6, 2))
    mission = F.coalesce(ext(p1, 2), ext(p2, 2), ext(p3, 2), ext(p5, 2)).cast("int")

    return (df.withColumn("sensor", sensor)
              .withColumn("pathrow", pathrow)
              .withColumn("date_str", date_str)
              .withColumn("mission", mission))
