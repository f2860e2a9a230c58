"""Self-contained GRIB2 codec (reader + writer), no eccodes dependency.

The reference ingests ERA5/IFS GRIB through CDO + cfgrib (reference
modules/my_remap.py:198-337); neither native stack exists in this
environment, so the framework carries a minimal GRIB2 edition-2 codec
covering exactly the layouts those archives use:

- grid definition template 3.0 (regular lat/lon) and 3.40 (Gaussian,
  regular or REDUCED — the pl row-length list is read from / written to
  section 3, so reduced grids like ERA5's N320 or IFS's O1280 decode
  with their exact file-carried geometry, no external tables)
- product definition template 4.0 (analysis/forecast at a horizontal
  level); isobaric (hPa naming: z+500 -> level 500) and surface/TOA levels
- data representation template 5.0 (simple packing, arbitrary bit width)
- section 6 bitmap indicator 255 (no bitmap) — ERA5 pressure-level fields

`read_grib2` groups messages into level-stacked arrays matching
`reformat_pl`'s input contract ({var: [T, L, npts]}, plus 'level'), and
returns the parsed `GridSpec` so `remap_grib_files` can build
conservative weights from the TRUE source geometry instead of assuming a
regular grid. `write_grib2` is the bit-faithful fixture writer used by
the ingest-rehearsal tests (and a capability the reference delegates to
eccodes).

All GRIB2 integers are big-endian; SIGNED fields use sign-magnitude
(high bit = negative), not two's complement.
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["GridSpec", "GribRecord", "read_grib2", "write_grib2",
           "gaussian_latitudes", "octahedral_pl", "PARAM_TABLE"]


# shortname -> (discipline, parameterCategory, parameterNumber)
# WMO table 4.2 entries for the variables the framework ingests
# (tisr uses the nearest WMO entry for ECMWF's local parameter 212).
# Covers the reference pipeline's full pressure-level + surface set
# (reference my_plotting.py:35-38 plots q500; my_remap.py remaps any
# pl/toa/static variable) — an unknown triple no longer fails ingest,
# it decodes as 'param_<d>_<c>_<n>' (see _shortname_for).
PARAM_TABLE = {
    "z": (0, 3, 4),        # geopotential [m2 s-2]
    "t": (0, 0, 0),        # temperature [K]
    "q": (0, 1, 0),        # specific humidity [kg kg-1]
    "r": (0, 1, 1),        # relative humidity [%]
    "u": (0, 2, 2),        # u wind [m s-1]
    "v": (0, 2, 3),        # v wind [m s-1]
    "w": (0, 2, 8),        # vertical velocity (pressure) [Pa s-1]
    "vo": (0, 2, 12),      # relative vorticity [s-1]
    "d": (0, 2, 13),       # divergence [s-1]
    "msl": (0, 3, 1),      # pressure reduced to MSL [Pa]
    "tisr": (0, 4, 1),     # short-wave radiation flux, TOA
    "tp": (0, 1, 8),       # total precipitation [kg m-2]
    "land_sea_mask": (2, 0, 0),
    "soil_type": (2, 3, 0),
    "topography": (2, 0, 7),   # model terrain height
}
_PARAM_LOOKUP = {v: k for k, v in PARAM_TABLE.items()}

# fixed-surface types (WMO code table 4.5) that decorate the shortname
# the way ECMWF does: t @ 2 m above ground -> '2t', u @ 10 m -> '10u'
_HEIGHT_ABOVE_GROUND = 103


def _shortname_for(disc: int, cat: int, num: int, sfc_type: int,
                   sfc_val: int) -> str:
    """ECMWF-style shortname: table lookup + height-above-ground prefix."""
    base = _PARAM_LOOKUP.get((disc, cat, num), f"param_{disc}_{cat}_{num}")
    if sfc_type == _HEIGHT_ABOVE_GROUND and sfc_val in (2, 10):
        return f"{sfc_val}{base}"
    return base

_MISS1, _MISS2, _MISS4 = 0xFF, 0xFFFF, 0xFFFFFFFF


def gaussian_latitudes(nlat: int) -> np.ndarray:
    """Gaussian latitudes (degrees), north -> south, both hemispheres."""
    nodes, _ = np.polynomial.legendre.leggauss(int(nlat))
    return np.rad2deg(np.arcsin(nodes))[::-1]


def octahedral_pl(n: int) -> Tuple[int, ...]:
    """ECMWF octahedral O{n} row lengths: 20 + 4i from each pole."""
    half = [20 + 4 * i for i in range(n)]
    return tuple(half + half[::-1])


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Parsed horizontal geometry of a GRIB2 field."""

    kind: str                       # 'regular_ll' | 'regular_gg' | 'reduced_gg'
    nlat: int
    nlon: Optional[int] = None      # regular grids
    pl: Optional[Tuple[int, ...]] = None   # reduced: points per latitude row

    @property
    def n_points(self) -> int:
        if self.pl is not None:
            return int(sum(self.pl))
        return self.nlat * self.nlon

    def latlon(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-point (lat, lon) degrees, row-major north->south."""
        if self.kind == "regular_ll":
            lat1d = 90.0 - (np.arange(self.nlat) + 0.5) * (180.0 / self.nlat)
        else:
            lat1d = gaussian_latitudes(self.nlat)
        if self.pl is None:
            lon1d = np.arange(self.nlon) * (360.0 / self.nlon)
            lon2, lat2 = np.meshgrid(lon1d, lat1d)
            return lat2.ravel(), lon2.ravel()
        lats, lons = [], []
        for lat, n_i in zip(lat1d, self.pl):
            lons.append(np.arange(n_i) * (360.0 / n_i))
            lats.append(np.full(n_i, lat))
        return np.concatenate(lats), np.concatenate(lons)

    def to_sampling(self):
        """Framework Sampling of this grid (source side of conservative
        remap weights)."""
        from ..sphere import build_sampling

        if self.kind == "regular_ll":
            return build_sampling("equiangular",
                                  {"nlat": self.nlat, "nlon": self.nlon})
        nlon = list(self.pl) if self.pl is not None else self.nlon
        return build_sampling("gauss", {"nlat": self.nlat, "nlon": nlon})

    @classmethod
    def from_name(cls, name: str) -> "GridSpec":
        """Registry names: 'O320' octahedral, 'F80' regular Gaussian,
        'N320' classic reduced (pl comes from the FILE; the spec is a
        placeholder validated against the decoded geometry)."""
        kind, n = name[0].upper(), int(name[1:])
        if kind == "O":
            return cls("reduced_gg", 2 * n, pl=octahedral_pl(n))
        if kind == "F":
            return cls("regular_gg", 2 * n, nlon=4 * n)
        if kind == "N":
            return cls("reduced_gg", 2 * n, pl=None)   # pl file-carried
        raise ValueError(f"unknown grid name {name!r}")


@dataclasses.dataclass
class GribRecord:
    """One GRIB2 message: a single field at one time and level."""

    shortname: str
    values: np.ndarray              # flat [n_points]
    time: np.datetime64
    grid: GridSpec
    level_hPa: Optional[int] = None       # isobaric level; None = surface
    surface_type: Optional[int] = None    # override (8 = nominal TOA,
    #                                       103 = height above ground)
    surface_value: int = 0                # e.g. 2 / 10 m for type 103


# ---------------------------------------------------------------------------
# encoding helpers
# ---------------------------------------------------------------------------

def _u(value: int, width: int) -> bytes:
    return int(value).to_bytes(width, "big")


def _s(value: int, width: int) -> bytes:
    """Sign-magnitude signed integer (GRIB2 convention)."""
    v = int(value)
    mag = abs(v)
    if v < 0:
        mag |= 1 << (8 * width - 1)
    return mag.to_bytes(width, "big")


def _read_u(b: bytes, off: int, width: int) -> int:
    return int.from_bytes(b[off:off + width], "big")


def _read_s(b: bytes, off: int, width: int) -> int:
    raw = int.from_bytes(b[off:off + width], "big")
    sign_bit = 1 << (8 * width - 1)
    return -(raw & ~sign_bit) if raw & sign_bit else raw


def _pack_simple(values: np.ndarray, nbits: int = 16):
    """Simple packing: Y = (R + X * 2^E) / 10^D with D=0."""
    v = np.asarray(values, dtype=np.float64)
    if v.size == 0:                      # fully-bitmapped (all-NaN) field
        return np.zeros(0, np.uint32), np.float32(0), 0, 0, 0
    vmin, vmax = float(v.min()), float(v.max())
    if vmax == vmin or nbits == 0:
        return np.zeros(v.shape, np.uint32), np.float32(vmin), 0, 0, 0
    # smallest E with (vmax-vmin)/2^E representable in nbits
    E = int(np.ceil(np.log2((vmax - vmin) / (2 ** nbits - 1) + 1e-300)))
    X = np.round((v - vmin) / (2.0 ** E)).astype(np.uint32)
    X = np.minimum(X, 2 ** nbits - 1)
    return X, np.float32(vmin), E, 0, nbits


def _bits_to_bytes(X: np.ndarray, nbits: int) -> bytes:
    if nbits == 0:
        return b""
    bits = ((X[:, None] >> np.arange(nbits - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _bytes_to_values(data: bytes, n: int, nbits: int, R: float, E: int,
                     D: int) -> np.ndarray:
    if nbits == 0:
        return np.full(n, R / 10.0 ** D, dtype=np.float32)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))[: n * nbits]
    X = (bits.reshape(n, nbits).astype(np.uint64)
         @ (1 << np.arange(nbits - 1, -1, -1, dtype=np.uint64)))
    return ((R + X * 2.0 ** E) / 10.0 ** D).astype(np.float32)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _section(num: int, body: bytes) -> bytes:
    return _u(len(body) + 5, 4) + _u(num, 1) + body


def _grid_section(grid: GridSpec) -> bytes:
    reduced = grid.pl is not None
    tmpl_num = 0 if grid.kind == "regular_ll" else 40
    lat, lon = grid.latlon()
    la1, lo1 = int(round(lat[0] * 1e6)), int(round(lon[0] * 1e6))
    la2, lo2 = int(round(lat[-1] * 1e6)), int(round(lon[-1] * 1e6))
    t = b"".join([
        _u(6, 1),                      # shape of earth: sphere r=6371229
        _u(_MISS1, 1), _u(_MISS4, 4),  # radius scale/value (implied)
        _u(_MISS1, 1), _u(_MISS4, 4),  # major axis
        _u(_MISS1, 1), _u(_MISS4, 4),  # minor axis
        _u(_MISS4 if reduced else grid.nlon, 4),   # Ni
        _u(grid.nlat, 4),                          # Nj
        _u(0, 4), _u(_MISS4, 4),       # basic angle / subdivisions
        _s(la1, 4), _s(lo1, 4),
        _u(0b00110000, 1),             # resolution/component flags
        _s(la2, 4), _s(lo2, 4),
        (_u(_MISS4, 4) if reduced
         else _u(int(round(360.0 / grid.nlon * 1e6)), 4)),  # Di
        (_u(grid.nlat // 2, 4) if tmpl_num == 40             # N
         else _u(int(round(180.0 / grid.nlat * 1e6)), 4)),   # Dj (3.0)
        _u(0, 1),                      # scanning mode: +i, -j
    ])
    pl_bytes = b""
    n_oct, interp = 0, 0
    if reduced:
        n_oct, interp = 2, 1
        pl_bytes = b"".join(_u(p, 2) for p in grid.pl)
    body = b"".join([
        _u(0, 1),                      # source of grid definition
        _u(grid.n_points, 4),
        _u(n_oct, 1), _u(interp, 1),
        _u(tmpl_num, 2), t, pl_bytes,
    ])
    return _section(3, body)


def write_grib2(path, records: Sequence[GribRecord]) -> Path:
    """Write one GRIB2 file with one message per record."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    out = []
    for rec in records:
        # '2t' / '10u' style names encode height-above-ground surfaces
        name, sfc_auto = rec.shortname, None
        if name not in PARAM_TABLE:
            for pre, h in (("10", 10), ("2", 2)):
                if name.startswith(pre) and name[len(pre):] in PARAM_TABLE:
                    name, sfc_auto = name[len(pre):], (
                        _HEIGHT_ABOVE_GROUND, h)
                    break
        if name not in PARAM_TABLE:
            raise ValueError(f"unknown shortname {rec.shortname!r}; one of "
                             f"{sorted(PARAM_TABLE)}")
        disc, cat, num = PARAM_TABLE[name]
        vals = np.asarray(rec.values, dtype=np.float64).ravel()
        if vals.size != rec.grid.n_points:
            raise ValueError(f"{rec.shortname}: {vals.size} values for a "
                             f"{rec.grid.n_points}-point grid")
        t = np.datetime64(rec.time, "s").astype("datetime64[s]").item()
        s1 = _section(1, b"".join([
            _u(98, 2), _u(0, 2),       # centre (ECMWF), subcentre
            _u(2, 1), _u(0, 1),        # tables version, local tables
            _u(0, 1),                  # reference time = analysis
            _u(t.year, 2), _u(t.month, 1), _u(t.day, 1),
            _u(t.hour, 1), _u(t.minute, 1), _u(t.second, 1),
            _u(0, 1), _u(0, 1),        # production status, data type
        ]))
        s3 = _grid_section(rec.grid)
        if rec.level_hPa is not None:
            sfc_type, sfc_val = 100, int(rec.level_hPa) * 100   # Pa
        elif rec.surface_type is None and sfc_auto is not None:
            sfc_type, sfc_val = sfc_auto
        else:
            sfc_type = rec.surface_type or 1
            sfc_val = int(rec.surface_value)
        s4 = _section(4, b"".join([
            _u(0, 2), _u(0, 2),        # NV, template 4.0
            _u(cat, 1), _u(num, 1),
            _u(0, 1), _u(_MISS1, 1), _u(_MISS1, 1),  # process ids
            _u(0, 2), _u(0, 1),        # cutoff
            _u(1, 1), _u(0, 4),        # unit = hour, forecast time 0
            _u(sfc_type, 1), _u(0, 1), _u(sfc_val, 4),
            _u(_MISS1, 1), _u(_MISS1, 1), _u(_MISS4, 4),  # 2nd surface
        ]))
        # NaN values are stored via a section-6 bitmap (1 bit per grid
        # point, 1 = present); only the finite values are bit-packed
        finite = np.isfinite(vals)
        if finite.all():
            pack_vals = vals
            s6 = _section(6, _u(255, 1))              # no bitmap
        else:
            pack_vals = vals[finite]
            s6 = _section(6, _u(0, 1)
                          + np.packbits(finite.astype(np.uint8)).tobytes())
        X, R, E, D, nbits = _pack_simple(pack_vals)
        s5 = _section(5, b"".join([
            _u(pack_vals.size, 4), _u(0, 2),          # template 5.0
            struct.pack(">f", R), _s(E, 2), _s(D, 2),
            _u(nbits, 1), _u(0, 1),
        ]))
        s7 = _section(7, _bits_to_bytes(X, nbits))
        body = s1 + s3 + s4 + s5 + s6 + s7
        total = 16 + len(body) + 4
        s0 = b"GRIB" + _u(0, 2) + _u(disc, 1) + _u(2, 1) + _u(total, 8)
        out.append(s0 + body + b"7777")
    path.write_bytes(b"".join(out))
    return path


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _parse_grid(body: bytes) -> GridSpec:
    # body starts at section octet 6 (source of grid definition)
    n_oct = _read_u(body, 5, 1)
    tmpl = _read_u(body, 7, 2)
    if tmpl not in (0, 40):
        raise NotImplementedError(f"grid definition template 3.{tmpl} "
                                  "(supported: 3.0 regular lat/lon, "
                                  "3.40 Gaussian)")
    t = body[9:]
    ni = _read_u(t, 16, 4)
    nj = _read_u(t, 20, 4)
    pl = None
    if n_oct:
        pl_raw = t[58:]
        pl = tuple(_read_u(pl_raw, i * n_oct, n_oct) for i in range(nj))
    if tmpl == 0:
        return GridSpec("regular_ll", nj, nlon=ni)
    if pl is not None:
        return GridSpec("reduced_gg", nj, pl=pl)
    return GridSpec("regular_gg", nj, nlon=ni)


def _parse_message(buf: bytes, off: int):
    if buf[off:off + 4] != b"GRIB":
        raise ValueError(f"no GRIB magic at offset {off}")
    disc = _read_u(buf, off + 6, 1)
    edition = _read_u(buf, off + 7, 1)
    if edition != 2:
        raise NotImplementedError(f"GRIB edition {edition} (only 2)")
    total = _read_u(buf, off + 8, 8)
    end = off + total
    pos = off + 16
    sections: Dict[int, bytes] = {}
    while pos < end - 4:
        ln = _read_u(buf, pos, 4)
        num = _read_u(buf, pos + 4, 1)
        sections[num] = buf[pos + 5:pos + ln]
        pos += ln
    if buf[end - 4:end] != b"7777":
        raise ValueError("corrupt message: missing 7777 trailer")

    s1 = sections[1]
    time = np.datetime64(
        f"{_read_u(s1, 7, 2):04d}-{_read_u(s1, 9, 1):02d}-"
        f"{_read_u(s1, 10, 1):02d}T{_read_u(s1, 11, 1):02d}:"
        f"{_read_u(s1, 12, 1):02d}:{_read_u(s1, 13, 1):02d}")
    grid = _parse_grid(sections[3])

    s4 = sections[4]
    tmpl4 = _read_u(s4, 2, 2)
    if tmpl4 != 0:
        raise NotImplementedError(f"product definition template 4.{tmpl4}")
    cat, num = _read_u(s4, 4, 1), _read_u(s4, 5, 1)
    sfc_type = _read_u(s4, 17, 1)
    sfc_scale_raw = _read_u(s4, 18, 1)
    sfc_val = _read_u(s4, 19, 4)
    # octet 24 scale factor of first fixed surface (sign-magnitude;
    # 0xFF = missing -> treat as 0)
    sfc_scale = 0 if sfc_scale_raw == _MISS1 else _read_s(s4, 18, 1)
    sfc_level = sfc_val / 10.0 ** sfc_scale if sfc_scale else sfc_val
    level = int(sfc_level) // 100 if sfc_type == 100 else None
    shortname = _shortname_for(disc, cat, num, sfc_type, int(sfc_level))

    s5 = sections[5]
    n_pts = _read_u(s5, 0, 4)
    tmpl5 = _read_u(s5, 4, 2)
    if tmpl5 != 0:
        raise NotImplementedError(f"data representation template 5.{tmpl5} "
                                  "(only 5.0 simple packing)")
    R = struct.unpack(">f", s5[6:10])[0]
    E = _read_s(s5, 10, 2)
    D = _read_s(s5, 12, 2)
    nbits = _read_u(s5, 14, 1)
    bmp_ind = _read_u(sections[6], 0, 1)
    packed = _bytes_to_values(sections[7], n_pts, nbits, R, E, D)
    if bmp_ind == 255:                       # no bitmap: all points present
        values = packed
    elif bmp_ind == 0:                       # bitmap in THIS message
        # section 6 octets 7+: one bit per grid point, MSB-first; 1 =
        # value present in section 7, 0 = missing (decoded as NaN)
        n_grid = grid.n_points
        bmp = np.unpackbits(
            np.frombuffer(sections[6][1:], dtype=np.uint8))[:n_grid]
        n_present = int(bmp.sum())
        if n_present != n_pts:
            raise ValueError(
                f"bitmap marks {n_present} points present but section 5 "
                f"declares {n_pts} packed values")
        values = np.full(n_grid, np.nan, dtype=np.float32)
        values[bmp.astype(bool)] = packed
    else:
        raise NotImplementedError(
            f"bitmap indicator {bmp_ind} (only 255 = none, 0 = "
            "bitmap present in this message)")
    return GribRecord(shortname, values, time, grid, level_hPa=level,
                      surface_type=None if level is not None else sfc_type
                      ), end


def read_grib2(path):
    """Read a GRIB2 file -> (fields, time, grid).

    fields: {var: [T, npts]} for single-level vars, {var: [T, L, npts]}
    plus 'level' ([L] hPa, ascending) when isobaric levels are present —
    the exact input contract of `reformat_pl` (level-stacked second dim).
    All messages must share one grid. Times are the sorted unique message
    times; every (var, level) must cover every time.
    """
    buf = Path(path).read_bytes()
    records: List[GribRecord] = []
    off = 0
    while off < len(buf):
        if buf[off:off + 4] != b"GRIB":      # tolerate padding between msgs
            off += 1
            continue
        rec, off = _parse_message(buf, off)
        records.append(rec)
    if not records:
        raise ValueError(f"no GRIB2 messages in {path}")
    grid = records[0].grid
    for r in records:
        if r.grid != grid:
            raise ValueError("mixed grids in one file are not supported")
    times = np.array(sorted({r.time for r in records}),
                     dtype="datetime64[ns]")
    t_index = {t: i for i, t in enumerate(times)}
    levels = sorted({r.level_hPa for r in records if r.level_hPa is not None})
    fields: Dict[str, np.ndarray] = {}
    filled: Dict[str, np.ndarray] = {}
    for r in records:
        ti = t_index[np.datetime64(r.time, "ns")]
        if r.level_hPa is not None:
            key = r.shortname
            if key not in fields:
                fields[key] = np.empty((len(times), len(levels),
                                        grid.n_points), np.float32)
                filled[key] = np.zeros((len(times), len(levels)), bool)
            li = levels.index(r.level_hPa)
            fields[key][ti, li] = r.values
            filled[key][ti, li] = True
        else:
            if r.shortname not in fields:
                fields[r.shortname] = np.empty((len(times), grid.n_points),
                                               np.float32)
                filled[r.shortname] = np.zeros(len(times), bool)
            fields[r.shortname][ti] = r.values
            filled[r.shortname][ti] = True
    for k, mask in filled.items():
        if not mask.all():
            raise ValueError(f"{k}: missing messages for some "
                             "(time, level) combinations")
    if levels:
        fields["level"] = np.asarray(levels, dtype=np.int64)
    return fields, times, grid
