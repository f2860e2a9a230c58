"""Independent validation of the GRIB2 codec (VERDICT r4 missing #1).

Every test here decodes messages built OCTET BY OCTET from the WMO FM-92
GRIB2 specification — `write_grib2` is never involved, so a spec
misreading mirrored in reader and writer cannot hide. The builders below
are deliberately separate implementations: each field is laid out with
its spec octet numbers annotated, and the expected physical values are
computed by hand from the template 5.0 formula

    Y = (R + X * 2**E) / 10**D

with sign-magnitude signed integers (GRIB2 convention: high bit = sign,
remaining bits = magnitude — NOT two's complement).

Reference ingest path being replaced: /root/reference/modules/
my_remap.py:198-337 (CDO/cfgrib); reader under test:
deepsphere_weather_tpu/data/grib.py.
"""

import struct

import numpy as np
import pytest

from deepsphere_weather_tpu.data.grib import (
    GribRecord, GridSpec, _bits_to_bytes, _bytes_to_values, _pack_simple,
    _read_s, _s, gaussian_latitudes, read_grib2, write_grib2)


def u(value, width):
    """Unsigned big-endian integer, `width` octets."""
    return int(value).to_bytes(width, "big")


def sm(value, width):
    """GRIB2 sign-magnitude signed integer: sign bit + magnitude."""
    mag = abs(int(value))
    if value < 0:
        mag |= 1 << (8 * width - 1)
    return mag.to_bytes(width, "big")


def section(number, body):
    """Any section: octets 1-4 length (incl. these 5), octet 5 number."""
    return u(len(body) + 5, 4) + u(number, 1) + body


def ident_section(year, month, day, hour):
    """Section 1 (Identification), 21 octets total."""
    return section(1, b"".join([
        u(98, 2),          # octets  6-7  originating centre (ECMWF)
        u(0, 2),           # octets  8-9  subcentre
        u(2, 1),           # octet  10    master tables version
        u(0, 1),           # octet  11    local tables version
        u(0, 1),           # octet  12    significance of ref. time
        u(year, 2),        # octets 13-14 year
        u(month, 1),       # octet  15    month
        u(day, 1),         # octet  16    day
        u(hour, 1),        # octet  17    hour
        u(0, 1),           # octet  18    minute
        u(0, 1),           # octet  19    second
        u(0, 1),           # octet  20    production status
        u(0, 1),           # octet  21    type of processed data
    ]))


def product_section(category, number, sfc_type, sfc_scale, sfc_value):
    """Section 4, product definition template 4.0 (34 octets total)."""
    return section(4, b"".join([
        u(0, 2),           # octets  6-7  NV (no coordinate values)
        u(0, 2),           # octets  8-9  template number 4.0
        u(category, 1),    # octet  10    parameter category
        u(number, 1),      # octet  11    parameter number
        u(0, 1),           # octet  12    type of generating process
        u(0xFF, 1),        # octet  13    background process (missing)
        u(0xFF, 1),        # octet  14    analysis process (missing)
        u(0, 2),           # octets 15-16 hours after cutoff
        u(0, 1),           # octet  17    minutes after cutoff
        u(1, 1),           # octet  18    time unit (1 = hour)
        u(0, 4),           # octets 19-22 forecast time (analysis)
        u(sfc_type, 1),    # octet  23    type of first fixed surface
        sm(sfc_scale, 1),  # octet  24    scale factor of first surface
        u(sfc_value, 4),   # octets 25-28 scaled value of first surface
        u(0xFF, 1),        # octet  29    second surface type (missing)
        u(0xFF, 1),        # octet  30    second surface scale (missing)
        u(0xFFFFFFFF, 4),  # octets 31-34 second surface value (missing)
    ]))


def repr_section(n_packed, R, E, D, nbits):
    """Section 5, data representation template 5.0 (21 octets total)."""
    return section(5, b"".join([
        u(n_packed, 4),          # octets  6-9  number of packed values
        u(0, 2),                 # octets 10-11 template number 5.0
        struct.pack(">f", R),    # octets 12-15 reference value R (IEEE)
        sm(E, 2),                # octets 16-17 binary scale factor E
        sm(D, 2),                # octets 18-19 decimal scale factor D
        u(nbits, 1),             # octet  20    bits per packed value
        u(0, 1),                 # octet  21    original field type
    ]))


def pack_msb(xs, nbits):
    """Bit-pack integers MSB-first into octets (section 7 payload)."""
    bits = []
    for x in xs:
        bits.extend((int(x) >> i) & 1 for i in range(nbits - 1, -1, -1))
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(b << (7 - i) for i, b in enumerate(bits[o:o + 8]))
        for o in range(0, len(bits), 8))


def grib2_message(discipline, sections):
    body = b"".join(sections)
    total = 16 + len(body) + 4
    s0 = (b"GRIB"          # octets  1-4  magic
          + u(0, 2)        # octets  5-6  reserved
          + u(discipline, 1)   # octet 7  discipline
          + u(2, 1)        # octet  8     edition 2
          + u(total, 8))   # octets  9-16 total message length
    return s0 + body + b"7777"


def latlon_grid_section(nlat, nlon, la1, lo1, la2, lo2, di, dj):
    """Section 3, grid definition template 3.0 (regular lat/lon).

    Lat/lon in microdegrees, sign-magnitude."""
    template = b"".join([
        u(6, 1),               # octet  15    shape of earth (r=6371229 m)
        u(0xFF, 1), u(0xFFFFFFFF, 4),   # octets 16-20 radius (implied)
        u(0xFF, 1), u(0xFFFFFFFF, 4),   # octets 21-25 major axis
        u(0xFF, 1), u(0xFFFFFFFF, 4),   # octets 26-30 minor axis
        u(nlon, 4),            # octets 31-34 Ni
        u(nlat, 4),            # octets 35-38 Nj
        u(0, 4),               # octets 39-42 basic angle
        u(0xFFFFFFFF, 4),      # octets 43-46 subdivisions (missing)
        sm(la1, 4),            # octets 47-50 La1
        sm(lo1, 4),            # octets 51-54 Lo1
        u(0b00110000, 1),      # octet  55    resolution/component flags
        sm(la2, 4),            # octets 56-59 La2
        sm(lo2, 4),            # octets 60-63 Lo2
        u(di, 4),              # octets 64-67 Di increment
        u(dj, 4),              # octets 68-71 Dj increment
        u(0, 1),               # octet  72    scanning mode (+i, -j)
    ])
    return section(3, b"".join([
        u(0, 1),               # octet   6    source of grid definition
        u(nlat * nlon, 4),     # octets  7-10 number of data points
        u(0, 1),               # octet  11    octets per pl entry (none)
        u(0, 1),               # octet  12    interpretation of list
        u(0, 2),               # octets 13-14 template number 3.0
        template,
    ]))


def reduced_gaussian_grid_section(nlat, pl):
    """Section 3, grid definition template 3.40 with a pl list
    (reduced Gaussian: Ni missing, N = nlat // 2, 2-octet pl entries
    following octet 72)."""
    glat = gaussian_latitudes(nlat)
    la1 = int(round(glat[0] * 1e6))
    la2 = int(round(glat[-1] * 1e6))
    template = b"".join([
        u(6, 1),                           # octet  15 shape of earth
        u(0xFF, 1), u(0xFFFFFFFF, 4),      # 16-20
        u(0xFF, 1), u(0xFFFFFFFF, 4),      # 21-25
        u(0xFF, 1), u(0xFFFFFFFF, 4),      # 26-30
        u(0xFFFFFFFF, 4),                  # 31-34 Ni (missing: reduced)
        u(nlat, 4),                        # 35-38 Nj
        u(0, 4), u(0xFFFFFFFF, 4),         # 39-46 basic angle/subdiv
        sm(la1, 4), sm(0, 4),              # 47-54 La1, Lo1
        u(0b00110000, 1),                  # 55    flags
        sm(la2, 4),                        # 56-59 La2
        sm(int(round((360.0 - 360.0 / pl[-1]) * 1e6)), 4),   # 60-63 Lo2
        u(0xFFFFFFFF, 4),                  # 64-67 Di (missing: reduced)
        u(nlat // 2, 4),                   # 68-71 N parallels pole->equator
        u(0, 1),                           # 72    scanning mode
    ])
    pl_bytes = b"".join(u(p, 2) for p in pl)     # octets 73+ : pl list
    return section(3, b"".join([
        u(0, 1),               # octet   6    source of grid definition
        u(sum(pl), 4),         # octets  7-10 number of data points
        u(2, 1),               # octet  11    2 octets per pl entry
        u(1, 1),               # octet  12    list interpretation 1
        u(40, 2),              # octets 13-14 template number 3.40
        template, pl_bytes,
    ]))


class TestGoldenMessages:
    """Hand-built messages: the reader never saw these bytes from its
    own writer."""

    def test_regular_latlon_negative_scale_factors(self, tmp_path):
        """2x3 regular lat/lon, t @ 850 hPa, R=-2.5, E=-1, D=+1, 4-bit
        packing. Expected by hand: Y = (-2.5 + X * 2**-1) / 10**1."""
        xs = [0, 1, 2, 3, 4, 5]
        msg = grib2_message(0, [          # discipline 0 = meteorological
            ident_section(2020, 1, 15, 12),
            latlon_grid_section(
                nlat=2, nlon=3,
                la1=45_000_000, lo1=0,               # centers: 45N..45S
                la2=-45_000_000, lo2=240_000_000,    # 0..240E step 120
                di=120_000_000, dj=90_000_000),
            product_section(category=0, number=0,    # 4.2-0-0: temperature
                            sfc_type=100, sfc_scale=0,
                            sfc_value=85_000),       # 85 000 Pa = 850 hPa
            repr_section(n_packed=6, R=-2.5, E=-1, D=1, nbits=4),
            section(6, u(255, 1)),                   # no bitmap
            section(7, pack_msb(xs, 4)),
        ])
        # sign-magnitude regression guards: E=-1 must be 0x8001 on the
        # wire (two's complement 0xFFFF would decode as -32767)
        assert sm(-1, 2) == b"\x80\x01"
        assert sm(-45_000_000, 4) == (45_000_000 | 1 << 31).to_bytes(4, "big")

        path = tmp_path / "golden_ll.grib2"
        path.write_bytes(msg)
        fields, times, grid = read_grib2(path)

        assert grid == GridSpec("regular_ll", 2, nlon=3)
        np.testing.assert_array_equal(
            times, np.array(["2020-01-15T12:00:00"], dtype="datetime64[ns]"))
        assert list(fields["level"]) == [850]
        expected = [(-2.5 + x * 2.0 ** -1) / 10.0 for x in xs]
        np.testing.assert_allclose(fields["t"][0, 0], expected,
                                   rtol=0, atol=1e-6)

    def test_reduced_gaussian_pl_from_file(self, tmp_path):
        """nlat=4 reduced Gaussian, file-carried pl=(2,3,3,2), z @ 500
        hPa, 8-bit packing, E=+2: Y = 50000 + X * 4."""
        pl = (2, 3, 3, 2)
        xs = list(range(10))
        msg = grib2_message(0, [
            ident_section(2021, 7, 1, 0),
            reduced_gaussian_grid_section(nlat=4, pl=pl),
            product_section(category=3, number=4,    # 4.2-0-3-4: geopot.
                            sfc_type=100, sfc_scale=0, sfc_value=50_000),
            repr_section(n_packed=10, R=50_000.0, E=2, D=0, nbits=8),
            section(6, u(255, 1)),
            section(7, pack_msb(xs, 8)),
        ])
        path = tmp_path / "golden_gg.grib2"
        path.write_bytes(msg)
        fields, times, grid = read_grib2(path)

        assert grid.kind == "reduced_gg" and grid.pl == pl
        assert grid.n_points == 10
        assert list(fields["level"]) == [500]
        np.testing.assert_allclose(fields["z"][0, 0],
                                   [50_000.0 + x * 4.0 for x in xs],
                                   rtol=0, atol=1e-2)

    def test_bitmap_present(self, tmp_path):
        """Section-6 bitmap 101101 on a 6-point grid: packed values land
        on the 1-bits, 0-bits decode as NaN (VERDICT r4 #9)."""
        msg = grib2_message(2, [          # discipline 2 = land surface
            ident_section(2020, 6, 1, 6),
            latlon_grid_section(
                nlat=2, nlon=3, la1=45_000_000, lo1=0,
                la2=-45_000_000, lo2=240_000_000,
                di=120_000_000, dj=90_000_000),
            product_section(category=0, number=0,    # land_sea_mask
                            sfc_type=1, sfc_scale=0, sfc_value=0),
            repr_section(n_packed=4, R=0.0, E=0, D=0, nbits=8),
            # bitmap octets 7+: bits 101101, MSB-first, zero-padded
            section(6, u(0, 1) + bytes([0b10110100])),
            section(7, pack_msb([7, 11, 13, 17], 8)),
        ])
        path = tmp_path / "golden_bitmap.grib2"
        path.write_bytes(msg)
        fields, _, grid = read_grib2(path)
        vals = fields["land_sea_mask"][0]
        np.testing.assert_allclose(vals[[0, 2, 3, 5]], [7, 11, 13, 17])
        assert np.isnan(vals[[1, 4]]).all()

    def test_bitmap_count_mismatch_rejected(self, tmp_path):
        """A bitmap advertising more present points than section 5 packs
        is corrupt, not silently misaligned."""
        msg = grib2_message(2, [
            ident_section(2020, 6, 1, 6),
            latlon_grid_section(
                nlat=2, nlon=3, la1=45_000_000, lo1=0,
                la2=-45_000_000, lo2=240_000_000,
                di=120_000_000, dj=90_000_000),
            product_section(category=0, number=0,
                            sfc_type=1, sfc_scale=0, sfc_value=0),
            repr_section(n_packed=3, R=0.0, E=0, D=0, nbits=8),
            section(6, u(0, 1) + bytes([0b11110000])),   # 4 present != 3
            section(7, pack_msb([1, 2, 3], 8)),
        ])
        path = tmp_path / "bad_bitmap.grib2"
        path.write_bytes(msg)
        with pytest.raises(ValueError, match="bitmap"):
            read_grib2(path)

    def test_height_above_ground_names(self, tmp_path):
        """Surface type 103 at 2 m / 10 m decorates the shortname the
        ECMWF way (2t, 10u); an unknown parameter triple still decodes
        under a synthetic name instead of failing ingest."""
        common = dict(nlat=2, nlon=3, la1=45_000_000, lo1=0,
                      la2=-45_000_000, lo2=240_000_000,
                      di=120_000_000, dj=90_000_000)
        xs = list(range(6))
        msgs = b"".join([
            grib2_message(0, [
                ident_section(2020, 1, 1, 0),
                latlon_grid_section(**common),
                product_section(category=0, number=0,     # t @ 2 m -> 2t
                                sfc_type=103, sfc_scale=0, sfc_value=2),
                repr_section(6, R=250.0, E=0, D=0, nbits=4),
                section(6, u(255, 1)), section(7, pack_msb(xs, 4))]),
            grib2_message(0, [
                ident_section(2020, 1, 1, 0),
                latlon_grid_section(**common),
                product_section(category=2, number=2,     # u @ 10 m -> 10u
                                sfc_type=103, sfc_scale=0, sfc_value=10),
                repr_section(6, R=-3.0, E=0, D=0, nbits=4),
                section(6, u(255, 1)), section(7, pack_msb(xs, 4))]),
            grib2_message(0, [
                ident_section(2020, 1, 1, 0),
                latlon_grid_section(**common),
                product_section(category=19, number=3,    # not in table
                                sfc_type=1, sfc_scale=0, sfc_value=0),
                repr_section(6, R=0.0, E=0, D=0, nbits=4),
                section(6, u(255, 1)), section(7, pack_msb(xs, 4))]),
        ])
        path = tmp_path / "golden_sfc.grib2"
        path.write_bytes(msgs)
        fields, _, _ = read_grib2(path)
        assert set(fields) == {"2t", "10u", "param_0_19_3"}
        np.testing.assert_allclose(fields["2t"][0], [250 + x for x in xs])
        np.testing.assert_allclose(fields["10u"][0], [-3 + x for x in xs])

    def test_surface_scale_factor_applied(self, tmp_path):
        """Octet-24 surface scale: type 100 value 8500 with scale -1
        means 85 000 Pa -> 850 hPa (sign-magnitude 0x81)."""
        msg = grib2_message(0, [
            ident_section(2020, 1, 1, 0),
            latlon_grid_section(
                nlat=2, nlon=3, la1=45_000_000, lo1=0,
                la2=-45_000_000, lo2=240_000_000,
                di=120_000_000, dj=90_000_000),
            product_section(category=0, number=0,
                            sfc_type=100, sfc_scale=-1, sfc_value=8_500),
            repr_section(6, R=250.0, E=0, D=0, nbits=4),
            section(6, u(255, 1)),
            section(7, pack_msb(range(6), 4)),
        ])
        path = tmp_path / "golden_scale.grib2"
        path.write_bytes(msg)
        fields, _, _ = read_grib2(path)
        assert list(fields["level"]) == [850]


class TestPackingProperties:
    """Property sweeps of the simple-packing kernel (bit widths 1-24,
    scale-factor signs) — VERDICT r4 'done' criterion."""

    @pytest.mark.parametrize("nbits", list(range(1, 25)))
    def test_roundtrip_all_bit_widths(self, nbits):
        rng = np.random.default_rng(nbits)
        v = rng.normal(scale=100.0, size=257) - 50.0
        X, R, E, D, nb = _pack_simple(v, nbits=nbits)
        assert nb == nbits
        y = _bytes_to_values(_bits_to_bytes(X, nbits), v.size, nbits,
                             float(R), E, D)
        # quantization error bounded by one packing step
        assert np.max(np.abs(y - v)) <= 2.0 ** E * (1 + 1e-6)

    @pytest.mark.parametrize("value,width", [
        (0, 1), (1, 1), (-1, 1), (127, 1), (-127, 1),
        (0, 2), (300, 2), (-300, 2), (32767, 2), (-32767, 2),
        (45_000_000, 4), (-45_000_000, 4),
    ])
    def test_sign_magnitude_roundtrip(self, value, width):
        assert _read_s(_s(value, width), 0, width) == value
        # and the wire form is sign-magnitude, not two's complement
        if value < 0:
            raw = int.from_bytes(_s(value, width), "big")
            assert raw == abs(value) | 1 << (8 * width - 1)

    def test_decode_decimal_scale(self):
        # D multiplies on the decoded side: Y = (R + X*2^E) / 10^D
        y = _bytes_to_values(pack_msb([5], 8), 1, 8, 10.0, 0, 2)
        np.testing.assert_allclose(y, [(10.0 + 5) / 100.0])
        y = _bytes_to_values(pack_msb([5], 8), 1, 8, 10.0, 0, -1)
        np.testing.assert_allclose(y, [(10.0 + 5) * 10.0])


class TestWriterReaderExtensions:
    """Round-trips through the writer for the NEW paths (bitmap, 2t/10u,
    >=3-level stacks) — complements, not replaces, the golden bytes."""

    def _grid(self):
        return GridSpec("regular_ll", 4, nlon=8)

    def test_nan_field_roundtrips_via_bitmap(self, tmp_path):
        grid = self._grid()
        vals = np.arange(32, dtype=np.float32)
        vals[[3, 17, 31]] = np.nan
        path = write_grib2(tmp_path / "b.grib2", [GribRecord(
            "land_sea_mask", vals, np.datetime64("2020-01-01T00"), grid)])
        fields, _, _ = read_grib2(path)
        out = fields["land_sea_mask"][0]
        assert np.isnan(out[[3, 17, 31]]).all()
        m = np.isfinite(vals)
        np.testing.assert_allclose(out[m], vals[m], atol=1e-3)

    def test_three_level_stack(self, tmp_path):
        grid = self._grid()
        rng = np.random.default_rng(0)
        times = [np.datetime64("2020-01-01T00"),
                 np.datetime64("2020-01-01T06")]
        recs, truth = [], {}
        for t in times:
            for lev in (850, 500, 300):
                v = rng.normal(size=32) * 10 + lev
                truth[(t, lev)] = v
                recs.append(GribRecord("z", v, t, grid, level_hPa=lev))
        path = write_grib2(tmp_path / "ml.grib2", recs)
        fields, ts, _ = read_grib2(path)
        assert fields["z"].shape == (2, 3, 32)
        assert list(fields["level"]) == [300, 500, 850]   # ascending hPa
        for ti, t in enumerate(times):
            for li, lev in enumerate((300, 500, 850)):
                np.testing.assert_allclose(fields["z"][ti, li],
                                           truth[(t, lev)], atol=1e-2)

    def test_2t_10u_write_read(self, tmp_path):
        grid = self._grid()
        recs = [
            GribRecord("2t", np.full(32, 280.0),
                       np.datetime64("2020-01-01T00"), grid),
            GribRecord("10u", np.full(32, -5.0),
                       np.datetime64("2020-01-01T00"), grid),
        ]
        fields, _, _ = read_grib2(write_grib2(tmp_path / "s.grib2", recs))
        assert set(fields) == {"2t", "10u"}
        np.testing.assert_allclose(fields["2t"][0], 280.0, atol=1e-3)
        np.testing.assert_allclose(fields["10u"][0], -5.0, atol=1e-3)
