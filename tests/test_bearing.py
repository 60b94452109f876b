"""DX country lookup / beam-heading tests (reference Bearing.cpp
`FindCountry` + haversine/azimuth readout)."""

import math

from t41x.decode import bearing
from t41x.decode.locator import grid_to_latlon


def test_longest_prefix_match():
    # 4-char beats 1-char: a 4U1ITU special station is not "4U"-generic
    c = bearing.find_country("4U1ITU")
    assert c.name == "ITU HQ Geneva"
    # plain 2-char
    assert bearing.find_country("DL1ABC").name == "Germany"
    # 3-char beats 2-char (3B8 Mauritius vs no bare 3B row)
    assert bearing.find_country("3B8CW").name == "Mauritius"
    # single-letter entities
    assert bearing.find_country("BY1QH").name == "China"
    assert bearing.find_country("F5IN").name == "France"
    assert bearing.find_country("K1JT").name == "United States"
    # longer prefix overrides shorter within the same family
    assert bearing.find_country("EA8ABC").name == "Canary Islands"
    assert bearing.find_country("EA3XYZ").name == "Spain"
    # no match
    assert bearing.find_country("QQQ") is None


def test_callsign_prefix_portable():
    assert bearing.callsign_prefix("W1AW/7") == "W1AW"
    # DX-side portable: EA8/G4ABC operates from the Canaries
    assert bearing.find_country("EA8/G4ABC").name == "Canary Islands"
    assert bearing.callsign_prefix(" dl1abc ") == "DL1ABC"


def test_dx_heading_known_path():
    # Boston-area QTH (FN42) to Germany: beam ~NE (40-70°),
    # distance ~5500-6500 km
    country, brg, dist = bearing.dx_heading("FN42", "DL1ABC")
    assert country.name == "Germany"
    assert 35.0 < brg < 75.0, brg
    assert 5200 < dist < 6800, dist


def test_dx_heading_southern_hemisphere():
    # From Germany (JO62) to South Africa: roughly due south
    country, brg, dist = bearing.dx_heading("JO62", "ZS6ABC")
    assert country.name == "South Africa"
    assert 150.0 < brg < 200.0, brg
    assert 8000 < dist < 10500, dist


def test_country_grid_consistent():
    c = bearing.find_country("JA1ABC")
    lat, lon = grid_to_latlon(c.grid)
    assert math.isclose(lat, c.lat, abs_tol=0.8)
    assert math.isclose(lon, c.lon, abs_tol=1.5)


def test_table_rows_sane():
    seen = set()
    for pfx, name, lat, lon in bearing.DXCC_TABLE:
        assert pfx not in seen, f"duplicate prefix {pfx}"
        seen.add(pfx)
        assert -90 <= lat <= 90 and -180 <= lon <= 180, (pfx, lat, lon)
        assert name
