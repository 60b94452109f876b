"""Panadapter rendering tests (reference Display.cpp spectrum/waterfall
layer re-expressed as pure tensor->image functions)."""

import numpy as np

from t41x.io import display


def test_colormap_shape_and_ramp():
    cmap = display.waterfall_colormap()
    assert cmap.shape == (117, 3) and cmap.dtype == np.uint8
    # starts black, ends bright; monotone-ish overall brightness rise
    assert cmap[0].sum() == 0
    assert cmap[-1].sum() > 400
    third = cmap[: len(cmap) // 3].astype(int).sum(axis=1).mean()
    last = cmap[-len(cmap) // 3:].astype(int).sum(axis=1).mean()
    assert last > third


def test_waterfall_rows_mapping():
    rows = np.array([[0.0, 10.0, 30.0, 100.0]])
    rgb = display.waterfall_rows_to_rgb(rows, floor_db=0.0, scale_index=1)
    assert rgb.shape == (1, 4, 3)
    # 0 dB maps to the bottom of the LUT (black), strong bins saturate
    assert rgb[0, 0].sum() == 0
    assert rgb[0, 3].sum() > 400
    # below-floor values clip instead of wrapping
    rgb2 = display.waterfall_rows_to_rgb(rows - 50.0)
    assert rgb2[0, 0].sum() == 0


def test_render_panadapter_composition():
    bins = 512
    spec = np.zeros(bins)
    spec[200] = 30.0            # one carrier
    wf = np.tile(spec, (20, 1))
    img = display.render_panadapter(
        spec, wf, spectrum_height=100,
        f_lo=200, f_hi=3000, span_hz=192_000)
    assert img.shape == (120, bins, 3) and img.dtype == np.uint8
    # the carrier column contains the bright polyline pixel high up
    col = img[:100, 200]
    assert col.max() >= 250
    # waterfall rows show the carrier as a hot pixel vs neighbours
    assert img[110, 200].astype(int).sum() \
        > img[110, 100].astype(int).sum()
    # bandwidth bar: passband columns are brighter than stopband bg
    pass_col = img[:100, bins // 2 + 4].astype(int).sum()
    stop_col = img[:100, 10].astype(int).sum()
    assert pass_col > stop_col


def test_render_without_waterfall():
    img = display.render_panadapter(np.zeros(256), None,
                                    spectrum_height=50)
    assert img.shape == (50, 256, 3)


def test_save_png_roundtrip(tmp_path):
    img = display.render_panadapter(np.linspace(0, 40, 128),
                                    np.zeros((4, 128)),
                                    spectrum_height=40)
    p = tmp_path / "pan.png"
    display.save_png(str(p), img)
    from PIL import Image
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img)


def test_snr_color_ladder():
    assert display.snr_color(-5) == display.SNR_COLORS[0]
    assert display.snr_color(0) == display.SNR_COLORS[0]
    assert display.snr_color(7) == display.SNR_COLORS[1]
    assert display.snr_color(6 * 6 + 1) == display.SNR_COLORS[6]
    assert display.snr_color(500) == display.SNR_COLORS[-1]   # clamps red


def test_render_beacon_map():
    from t41x.decode.beacon import BeaconReport
    import numpy as np
    rep = BeaconReport()
    rep.update(0, np.array([40.0, 0, 0, 0, 0]))   # slot 0: 4U1UN on 20M
    img = display.render_beacon_map(rep, home_grid="FN42", band_index=0,
                                    scale=2)
    assert img.shape == (360, 720, 3)
    # 4U1UN (FN30as ~ 40.8N, -74W) patch is bright green-ish (40 dB)
    y, x = int((90 - 40.8) * 2), int((-74 + 180) * 2)
    region = img[y - 4: y + 5, x - 4: x + 5]
    assert region[..., 1].max() >= 250      # green channel saturated
    # QTH marker is white
    from t41x.decode.locator import grid_to_latlon
    lat, lon = grid_to_latlon("FN42")
    yq, xq = int((90 - lat) * 2), int((lon + 180) * 2)
    assert (img[yq, xq] == 255).all()


def test_render_smeter():
    weak = display.render_smeter(-121.0)
    s9 = display.render_smeter(-73.0)
    over = display.render_smeter(-33.0)
    assert weak.shape == (24, 360, 3)
    # stronger signal lights more green columns
    def green_cols(img):
        return int((img[12, :, 1] == 255).sum())
    assert green_cols(weak) < green_cols(s9)
    # +40 over S9 lights the red segment
    assert (over[12, :, 0] == 255).any()
    assert not (s9[12, :, 0] == 255).any()


def test_ascii_spectrum():
    spec = np.zeros(512)
    spec[100:110] = 50.0
    s = display.ascii_spectrum(spec, width=64, height=8)
    lines = s.splitlines()
    assert len(lines) == 9 and all(len(ln) == 64 for ln in lines)
    assert "#" in s
    # column containing the signal is tall (50/60 of full scale -> row 7)
    assert lines[1][100 * 64 // 512] == "#"
    # empty far column is blank
    assert lines[1][60] == " "


def test_render_bearing_map():
    """DX bearing map: QTH + DXCC endpoint + great-circle path drawn,
    heading/distance sane (Boston -> Japan goes NNW over the pole)."""
    from t41x.io.display import render_bearing_map

    img, info = render_bearing_map("FN42", "JA1XYZ", scale=2)
    assert img.shape == (360, 720, 3)
    assert info["country"] == "Japan"
    assert 320 < info["bearing_deg"] < 350, info
    assert 9000 < info["distance_km"] < 12500, info
    # path pixels drawn (yellow), endpoints present (white + red)
    yellow = (img == np.array([255, 210, 60])).all(axis=-1).sum()
    assert yellow > 100
    assert (img == np.array([255, 255, 255])).all(axis=-1).any()
    assert (img == np.array([255, 60, 60])).all(axis=-1).any()

    import pytest

    with pytest.raises(ValueError):
        render_bearing_map("FN42", "ZZ9ZZZ")
