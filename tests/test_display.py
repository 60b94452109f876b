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
