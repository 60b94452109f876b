"""CAT server and control-protocol tests (through real TCP sockets)."""

import socket
import time

import numpy as np

from t41x.io import cat, control
from t41x.radio import Radio


def test_cat_handler_basics():
    radio = Radio()
    h = cat.CATHandler(radio)
    assert h.handle_command("ID") == "ID024;"
    assert h.handle_command("PS") == "PS1;"
    assert h.handle_command("FA").startswith("FA") \
        and h.handle_command("FA").endswith(";")
    # set frequency: moves to 40M band
    h.handle_command("FA00007074000")
    assert radio.config.band.name == "40M"
    assert radio.config.center_freq == 7_074_000
    # mode set/get
    h.handle_command("MD2")
    assert radio.config.band.mode == "usb"
    assert h.handle_command("MD") == "MD2;"
    # IF status frame is fixed-length-ish and contains the frequency
    s = h.handle_command("IF")
    assert s.startswith("IF00007074000") and s.endswith(";")
    assert h.handle_command("ZZ") == "?;"


def test_cat_extended_command_set():
    """The rest of the reference's WSJTLoop surface (wsjt.cpp:170-463):
    increments, VFO select, AGC, noise floor, power, split, clock."""
    radio = Radio()
    h = cat.CATHandler(radio)
    cfg = radio.config

    # FI: tune/fine-tune increment tables
    h.handle_command("FI06")
    assert cfg.tune_index == 6
    h.handle_command("FI13")
    assert cfg.ft_index == 3 and cfg.fine_tune_step == 500

    # FS: fine-tune active flag
    h.handle_command("FS0")
    assert cfg.fine_tune_active is False
    assert h.handle_command("FS") == "FS0;"

    # FR/FT with body: VFO select
    a_freq = cfg.center_freq
    h.handle_command("FR1")
    assert cfg.active_vfo == "B"
    assert cfg.center_freq == cfg.to_dict()["center_freq"]
    h.handle_command("FT0")
    assert cfg.active_vfo == "A" and cfg.center_freq == a_freq

    # GT: AGC
    h.handle_command("GT3")
    assert cfg.agc_mode == 3
    assert h.handle_command("GT") == "GT3;"

    # NF/NG: per-band noise floor
    h.handle_command("NF0012")
    assert cfg.band.noise_floor == 12
    assert h.handle_command("NF") == "NF0012;"
    h.handle_command("NG1")
    assert cfg.live_noise_floor is True

    # OM: operating demod mode
    assert h.handle_command("OM0").startswith("OM0")
    h.handle_command("OM01")
    assert cfg.band.mode == "lsb"

    # PC: transmit power
    h.handle_command("PC015")
    assert cfg.transmit_power == 15.0
    assert h.handle_command("PC") == "PC015;"

    # SP: split
    h.handle_command("SP1")
    assert cfg.split_on is True
    assert h.handle_command("SP") == "SP1;"

    # ME: operating mode
    h.handle_command("ME1")
    assert cfg.op_mode == "cw"
    assert h.handle_command("ME") == "ME1;"

    # TM: clock sync stored as an offset
    h.handle_command("TM00000012345")
    assert isinstance(h.clock_offset, int)

    # BU with step count wraps the band table
    start = cfg.current_band
    h.handle_command("BU2")
    assert cfg.current_band == (start + 2) % len(cfg.bands)


def test_cat_server_over_tcp():
    radio = Radio()
    srv = cat.CATServer(radio)
    try:
        assert cat.cat_query(srv.port, "ID;") == "ID024;"
        cat.cat_query(srv.port, "FA00014074000;MD2;")
        time.sleep(0.1)
        assert radio.config.center_freq == 14_074_000
        assert radio.config.band.mode == "usb"
        # stream of multiple commands in one packet
        resp = cat.cat_query(srv.port, "PS;ID;")
        assert "PS1;" in resp
    finally:
        srv.close()


def test_control_frames_roundtrip():
    pix = np.linspace(0, 100, 512)
    f = control.rf_spectrum_frame(pix)
    frames, rest = control.parse_frames(f)
    assert rest == b""
    assert frames[0][0] == "FD"
    assert len(frames[0][1]) == 3 + 512
    sm = control.smeter_frame(-73.0)
    frames, _ = control.parse_frames(sm)
    assert frames[0][0] == "SM"
    assert b"-0073.0" in frames[0][1]


def test_control_server_streams_to_client():
    srv = control.ControlServer()
    try:
        with socket.create_connection(("127.0.0.1", srv.port),
                                      timeout=5) as c:
            time.sleep(0.1)
            srv.publish_rf_spectrum(np.arange(512.0))
            srv.publish_smeter(-80.0)
            c.settimeout(2)
            buf = b""
            while True:
                frames, _ = control.parse_frames(buf)
                if len(frames) >= 2:
                    break
                buf += c.recv(4096)
            tags = [t for t, _ in frames]
            assert tags[:2] == ["FD", "SM"]
    finally:
        srv.close()


def test_cat_ts2000_variant():
    radio = Radio()
    h = cat.CATHandlerTS2000(radio)
    assert h.handle_command("ID;") == "ID019;"
    assert h.handle_command("PS;") == "PS0;"  # manual: 0 = on
    # IF status: "IF" + 11 freq + 4 step + 6 RIT + 13 single-char/2-wide
    resp = h.handle_command("IF;")
    assert resp.startswith("IF") and resp.endswith(";")
    assert len(resp) == 2 + 11 + 4 + 6 + 14 + 1
    # shared commands still work through the base handler
    h.handle_command("FA00014074000;")
    assert radio.config.center_freq == 14_074_000
    srv = cat.CATServer(radio, variant="ts2000")
    try:
        assert cat.cat_query(srv.port, "ID;") == "ID019;"
    finally:
        srv.close()


def test_beacon_frame_roundtrip():
    colors = np.arange(90) % 10
    f = control.beacon_frame(2, 7, 30, colors)
    assert len(f) == 96
    frames, rest = control.parse_frames(f)
    assert rest == b"" and frames[0][0] == "BM"
    band, beacon, volume = frames[0][1][:3]
    assert (band, beacon, volume) == (2, 7, 30)
    np.testing.assert_array_equal(
        np.frombuffer(frames[0][1][3:], np.uint8), colors)


def test_beacon_app_server_ds_dp_gating():
    srv = control.BeaconAppServer()
    try:
        with socket.create_connection(("127.0.0.1", srv.port),
                                      timeout=5) as c:
            time.sleep(0.1)
            # not streaming until DS;
            srv.publish_beacon(0, 0, 10, np.zeros(90))
            c.sendall(b"DS;")
            for _ in range(100):
                if srv.streaming:
                    break
                time.sleep(0.02)
            assert srv.streaming
            srv.publish_beacon(1, 2, 30, np.full(90, 4))
            c.settimeout(2)
            buf = b""
            while True:
                frames, _ = control.parse_frames(buf)
                if frames:
                    break
                buf += c.recv(4096)
            assert frames[0][0] == "BM" and frames[0][1][0] == 1
            c.sendall(b"DP;")
            for _ in range(100):
                if not srv.streaming:
                    break
                time.sleep(0.02)
            assert not srv.streaming
    finally:
        srv.close()
