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
