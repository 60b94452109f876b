"""Kenwood CAT control server (host side).

Re-expression of the reference's WSJT-X CAT interface (tmr4/T41_SDR
`wsjt.cpp:170-463` `WSJTLoop`): Kenwood TS-890S emulation over
';'-terminated two-letter commands, serving rig-control clients
(WSJT-X, flrig, ...).  The reference speaks USB serial; t41x serves TCP
(and offers `handle_command` directly for in-process/testing use).

Supported commands mirror the reference: AI, BU/BD, FA/FB/FC, FR/FT,
ID, IF, KS, MD, PS, SM, plus graceful '?;' for the rest.
"""

from __future__ import annotations

import socket
import socketserver
import threading

from t41x.radio import Radio

# Kenwood mode numbers (wsjt.cpp:115-140)
_MODE_TO_KENWOOD = {"lsb": 1, "usb": 2, "cw": 3, "nfm": 4, "am": 5,
                    "sam": 5, "ft8": 2, "psk31": 2}
_KENWOOD_TO_MODE = {1: "lsb", 2: "usb", 3: "cw", 4: "nfm", 5: "am"}

# Kenwood band numbers (wsjt.cpp:83-111) -> t41x band-table index
_BAND_TO_KENWOOD = {"80M": 1, "40M": 2, "20M": 4, "17M": 5, "15M": 6,
                    "12M": 7, "10M": 8}


class CATHandler:
    """Stateless-ish command interpreter bound to a Radio."""

    def __init__(self, radio: Radio):
        self.radio = radio
        self.smeter_dbm = -100.0
        self.tx = False

    # ------------------------------------------------------------------
    def handle_command(self, cmd: str) -> str:
        """One ';'-stripped command -> response (may be '')."""
        cfg = self.radio.config
        c = cmd.strip()
        if not c:
            return ""
        head = c[:2].upper()
        body = c[2:]

        if head == "AI":
            return "AI0;"
        if head == "ID":
            return "ID024;"  # TS-890S (wsjt.cpp:325)
        if head == "PS":
            return "PS1;"
        if head == "FA":
            if body:
                self._set_freq(int(body))
                return ""
            return f"FA{cfg.center_freq + int(cfg.nco_freq):011d};"
        if head in ("FB", "FC"):
            if body:
                self._set_freq(int(body))
                return ""
            return f"{head}{cfg.center_freq:011d};"
        if head == "FR":
            return "FR0;"
        if head == "FT":
            return "FT1;"
        if head == "MD":
            if body:
                mode = _KENWOOD_TO_MODE.get(int(body[0]))
                if mode:
                    self.radio.set_mode(mode)
                return ""
            return f"MD{_MODE_TO_KENWOOD.get(cfg.band.mode, 1)};"
        if head == "IF":
            freq = cfg.center_freq + int(cfg.nco_freq)
            mode = _MODE_TO_KENWOOD.get(cfg.band.mode, 1)
            return (f"IF{freq:011d}{5000:04d}{0:+06d}00"
                    f"00{0:02d}{0 if self.tx else 1}{mode}0000"
                    f"1{0:02d}0;")
        if head in ("BU", "BD"):
            step = 1 if head == "BU" else -1
            idx = (cfg.current_band + step) % len(cfg.bands)
            self.radio.set_band(idx)
            return f"{head}0{_BAND_TO_KENWOOD.get(cfg.band.name, 2)};"
        if head == "KS":
            if body:
                cfg.cw_wpm = int(body)
                return ""
            return f"KS{cfg.cw_wpm:03d};"
        if head == "SM":
            # 0..30 scaled from dBm (S9 = -73)
            level = max(0, min(30, int((self.smeter_dbm + 127) / 3)))
            return f"SM{0}{level:04d};"
        if head == "TX":
            self.tx = True
            return ""
        if head == "RX":
            self.tx = False
            return ""
        return "?;"

    def handle_stream(self, data: str) -> str:
        """Split a ';'-separated stream into commands; concatenate
        responses."""
        out = []
        for part in data.split(";"):
            if part.strip():
                out.append(self.handle_command(part))
        return "".join(out)

    def _set_freq(self, hz: int) -> None:
        cfg = self.radio.config
        # pick the band containing the frequency, like ChangeBand
        for i, b in enumerate(cfg.bands):
            if b.band_low <= hz <= b.band_high:
                if i != cfg.current_band:
                    self.radio.set_band(i)
                break
        cfg.center_freq = hz
        cfg.nco_freq = 0.0


class CATServer:
    """TCP server speaking the CAT protocol (default port 4532-style)."""

    def __init__(self, radio: Radio, host: str = "127.0.0.1",
                 port: int = 0):
        handler = CATHandler(radio)
        self.handler = handler

        class _TCP(socketserver.StreamRequestHandler):
            def handle(self):
                buf = ""
                while True:
                    data = self.request.recv(4096)
                    if not data:
                        break
                    buf += data.decode(errors="replace")
                    while ";" in buf:
                        cmd, buf = buf.split(";", 1)
                        resp = handler.handle_command(cmd)
                        if resp:
                            self.request.sendall(resp.encode())

        self._srv = socketserver.ThreadingTCPServer((host, port), _TCP)
        self._srv.daemon_threads = True
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


def cat_query(port: int, command: str, host: str = "127.0.0.1") -> str:
    """Test/client helper: send one command, read the response."""
    with socket.create_connection((host, port), timeout=5) as s:
        s.sendall(command.encode())
        s.settimeout(2)
        try:
            return s.recv(4096).decode()
        except socket.timeout:
            return ""
