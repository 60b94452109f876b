"""Live operator session (VERDICT r2 item 8): scripted control of a
running stream — tune/band/mode/AGC mid-stream, ASCII panadapter — with
the audio-spectrum peak observed to MOVE when the operator retunes."""

import socket

import numpy as np

from t41x import constants as C
from t41x.io import signals
from t41x.io.repl import OperatorServer, OperatorSession
from t41x.radio import Radio
from t41x.runner import StreamRunner

AUDIO_BIN_HZ = C.AUDIO_RATE / 512.0


def _two_station_capture(n: int) -> np.ndarray:
    """Station A: 800 Hz tone at the tuning point; station B: 1500 Hz
    tone 40 kHz up — the operator must retune (NCO) to hear B."""
    a = signals.usb_signal([800.0], n) * 0.3
    b = signals.usb_signal([1500.0], n, nco=40_000.0) * 0.3
    return (a + b).astype(np.complex64)


def _pump(runner: StreamRunner, iq: np.ndarray, n_blocks: int,
          offset: int = 0) -> int:
    for b in range(n_blocks):
        s = ((offset + b) * C.BLOCK_SIZE) % (len(iq) - C.BLOCK_SIZE)
        runner.ring.push(np.ascontiguousarray(
            iq[s: s + C.BLOCK_SIZE]).view(np.float32))
        runner.drain()
    return offset + n_blocks


def _audio_peak_hz(runner: StreamRunner) -> float:
    spec = np.asarray(runner.last_audio_spectrum)
    return float(np.argmax(spec) * AUDIO_BIN_HZ)


def test_operator_session_retune_moves_audio_peak():
    radio = Radio()
    runner = StreamRunner(radio)
    session = OperatorSession(runner)
    iq = _two_station_capture(24 * C.BLOCK_SIZE)

    off = _pump(runner, iq, 10)
    assert abs(_audio_peak_hz(runner) - 800.0) < 2 * AUDIO_BIN_HZ

    # operator retunes 40 kHz up, mid-stream; station B appears at 1500
    out = session.execute("tune 40000")
    assert "nco 40000" in out
    off = _pump(runner, iq, 10, off)
    assert abs(_audio_peak_hz(runner) - 1500.0) < 2 * AUDIO_BIN_HZ

    # spectrum art renders with energy above the floor
    art = session.execute("audio")
    assert "#" in art

    # status reflects the live stream
    status = session.execute("status")
    assert "blocks 20" in status and "nco +40000" in status


def test_operator_session_band_mode_agc_mid_stream():
    radio = Radio()
    runner = StreamRunner(radio)
    session = OperatorSession(runner)
    iq = _two_station_capture(16 * C.BLOCK_SIZE)

    off = _pump(runner, iq, 4)
    assert session.execute("band 40M").startswith("band 40M")
    assert "mode cw" == session.execute("mode cw")
    assert session.execute("agc fast") == "agc fast"
    assert session.execute("vol 80") == "volume 80"
    # the swapped-in chain keeps processing (new spec compiled lazily)
    off = _pump(runner, iq, 4, off)
    assert runner.blocks_processed == 8
    st = session.execute("status")
    assert "band 40M" in st and "mode cw" in st and "agc fast" in st
    # rf panadapter renders (zoom defaults to x2)
    art = session.execute("spectrum")
    assert "#" in art and "MHz" in art
    # errors are reported, not raised
    assert session.execute("mode fm").startswith("error")
    assert session.execute("bogus").startswith("error")


def test_operator_encoder_nudges_and_eeprom_menu(tmp_path):
    """Encoder-detent nudges (tune/freq/vol +/-) and the EEPROM menu
    analog (save/load from the live session)."""
    radio = Radio()
    runner = StreamRunner(radio)
    session = OperatorSession(runner)

    assert "tune increment" in session.execute("step")
    f0 = radio.config.center_freq
    session.execute("freq +")
    assert radio.config.center_freq > f0
    session.execute("tune 1000")
    session.execute("tune +")
    assert radio.config.nco_freq == 1000.0 + radio.config.fine_tune_step
    session.execute("vol 50")
    session.execute("vol -")
    assert radio.config.audio_volume == 45

    path = str(tmp_path / "rig.json")
    session.execute("vol 72")
    assert "saved" in session.execute(f"save {path}")
    session.execute("vol 10")
    assert "loaded" in session.execute(f"load {path}")
    assert radio.config.audio_volume == 72


def test_operator_cal_tx_flow_converges():
    """The MenuProc calibrate flow from the live session: a simulated
    analog IQ imbalance as the loopback; `cal tx` must improve image
    rejection and write the factors through to config."""
    radio = Radio()
    runner = StreamRunner(radio)

    def hardware(iq):
        i, q = iq.real, iq.imag
        return (1.08 * i + 0.06 * q) + 1j * q

    session = OperatorSession(runner, loopback=hardware)
    out = session.execute("cal tx 1000")
    assert "image rejection" in out, out
    rej = float(out.split("rejection")[1].split("dB")[0])
    assert rej > 30.0, out
    assert radio.config.band.iq_amp_correction_tx != 1.0

    bare = OperatorSession(runner)
    assert "no TX->RX loopback" in bare.execute("cal tx")


def test_operator_tcp_server_scripted_session():
    radio = Radio()
    runner = StreamRunner(radio)
    iq = _two_station_capture(12 * C.BLOCK_SIZE)
    _pump(runner, iq, 6)

    srv = OperatorServer(runner)
    try:
        with socket.create_connection(("127.0.0.1", srv.port),
                                      timeout=10) as sk:
            f = sk.makefile("rwb")

            def cmd(line: str) -> str:
                f.write(line.encode() + b"\n")
                f.flush()
                out = []
                while True:
                    ln = f.readline()
                    if not ln or ln == b"\n":
                        break
                    out.append(ln.decode().rstrip("\n"))
                return "\n".join(out)

            assert "tune increment" in cmd("step")
            assert cmd("tune 12500").startswith("nco 12500")
            assert "#" in cmd("audio")
            assert "blocks 6" in cmd("status")
            assert cmd("quit") == "bye"
    finally:
        srv.close()


def test_operator_eq_commands_mid_stream():
    """EQ set menus (`MenuProc.cpp:318/:348`) from the live session:
    toggle the receive EQ mid-stream (chain swap) and edit band gains
    live — the gains must change the audio on the NEXT block."""
    radio = Radio()
    runner = StreamRunner(radio)
    runner.keep_audio = True
    session = OperatorSession(runner)
    iq = _two_station_capture(20 * C.BLOCK_SIZE)

    off = _pump(runner, iq, 4)
    assert session.execute("eq rx on") == "eq rx on"
    off = _pump(runner, iq, 4, off)   # chain swap happened mid-stream
    n_keep = len(runner.audio_chunks)
    off = _pump(runner, iq, 4, off)
    before_rms = float(np.sqrt(np.mean(np.concatenate(
        runner.audio_chunks[n_keep:]) ** 2)))

    # zero every EQ band: the audio output (EQ is applied after the
    # audio-spectrum tap, Process.cpp:828-831) must collapse
    for b in range(1, 15):
        out = session.execute(f"eq rx {b} 0")
        assert f"band {b} = 0" in out
    off = _pump(runner, iq, 2, off)   # flush the transition block
    n_keep = len(runner.audio_chunks)
    off = _pump(runner, iq, 4, off)
    after_rms = float(np.sqrt(np.mean(np.concatenate(
        runner.audio_chunks[n_keep:]) ** 2)))
    assert after_rms < 0.1 * before_rms, (after_rms, before_rms)

    # show view renders gains
    view = session.execute("eq rx")
    assert view.startswith("eq rx on")
    assert "  0" in view
    # tx EQ gain edit goes to the xmit table
    session.execute("eq tx 3 55")
    assert radio.config.equalizer_xmt[2] == 55
    assert radio.config.equalizer_rec[2] == 0


def test_operator_mic_menu():
    radio = Radio()
    runner = StreamRunner(radio)
    session = OperatorSession(runner)
    out = session.execute("mic gain 15 comp 8.5")
    assert "mic gain 15 dB" in out and "compression 8.5" in out
    assert radio.config.mic_gain == 15
    assert radio.config.mic_compression == 8.5
    out = session.execute("mic comp -1")
    assert "(off)" in out
    assert "mic gain 15" in session.execute("mic")


def test_operator_cal_rx_flow_converges():
    """`cal rx` (`DoReceiveCalibrate` `Process2.cpp:159`): the loopback
    models the RX front end's IQ imbalance; the flow must converge the
    RX correction factors and write them to the per-band config."""
    radio = Radio()
    runner = StreamRunner(radio)

    def rx_hardware(iq):
        i, q = iq.real, iq.imag
        return (0.93 * i - 0.04 * q) + 1j * q

    session = OperatorSession(runner, loopback=rx_hardware)
    out = session.execute("cal rx 1000")
    assert "RX cal" in out and "image rejection" in out, out
    rej = float(out.split("rejection")[1].split("dB")[0])
    assert rej > 30.0, out
    assert radio.config.band.iq_amp_correction != 1.0
    assert radio.config.band.iq_amp_correction_tx == 1.0  # TX untouched

    bare = OperatorSession(runner)
    assert "no TX->RX loopback" in bare.execute("cal rx")


def test_operator_favorites_recall():
    """Favorites (`EEPROMData.favoriteFreqs[13]`): store, list, recall
    with automatic band switch."""
    radio = Radio()
    runner = StreamRunner(radio)
    session = OperatorSession(runner)

    session.execute("freq 14250000")
    assert "favorite 2 = 14.2500 MHz" in session.execute("fav set 2")
    session.execute("band 40M")        # band switch recalls band.freq,
    session.execute("freq 7200000")    # then tune within the band
    assert "favorite 5 = 7.2000 MHz" in session.execute("fav set 5")

    listing = session.execute("fav")
    assert "2: 14.2500 MHz" in listing and "5: 7.2000 MHz" in listing

    out = session.execute("fav 2")   # recall: band auto-switches to 20M
    assert "14.2500 MHz" in out and "20M" in out
    assert radio.config.center_freq == 14_250_000
    assert radio.config.band.name == "20M"

    assert "error" in session.execute("fav 9")  # empty slot


def test_operator_mic_missing_value_prints_usage():
    """'mic gain' with no value must produce the usage error, not leak
    StopIteration out of the REPL (r4 advisor finding, repl.py)."""
    radio = Radio()
    runner = StreamRunner(radio)
    session = OperatorSession(runner)
    out = session.execute("mic gain")
    assert out.startswith("error:") and "usage: mic" in out
    out = session.execute("mic comp")
    assert out.startswith("error:") and "usage: mic" in out
    assert radio.config.mic_gain == 10  # default untouched
